package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._
  import operators.Skew

  test("salted aggregate equals plain aggregate") {
    import spark.implicits._
    val li = sources.Tables.lineitem(spark, sf)
    val salted = Skew.saltedAggregate(li, "l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val li = sources.Tables.lineitem(spark, sf)
    val sup = sources.Tables.supplier(spark, sf)
    val salted = Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey")
      .groupBy($"s_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val plain = li.join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
