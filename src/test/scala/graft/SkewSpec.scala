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

  test("AQE splits a runtime-detected skewed join (skew=true in final plan)") {
    import spark.implicits._
    // Thresholds lowered so test-sized data trips the same machinery
    // that handles real skew at 100 TB: one hot key holding 75% of the
    // left side must make OptimizeSkewedJoin split its partition.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 200000).select(
        when($"id" < 150000, 0L).otherwise($"id").as("k"),
        lpad($"id".cast("string"), 64, "x").as("pad"))
      val right = spark.range(0, 1000).select($"id".as("k"),
        lit("r").as("rv"))
      val j = left.join(right, "k")
      // collect() executes j's OWN QueryExecution (count() would spawn
      // a separate one and leave this plan un-finalized)
      assert(j.collect().length == 150000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not split the hot partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces a nearly-empty shuffle (AQEShuffleRead coalesced)") {
    import spark.implicits._
    // The complement of the skew split: a 5-group aggregate shuffled
    // over 32 partitions leaves ~27 empty — CoalesceShufflePartitions
    // must fold them at runtime (the reference sizes reducers at plan
    // time from stats; AQE does it from the ACTUAL map output, which is
    // what survives a 1000-executor cluster where stats lie).
    val df = sources.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"))
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead coalesced"),
      s"expected coalesced shuffle read:\n$p")
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
