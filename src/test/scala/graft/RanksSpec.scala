package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-safe rank/prefix-sum primitives (operators/Ranks) must be
  * VALUE-identical to the single-partition window forms they replace —
  * these tests pin that equivalence on data with duplicates, skewed
  * buckets, and hash-ordered keys, so the four production call sites
  * (s06/s07 seed ranks, p03 LPT rank, p07 running pack sum) can rely
  * on it. */
class RanksSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fixture = {
    import spark.implicits._
    // 500 rows, duplicate values (forces tie-breaks), skewed buckets
    spark.range(0, 500)
      .select($"id",
        (($"id" * 37) % 11).as("v"),
        md5($"id".cast("string")).as("k"))
  }

  test("runningSum equals the global-window cumsum (hash-key order)") {
    import spark.implicits._
    val df = fixture
    val w = Window.orderBy($"k", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum($"v").over(w))
      .select($"id", $"cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = operators.Ranks
      .runningSum(df, substring($"k", 1, 2), Seq($"k", $"id"), $"v", "cum")
      .select($"id", $"cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("globalRank equals row_number over a desc/asc composite order") {
    import spark.implicits._
    val df = fixture
    val w = Window.orderBy($"v".desc, $"id")
    val want = df.withColumn("rn", row_number().over(w))
      .select($"id", $"rn").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    // bucket = -v: 11 skewed buckets, ascending bucket == descending v
    val got = operators.Ranks
      .globalRank(df, -$"v", Seq($"v".desc, $"id"), "rn")
      .select($"id", $"rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("tinyRank equals row_number on a top-k survivor frame") {
    import spark.implicits._
    val pool = fixture.orderBy($"k", $"id").limit(16).localCheckpoint()
    val w = Window.orderBy($"k", $"id")
    val want = pool.withColumn("r", row_number().over(w))
      .select($"id", $"r").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = operators.Ranks
      .tinyRank(pool, struct($"k", $"id"), "r")
      .select($"id", $"r").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.values.toSeq.sorted == (1L to 16L))
  }
}
