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

  test("stratumRank equals row_number partitioned by stratum") {
    import spark.implicits._
    // skewed strata (one rare, one common, one mid by id%7 bands) plus
    // a NULL stratum (id%7==6): row_number ranks the null partition
    // like any other, so stratumRank must too (the null-safe join pin)
    val df = fixture.withColumn("s",
      when($"id" % 7 === 0, "a").when($"id" % 7 < 4, "b")
        .when($"id" % 7 < 6, "c"))
    val w = Window.partitionBy($"s").orderBy($"k", $"id")
    val want = df.withColumn("rn", row_number().over(w))
      .select($"id", $"rn").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = operators.Ranks
      .stratumRank(df, Seq($"s"), substring($"k", 1, 1),
        Seq($"k", $"id"), "rn")
      .select($"id", $"rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("PROPERTY: any order-respecting bucket fn => bit-identical runningSum") {
    // the bucket contract (Ranks.runningSum scaladoc): for ANY pure
    // bucket function that respects the sort-key total order, the
    // two-pass prefix sum equals the single-reducer global window
    // bit-for-bit. ScalaCheck drives random value lists, random key
    // distributions (duplicates included — bucket is a function of
    // the key alone, so key-ties always share a bucket), and a random
    // monotone band bucket floor((k - off) / width); the reference is
    // computed driver-side, independent of any Spark window.
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // keys are OPTIONAL: a None key models the null-sort-key rows the
    // null-aware bucket ordering handles — they sort FIRST (Spark asc
    // NULLS FIRST) and their bucket expression is null
    val genCase = for {
      n <- Gen.choose(1, 60)
      vs <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
      ks <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(-500L, 500L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long])))
      width <- Gen.choose(1L, 200L)
      off <- Gen.choose(-100L, 100L)
    } yield (ks.zip(vs), width, off)
    val prop = Prop.forAllNoShrink(genCase) { case (rows, width, off) =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k, v) }.toDF("id", "k", "v")
      val bucket = floor(($"k" - off) / width.toDouble).cast("long")
      val got = operators.Ranks
        .runningSum(df, bucket, Seq($"k", $"id"), $"v", "cum")
        .select($"id", $"cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sorted = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k, v) }
        .sortBy { case (i, k, _) => (k.isDefined, k.getOrElse(0L), i) }
      val want = sorted.zip(sorted.scanLeft(0L) { case (acc, (_, _, v)) =>
        acc + v }.tail).map { case ((i, _, _), cum) => i -> cum }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("globalRank with a NULL bucket (null sort keys) matches NULLS FIRST") {
    import spark.implicits._
    // a caller whose bucket expression yields null (here: because the
    // sort key itself is null for some rows — ascending order puts
    // them FIRST) must still match row_number: the null bucket's total
    // feeds every non-null bucket's offset and its own rows start at
    // offset 0, instead of colliding with the first non-null bucket
    val df = fixture.withColumn("kn", when($"id" % 10 =!= 0, $"k"))
    val w = Window.orderBy($"kn".asc, $"id")
    val want = df.withColumn("rn", row_number().over(w))
      .select($"id", $"rn").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = operators.Ranks
      .globalRank(df, substring($"kn", 1, 1), Seq($"kn".asc, $"id"), "rn")
      .select($"id", $"rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("tinyRank fails loudly on a duplicate key (violated contract)") {
    import spark.implicits._
    val dup = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
      .localCheckpoint()
    val ex = intercept[Exception] {
      operators.Ranks.tinyRank(dup, $"k", "r").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("tinyRank: duplicate key")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
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
