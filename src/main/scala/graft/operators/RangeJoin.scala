package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Range (interval) join — point-in-interval matching with NO equi key.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin:
  * O(|L|·|R|) comparisons, fine only while one side broadcasts. The
  * scale path composes existing operators (no custom strategy needed):
  * quantize values and intervals into fixed-width bins, equi-join on
  * the bin id (an ordinary shuffle hash join), then apply the exact
  * range predicate. Candidate work drops from |L|·|R| to
  * Σ_bin |L_bin|·|R_bin| — linear-ish when the bin width matches the
  * interval length (each interval explodes into ceil(len/width)+1
  * bins).
  *
  * This is the same containment-bucketing idea the reference's
  * IntervalJoin/between-optimizations and published range-join
  * implementations use, declared with explode + join so Catalyst/AQE
  * still handle partial aggregation, skew splitting and runtime
  * re-planning. */
object RangeJoin {

  /** Join rows of `points` (value column `v`, LongType units) to rows
    * of `intervals` carrying [`lo`, `hi`) bounds in the same units.
    * `binWidth` should be ~ the typical interval length. */
  def binned(points: DataFrame, v: Column, intervals: DataFrame,
      lo: Column, hi: Column, binWidth: Long): DataFrame = {
    val pb = points.withColumn("_bin", floor(v / binWidth))
    val ib = intervals.withColumn("_bin",
      explode(sequence(floor(lo / binWidth), floor((hi - 1) / binWidth))))
    pb.join(ib, Seq("_bin"))
      .filter(v >= lo && v < hi)
      .drop("_bin")
  }

  /** r01: per-order count of lineitems (ANY order's items, no key) that
    * shipped within 7 days of the order date — a genuine both-sides-
    * large range join; the naive formulation is a 60k x 15k nested
    * loop at sf0.01 and quadratic at scale. */
  val r01RangeJoin: Q = Q(
    "r01_range_join",
    """SELECT o_orderkey,
      |  count(*) AS n_shipped,
      |  count(DISTINCT l_returnflag) AS n_flags
      |FROM orders JOIN lineitem
      |  ON l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 7 DAY
      |GROUP BY o_orderkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val day = 86400L
    val li = Tables.lineitem(s, d)
      .select($"l_returnflag",
        (unix_timestamp($"l_shipdate") / day).cast("long").as("ship_d"))
    val ord = Tables.orders(s, d)
      .select($"o_orderkey",
        (unix_timestamp($"o_orderdate") / day).cast("long").as("lo_d"))
      .withColumn("hi_d", $"lo_d" + 7)
    binned(li, $"ship_d", ord, $"lo_d", $"hi_d", binWidth = 7)
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_shipped"),
        countDistinct($"l_returnflag").as("n_flags"))
  }

  val all: Seq[Q] = Seq(r01RangeJoin)
}
