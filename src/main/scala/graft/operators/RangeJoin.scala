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

  /** r01: per-high-value-order count and value of lineitems (ANY
    * order's items — no equi key) shipped the day of the order date.
    * A genuine no-equi-key range join; the naive plan is a nested loop
    * (6k x 600k at sf0.1).
    *
    * Range joins are only cheap when SPARSE: the match count is
    * |L|·|R|·(window/domain), so window width and interval-side
    * selectivity — not the algorithm — decide the cost. An earlier
    * 7-day/all-orders variant of this query was semantically DENSE
    * (~2.5e8 genuine matches at sf0.1, 193 s) — no join algorithm
    * fixes a dense range join; narrow the window or pre-filter the
    * interval side (here: 1 day, high-value orders → 1.4M matches). */
  val r01RangeJoin: Q = Q(
    "r01_range_join",
    """SELECT o_orderkey,
      |  count(*) AS n_shipped,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      |    AS shipped_value
      |FROM orders JOIN lineitem
      |  ON l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 1 DAY
      |WHERE o_totalprice > 480000
      |GROUP BY o_orderkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val day = 86400L
    val li = Tables.lineitem(s, d)
      .select($"l_extendedprice",
        (unix_timestamp($"l_shipdate") / day).cast("long").as("ship_d"))
    val ord = Tables.orders(s, d)
      .filter($"o_totalprice" > 480000)
      .select($"o_orderkey",
        (unix_timestamp($"o_orderdate") / day).cast("long").as("lo_d"))
      .withColumn("hi_d", $"lo_d" + 1)
    binned(li, $"ship_d", ord, $"lo_d", $"hi_d", binWidth = 1)
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_shipped"),
        Exact.dsum($"l_extendedprice").as("shipped_value"))
  }

  val all: Seq[Q] = Seq(r01RangeJoin)
}
