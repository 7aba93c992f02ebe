package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Statistical aggregates (SURVEY.md §2.3 UDAF inventory): exact
  * percentiles, correlation/covariance, stddev/variance, the regr_*
  * family, and ordered collect_list/collect_set. All are single-pass
  * partial+final aggregates in Spark (co-moment merge formulas), matching
  * the reference's `GenericUDAFEvaluator` PARTIAL1/FINAL split. */
object Analytics {

  /** Exact percentile (linear interpolation) = DuckDB quantile_cont.
    *
    * SCALE HAZARD: Spark's exact `percentile` buffers EVERY value of a
    * group in the aggregation buffer — with a 3-value grouping key this
    * is an unbounded per-group memory cost, fine at fixture scale and
    * lethal at 100 TB. Production uses [[q35aApproxPercentile]]
    * (GK-sketch `percentile_approx`, bounded buffer, mergeable — the
    * reference itself ships GenericUDAFPercentileApprox for exactly
    * this reason, SURVEY.md §2.3); the exact form stays as the
    * ground-truth twin the sketch is bounds-checked against. */
  val q35Percentiles: Q = Q(
    "q35_percentiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).groupBy($"l_returnflag")
      .agg(
        round(percentile($"l_quantity", lit(0.5)), 4).as("median_qty"),
        round(percentile($"l_extendedprice", lit(0.9)), 4).as("p90_price"),
        round(percentile($"l_extendedprice", lit(0.99)), 4).as("p99_price"))
  }

  /** q35a: the scale-safe percentile path — `percentile_approx` (GK
    * sketch, bounded buffer) bounds-checked in-query against the exact
    * percentile. Sketch values are merge-order-specific, so no value
    * oracle exists cross-engine; instead the query OUTPUTS the bounds
    * verdict and the oracle pins it true — driver-green means the
    * approximation guarantee held. Exact values are additionally pinned
    * in FunctionSpec. */
  val q35aApproxPercentile: Q = Q(
    "q35a_percentile_approx",
    """SELECT l_returnflag, true AS median_ok, true AS p90_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).groupBy($"l_returnflag")
      .agg(
        percentile_approx($"l_quantity", lit(0.5), lit(10000)).as("am"),
        percentile($"l_quantity", lit(0.5)).as("em"),
        percentile_approx($"l_extendedprice", lit(0.9), lit(10000)).as("ap"),
        percentile($"l_extendedprice", lit(0.9)).as("ep"))
      .select($"l_returnflag",
        (abs($"am" - $"em") <= lit(1.0)).as("median_ok"),
        (abs($"ap" - $"ep") / $"ep" <= lit(0.02)).as("p90_ok"))
  }

  /** q12a: HyperLogLog++ approximate distinct counts (the reference's
    * compute-stats HLL path, SURVEY.md §2.3) bounds-checked in-query
    * against exact countDistinct — same driver-visible-verdict pattern
    * as q35a. Default rsd 5%; the gate allows 10%. At 100 TB the HLL
    * sketch replaces the Expand-based exact distinct (one fixed-size
    * buffer per group instead of a second shuffle of distinct keys). */
  val q12aApproxDistinct: Q = Q(
    "q12a_approx_distinct",
    """SELECT l_returnflag, true AS nd_parts_ok, true AS nd_supps_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("ap"),
        countDistinct($"l_partkey").as("ep"),
        approx_count_distinct($"l_suppkey").as("as_"),
        countDistinct($"l_suppkey").as("es"))
      .select($"l_returnflag",
        (abs($"ap" - $"ep").cast("double") / $"ep" <= 0.10)
          .as("nd_parts_ok"),
        (abs($"as_" - $"es").cast("double") / $"es" <= 0.10)
          .as("nd_supps_ok"))
  }

  /** q12b: mergeable-sketch rollup — the pattern that makes distinct
    * counting tractable at 100 TB: build DataSketches HLL sketches once
    * at a fine grain (per flag+status), then answer coarser grains by
    * UNIONING the stored sketches (`hll_union_agg`) without rescanning
    * the fact table — exactly how per-partition stats roll up to table
    * stats in the reference's metastore compute-stats path. Both levels
    * are bounds-checked in-query against exact countDistinct (same
    * verdict-oracle device as q12a/q35a: sketch bytes are merge-order-
    * specific, so the oracle pins the GUARANTEE, not the bits). */
  val q12bSketchRollup: Q = Q(
    "q12b_sketch_rollup",
    """SELECT l_returnflag, true AS fine_ok, true AS rollup_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val fine = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(hll_sketch_agg($"l_partkey").as("sk"),
        countDistinct($"l_partkey").as("exact_fine"))
    val fineOk = fine
      .select($"l_returnflag",
        (abs(hll_sketch_estimate($"sk") - $"exact_fine").cast("double") /
          $"exact_fine" <= 0.1).as("ok"))
      .groupBy($"l_returnflag").agg(bool_and($"ok").as("fine_ok"))
    val rolled = fine.groupBy($"l_returnflag")
      .agg(hll_union_agg($"sk").as("sku"))
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_flag"))
    rolled.join(exact, "l_returnflag").join(fineOk, "l_returnflag")
      .select($"l_returnflag", $"fine_ok",
        (abs(hll_sketch_estimate($"sku") - $"exact_flag").cast("double") /
          $"exact_flag" <= 0.1).as("rollup_ok"))
  }

  /** Correlation / covariance / stddev / variance + linear regression. */
  val q36Stats: Q = Q(
    "q36_stats",
    """SELECT
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(covar_pop(l_quantity, l_extendedprice), 2) AS covp,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covs,
      |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
      |  round(var_pop(l_discount), 6) AS var_disc,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  regr_count(l_extendedprice, l_quantity) AS n
      |FROM lineitem""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).agg(
      round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
      round(covar_pop($"l_quantity", $"l_extendedprice"), 2).as("covp"),
      round(covar_samp($"l_quantity", $"l_extendedprice"), 2).as("covs"),
      round(stddev_samp($"l_extendedprice"), 4).as("sd_price"),
      round(var_pop($"l_discount"), 6).as("var_disc"),
      round(regr_slope($"l_extendedprice", $"l_quantity"), 6).as("slope"),
      round(regr_intercept($"l_extendedprice", $"l_quantity"), 4)
        .as("intercept"),
      round(regr_r2($"l_extendedprice", $"l_quantity"), 6).as("r2"),
      regr_count($"l_extendedprice", $"l_quantity").as("n"))
  }

  /** Ordered collect_list + deduplicated collect_set (sorted for
    * determinism — collect order is partition-dependent otherwise).
    * The list is serialized to a CSV string on output: the driver's
    * comparator sorts rows in pandas, which cannot hash array cells —
    * scalar columns keep the query fully oracle-checkable. */
  val q37Collect: Q = Q(
    "q37_collect",
    """SELECT s_nationkey,
      |  string_agg(s_suppkey::VARCHAR, ',' ORDER BY s_suppkey) AS supps,
      |  count(DISTINCT s_suppkey) AS n_set,
      |  count(*) AS n
      |FROM supplier GROUP BY s_nationkey""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.supplier(s, d).groupBy($"s_nationkey")
      .agg(concat_ws(",", sort_array(collect_list($"s_suppkey"))).as("supps"),
        size(collect_set($"s_suppkey")).cast("long").as("n_set"),
        count(lit(1)).as("n"))
  }

  /** min/max/sum/avg over every numeric column family + min/max on
    * strings and timestamps (exact, no rounding needed for min/max). */
  val q38MinMax: Q = Q(
    "q38_minmax",
    """SELECT
      |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  min(l_returnflag) AS min_flag, max(l_returnflag) AS max_flag,
      |  count(*) AS n
      |FROM lineitem""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).agg(
      min($"l_shipdate").as("min_ship"), max($"l_shipdate").as("max_ship"),
      min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"),
      min($"l_returnflag").as("min_flag"), max($"l_returnflag").as("max_flag"),
      count(lit(1)).as("n"))
  }

  /** q64: max_by / min_by (argmax aggregates). Neither engine supports
    * a composite ordering argument, and a bare `max_by(key, price)` is
    * nondeterministic under price ties — so the ordering key is a
    * fixed-width STRING composite (price*100 zero-padded ++ orderkey
    * zero-padded): totally ordered, tie-free (orderkey is unique), and
    * compared identically by both engines. price*100 is rounded before
    * the integer cast — the 2-dp doubles sit a hair off the integer
    * grid and a bare cast truncation would be a coin flip. */
  val q64ArgMinMax: Q = Q(
    "q64_arg_min_max",
    """WITH o AS (SELECT o_orderpriority, o_orderkey,
      |  lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR(12)),
      |       12, '0')
      |    || lpad(CAST(o_orderkey AS VARCHAR(12)), 12, '0') AS ck
      |  FROM orders)
      |SELECT o_orderpriority,
      |  max_by(o_orderkey, ck) AS priciest_order,
      |  min_by(o_orderkey, ck) AS cheapest_order,
      |  count(*) AS n
      |FROM o GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    import s.implicits._
    val ck = concat(
      lpad(round($"o_totalprice" * 100).cast("long").cast("string"),
        12, "0"),
      lpad($"o_orderkey".cast("string"), 12, "0"))
    Tables.orders(s, d)
      .select($"o_orderpriority", $"o_orderkey", ck.as("ck"))
      .groupBy($"o_orderpriority")
      .agg(max_by($"o_orderkey", $"ck").as("priciest_order"),
        min_by($"o_orderkey", $"ck").as("cheapest_order"),
        count(lit(1)).as("n"))
  }

  val all: Seq[Q] = Seq(q35Percentiles, q35aApproxPercentile, q36Stats,
    q37Collect, q38MinMax, q12aApproxDistinct, q12bSketchRollup,
    q64ArgMinMax)
}
