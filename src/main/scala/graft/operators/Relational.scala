package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.sources.Tables

/** Relational core: the reference's physical operator inventory
  * (SURVEY.md §2.1-2.6) re-expressed as declarative DataFrame plans.
  *
  * Scale notes (100 TB discipline, SURVEY.md §7.4):
  *   - Dimension tables (`region`, `nation`) are explicitly
  *     `broadcast()`-hinted — they are bounded-size (5 / 25 rows at any
  *     scale factor) so the reference's map-join conversion
  *     (`MapJoinOperator`, §2.1) is pinned rather than left to the
  *     size-estimator.
  *   - Fact-fact joins (`lineitem ⋈ orders`) stay as shuffle joins on the
  *     join key; AQE converts to broadcast at runtime when a filtered side
  *     collapses below the threshold, and splits skewed partitions.
  *   - Money sums/averages go through [[Exact]]: per-row cast to
  *     decimal(18,6), exact decimal sum, cast back to double. IEEE754
  *     double summation is order-dependent, so `round(sum(double))` is
  *     only hash-stable when the jitter misses a rounding boundary —
  *     exact decimal summation removes that lottery entirely and is the
  *     correct money arithmetic at 100 TB.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def supp(s: SparkSession, d: String) = Tables.supplier(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)
  private def reg(s: SparkSession, d: String) = Tables.region(s, d)
  private def prt(s: SparkSession, d: String) = Tables.part(s, d)

  private def ts(x: String) = lit(java.sql.Timestamp.valueOf(x + " 00:00:00"))

  /** TPC-H Q1-shaped pricing summary: scan → filter → partial/final hash
    * aggregate → shuffle → sort. The reference pipeline
    * `TableScan→Filter→GroupBy(HASH)→ReduceSink→GroupBy(MERGEPARTIAL)`
    * (SURVEY.md §2.1, §7.2) is exactly Spark's
    * `HashAggregateExec(partial)→Exchange→HashAggregateExec(final)`. */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  sum(l_quantity) / count(l_quantity) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    import s.implicits._
    // l_quantity is integer-valued: its double sums are exact at any
    // summation order (integer intermediates stay far below 2^53 even
    // at 100 TB), so the decimal buffer is reserved for the genuinely
    // fractional money columns.
    li(s, d)
      .filter($"l_shipdate" <= ts("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        Exact.dsum($"l_extendedprice").as("sum_base_price"),
        Exact.dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
          .as("sum_disc_price"),
        Exact.dsum($"l_extendedprice" * (lit(1) - $"l_discount") *
          (lit(1) + $"l_tax")).as("sum_charge"),
        (sum($"l_quantity") / count($"l_quantity")).as("avg_qty"),
        Exact.davg($"l_extendedprice").as("avg_price"),
        Exact.davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Filter + projection only — exercises parquet predicate pushdown and
    * column pruning (`PushedFilters`/`ReadSchema` visible in explain). */
  val q02FilterProject: Q = Q(
    "q02_filter_project",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0""".stripMargin) {
    (s, d) =>
      import s.implicits._
      ord(s, d)
        .filter($"o_orderstatus" === "F" && $"o_totalprice" > 200000.0)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  /** Top-k: orderBy + limit compiles to `TakeOrderedAndProjectExec` — the
    * reference's ReduceSink bounded heap (`topN`, SURVEY.md §2.5). No
    * global sort materialization: each task keeps a k-heap, driver merges. */
  val q03TopkOrders: Q = Q(
    "q03_topk_orders",
    """SELECT o_orderkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
    (s, d) =>
      import s.implicits._
      ord(s, d)
        .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
  }

  /** TPC-H Q3-shaped: selective dimension filter, two fact joins, agg,
    * top-k by computed measure. customer(filtered) is broadcast-eligible;
    * lineitem⋈orders shuffles on orderkey. */
  val q04ShippingPriority: Q = Q(
    "q04_shipping_priority",
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    import s.implicits._
    cust(s, d).filter($"c_mktsegment" === "BUILDING")
      .join(ord(s, d).filter($"o_orderdate" < ts("1998-03-15")),
        $"c_custkey" === $"o_custkey")
      .join(li(s, d).filter($"l_shipdate" > ts("1996-03-15")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(Exact.dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
        .as("revenue"))
      .select($"l_orderkey", $"revenue", $"o_orderdate", $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  /** TPC-H Q5-shaped 6-way join: fact shuffle joins + broadcast dims.
    * nation/region are broadcast()-pinned (bounded size at any SF). */
  val q05LocalSupplierVolume: Q = Q(
    "q05_local_supplier_volume",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin) { (s, d) =>
    import s.implicits._
    cust(s, d)
      .join(ord(s, d).filter($"o_orderdate" >= ts("1996-01-01") &&
        $"o_orderdate" < ts("1998-01-01")), $"c_custkey" === $"o_custkey")
      .join(li(s, d), $"l_orderkey" === $"o_orderkey")
      .join(supp(s, d),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg(s, d).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(Exact.dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
        .as("revenue"))
  }

  /** TPC-H Q6-shaped: pure filter→agg, no grouping — single-row global
    * aggregate; the filter is fully pushed to the parquet scan. */
  val q06ForecastRevenue: Q = Q(
    "q06_forecast_revenue",
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24.0""".stripMargin) { (s, d) =>
    import s.implicits._
    li(s, d)
      .filter($"l_shipdate" >= ts("1996-01-01") &&
        $"l_shipdate" < ts("1997-01-01") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24.0)
      .agg(Exact.dsum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Left outer join with null-extension: every customer, order count and
    * coalesced spend (the reference's `CommonJoinOperator` outer padding,
    * SURVEY.md §2.1), then re-aggregated by segment. */
  val q07CustomerOrders: Q = Q(
    "q07_customer_orders_outer",
    """SELECT c_mktsegment,
      |  count(*) AS n_customers,
      |  CAST(sum(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive,
      |  CAST(sum(spend) AS DOUBLE) AS total_spend
      |FROM (
      |  SELECT c.c_custkey, c.c_mktsegment,
      |    count(o.o_orderkey) AS n_orders,
      |    coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 0) AS spend
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey, c.c_mktsegment
      |) GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
    import s.implicits._
    // spend stays decimal through BOTH aggregation levels (exact,
    // order-independent) and is cast to double only on output. The
    // oracle's integer sum is CAST to BIGINT: DuckDB sum(int) returns
    // HUGEINT, which pandas narrows to float64 — a driver-side dtype
    // mismatch against Spark's int64 even when every value is equal.
    val per = cust(s, d)
      .join(ord(s, d), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(count($"o_orderkey").as("n_orders"),
        coalesce(Exact.dsumDec($"o_totalprice"),
          lit(BigDecimal(0)).cast("decimal(28,6)")).as("spend"))
    per.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(when($"n_orders" === 0, 1).otherwise(0)).as("n_inactive"),
        sum($"spend").cast("double").as("total_spend"))
  }

  /** Anti join: customers with no orders in a recent window (reference:
    * NOT EXISTS → `HiveSemiJoinRule` anti shape; Spark `left_anti`). */
  val q08AntiJoin: Q = Q(
    "q08_anti_join",
    """SELECT c_mktsegment, count(*) AS n_no_order
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
    import s.implicits._
    cust(s, d)
      .join(ord(s, d).filter($"o_orderdate" >= ts("2000-01-01")),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_no_order"))
  }

  /** Semi join: parts that ship (EXISTS → `left_semi`). */
  val q09SemiJoin: Q = Q(
    "q09_semi_join",
    """SELECT p_brand, count(*) AS n_shipped_parts
      |FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |GROUP BY p_brand""".stripMargin) { (s, d) =>
    import s.implicits._
    prt(s, d)
      .join(li(s, d), $"p_partkey" === $"l_partkey", "left_semi")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_shipped_parts"))
  }

  /** Full outer join: per-nation customer vs supplier account balance —
    * nations may exist on one side only (null-extended both ways). */
  val q10FullOuter: Q = Q(
    "q10_full_outer",
    """SELECT coalesce(cn, sn) AS nationkey,
      |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS cn, count(*) AS n_cust
      |      FROM customer GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS sn, count(*) AS n_supp
      |      FROM supplier GROUP BY s_nationkey) s
      |ON cn = sn""".stripMargin) { (s, d) =>
    import s.implicits._
    val c = cust(s, d).groupBy($"c_nationkey".as("cn"))
      .agg(count(lit(1)).as("n_cust"))
    val sp = supp(s, d).groupBy($"s_nationkey".as("sn"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sp, $"cn" === $"sn", "full_outer")
      .select(coalesce($"cn", $"sn").as("nationkey"),
        coalesce($"n_cust", lit(0)).as("n_cust"),
        coalesce($"n_supp", lit(0)).as("n_supp"))
  }

  /** Cross join (explicitly requested cartesian of two tiny inputs —
    * guarded by design; never cross facts). */
  val q11CrossJoin: Q = Q(
    "q11_cross_join",
    """SELECT r_name, st, count(*) AS n
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders)
      |GROUP BY r_name, st""".stripMargin) { (s, d) =>
    import s.implicits._
    reg(s, d).crossJoin(ord(s, d).select($"o_orderstatus".as("st")).distinct())
      .groupBy($"r_name", $"st")
      .agg(count(lit(1)).as("n"))
  }

  /** Distinct aggregation: count(DISTINCT) — the reference's ReduceSink
    * key-expansion plan (SURVEY.md §2.3); Spark plans it as a two-stage
    * aggregate (Expand for multi-distinct). */
  val q12CountDistinct: Q = Q(
    "q12_count_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS nd_parts,
      |  count(DISTINCT l_suppkey) AS nd_supps,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    li(s, d).groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("nd_parts"),
        countDistinct($"l_suppkey").as("nd_supps"),
        count(lit(1)).as("n"))
  }

  /** q63: explicit NULLS FIRST ordering through a top-k. The engines'
    * DEFAULTS disagree (Spark sorts nulls first on ASC, DuckDB last),
    * so any ORDER BY over a nullable key silently diverges unless the
    * placement is pinned — this query pins it (and the oracle text
    * carries the same pin), proving the engine honors the modifier
    * through the TakeOrderedAndProject path. */
  val q63NullsOrdering: Q = Q(
    "q63_nulls_ordering",
    """SELECT o_orderkey, pr FROM (
      |  SELECT o_orderkey, nullif(o_orderpriority, '3-URGENT') AS pr
      |  FROM orders)
      |ORDER BY pr ASC NULLS FIRST, o_orderkey LIMIT 50""".stripMargin) {
    (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey",
          nullif($"o_orderpriority", lit("3-URGENT")).as("pr"))
        .orderBy($"pr".asc_nulls_first, $"o_orderkey")
        .limit(50)
  }

  /** q67: join-strategy hints — the reference's `/*+ MAPJOIN(t) */`
    * surface (SURVEY.md §3.1 HiveQL hints) maps to Spark's BROADCAST /
    * MERGE / SHUFFLE_HASH hints. The query FORCES the merge strategy on
    * a join AQE would otherwise broadcast, proving the hint overrides
    * the planner (PlanSpec asserts SortMergeJoin here and
    * BroadcastHashJoin for the broadcast-hinted twin); the result is
    * strategy-independent and carries a plain-SQL oracle. */
  val q67JoinHints: Q = Q(
    "q67_join_hints",
    """SELECT n_name, count(*) AS n_suppliers,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.supplier(s, d)
      .join(Tables.nation(s, d).hint("merge"),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        Exact.dsum($"s_acctbal").as("total_bal"))
  }

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02FilterProject, q03TopkOrders, q04ShippingPriority,
    q05LocalSupplierVolume, q06ForecastRevenue, q07CustomerOrders,
    q08AntiJoin, q09SemiJoin, q10FullOuter, q11CrossJoin, q12CountDistinct,
    q63NullsOrdering, q67JoinHints)
}
