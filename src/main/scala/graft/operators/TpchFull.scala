package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** The remaining TPC-H query shapes (Q4, Q10, Q12, Q13, Q14, Q16, Q19
  * adapted to the fixture schema) — with TpchJoins this completes all
  * 22 TPC-H patterns. Fixture adaptations: no commit/receipt dates →
  * "late" means shipped >N days after the order date; no l_shipmode →
  * l_linestatus classifies lines; no partsupp → lineitem is the
  * part-supplier bridge; no p_container → size/brand predicates only.
  *
  * 100 TB notes: every shape keeps aggregation partial/final split and
  * joins on natural keys (AQE skew-splittable). Q4/Q16's subqueries
  * become semi/anti joins (no per-row re-execution); Q13's outer join
  * carries its secondary predicate IN the join condition (not a
  * post-filter, which would change outer semantics); Q14/Q19 push all
  * part-side predicates below the join so the build side shrinks
  * before shuffle/broadcast.
  */
object TpchFull {

  /** Q4 shape: order-priority checking. EXISTS(correlated, with an
    * inequality across both tables) becomes a LEFT SEMI join whose
    * condition carries the cross-table inequality — one shuffle on
    * orderkey, no per-row subquery. */
  val q69OrderPriority: Q = Q(
    "q69_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(s, d),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q10 shape: returned-item reporting — revenue lost to returns per
    * customer over a window, top 20. Customer/nation join AFTER the
    * fact-side aggregation input is filtered; nation broadcast. */
  val q70ReturnedItems: Q = Q(
    "q70_returned_items",
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1996-07-01").cast("timestamp")),
        $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, d).filter($"l_returnflag" === "R"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(Exact.dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
        .as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Q12 shape: shipping classes vs priority — conditional counts under
    * a cross-table inequality filter. l_linestatus stands in for
    * l_shipmode; "late" = shipped >45 days after the order. */
  val q71ShipClassPriority: Q = Q(
    "q71_ship_class_priority",
    """SELECT l_linestatus AS ship_class,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
      |GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 45 DAYS"))
      .groupBy($"l_linestatus".as("ship_class"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
  }

  /** Q13 shape: customer order-count distribution. The secondary
    * predicate lives IN the outer-join condition (a post-filter would
    * silently drop the zero-order customers Q13 exists to count);
    * two aggregations, the second on the tiny distinct-count domain. */
  val q72CustomerDistribution: Q = Q(
    "q72_customer_distribution",
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "1-URGENT",
        "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q14 shape: promotion revenue share — a conditional ratio over one
    * joined scan. Both numerator and denominator sum exactly in
    * decimal space; the final division is double-on-double of
    * identical operands in either engine. */
  val q73PromoRevenue: Q = Q(
    "q73_promo_revenue",
    """SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
      |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin) { (s, d) =>
    import s.implicits._
    val disc = $"l_extendedprice" * (lit(1) - $"l_discount")
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
      .agg((lit(100.0)
        * Exact.dsum(when($"p_type" === "PROMO", disc).otherwise(lit(0)))
        / Exact.dsum(disc)).as("promo_revenue"))
  }

  /** Q16 shape: supplier counts by part attributes, excluding a
    * supplier subset. NOT IN (uncorrelated, non-null key) becomes a
    * LEFT ANTI join; lineitem is the part-supplier bridge (no
    * partsupp in the fixture). Distinct-count shuffles once on the
    * (brand,size) grouping key after a local distinct. */
  val q74SupplierPartCounts: Q = Q(
    "q74_supplier_part_counts",
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .join(Tables.supplier(s, d).filter($"s_acctbal" < 0)
          .select($"s_suppkey"),
        $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(Tables.part(s, d).filter($"p_brand" =!= "Brand#1" &&
          $"p_size".isin(1, 5, 10, 15, 20, 25, 30, 35)),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
  }

  /** Q19 shape: disjunctive multi-attribute predicate across a join.
    * Catalyst extracts the part-only disjuncts (brand+size) below the
    * join — the build side shrinks before shuffle — while the
    * cross-table quantity conjuncts stay in the join filter. */
  val q75DisjunctivePredicate: Q = Q(
    "q75_disjunctive_pred",
    """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE
      |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity BETWEEN 1 AND 20)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
      |    AND l_quantity BETWEEN 10 AND 30)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
      |    AND l_quantity BETWEEN 20 AND 50)""".stripMargin) { (s, d) =>
    import s.implicits._
    val cond =
      ($"p_brand" === "Brand#1" && $"p_size".between(1, 10) &&
        $"l_quantity".between(1, 20)) ||
      ($"p_brand" === "Brand#2" && $"p_size".between(5, 20) &&
        $"l_quantity".between(10, 30)) ||
      ($"p_brand" === "Brand#3" && $"p_size".between(10, 40) &&
        $"l_quantity".between(20, 50))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), $"p_partkey" === $"l_partkey")
      .filter(cond)
      .agg(Exact.dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
        .as("revenue"))
  }

  /** TPC-DS Q47 shape (beyond the 22 TPC-H forms): a window OVER an
    * aggregate — monthly revenue per supplier nation, centered 3-month
    * moving average, emit the months deviating >10% from their own
    * neighborhood. Exactness device: the monthly sum STAYS DECIMAL
    * through the window (order-independent regardless of how either
    * engine schedules the moving frame — DuckDB uses segment trees for
    * moving aggregates, which reorders additions), and the moving
    * average is ONE double division of exact operands at the end.
    *
    * Scale: the month rollup shuffles once with partial aggregation and
    * collapses cardinality to nations x months; the window then runs
    * over that tiny relation partitioned by nation — never over fact
    * rows (the classic Q47 trap of windowing pre-aggregation). */
  val q78MovingAvg: Q = Q(
    "q78_moving_avg",
    """WITH m AS (
      |  SELECT n_name, date_trunc('month', l_shipdate) AS month,
      |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
      |      AS rev_dec
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT n_name, month, CAST(rev_dec AS DOUBLE) AS revenue,
      |    CAST(sum(rev_dec) OVER win AS DOUBLE) / count(*) OVER win
      |      AS mavg
      |  FROM m WINDOW win AS (PARTITION BY n_name ORDER BY month
      |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING))
      |SELECT n_name, month, revenue, mavg FROM w
      |WHERE revenue > mavg * 1.1 OR revenue < mavg * 0.9""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val monthly = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(Tables.nation(s, d), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name", date_trunc("month", $"l_shipdate").as("month"))
        .agg(Exact.dsumDec($"l_extendedprice" * (lit(1) - $"l_discount"))
          .as("rev_dec"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy($"n_name").orderBy($"month").rowsBetween(-1, 1)
      monthly.select($"n_name", $"month",
        $"rev_dec".cast("double").as("revenue"),
        (sum($"rev_dec").over(win).cast("double") /
          count(lit(1)).over(win)).as("mavg"))
        .filter($"revenue" > $"mavg" * 1.1 || $"revenue" < $"mavg" * 0.9)
  }

  val all: Seq[Q] = Seq(q69OrderPriority, q70ReturnedItems,
    q71ShipClassPriority, q72CustomerDistribution, q73PromoRevenue,
    q74SupplierPartCounts, q75DisjunctivePredicate, q78MovingAvg)
}
