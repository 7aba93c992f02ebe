package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Subquery shapes (SURVEY.md §4.1: `HiveSubQueryRemoveRule` /
  * `HiveRelDecorrelator`): scalar subquery, IN-subquery (semi join),
  * correlated aggregate. Written decorrelated by construction — the
  * Spark-first forms ARE the plans the reference's optimizer rewrites
  * into: scalar → broadcast single-row join, IN → left-semi, correlated
  * aggregate → join against a pre-aggregated side. */
object Subqueries {

  /** Scalar subquery: orders above the global average price. The 1-row
    * aggregate is broadcast — no driver-side collect (100 TB rule). */
  val q27ScalarSubquery: Q = Q(
    "q27_scalar_subquery",
    """SELECT o_orderstatus, count(*) AS n
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
    import s.implicits._
    val avgPrice = Tables.orders(s, d)
      .agg(avg($"o_totalprice").as("global_avg"))
    Tables.orders(s, d)
      .join(broadcast(avgPrice))
      .filter($"o_totalprice" > $"global_avg")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"))
  }

  /** IN-subquery over a dimension chain → broadcast left-semi join. */
  val q28InSubquery: Q = Q(
    "q28_in_subquery",
    """SELECT c_mktsegment, count(*) AS n_asia_cust
      |FROM customer
      |WHERE c_nationkey IN (
      |  SELECT n_nationkey FROM nation
      |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
      |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
    import s.implicits._
    val asiaNations = Tables.nation(s, d)
      .join(Tables.region(s, d).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    Tables.customer(s, d)
      .join(broadcast(asiaNations), $"c_nationkey" === $"n_nationkey",
        "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_asia_cust"))
  }

  /** Correlated aggregate: suppliers above their nation's average
    * balance. Decorrelated to a per-nation aggregate + equi join (the
    * shuffle is on the 25-value nation key; at 100 TB the aggregate side
    * is tiny and broadcasts). */
  val q29CorrelatedAgg: Q = Q(
    "q29_correlated_agg",
    """SELECT s.s_suppkey, s.s_name, s.s_acctbal
      |FROM supplier s
      |WHERE s.s_acctbal > (SELECT avg(s2.s_acctbal) FROM supplier s2
      |                     WHERE s2.s_nationkey = s.s_nationkey)""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val perNation = Tables.supplier(s, d)
        .groupBy($"s_nationkey".as("nk"))
        .agg(avg($"s_acctbal").as("nation_avg"))
      Tables.supplier(s, d)
        .join(broadcast(perNation), $"s_nationkey" === $"nk")
        .filter($"s_acctbal" > $"nation_avg")
        .select($"s_suppkey", $"s_name", $"s_acctbal")
  }

  /** q52: NOT IN under NULL — SQL's three-valued-logic trap. A single
    * NULL in the NOT IN subquery makes every predicate UNKNOWN (zero
    * rows survive), while the same list without the NULL excludes
    * normally and NOT EXISTS is unaffected by NULLs. The reference's
    * Calcite rewrite (null-aware anti join) and Spark's
    * NullAwareAntiJoin implement exactly these semantics; the shared
    * ANSI text runs verbatim on both engines. */
  val q52NotInNulls: Q = {
    val sql =
      """SELECT
        |  (SELECT count(*) FROM part WHERE p_size NOT IN
        |    (SELECT CASE WHEN o_orderkey = 1 THEN NULL ELSE 999 END
        |     FROM orders WHERE o_orderkey <= 5)) AS n_null_poisoned,
        |  (SELECT count(*) FROM part WHERE p_size NOT IN
        |    (SELECT 999 FROM orders WHERE o_orderkey <= 5)) AS n_clean,
        |  (SELECT count(*) FROM part p WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = p.p_size
        |     AND o_orderkey > 999999)) AS n_not_exists""".stripMargin
    Q("q52_not_in_nulls", sql) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(sql)
    }
  }

  /** q59 (TPC-H Q2 shape): for each part of a size family, the
    * supplier(s) with the MINIMUM account balance among that part's
    * actual suppliers — a correlated scalar MIN whose correlation runs
    * through a derived part↔supplier bridge (DISTINCT lineitem pairs,
    * standing in for partsupp). The DSL builds the decorrelated form as
    * a single pass: window min over the bridge⋈supplier relation
    * partitioned by part (partition size = suppliers-per-part, bounded)
    * instead of re-aggregating and re-joining the bridge. The equality
    * compares RAW column doubles (no arithmetic) — identical bits in
    * both engines. */
  val q59MinCostSupplier: Q = Q(
    "q59_min_cost_supplier",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_partkey, s_suppkey, s_name, s_acctbal
      |FROM part
      |JOIN ps ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE p_size = 10
      |  AND s_acctbal = (SELECT min(s2.s_acctbal)
      |                   FROM ps ps2 JOIN supplier s2
      |                     ON ps2.l_suppkey = s2.s_suppkey
      |                   WHERE ps2.l_partkey = p_partkey)""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val bridge = Tables.lineitem(s, d)
        .select($"l_partkey", $"l_suppkey").distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"l_partkey")
      bridge
        .join(Tables.part(s, d).filter($"p_size" === 10),
          $"l_partkey" === $"p_partkey")
        .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .withColumn("mn", min($"s_acctbal").over(w))
        .filter($"s_acctbal" === $"mn")
        .select($"p_partkey", $"s_suppkey", $"s_name", $"s_acctbal")
  }

  /** q68: LATERAL correlated subquery with ORDER BY + LIMIT — top-2
    * suppliers per nation through the lateral-join surface. Spark's
    * DecorrelateInnerQuery rewrites the per-row LIMIT into a
    * partitioned row_number window + filter + one join — never a
    * per-nation re-scan of supplier. (The window here does NOT get the
    * WindowGroupLimit pushdown q13's direct rank-filter form gets —
    * the decorrelation-inserted predicate shape isn't matched by that
    * rule; q13 remains the bounded-heap path when topN-per-key is
    * written directly.) Same text runs on both engines. */
  val q68LateralJoin: Q = {
    val sql =
      """SELECT n_name, s_name, s_acctbal
        |FROM nation,
        |  LATERAL (SELECT s_name, s_acctbal FROM supplier
        |           WHERE s_nationkey = n_nationkey
        |           ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t""".stripMargin
    Q("q68_lateral_join", sql) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(q27ScalarSubquery, q28InSubquery, q29CorrelatedAgg,
    q52NotInNulls, q59MinCostSupplier, q68LateralJoin)
}
