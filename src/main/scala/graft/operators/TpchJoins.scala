package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Deeper TPC-H-shaped join patterns (Q9 / Q18 / Q21 adapted to the
  * fixture schema, which carries no partsupp or receipt/commit dates):
  * multi-fact join trees, aggregate-in-HAVING under a join, and
  * semi+anti joins under aggregation — the shapes where the reference's
  * CalcitePlanner does real join-reorder work (SURVEY.md §4.1) and
  * where Spark's CBO/AQE must pick build sides and orders well.
  *
  * 100 TB notes: all fact-fact edges shuffle on their join key and are
  * AQE-skew-splittable; nation is broadcast-pinned; the Q21 shape
  * reuses ONE joined lineitem-orders intermediate for the base, the
  * EXISTS side, and the NOT EXISTS side rather than re-scanning.
  */
object TpchJoins {

  /** Q9 shape: 5-table join, profit per nation per year.
    * p_retailprice stands in for ps_supplycost (no partsupp table). */
  val q45Profit: Q = Q(
    "q45_profit",
    """SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
      |    AS profit
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN part     ON l_partkey = p_partkey
      |WHERE p_name LIKE '%a%'
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(Tables.part(s, d).filter($"p_name".like("%a%")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"n_name".as("nation"),
        year($"o_orderdate").cast("long").as("o_year"))
      .agg(Exact.dsum($"l_extendedprice" * (lit(1) - $"l_discount")
        - lit(0.1) * $"p_retailprice" * $"l_quantity").as("profit"))
  }

  /** Q18 shape: large-volume orders — aggregate with HAVING under the
    * join, then top-k. The inner group-by runs BEFORE the join (the
    * reference's aggregate-pushdown shape), so the join input is
    * |qualifying orders|, not |lineitem|. */
  val q46LargeOrders: Q = Q(
    "q46_large_orders",
    """SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 300)
      |JOIN orders   ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    import s.implicits._
    // integer-valued quantities sum exactly in doubles (see q01)
    val big = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 300)
    big
      .join(Tables.orders(s, d), $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(s, d), $"c_custkey" === $"o_custkey")
      .select($"c_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
        $"sum_qty")
      .orderBy($"sum_qty".desc, $"o_orderkey")
      .limit(100)
  }

  /** Q21 shape: suppliers who were the ONLY late supplier of a
    * multi-supplier order (late = shipped >90 days after the order
    * date, standing in for receipt>commit). Semi join (another supplier
    * exists) + anti join (no OTHER late supplier) under an aggregate. */
  val q47WaitingSupplier: Q = Q(
    "q47_waiting_supplier",
    """WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
      |FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM l l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l3.o_orderdate
      |                      + INTERVAL 90 DAY)
      |GROUP BY s_name""".stripMargin) { (s, d) =>
    import s.implicits._
    val l = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate", $"o_orderdate")
    val late = l.filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAY"))
    val l2 = l.select($"l_orderkey".as("ok2"), $"l_suppkey".as("sk2"))
    val late3 = late.select($"l_orderkey".as("ok3"), $"l_suppkey".as("sk3"))
    late
      .join(l2, $"l_orderkey" === $"ok2" && $"l_suppkey" =!= $"sk2",
        "left_semi")
      .join(late3, $"l_orderkey" === $"ok3" && $"l_suppkey" =!= $"sk3",
        "left_anti")
      .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(countDistinct($"l_orderkey").as("numwait"))
  }

  /** q49: null-safe equality join (`<=>` / IS NOT DISTINCT FROM — the
    * reference CommonJoinOperator's null-safe key mode). Null keys are
    * derived deterministically (priority 3-URGENT → NULL on both
    * sides) so the null<=>null matches are exercised and counted. */
  val q49NullSafeJoin: Q = Q(
    "q49_nullsafe_join",
    """WITH o AS (SELECT o_orderkey,
      |             nullif(o_orderpriority, '3-URGENT') AS pr
      |           FROM orders),
      |d AS (SELECT DISTINCT nullif(o_orderpriority, '3-URGENT') AS pr2
      |      FROM orders)
      |SELECT coalesce(pr, '<null>') AS priority, count(*) AS n
      |FROM o JOIN d ON pr IS NOT DISTINCT FROM pr2
      |GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val o = Tables.orders(s, d)
      .select($"o_orderkey",
        nullif($"o_orderpriority", lit("3-URGENT")).as("pr"))
    val dim = Tables.orders(s, d)
      .select(nullif($"o_orderpriority", lit("3-URGENT")).as("pr2"))
      .distinct()
    o.join(dim, $"pr" <=> $"pr2")
      .groupBy(coalesce($"pr", lit("<null>")).as("priority"))
      .agg(count(lit(1)).as("n"))
  }

  val all: Seq[Q] = Seq(q45Profit, q46LargeOrders, q47WaitingSupplier,
    q49NullSafeJoin)
}
