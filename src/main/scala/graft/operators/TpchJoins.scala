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

  /** Q7 shape: volume shipped between a nation PAIR, both directions,
    * by year. The nation filter is applied to the two broadcast dims
    * BEFORE the fact joins, so the big shuffles run on pre-reduced
    * inputs (the reference pushes the same predicate through its
    * join tree; Spark's CBO does it only if we keep the filter on the
    * dim side — so we do it explicitly). */
  val q53VolumeShipping: Q = Q(
    "q53_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice, l_discount
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    import s.implicits._
    val pair = Seq("NATION_1", "NATION_2")
    val nat1 = Tables.nation(s, d).filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))
    val nat2 = Tables.nation(s, d).filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("cnk"), $"n_name".as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nat1), $"s_nationkey" === $"snk")
      .join(broadcast(nat2), $"c_nationkey" === $"cnk")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(Exact.dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
        .as("revenue"))
  }

  /** Q8 shape: one nation's market share of a region's PROMO-part
    * volume per year — conditional aggregate over a 7-table join.
    * Numerator and denominator are both exact decimal sums cast to
    * double before the division, so the ratio is bit-identical across
    * engines and partition orders. Customer-region membership is a
    * broadcast LEFT SEMI (no row multiplication, no columns carried). */
  val q54MarketShare: Q = Q(
    "q54_market_share",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_2'
      |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END
      |    AS DECIMAL(18,6))) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val asiaCust = Tables.nation(s, d)
      .join(Tables.region(s, d).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("cnk"))
    val suppNat = Tables.nation(s, d)
      .select($"n_nationkey".as("snk"), $"n_name".as("snat"))
    val vol = $"l_extendedprice" * (lit(1) - $"l_discount")
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter($"p_type" === "PROMO"),
        $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(asiaCust), $"c_nationkey" === $"cnk", "left_semi")
      .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(suppNat), $"s_nationkey" === $"snk")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg((Exact.dsum(when($"snat" === "NATION_2", vol).otherwise(lit(0.0)))
        / Exact.dsum(vol)).as("mkt_share"))
  }

  /** Q15 shape: supplier(s) with the MAX windowed revenue. The oracle
    * keeps the classic scalar-subquery-over-CTE text; the DSL builds
    * the plan you actually want at 100 TB: aggregate lineitem ONCE
    * into a checkpointed |suppliers|-sized frame, reduce it to a
    * broadcast 1-row max, and filter — no window anywhere. (Earlier
    * rounds used rank()==1 over a GLOBAL window here; the registry-
    * wide PlanSpec invariant now bans that shape — at TPC-H SF100k
    * the revenue relation is ~1M suppliers through one task. Spark
    * does NOT reuse the two aggregate subtrees of the naive
    * twice-referenced CTE even under AQE — the join branch picks up
    * an extra isnotnull(l_suppkey) filter, breaking canonical
    * equality — so the checkpoint is also what keeps the fact scan
    * single.) Ties: the decimal-equality filter keeps all maxima,
    * matching `r = (SELECT max(r) ...)`. Comparison stays in DECIMAL
    * space → exact in both engines. */
  val q55TopSupplier: Q = Q(
    "q55_top_supplier",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
      |      AS r
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
      |    AND l_shipdate < TIMESTAMP '1999-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE r = (SELECT max(r) FROM revenue)""".stripMargin) { (s, d) =>
    import s.implicits._
    val rev = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= "1999-01-01" && $"l_shipdate" < "1999-04-01")
      .groupBy($"l_suppkey")
      .agg(Exact.dsumDec($"l_extendedprice" * (lit(1) - $"l_discount"))
        .as("r"))
      .localCheckpoint() // one fact scan feeds both the max and the filter
    val mx = rev.agg(max($"r").as("rmax"))
    rev
      .crossJoin(broadcast(mx))
      .filter($"r" === $"rmax")
      .join(Tables.supplier(s, d), $"s_suppkey" === $"l_suppkey")
      .select($"s_suppkey", $"s_name",
        $"r".cast("double").as("total_revenue"))
  }

  /** Q17 shape: revenue lost to small-quantity orders — correlated
    * scalar AVG subquery against the OUTER's part key. The DSL builds
    * the decorrelated form Spark's optimizer would produce (per-key
    * aggregate joined back); the SqlParity test runs the correlated
    * text through spark.sql to prove the rewrite itself. avg(quantity)
    * is exact in doubles (integer-valued, sum < 2^53), so the
    * `< 0.2*avg` threshold is bit-identical across engines. */
  val q56SmallQtyRevenue: Q = Q(
    "q56_small_qty_revenue",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      |    / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val avgQty = Tables.lineitem(s, d)
        .groupBy($"l_partkey".as("pk"))
        .agg(avg($"l_quantity").as("avg_qty"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter($"p_brand" === "Brand#3"),
          $"l_partkey" === $"p_partkey")
        .join(avgQty, $"l_partkey" === $"pk")
        .filter($"l_quantity" < lit(0.2) * $"avg_qty")
        .agg((Exact.dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly"))
  }

  /** Q20 shape: suppliers who moved serious volume of a part family in
    * a window — IN nested inside IN with a HAVING between them. The DSL
    * form is two LEFT SEMI joins with the part-list side broadcast
    * (60k-part families stay far under the broadcast threshold even at
    * 100 TB fact scale; the supplier semi join keys on the post-HAVING
    * aggregate, which is |suppliers|-sized). Quantity sums are
    * integer-valued → plain sum() is exact. */
  val q57ExcessSuppliers: Q = Q(
    "q57_excess_suppliers",
    """SELECT s_name, s_acctbal FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part
      |                      WHERE p_name LIKE 'small %')
      |    AND l_shipdate >= TIMESTAMP '1998-01-01'
      |  GROUP BY l_suppkey
      |  HAVING sum(l_quantity) > 1000)""".stripMargin) { (s, d) =>
    import s.implicits._
    val smallParts = Tables.part(s, d).filter($"p_name".like("small %"))
      .select($"p_partkey")
    val qualifying = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= "1998-01-01")
      .join(broadcast(smallParts), $"l_partkey" === $"p_partkey",
        "left_semi")
      .groupBy($"l_suppkey")
      .agg(sum($"l_quantity").as("sq"))
      .filter($"sq" > 1000)
    Tables.supplier(s, d)
      .join(qualifying, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_name", $"s_acctbal")
  }

  /** Q22 shape: well-funded customers with no RECENT orders — scalar
    * AVG subquery threshold plus a NOT EXISTS anti join, grouped into
    * nation cohorts. (Every fixture customer has SOME order, so the
    * anti-join predicate is "no order since 2001" to keep the shape
    * non-degenerate.) acctbal is fractional → decimal-exact avg/sum. */
  val q58IdleCustomers: Q = Q(
    "q58_idle_customers",
    """SELECT CAST(c_nationkey % 5 AS BIGINT) AS cgroup,
      |  count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
      |    AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
      |                     AS DOUBLE) / count(c_acctbal)
      |                   FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      |GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val avgBal = Tables.customer(s, d).filter($"c_acctbal" > 0)
      .agg(Exact.davg($"c_acctbal").as("ab"))
    val recentCust = Tables.orders(s, d)
      .filter($"o_orderdate" >= "2001-01-01")
      .select($"o_custkey")
    Tables.customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"ab")
      .join(recentCust, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy(($"c_nationkey" % 5).cast("long").as("cgroup"))
      .agg(count(lit(1)).as("numcust"),
        Exact.dsum($"c_acctbal").as("totacctbal"))
  }

  /** Q11 shape: value concentration — parts whose lineitem inventory
    * value exceeds 1.5× the MEAN per-part value (mean-relative, so the
    * predicate stays meaningful at every scale factor, unlike Q11's
    * fixed global fraction whose selectivity collapses as |parts|
    * grows). The oracle keeps the scalar-subquery-over-CTE text; the
    * DSL aggregates per part ONCE into a checkpointed parts-sized
    * frame and broadcasts the 1-row mean threshold (same
    * single-fact-scan rationale as q55 — the twice-referenced CTE
    * would scan lineitem twice; and same no-global-window rule — the
    * earlier Window.partitionBy(lit(1)) folds to an empty partition
    * spec, one task holding every part). All sums in decimal space;
    * the threshold is derived from the exact decimal by identical
    * double ops in both engines. */
  val q61ValueConcentration: Q = Q(
    "q61_value_concentration",
    """WITH pv AS (
      |  SELECT l_partkey,
      |    sum(CAST(l_quantity * p_retailprice AS DECIMAL(18,6))) AS v
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
      |FROM pv
      |WHERE CAST(v AS DOUBLE) >
      |  (SELECT CAST(sum(v) AS DOUBLE) / count(*) * 1.5 FROM pv)"""
      .stripMargin) { (s, d) =>
    import s.implicits._
    val pv = Tables.lineitem(s, d)
      .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey")
      .agg(Exact.dsumDec($"l_quantity" * $"p_retailprice").as("v"))
      .localCheckpoint() // one fact scan feeds threshold and filter
    val thr = pv.agg(
      (sum($"v").cast("double") / count(lit(1)) * 1.5).as("thr"))
    pv
      .crossJoin(broadcast(thr))
      .filter($"v".cast("double") > $"thr")
      .select($"l_partkey".as("p_partkey"),
        $"v".cast("double").as("part_value"))
  }

  val all: Seq[Q] = Seq(q45Profit, q46LargeOrders, q47WaitingSupplier,
    q49NullSafeJoin, q53VolumeShipping, q54MarketShare, q55TopSupplier,
    q56SmallQtyRevenue, q57ExcessSuppliers, q58IdleCustomers,
    q61ValueConcentration)
}
