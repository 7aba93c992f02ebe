package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Multi-dimensional aggregation — ROLLUP / CUBE / GROUPING SETS with
  * `grouping_id`, HAVING, conditional (pivot-style) aggregation
  * (SURVEY.md §2.3: grammar keywords KW_GROUPING/KW_CUBE/KW_ROLLUP + the
  * `grouping` UDF). Spark plans all of these through a single Expand +
  * partial/final hash aggregate — map-side combine keeps the shuffle at
  * |groups|×|grouping sets| rows, not |input|. */
object Grouping {

  val q19Rollup: Q = Q(
    "q19_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  grouping_id(l_returnflag, l_linestatus) AS gid,
      |  sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
    import s.implicits._
    // l_quantity is integer-valued → plain double sums are exact and
    // order-independent (see q01); no decimal buffer needed here.
    Tables.lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(grouping_id().as("gid"),
        sum($"l_quantity").as("sum_qty"),
        count(lit(1)).as("n"))
      .select($"l_returnflag", $"l_linestatus", $"gid", $"sum_qty", $"n")
  }

  val q20Cube: Q = Q(
    "q20_cube",
    """SELECT l_returnflag, l_linestatus,
      |  grouping_id(l_returnflag, l_linestatus) AS gid,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
    import s.implicits._
    // revenue product + decimal cast computed once per input row, not
    // once per Expand-replicated row (4 grouping sets) — hoist computed
    // aggregate inputs ABOVE rollup/cube/grouping-sets Expand.
    Tables.lineitem(s, d)
      .select($"l_returnflag", $"l_linestatus",
        ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,6)").as("rev_d"))
      .cube($"l_returnflag", $"l_linestatus")
      .agg(grouping_id().as("gid"),
        sum($"rev_d").cast("double").as("revenue"))
      .select($"l_returnflag", $"l_linestatus", $"gid", $"revenue")
  }

  /** GROUPING SETS via the SQL front end (the engine's `spark.sql` entry,
    * SURVEY.md §7.1 step 4 — same text parses on both engines). */
  val q21GroupingSets: Q = {
    val sql =
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping_id(o_orderstatus, o_orderpriority) AS gid,
        |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin
    Q("q21_grouping_sets", sql) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(sql)
    }
  }

  val q22Having: Q = Q(
    "q22_having",
    """SELECT p_brand, count(*) AS n,
      |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE)
      |    / count(p_retailprice) AS avg_price
      |FROM part GROUP BY p_brand HAVING count(*) >= 50""".stripMargin) {
    (s, d) =>
      import s.implicits._
      Tables.part(s, d).groupBy($"p_brand")
        .agg(count(lit(1)).as("n"),
          Exact.davg($"p_retailprice").as("avg_price"))
        .filter($"n" >= 50)
  }

  /** Pivot: one output column per order status (Spark `.pivot` with
    * pinned values — never pivot on unbounded cardinality at scale). */
  val q23Pivot: Q = Q(
    "q23_pivot",
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS F,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS O,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS P
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(Exact.dsum($"o_totalprice"))
  }

  /** q51: UNPIVOT — the inverse of q23's pivot (reference: explode of
    * conditional-aggregation columns back to rows). The SQL-standard
    * text parses identically on Spark and DuckDB, so the SAME string is
    * the engine query and the oracle (the q21 shared-text pattern). */
  val q51Unpivot: Q = {
    val sql =
      """WITH a AS (SELECT s_nationkey, count(*) AS n_rows,
        |           count(DISTINCT s_name) AS n_names
        |           FROM supplier GROUP BY s_nationkey)
        |SELECT s_nationkey, metric, val
        |FROM a UNPIVOT (val FOR metric IN (n_rows, n_names))""".stripMargin
    Q("q51_unpivot", sql) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(sql)
    }
  }

  /** q65: GROUP BY ALL / ORDER BY ALL — the modern shorthand both
    * engines resolve to "group by every non-aggregate select item"
    * (Spark 3.4+ / DuckDB). Run through spark.sql so the resolution
    * itself is what's exercised; the DSL form would just be an
    * ordinary groupBy. */
  val q65GroupByAll: Q = {
    val sql =
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin
    Q("q65_group_by_all", sql) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(q19Rollup, q20Cube, q21GroupingSets, q22Having,
    q23Pivot, q51Unpivot, q65GroupByAll)
}
