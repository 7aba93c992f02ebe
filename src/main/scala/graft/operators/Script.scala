package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Script transform + constant-generator + map-constructor coverage:
  * the reference's `ScriptOperator` (TRANSFORM ... USING 'cmd',
  * SURVEY.md §2.1), `stack`/`inline` UDTFs, and `str_to_map`.
  *
  * TRANSFORM pipes rows through an external process per partition
  * (tab-delimited, no-serde mode — `SparkScriptTransformationExec`);
  * at scale the child process count equals task count, and rows stream
  * without buffering. */
object Script {

  /** sc01: TRANSFORM through /bin/cat (identity) — exercises the full
    * fork/pipe/parse machinery; oracle is the identity projection. */
  val sc01Transform: Q = Q(
    "sc01_script_transform",
    """SELECT CAST(l_orderkey AS VARCHAR) AS k,
      |  CAST(CAST(l_quantity AS INT) AS VARCHAR) AS q
      |FROM lineitem WHERE l_orderkey < 50""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sc")
    s.sql(
      """SELECT TRANSFORM(CAST(l_orderkey AS STRING),
        |                 CAST(CAST(l_quantity AS INT) AS STRING))
        |  USING '/bin/cat' AS (k STRING, q STRING)
        |FROM lineitem_sc WHERE l_orderkey < 50""".stripMargin)
  }

  /** sc05: TRANSFORM with an explicit ROW FORMAT DELIMITED serde — the
    * reference's LazySimpleSerDe-backed script I/O (SURVEY.md §2.1):
    * custom field delimiter on both the feed and the read side, plus a
    * downstream shell command (cut) proving the delimiter actually
    * crosses the process boundary. (Spark applies the OUTPUT field
    * terminator as a regex — metachars like '|' split per character, so
    * the delimiter here is ':'.) */
  val sc05TransformSerde: Q = Q(
    "sc05_transform_serde",
    """SELECT CAST(l_orderkey AS VARCHAR) AS k,
      |  CAST(l_linenumber AS VARCHAR) AS ln
      |FROM lineitem WHERE l_orderkey < 50""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sc5")
    s.sql(
      """SELECT TRANSFORM(CAST(l_orderkey AS STRING),
        |                 CAST(l_linenumber AS STRING))
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY ':'
        |  USING 'cut -d: -f1,2' AS (k, ln)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY ':'
        |FROM lineitem_sc5 WHERE l_orderkey < 50""".stripMargin)
  }

  /** sc02: stack() constant generator joined against real data. */
  val sc02Stack: Q = Q(
    "sc02_stack",
    """WITH m(flag, meaning) AS (VALUES ('A', 'accepted'), ('N', 'none'),
      |                                ('R', 'returned'))
      |SELECT meaning, count(*) AS n
      |FROM lineitem JOIN m ON l_returnflag = flag
      |GROUP BY meaning""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sc2")
    s.sql(
      """SELECT meaning, count(*) AS n
        |FROM lineitem_sc2
        |JOIN (SELECT stack(3, 'A', 'accepted', 'N', 'none',
        |                      'R', 'returned') AS (flag, meaning)) m
        |  ON l_returnflag = flag
        |GROUP BY meaning""".stripMargin)
  }

  /** sc03: inline(array(named_struct(...))) — struct-array expansion. */
  val sc03Inline: Q = Q(
    "sc03_inline",
    """WITH b(lo, hi, band) AS (VALUES (0, 10, 'small'), (10, 30, 'mid'),
      |                               (30, 51, 'large'))
      |SELECT band, count(*) AS n
      |FROM lineitem JOIN b ON l_quantity >= lo AND l_quantity < hi
      |GROUP BY band""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sc3")
    s.sql(
      """SELECT band, count(*) AS n
        |FROM lineitem_sc3
        |JOIN (SELECT inline(array(
        |        named_struct('lo', 0, 'hi', 10, 'band', 'small'),
        |        named_struct('lo', 10, 'hi', 30, 'band', 'mid'),
        |        named_struct('lo', 30, 'hi', 51, 'band', 'large'))))
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band""".stripMargin)
  }

  /** sc04: str_to_map round-trip — build a kv string, parse, extract. */
  val sc04StrToMap: Q = Q(
    "sc04_str_to_map",
    """SELECT l_returnflag AS flag, l_linestatus AS status, count(*) AS n
      |FROM lineitem GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .select(str_to_map(
        concat(lit("flag:"), $"l_returnflag", lit(",status:"),
          $"l_linestatus"), lit(","), lit(":")).as("m"))
      .select($"m".getItem("flag").as("flag"),
        $"m".getItem("status").as("status"))
      .groupBy($"flag", $"status")
      .agg(count(lit(1)).as("n"))
  }

  val all: Seq[Q] = Seq(sc01Transform, sc02Stack, sc03Inline, sc04StrToMap,
    sc05TransformSerde)
}
