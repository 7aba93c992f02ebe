package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Table-generating functions and physical-layout operators: explode /
  * posexplode (the reference's `UDTFOperator` + `LateralViewJoinOperator`,
  * SURVEY.md §2.1), JSON extraction (`get_json_object`/`json_tuple`),
  * TABLESAMPLE, and SORT BY / DISTRIBUTE BY / CLUSTER BY
  * (`repartition` + `sortWithinPartitions`). */
object Generators {

  /** LATERAL VIEW explode(split(...)): word frequencies. At 100 TB the
    * explode multiplies rows ~50×; the partial aggregate after it
    * map-side-combines before the shuffle, so shuffle volume is
    * |vocabulary|, not |tokens|. */
  val q30ExplodeWords: Q = Q(
    "q30_explode_words",
    """SELECT word, count(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
      |) GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin) {
    (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word".asc)
        .limit(20)
  }

  /** posexplode: token positions (0-based on both engines —
    * generate_subscripts is 1-based, so the oracle subtracts 1). */
  val q31Posexplode: Q = Q(
    "q31_posexplode",
    """SELECT word, round(avg(pos), 4) AS avg_pos, count(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word,
      |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      |  FROM documents
      |) GROUP BY word ORDER BY n DESC, word LIMIT 15""".stripMargin) {
    (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(posexplode(split($"text", " ")).as(Seq("pos", "word")))
        .groupBy($"word")
        .agg(round(avg($"pos"), 4).as("avg_pos"), count(lit(1)).as("n"))
        .select($"word", $"avg_pos", $"n")
        .orderBy($"n".desc, $"word".asc)
        .limit(15)
  }

  /** JSON path extraction from the events props column. */
  val q32Json: Q = Q(
    "q32_json",
    """SELECT event_type,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
      |    AS avg_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(round(avg(get_json_object($"props", "$.k").cast("bigint")), 4)
        .as("avg_k"),
        count(lit(1)).as("n"))
  }

  /** TABLESAMPLE — no cross-engine oracle (sampling is engine-seeded);
    * driver records a rows-only check. Deterministic for a fixed seed. */
  val q33Sample: Q = Q.noOracle("q33_sample") { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).sample(withReplacement = false, 0.1, seed = 42)
      .agg(count(lit(1)).as("n_sampled"),
        round(sum($"l_quantity"), 2).as("qty_sampled"))
  }

  /** DISTRIBUTE BY + SORT BY (Hive CLUSTER BY): partition-local sort
    * after hash distribution — no global order. Result SET equals the
    * plain projection (the oracle checks content; the operator exercises
    * `repartition` + `sortWithinPartitions` physical shape). */
  val q34ClusterBy: Q = Q(
    "q34_cluster_by",
    """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
      |WHERE l_returnflag <> 'N'""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_returnflag" =!= "N")
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag")
      .repartition($"l_returnflag")
      .sortWithinPartitions($"l_orderkey", $"l_linenumber")
  }

  val all: Seq[Q] = Seq(q30ExplodeWords, q31Posexplode, q32Json, q33Sample,
    q34ClusterBy)
}
