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

  /** q32b: json_tuple — the reference's multi-path JSON UDTF (one parse
    * per row for several paths, vs one parse PER PATH with repeated
    * get_json_object). Exercised through the SQL LATERAL VIEW form. */
  val q32bJsonTuple: Q = Q(
    "q32b_json_tuple",
    """SELECT event_type,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
      |    AS avg_k,
      |  count(DISTINCT json_extract_string(props, '$.source')) AS n_sources
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.events(s, d).createOrReplaceTempView("events_jt")
    s.sql(
      """SELECT event_type, round(avg(CAST(k AS BIGINT)), 4) AS avg_k,
        |  count(DISTINCT source) AS n_sources
        |FROM events_jt
        |LATERAL VIEW json_tuple(props, 'k', 'source') jt AS k, source
        |GROUP BY event_type""".stripMargin)
  }

  /** q48: array/collection function family (§2.7 collection UDFs) —
    * construction, membership, dedup, sort, slice, flatten, zip — the
    * whole family in one differential-checked projection. */
  val q48Collections: Q = Q(
    "q48_collection_funcs",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a
      |           FROM documents WHERE doc_id < 100)
      |SELECT doc_id,
      |  len(a) AS n,
      |  list_contains(a, 'the') AS has_the,
      |  len(list_distinct(a)) AS n_distinct,
      |  list_sort(list_distinct(a))[1] AS first_sorted,
      |  list_sort(list_distinct(a))[-1] AS last_sorted,
      |  array_to_string(a[2:4], ',') AS mid3,
      |  CAST(coalesce(list_position(a, 'the'), 0) AS BIGINT) AS the_pos,
      |  array_to_string(a[1:3], '-') AS head3
      |FROM t""".stripMargin) { (s, d) =>
    import s.implicits._
    // cross-engine notes: slices are scalarized (the driver comparator
    // can't sort array cells); Spark's array_position yields 0 for
    // missing where DuckDB's list_position yields NULL (coalesced).
    val a = split($"text", " ")
    Tables.documents(s, d).filter($"doc_id" < 100)
      .select($"doc_id",
        size(a).cast("long").as("n"),
        array_contains(a, "the").as("has_the"),
        size(array_distinct(a)).cast("long").as("n_distinct"),
        element_at(sort_array(array_distinct(a)), 1).as("first_sorted"),
        element_at(sort_array(array_distinct(a)), -1).as("last_sorted"),
        concat_ws(",", slice(a, 2, 3)).as("mid3"),
        array_position(a, "the").as("the_pos"),
        concat_ws("-", slice(a, 1, 3)).as("head3"))
  }

  /** q50: map function family (§2.7 map UDFs) — construction (from
    * text via str_to_map), map_keys/map_values, element_at lookup,
    * map_concat, map_filter. Map cells never cross the driver
    * comparator (scalarized); the DuckDB oracle recomputes the same
    * scalars from the source columns, so values are differential-
    * checked while the map machinery runs on the Spark side. */
  val q50MapFuncs: Q = Q(
    "q50_map_funcs",
    """SELECT event_type,
      |  count(*) AS n,
      |  min('k,type') AS keys_csv,
      |  count(DISTINCT json_extract_string(props, '$.k')
      |        || '|' || event_type) AS n_value_combos,
      |  count(DISTINCT CASE WHEN CAST(json_extract_string(props, '$.k')
      |        AS BIGINT) > 5 THEN json_extract_string(props, '$.k') END)
      |    AS n_high_k
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    import s.implicits._
    // props carries only the "k" key; "type" joins in from the column
    // via map_concat so construction, merge, lookup and filter all run
    val m = map_concat(
      str_to_map(concat(lit("k:"),
        get_json_object($"props", "$.k")), lit(","), lit(":")),
      map(lit("type"), $"event_type"))
    Tables.events(s, d)
      .select($"event_type", m.as("m"))
      .select($"event_type",
        concat_ws(",", sort_array(map_keys($"m"))).as("keys_csv"),
        concat_ws("|", element_at($"m", "k"), element_at($"m", "type"))
          .as("combo"),
        map_filter($"m", (k, v) =>
          k === "k" && v.cast("bigint") > 5).as("high"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        min($"keys_csv").as("keys_csv"),
        countDistinct($"combo").as("n_value_combos"),
        countDistinct(element_at($"high", "k")).as("n_high_k"))
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

  val all: Seq[Q] = Seq(q30ExplodeWords, q31Posexplode, q32Json,
    q32bJsonTuple, q33Sample, q34ClusterBy, q48Collections, q50MapFuncs)
}
