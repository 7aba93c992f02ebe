package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §7.1 step 4: the reference's primary user surface is SQL
  * text, not a DataFrame API. Every inventory query whose oracle SQL is
  * ANSI enough to parse on BOTH engines is executed here through
  * `spark.sql` over the registered views and must return EXACTLY the
  * DSL builder's rows — proving the engine's SQL front end end-to-end
  * (parser → analyzer → same physical semantics). HiveQL-only text
  * forms (LATERAL VIEW, DISTRIBUTE BY / SORT BY / CLUSTER BY,
  * TABLESAMPLE) are covered with inline texts DuckDB can't host.
  */
class SqlParitySpec extends AnyFunSuite {
  import SparkTestSession._

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString("|"))

  /** Inventory queries whose oracle text is dual-dialect (ANSI subset
    * parsed identically by Spark and DuckDB). */
  private val dualDialect = Seq(
    "q01_pricing_summary", "q02_filter_project", "q03_topk_orders",
    "q04_shipping_priority", "q05_local_supplier_volume",
    "q06_forecast_revenue", "q07_customer_orders_outer", "q08_anti_join",
    "q09_semi_join", "q10_full_outer", "q11_cross_join",
    // q14/q15 excluded: their oracle uses DuckDB's `OVER (w ROWS ...)`
    // named-window-extension syntax, which Spark's parser rejects; the
    // equivalent frame text is covered inline below.
    "q12_count_distinct", "q13_window_rank",
    "q16_lag_lead", "q18_first_last", "q19_rollup",
    "q20_cube", "q21_grouping_sets", "q22_having", "q23_pivot",
    "q24_union_all", "q25_union_distinct", "q26_intersect_except",
    "q27_scalar_subquery", "q28_in_subquery", "q29_correlated_agg",
    "q34_cluster_by", "q38_minmax", "q45_profit", "q46_large_orders",
    "q47_waiting_supplier", "q53_volume_shipping", "q54_market_share",
    "q55_top_supplier", "q56_small_qty_revenue", "q57_excess_suppliers",
    "q58_idle_customers", "q59_min_cost_supplier", "q61_value_concentration",
    "q62_interval_frame", "q63_nulls_ordering", "q64_arg_min_max",
    "q67_join_hints",
    // round-3 TPC-H completions + sessionize: correlated EXISTS with
    // cross-table interval inequality, outer-join-condition predicate,
    // NOT IN, OR-of-ANDs, named WINDOW clause (q77/t11/p04/p05/d08
    // excluded: IGNORE-NULLS placement, struct literals, //, strpos
    // and regexp flags are DuckDB-dialect)
    "q69_order_priority", "q70_returned_items", "q71_ship_class_priority",
    "q72_customer_distribution", "q73_promo_revenue",
    "q74_supplier_part_counts", "q75_disjunctive_pred", "q76_sessionize",
    "st05_stateful_totals", "w01_smb_join",
    // late round-3 additions: MERGE-as-join CTEs, aggregate FILTER
    // clauses + NOT EXISTS, window-over-aggregate with a named WINDOW
    // (d09/c02 excluded: list_slice/unnest-range segmenting is
    // DuckDB-dialect)
    "w04_merge_upsert", "dq01_quality_audit", "q78_moving_avg",
    "q79_cumulative_crossover",
    // round-4: lead()-NFA row-pattern text form (q80b excluded: its
    // oracle puts IGNORE NULLS inside the call parens, DuckDB-dialect;
    // Spark placement covered inline below)
    "q80_matchpath_funnel")

  dualDialect.foreach { n =>
    test(s"$n: SQL text == DSL builder") {
      register()
      val viaSql = spark.sql(SparkEntry.oracleSql(n))
      val viaDsl = SparkEntry.queries(n)(spark, sf)
      assert(viaSql.columns.sorted.sameElements(viaDsl.columns.sorted),
        s"columns ${viaSql.columns.toSeq} vs ${viaDsl.columns.toSeq}")
      assert(canon(viaSql) == canon(viaDsl))
    }
  }

  test("star-quantifier pattern SQL text (Spark IGNORE NULLS) == DSL") {
    register()
    val viaSql = spark.sql(
      """WITH m AS (SELECT user_id, event_id, event_type, ts,
        |    last_value(CASE WHEN event_type <> 'click'
        |                    THEN event_type END) IGNORE NULLS OVER w
        |      AS p_sym,
        |    last_value(CASE WHEN event_type <> 'click'
        |                    THEN event_id END) IGNORE NULLS OVER w
        |      AS p_event,
        |    last_value(CASE WHEN event_type <> 'click'
        |                    THEN ts END) IGNORE NULLS OVER w AS p_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND 1 PRECEDING))
        |SELECT user_id, p_event AS start_event, p_ts AS start_ts,
        |  event_id AS end_event, ts AS end_ts
        |FROM m
        |WHERE event_type = 'purchase' AND p_sym = 'view'""".stripMargin)
    val viaDsl = SparkEntry.queries("q80b_matchpath_star")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("quantified pattern SQL text (Spark IGNORE NULLS) == DSL") {
    // q80c's oracle is DuckDB-dialect (IGNORE NULLS inside the call
    // parens); this is the same backward unit compilation in Spark's
    // placement — both texts and the DSL must agree row-for-row
    register()
    val viaSql = spark.sql(
      """WITH u3a AS (SELECT *,
        |    CASE WHEN event_type = 'purchase' THEN event_id END AS a3_ee,
        |    CASE WHEN event_type = 'purchase' THEN ts END AS a3_ts
        |  FROM events),
        |u3 AS (SELECT *,
        |    first_value(CASE WHEN event_type <> 'click'
        |      THEN coalesce(a3_ee, -1) END) IGNORE NULLS OVER wf AS f3_ee,
        |    first_value(CASE WHEN event_type <> 'click'
        |      THEN coalesce(a3_ts, TIMESTAMP '1900-01-01') END)
        |      IGNORE NULLS OVER wf AS f3_ts
        |  FROM u3a
        |  WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |e3 AS (SELECT *,
        |    CASE WHEN event_type = 'purchase' THEN a3_ee
        |         WHEN event_type = 'click' AND f3_ee <> -1 THEN f3_ee
        |    END AS e3_ee,
        |    CASE WHEN event_type = 'purchase' THEN a3_ts
        |         WHEN event_type = 'click' AND f3_ee <> -1 THEN f3_ts
        |    END AS e3_ts
        |  FROM u3),
        |u2a AS (SELECT *,
        |    CASE WHEN event_type = 'view' THEN lead(e3_ee, 1) OVER wl
        |    END AS a2_ee,
        |    CASE WHEN event_type = 'view' THEN lead(e3_ts, 1) OVER wl
        |    END AS a2_ts
        |  FROM e3
        |  WINDOW wl AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |u2 AS (SELECT *,
        |    first_value(CASE WHEN event_type <> 'click'
        |      THEN coalesce(a2_ee, -1) END) IGNORE NULLS OVER wf AS f2_ee,
        |    first_value(CASE WHEN event_type <> 'click'
        |      THEN coalesce(a2_ts, TIMESTAMP '1900-01-01') END)
        |      IGNORE NULLS OVER wf AS f2_ts
        |  FROM u2a
        |  WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |e2 AS (SELECT *,
        |    CASE WHEN event_type = 'view' THEN a2_ee
        |         WHEN event_type = 'click' AND f2_ee <> -1 THEN f2_ee
        |    END AS e2_ee,
        |    CASE WHEN event_type = 'view' THEN a2_ts
        |         WHEN event_type = 'click' AND f2_ee <> -1 THEN f2_ts
        |    END AS e2_ts
        |  FROM u2),
        |e1 AS (SELECT *,
        |    CASE WHEN event_type = 'view' THEN lead(e2_ee, 1) OVER wl
        |    END AS e1_ee,
        |    CASE WHEN event_type = 'view' THEN lead(e2_ts, 1) OVER wl
        |    END AS e1_ts
        |  FROM e2
        |  WINDOW wl AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS start_event, ts AS start_ts,
        |  e1_ee AS end_event, e1_ts AS end_ts
        |FROM e1 WHERE e1_ee IS NOT NULL""".stripMargin)
    val viaDsl = SparkEntry.queries("q80c_matchpath_quant")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("matchpath table-valued function: SQL call == DSL plan") {
    // the reference PTF's own calling convention — a table function in
    // the FROM clause; the TVF returns matchPathQuant's logical plan
    // verbatim, so values AND shape match the registered q80c
    register()
    val viaSql = spark.sql("SELECT * FROM matchpath('events', " +
      "'view', 'click*', 'view', 'click*', 'purchase')")
    val viaDsl = SparkEntry.queries("q80c_matchpath_quant")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("matchpath TVF symbol definitions: predicate symbols == DSL map") {
    // 'name := <sql>' trailing args are the reference's
    // symbol-expression pairs; the parsed predicate must drive the
    // same plan as the registered q80e's Column map
    register()
    val viaSql = spark.sql("SELECT * FROM matchpath('events', " +
      "'bigv', 'click*', 'purchase', " +
      "'bigv := event_type = ''view'' AND value >= 30.0')")
    val viaDsl = SparkEntry.queries("q80e_matchpath_symbols")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("trailing-run pattern SQL text (Spark IGNORE NULLS) == DSL") {
    // q80f's oracle is DuckDB-dialect; this is the same backward
    // (run-end anchored) derivation in Spark's IGNORE NULLS placement
    register()
    val viaSql = spark.sql(
      """WITH m AS (SELECT user_id, event_id, event_type, ts,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS n_sym,
        |    last_value(CASE WHEN event_type <> 'click'
        |                    THEN event_type END) IGNORE NULLS OVER w
        |      AS p_sym,
        |    last_value(CASE WHEN event_type <> 'click'
        |                    THEN event_id END) IGNORE NULLS OVER w
        |      AS p_event,
        |    last_value(CASE WHEN event_type <> 'click'
        |                    THEN ts END) IGNORE NULLS OVER w AS p_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND 1 PRECEDING))
        |SELECT user_id, p_event AS start_event, p_ts AS start_ts,
        |  event_id AS end_event, ts AS end_ts
        |FROM m WHERE event_type = 'click'
        |  AND (n_sym IS NULL OR n_sym <> 'click')
        |  AND p_sym = 'view'""".stripMargin)
    val viaDsl = SparkEntry.queries("q80f_matchpath_trailing")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("matchpath TVF accepts a trailing quantified run") {
    register()
    val viaSql = spark.sql(
      "SELECT * FROM matchpath('events', 'view', 'click+')")
    val viaDsl = SparkEntry.queries("q80f_matchpath_trailing")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("matchpath TVF composes over a registered relation (filtered view)") {
    // the reference PTF takes a subquery argument; the engine's
    // composition path is a named (temp) view over any DataFrame —
    // the TVF must run the SAME plan over the filtered relation
    register()
    import spark.implicits._
    val filtered = sources.Tables.events(spark, sf)
      .filter($"value" >= 10.0)
    filtered.createOrReplaceTempView("events_big")
    val viaSql = spark.sql(
      "SELECT * FROM matchpath('events_big', 'view', 'click*', 'purchase')")
    val viaDsl = operators.Windows.matchPathQuant(filtered,
      Seq("view", "click*", "purchase"))
    assert(canon(viaSql) == canon(viaDsl))
    // the filter must have BITTEN (different rows than the full table)
    assert(canon(viaSql) !=
      canon(SparkEntry.queries("q80b_matchpath_star")(spark, sf)))
  }

  test("asof_join TVF: SQL call == DSL plan (inner and outer)") {
    // Spark's parser has no ASOF JOIN syntax; the engine exposes the
    // operator as a catalog table function over registered views —
    // the builder returns asofJoin's logical plan verbatim
    register()
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => fcount, lit => flit, max => fmax}
    val ev = sources.Tables.events(spark, sf)
    val left = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val right = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts")
      .agg(fmax($"event_id").as("view_event"))
    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")
    val viaSql = spark.sql(
      "SELECT * FROM asof_join('asof_l', 'asof_r', 'user_id', 'ts', 'ts')")
    val viaDsl = operators.AsofJoin.asofJoin(left, right,
      key = "user_id", leftTs = "ts", rightTs = "ts")
    assert(canon(viaSql) == canon(viaDsl))
    assert(viaSql.count() > 0)
    val viaSqlOuter = spark.sql("SELECT * FROM asof_join('asof_l', " +
      "'asof_r', 'user_id', 'ts', 'ts', 'outer')")
    val viaDslOuter = operators.AsofJoin.asofJoin(left, right,
      key = "user_id", leftTs = "ts", rightTs = "ts", outer = true)
    assert(canon(viaSqlOuter) == canon(viaDslOuter))
    // outer keeps left rows the inner form dropped
    assert(viaSqlOuter.count() == left.count())
  }

  test("asof_join TVF rejects an unknown option") {
    register()
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('events', 'events', " +
        "'user_id', 'ts', 'ts', 'oooter')").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("unknown option")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("matchpath TVF rejects an empty symbol-definition name") {
    register()
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM matchpath('events', 'view', 'purchase', " +
        "' := event_type = ''view''')").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("empty name")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("matchPathQuant degenerates to matchPath / matchPathStar") {
    // the general compiler must agree with the two fixed matchers on
    // their own patterns (all-literal chain; single A.B*.C star) —
    // three independently-derived formulations, one match set
    val ev = sources.Tables.events(spark, sf)
    assert(canon(operators.Windows.matchPathQuant(ev,
        Seq("view", "view", "purchase"))) ==
      canon(SparkEntry.queries("q80_matchpath_funnel")(spark, sf)))
    assert(canon(operators.Windows.matchPathQuant(ev,
        Seq("view", "click*", "purchase"))) ==
      canon(SparkEntry.queries("q80b_matchpath_star")(spark, sf)))
    // the + rewrite: s+ must equal its s.s* expansion written out
    assert(canon(operators.Windows.matchPathQuant(ev,
        Seq("view", "click+", "purchase"))) ==
      canon(operators.Windows.matchPathQuant(ev,
        Seq("view", "click", "click*", "purchase"))))
  }

  test("LATERAL VIEW explode text form matches the DSL explode plan") {
    register()
    val viaSql = spark.sql(
      """SELECT word, count(*) AS n FROM documents
        |LATERAL VIEW explode(split(text, ' ')) t AS word
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin)
    val viaDsl = SparkEntry.queries("q30_explode_words")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("LATERAL VIEW posexplode text form matches the DSL plan") {
    register()
    val viaSql = spark.sql(
      """SELECT word, round(avg(pos), 4) AS avg_pos, count(*) AS n
        |FROM documents
        |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
        |GROUP BY word ORDER BY n DESC, word LIMIT 15""".stripMargin)
    val viaDsl = SparkEntry.queries("q31_posexplode")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("DISTRIBUTE BY / SORT BY text: same content, partition-local order") {
    register()
    import spark.implicits._
    val viaSql = spark.sql(
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag <> 'N'
        |DISTRIBUTE BY l_returnflag SORT BY l_orderkey, l_linenumber"""
        .stripMargin)
    val viaDsl = SparkEntry.queries("q34_cluster_by")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
    // partition-local sortedness (the property DISTRIBUTE/SORT BY adds)
    val perPart = viaSql
      .select($"l_orderkey", $"l_linenumber").rdd
      .mapPartitions { it =>
        Iterator.single(it.map(r => (r.getLong(0), r.getInt(1))).toSeq)
      }.collect()
    perPart.foreach(p => assert(p == p.sorted, "partition not sorted"))
  }

  test("CLUSTER BY text form: same content as DISTRIBUTE+SORT") {
    register()
    val viaSql = spark.sql(
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag <> 'N'
        |CLUSTER BY l_orderkey""".stripMargin)
    val viaDsl = SparkEntry.queries("q34_cluster_by")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("TABLESAMPLE text form samples a bounded fraction") {
    register()
    val n = spark.sql(
      "SELECT count(*) AS n FROM lineitem TABLESAMPLE (10 PERCENT)")
      .collect()(0).getLong(0)
    val total = spark.table("lineitem").count()
    assert(n > 0 && n < total / 2, s"10% sample returned $n of $total")
  }

  test("ROWS/RANGE frame SQL text matches the DSL window plans") {
    register()
    val running = spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_spend,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
        |FROM orders""".stripMargin)
    val viaDsl = SparkEntry.queries("q14_window_running")(spark, sf)
    assert(canon(running) == canon(viaDsl))
  }

  test("dq02 source gate as Spark SQL text matches the DSL builder") {
    register()
    val viaSql = spark.sql(
      """WITH per_doc AS (
        |  SELECT source, md5(text) AS h, size(split(text, ' ')) AS n_toks
        |  FROM documents),
        |agg AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_dup,
        |    CAST(sum(n_toks) AS BIGINT) AS total_tokens,
        |    CAST(count(*) FILTER (WHERE n_toks < 30) AS BIGINT) AS n_short
        |  FROM per_doc GROUP BY source)
        |SELECT source, n_docs, n_dup, total_tokens, n_short,
        |  (5 * n_dup <= n_docs AND 10 * n_short <= 3 * n_docs
        |   AND total_tokens >= 15 * n_docs) AS keep
        |FROM agg""".stripMargin)
    val viaDsl = SparkEntry.queries("dq02_source_quality")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("t12 LM surprisal as Spark SQL text matches the DSL builder") {
    register()
    val viaSql = spark.sql(
      """WITH tok AS (SELECT doc_id, lang, word AS tok FROM documents
        |             LATERAL VIEW explode(split(text, ' ')) t AS word),
        |train AS (SELECT tok FROM tok WHERE doc_id % 2 = 0),
        |nv AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM train),
        |cnt AS (SELECT tok, count(*) AS c FROM train GROUP BY tok),
        |scored AS (
        |  SELECT t.doc_id, t.lang, count(*) AS n_toks,
        |    avg(-ln((coalesce(c.c, 0) + 1.0) / (nv.n + nv.v))) AS surprisal
        |  FROM tok t LEFT JOIN cnt c USING (tok) CROSS JOIN nv
        |  WHERE t.doc_id % 2 = 1
        |  GROUP BY t.doc_id, t.lang),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY surprisal DESC, doc_id) AS rk FROM scored)
        |SELECT lang, rk, doc_id, CAST(n_toks AS BIGINT) AS n_toks
        |FROM r WHERE rk <= 3""".stripMargin)
    val viaDsl = SparkEntry.queries("t12_lm_score")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("p06 epoch shuffle as Spark SQL text matches the DSL builder") {
    register()
    val viaSql = spark.sql(
      """WITH e AS (SELECT explode(array(0, 1, 2)) AS epoch),
        |keyed AS (
        |  SELECT e.epoch, d.doc_id,
        |    md5(concat(CAST(d.doc_id AS STRING), ':e',
        |               CAST(e.epoch AS STRING))) AS k
        |  FROM documents d CROSS JOIN e),
        |r AS (SELECT epoch, doc_id, k, row_number() OVER (
        |        PARTITION BY epoch ORDER BY k, doc_id) AS pos
        |      FROM keyed)
        |SELECT CAST(epoch AS INT) AS epoch, CAST(pos AS INT) AS pos,
        |  doc_id, k AS shuffle_key
        |FROM r WHERE pos <= 4""".stripMargin)
    val viaDsl = SparkEntry.queries("p06_epoch_shuffle")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("w05 z-order stats as Spark SQL text matches the DSL builder") {
    register()
    val viaSql = spark.sql(
      """WITH mx AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms
        |            FROM lineitem),
        |oct AS (SELECT (l_partkey * 8) DIV (mp + 1) AS pa,
        |               (l_suppkey * 8) DIV (ms + 1) AS pb
        |        FROM lineitem CROSS JOIN mx),
        |z AS (SELECT pa, pb,
        |        shiftleft(pa & 1, 0) | shiftleft(pb & 1, 1)
        |        | shiftleft(shiftright(pa, 1) & 1, 2)
        |        | shiftleft(shiftright(pb, 1) & 1, 3)
        |        | shiftleft(shiftright(pa, 2) & 1, 4)
        |        | shiftleft(shiftright(pb, 2) & 1, 5) AS z6
        |      FROM oct)
        |SELECT CAST(shiftright(z6, 3) AS INT) AS zfile, count(*) AS n,
        |  CAST(min(pa) AS INT) AS min_pa, CAST(max(pa) AS INT) AS max_pa,
        |  CAST(min(pb) AS INT) AS min_pb, CAST(max(pb) AS INT) AS max_pb
        |FROM z GROUP BY 1""".stripMargin)
    val viaDsl = SparkEntry.queries("w05_zorder_stats")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("p07 sequence packing as Spark SQL text matches the DSL builder") {
    register()
    val viaSql = spark.sql(
      """WITH ordered AS (SELECT doc_id, size(split(text, ' ')) AS n_toks,
        |       md5(concat(CAST(doc_id AS STRING), ':e0')) AS k
        |       FROM documents),
        |c AS (SELECT doc_id, n_toks, sum(n_toks) OVER (ORDER BY k, doc_id
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM ordered),
        |b AS (SELECT doc_id, n_toks,
        |        (cum - n_toks) DIV 2048 AS bin,
        |        (cum - 1) DIV 2048 AS bin_end FROM c)
        |SELECT CAST(bin AS INT) AS bin, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
        |  CAST(count(CASE WHEN bin_end > bin THEN 1 END) AS BIGINT)
        |    AS n_straddle
        |FROM b WHERE bin < 10 GROUP BY 1""".stripMargin)
    val viaDsl = SparkEntry.queries("p07_sequence_pack")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("dq03 embedding audit as Spark SQL text matches the DSL builder") {
    register()
    val viaSql = spark.sql(
      """SELECT 'null_embedding' AS chk,
        |  CAST(count(CASE WHEN embedding IS NULL THEN 1 END) AS BIGINT)
        |    AS n_violations
        |FROM embeddings
        |UNION ALL
        |SELECT 'wrong_dim',
        |  CAST(count(CASE WHEN size(embedding) <> 64 THEN 1 END) AS BIGINT)
        |FROM embeddings
        |UNION ALL
        |SELECT 'non_finite',
        |  CAST(count(CASE WHEN exists(embedding,
        |    x -> isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) = double('inf'))
        |    THEN 1 END) AS BIGINT)
        |FROM embeddings
        |UNION ALL
        |SELECT 'zero_norm',
        |  CAST(count(CASE WHEN aggregate(embedding, 0.0D,
        |    (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) = 0.0D
        |    THEN 1 END) AS BIGINT)
        |FROM embeddings
        |UNION ALL
        |SELECT 'dup_vec_id',
        |  CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM (
        |  SELECT count(*) AS n FROM embeddings GROUP BY vec_id
        |  HAVING count(*) > 1)""".stripMargin)
    val viaDsl = SparkEntry.queries("dq03_embedding_audit")(spark, sf)
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("windowed SQL with WINDOW clause parses and matches inline OVER") {
    register()
    val withClause = spark.sql(
      """SELECT o_custkey, o_orderkey,
        |  rank() OVER w AS rk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
        |             o_orderkey)""".stripMargin)
    val inline = spark.sql(
      """SELECT o_custkey, o_orderkey,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
        |               o_orderkey) AS rk
        |FROM orders""".stripMargin)
    assert(canon(withClause) == canon(inline))
  }

  test("bm25_topk TVF: SQL call == s12's registered plan") {
    // round-14 verdict ask #5: the retrieval family was DSL-only —
    // a SQL-prompt user could not reach the headline features. The
    // TVF returns bm25FromIndex's logical plan verbatim, so equality
    // here rides s12's hash-verified oracle transitively.
    register()
    val viaSql = spark.sql("SELECT * FROM bm25_topk('documents')")
    val viaDsl = SparkEntry.queries("s12_bm25_lexical")(spark, sf)
    assert(viaSql.columns.sorted.sameElements(viaDsl.columns.sorted))
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("bm25_topk TVF: trailing k overrides the top-k") {
    register()
    val viaSql = spark.sql("SELECT * FROM bm25_topk('documents', 3)")
    val (p, sz) = operators.Similarity
      .lexIndex(sources.Tables.documents(spark, sf))
    val viaDsl = operators.Similarity.bm25FromIndex(p, sz, k = 3)
    assert(canon(viaSql) == canon(viaDsl))
    // and it genuinely cut: no rank past 3, fewer rows than k=5
    assert(viaSql.collect().forall(_.getInt(2) <= 3))
  }

  test("hybrid_topk TVF: SQL call == s13's registered plan") {
    register()
    val viaSql = spark.sql(
      "SELECT * FROM hybrid_topk('documents', 'embeddings')")
    val viaDsl = SparkEntry.queries("s13_bm25_hybrid")(spark, sf)
    assert(viaSql.columns.sorted.sameElements(viaDsl.columns.sorted))
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("hybrid_topk TVF composes over a registered relation (filtered view)") {
    // the TVF must run the SAME plan over any named relation — and
    // the filter must BITE (different rows than the full corpus)
    register()
    import spark.implicits._
    val filtered = sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 2 === 0)
    filtered.createOrReplaceTempView("docs_even")
    val viaSql = spark.sql("SELECT * FROM bm25_topk('docs_even')")
    val (p, sz) = operators.Similarity.lexIndex(filtered)
    val viaDsl = operators.Similarity.bm25FromIndex(p, sz)
    assert(canon(viaSql) == canon(viaDsl))
    assert(canon(viaSql) !=
      canon(SparkEntry.queries("s12_bm25_lexical")(spark, sf)))
  }

  test("knn_topk TVF: SQL call == s04's registered plan") {
    register()
    val viaSql = spark.sql("SELECT * FROM knn_topk('embeddings')")
    val viaDsl = SparkEntry.queries("s04_knn_ivf")(spark, sf)
    assert(viaSql.columns.sorted.sameElements(viaDsl.columns.sorted))
    assert(canon(viaSql) == canon(viaDsl))
    // and the k override cuts (top-2 is a strict per-query prefix)
    val k2 = spark.sql("SELECT * FROM knn_topk('embeddings', 2)")
    assert(k2.collect().forall(_.getInt(3) <= 2))
    assert(canon(k2) == canon(viaDsl.filter("rk <= 2")))
  }

  test("bm25_topk / knn_topk TVFs: explicit query relation — the " +
      "default slice reproduced verbatim, an arbitrary view bites") {
    // round-15 verdict ask #1: the TVFs pinned the query set to the
    // registry's id % 50 = 0 convention — a SQL user's first real
    // question is "top-k for THESE queries". The default must stay
    // hash-identical (every pre-round-16 pin rides it), and an
    // explicit view equal to the slice must reproduce it EXACTLY —
    // query shingles outside the index vocabulary never survive the
    // probe join, so the two constructions coincide by construction.
    register()
    import spark.implicits._
    sources.Tables.documents(spark, sf).filter($"doc_id" % 50 === 0)
      .createOrReplaceTempView("q_slice_docs")
    assert(canon(spark.sql(
        "SELECT * FROM bm25_topk('documents', 'q_slice_docs')")) ==
      canon(spark.sql("SELECT * FROM bm25_topk('documents')")))
    // an arbitrary query view CHANGES the answer (different query set,
    // same corpus/index) — the relation argument genuinely bites
    sources.Tables.documents(spark, sf).filter($"doc_id" % 50 === 7)
      .createOrReplaceTempView("q_alt_docs")
    val alt = spark.sql(
      "SELECT * FROM bm25_topk('documents', 'q_alt_docs', 3)").collect()
    assert(alt.nonEmpty)
    assert(alt.forall(r => r.getLong(0) % 50 == 7 && r.getInt(2) <= 3))
    // vector side: same two claims
    sources.Tables.embeddings(spark, sf).filter($"vec_id" % 50 === 0)
      .createOrReplaceTempView("q_slice_emb")
    assert(canon(spark.sql(
        "SELECT * FROM knn_topk('embeddings', 'q_slice_emb')")) ==
      canon(spark.sql("SELECT * FROM knn_topk('embeddings')")))
    sources.Tables.embeddings(spark, sf).filter($"vec_id" % 50 === 7)
      .createOrReplaceTempView("q_alt_emb")
    val kalt = spark.sql(
      "SELECT * FROM knn_topk('embeddings', 'q_alt_emb', 2)").collect()
    assert(kalt.nonEmpty)
    assert(kalt.forall(r => r.getLong(0) % 50 == 7 && r.getInt(3) <= 2))
  }

  test("explicit query relations: disjoint-id queries rank the FULL " +
      "corpus (no self-exclusion), colliding ids are corpus members") {
    // the id-namespace contract (round-16 self-review): self-exclusion
    // is keyed on id equality, so a query re-using a corpus id is
    // treated AS that corpus member, while an out-of-range id ranks
    // everything — its own source doc included. Pin both: the same
    // query text under an OFFSET id must surface its source doc
    // (typically at rank 1), which the colliding-id form excludes.
    register()
    import spark.implicits._
    val Off = 50000000L
    sources.Tables.documents(spark, sf).filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + Off).as("doc_id"), $"text")
      .createOrReplaceTempView("q_offset_docs")
    val off = spark.sql(
      "SELECT * FROM bm25_topk('documents', 'q_offset_docs')").collect()
    assert(off.nonEmpty)
    // every offset query's ranking now CONTAINS its own source doc...
    val hitsOwn = off.filter(r => r.getLong(1) == r.getLong(0) - Off)
    assert(hitsOwn.nonEmpty,
      "offset queries never surfaced their own source docs — " +
        "self-exclusion leaked into the disjoint-id namespace")
    // ...which the colliding-id (corpus-slice) form never does
    sources.Tables.documents(spark, sf).filter($"doc_id" % 50 === 0)
      .createOrReplaceTempView("q_colliding_docs")
    val coll = spark.sql(
      "SELECT * FROM bm25_topk('documents', 'q_colliding_docs')").collect()
    assert(coll.forall(r => r.getLong(1) != r.getLong(0)),
      "a corpus-id query ranked itself — the s12 convention broke")
    // vector side: an offset query's top hit is its own vector, sim ~1
    sources.Tables.embeddings(spark, sf).filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + Off).as("vec_id"), $"embedding")
      .createOrReplaceTempView("q_offset_emb")
    val koff = spark.sql(
      "SELECT * FROM knn_topk('embeddings', 'q_offset_emb', 1)").collect()
    assert(koff.nonEmpty)
    assert(koff.forall(r => r.getLong(1) == r.getLong(0) - Off &&
      r.getDouble(2) > 0.999999),
      "an offset query's nearest neighbour is not its own source vector")
  }

  test("bm25_serve / knn_serve TVFs: stored-index serving == the " +
      "inline build, through a real write/read cycle") {
    // the index-lifecycle half of the SQL closure: build once (w12's
    // layouts), serve the stored artifact — and the serve must be
    // row-identical to the inline TVF (the w12 oracle identity on the
    // lexical side; frozen quantizer + stored assignment on the IVF
    // side). A bogus dir must FAIL, proving the stored path is real.
    register()
    import spark.implicits._
    val lexDir = java.nio.file.Files
      .createTempDirectory("graft_tvf_lexserve").toString
    sources.Writers.rmrf(new java.io.File(lexDir))
    val (p, sz) = operators.Similarity
      .lexIndex(sources.Tables.documents(spark, sf))
    sources.Writers.writeLexIndex(p, sz, lexDir)
    val served = spark.sql(s"SELECT * FROM bm25_serve('$lexDir')")
    assert(canon(served) ==
      canon(spark.sql("SELECT * FROM bm25_topk('documents')")))
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft_tvf_ivfserve").toString
    sources.Writers.rmrf(new java.io.File(ivfDir))
    val emb = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding",
        operators.Similarity.norm($"embedding").as("nrm"))
    val cents = emb
      .filter($"vec_id" % operators.Similarity.centModulusFor(spark, sf)
        === 7)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"),
        $"nrm".as("c_nrm"))
    sources.Writers.writeIvfIndex(cents,
      operators.Similarity.ivfAssignment(emb, cents), ivfDir)
    val kserved = spark.sql(
      s"SELECT * FROM knn_serve('$ivfDir', 'embeddings')")
    assert(canon(kserved) ==
      canon(spark.sql("SELECT * FROM knn_topk('embeddings')")))
    // the explicit-query forms over the STORED artifacts reproduce
    // their defaults (round-15 ask #1 on the serve twins)
    sources.Tables.documents(spark, sf).filter($"doc_id" % 50 === 0)
      .createOrReplaceTempView("q_slice_docs_serve")
    assert(canon(spark.sql(
        s"SELECT * FROM bm25_serve('$lexDir', 'q_slice_docs_serve')")) ==
      canon(served))
    sources.Tables.embeddings(spark, sf).filter($"vec_id" % 50 === 0)
      .createOrReplaceTempView("q_slice_emb_serve")
    assert(canon(spark.sql(s"SELECT * FROM knn_serve('$ivfDir', " +
        "'embeddings', 'q_slice_emb_serve')")) ==
      canon(kserved))
    // an ARBITRARY query view through the READ-PRUNED stored path
    // (round-17: the explicit-query serve semi-joins the lists against
    // the view's probed cells) must equal the inline probe verbatim —
    // the pruning is a semantic no-op by construction, and this pin
    // would catch a dropped cell
    sources.Tables.embeddings(spark, sf).filter($"vec_id" % 50 === 7)
      .createOrReplaceTempView("q_alt_emb_serve")
    assert(canon(spark.sql(s"SELECT * FROM knn_serve('$ivfDir', " +
        "'embeddings', 'q_alt_emb_serve')")) ==
      canon(spark.sql(
        "SELECT * FROM knn_topk('embeddings', 'q_alt_emb_serve')")),
      "the read-pruned arbitrary-view serve diverged from the inline probe")
    // engagement probe: a dir with no index must fail loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM bm25_serve('/nonexistent/graft_idx')")
        .collect()
    }
  }

  test("bm25_topk / bm25_serve: free-text query => '<text>' == the " +
      "one-row explicit view, and ranks the full corpus") {
    // round-16 verdict ask #3: a SQL user's very first prompt is a
    // string, not a registered view. The literal must flow through the
    // SAME explicit-view path (one-row relation under FreeTextQueryId)
    // — pinned verbatim against a hand-registered one-row view — and
    // the negative id must put the query OUTSIDE the corpus namespace,
    // so no self-exclusion fires and the query's own source doc can
    // surface.
    register()
    import spark.implicits._
    val sample = sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 50 === 0)
      .select($"doc_id", $"text").orderBy($"doc_id").limit(1)
      .collect()(0)
    val (srcId, text) = (sample.getLong(0), sample.getString(1))
    val lit = text.replace("\\", "\\\\").replace("'", "''")
    Seq((plans.RetrievalTvfs.FreeTextQueryId, text)).toDF("doc_id", "text")
      .createOrReplaceTempView("q_free_view")
    val viaText = spark.sql(
      s"SELECT * FROM bm25_topk('documents', query => '$lit')")
    val viaView = spark.sql(
      "SELECT * FROM bm25_topk('documents', 'q_free_view')")
    assert(canon(viaText) == canon(viaView),
      "free-text form must equal the one-row explicit-view form verbatim")
    val rows = viaText.collect()
    assert(rows.nonEmpty &&
      rows.forall(_.getLong(0) == plans.RetrievalTvfs.FreeTextQueryId))
    assert(rows.exists(_.getLong(1) == srcId),
      "a full-document free-text query did not surface its source doc — " +
        "self-exclusion leaked into the free-text namespace")
    // k composes with the named argument
    val k1 = spark.sql(
      s"SELECT * FROM bm25_topk('documents', query => '$lit', 1)")
    assert(k1.collect().forall(_.getInt(2) <= 1))
    // the serve twin takes the same form, against a stored index
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_freeserve").toString
    sources.Writers.rmrf(new java.io.File(dir))
    val (p, sz) = operators.Similarity
      .lexIndex(sources.Tables.documents(spark, sf))
    sources.Writers.writeLexIndex(p, sz, dir)
    assert(canon(spark.sql(
        s"SELECT * FROM bm25_serve('$dir', query => '$lit')")) ==
      canon(viaText),
      "bm25_serve's free-text form must equal bm25_topk's")
    // misuse fails loudly: free text + an explicit query view is
    // ambiguous, and unknown named arguments are rejected
    intercept[Exception](spark.sql(
      s"SELECT * FROM bm25_topk('documents', 'q_free_view', query => 'x')"))
    intercept[Exception](spark.sql(
      "SELECT * FROM bm25_topk('documents', foo => 'x')"))
  }

  test("bm25_serve on a V2 (g-hash-bucketed) index: pruned serve == " +
      "v1 serve == inline, through real write/read cycles") {
    // round-17 verdict ask #1: the lexical layout revision. The v2
    // artifact must serve ROW-IDENTICALLY to the v1 artifact and the
    // inline build for an arbitrary query view AND free text — the
    // bucketed write, the stamp dispatch, the bucket-set collect and
    // the pruned-read df regroup all sit under this pin (a shingle
    // scattered across buckets would split its df and change scores;
    // a bucket pruned wrongly would drop rows). PlanSpec separately
    // asserts the EXECUTED scan's partition metrics.
    register()
    import spark.implicits._
    val docs = sources.Tables.documents(spark, sf)
    val (p, sz) = operators.Similarity.lexIndex(docs)
    val v1Dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_lexv1").toString
    val v2Dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_lexv2").toString
    Seq(v1Dir, v2Dir).foreach(d => sources.Writers.rmrf(new java.io.File(d)))
    sources.Writers.writeLexIndex(p, sz, v1Dir)
    // two v2 legs under one frozen B — the w13 admission cycle
    sources.Writers.writeLexIndexV2(p.filter($"doc_id" % 2 === 0),
      sz.filter($"doc_id" % 2 === 0), v2Dir, buckets = 32)
    sources.Writers.writeLexIndexV2(p.filter($"doc_id" % 2 === 1),
      sz.filter($"doc_id" % 2 === 1), v2Dir, buckets = 32,
      org.apache.spark.sql.SaveMode.Append)
    assert(sources.Writers.lexLayoutOf(spark, v2Dir).contains(32))
    assert(sources.Writers.lexLayoutOf(spark, v1Dir).isEmpty)
    // arbitrary query view (NOT the default slice; ids stay in the
    // corpus namespace so self-exclusion semantics ride along)
    docs.filter($"doc_id" % 97 === 11)
      .createOrReplaceTempView("q_v2_docs")
    assert(spark.table("q_v2_docs").count() > 0, "fixture drift: empty view")
    val inline = spark.sql(
      "SELECT * FROM bm25_topk('documents', 'q_v2_docs')")
    assert(canon(spark.sql(
        s"SELECT * FROM bm25_serve('$v2Dir', 'q_v2_docs')")) ==
      canon(inline),
      "v2 pruned serve diverged from the inline build")
    assert(canon(spark.sql(
        s"SELECT * FROM bm25_serve('$v1Dir', 'q_v2_docs')")) ==
      canon(inline),
      "v1 serve diverged from the inline build")
    // free text through the pruned path == the v1 full read
    val sample = docs.filter($"doc_id" % 50 === 0)
      .select($"text").orderBy($"doc_id").limit(1)
      .collect()(0).getString(0)
    val lit = sample.replace("\\", "\\\\").replace("'", "''")
    assert(canon(spark.sql(
        s"SELECT * FROM bm25_serve('$v2Dir', query => '$lit')")) ==
      canon(spark.sql(
        s"SELECT * FROM bm25_serve('$v1Dir', query => '$lit')")),
      "v2 free-text serve diverged from v1")
    // sub-shingle free text degrades to empty on the pruned path too
    assert(spark.sql(
      s"SELECT * FROM bm25_serve('$v2Dir', query => 'ab')")
      .collect().isEmpty)
    // default-slice form over a v2 tree: layout-transparent full read
    assert(canon(spark.sql(s"SELECT * FROM bm25_serve('$v2Dir')")) ==
      canon(spark.sql(s"SELECT * FROM bm25_serve('$v1Dir')")),
      "default-slice serve must be layout-transparent")
    // appending under a DIFFERENT bucket count must fail loudly — it
    // would scatter shingles across buckets and break pruning/df
    val ex = intercept[IllegalArgumentException] {
      sources.Writers.writeLexIndexV2(p, sz, v2Dir, buckets = 8,
        org.apache.spark.sql.SaveMode.Append)
    }
    assert(ex.getMessage.contains("buckets"))
    Seq(v1Dir, v2Dir).foreach(d => sources.Writers.rmrf(new java.io.File(d)))
  }

  test("v2 ADMISSION legs: a legged v2 index serves identically to " +
      "the inline build, replays idempotently, and rejects a leg " +
      "with a different B") {
    // the layout revision composed with the streaming lifecycle
    // (round-17 verdict stretch): st22's per-batch leg shape writing
    // INTO the v2 bucket layout — three legs covering the corpus must
    // serve (pruned) exactly like one inline build, a replayed leg
    // must byte-preserve the stored index (the overwrite contract at
    // the v2 depth), and a leg under a different bucket count must
    // fail loudly before scattering shingles.
    register()
    import spark.implicits._
    val docs = sources.Tables.documents(spark, sf)
    val (p, sz) = operators.Similarity.lexIndex(docs)
    val pc = p.localCheckpoint()
    val szc = sz.localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_lexv2leg").toString
    sources.Writers.rmrf(new java.io.File(dir))
    val B = 32
    (0 until 3).foreach { k =>
      sources.Writers.writeLexIndexV2Leg(pc.filter($"doc_id" % 3 === k),
        szc.filter($"doc_id" % 3 === k), dir, s"00$k", B)
    }
    assert(sources.Writers.lexLayoutOf(spark, dir).contains(B))
    docs.filter($"doc_id" % 97 === 11)
      .createOrReplaceTempView("q_v2leg_docs")
    val served = spark.sql(
      s"SELECT * FROM bm25_serve('$dir', 'q_v2leg_docs')")
    assert(canon(served) == canon(spark.sql(
        "SELECT * FROM bm25_topk('documents', 'q_v2leg_docs')")),
      "legged v2 pruned serve diverged from the inline build")
    // replay idempotence: re-admit leg 001's batch verbatim; the
    // stored index must be row-identical (count + order-independent
    // content hash on both legs of the layout)
    def indexSig(): (Long, Long, Long, Long) = {
      import org.apache.spark.sql.functions.xxhash64
      val pp = spark.read.parquet(s"$dir/postings")
        .withColumn("h", xxhash64($"g", $"doc_id", $"gb"))
      val ss = spark.read.parquet(s"$dir/sizes")
        .withColumn("h", xxhash64($"doc_id", $"n"))
      (pp.count(), pp.selectExpr("bit_xor(h)").head.getLong(0),
        ss.count(), ss.selectExpr("bit_xor(h)").head.getLong(0))
    }
    val before = indexSig()
    sources.Writers.writeLexIndexV2Leg(pc.filter($"doc_id" % 3 === 1),
      szc.filter($"doc_id" % 3 === 1), dir, "001", B)
    assert(indexSig() == before,
      "replayed leg 001 changed the stored v2 index")
    // a leg under a different B must fail loudly
    val ex = intercept[IllegalArgumentException] {
      sources.Writers.writeLexIndexV2Leg(pc, szc, dir, "bad", B * 2)
    }
    assert(ex.getMessage.contains("buckets"))
    sources.Writers.rmrf(new java.io.File(dir))
  }

  test("hybrid_serve TVF: stored-artifact fusion == inline " +
      "hybrid_topk, and a bogus dir fails loudly") {
    // round-17 verdict ask #2: stored-artifact hybrid retrieval at
    // the SQL prompt. Serving the two stored legs (w12 lexical + w07
    // IVF, built from the same corpus) through the shared RRF fusion
    // must be row-identical to the inline hybrid_topk — the paired-
    // identity contract both artifacts share by construction.
    register()
    import spark.implicits._
    val lexDir = java.nio.file.Files
      .createTempDirectory("graft_tvf_hyblex").toString
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft_tvf_hybivf").toString
    Seq(lexDir, ivfDir).foreach(d =>
      sources.Writers.rmrf(new java.io.File(d)))
    val (p, sz) = operators.Similarity
      .lexIndex(sources.Tables.documents(spark, sf))
    sources.Writers.writeLexIndex(p, sz, lexDir)
    val emb = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding",
        operators.Similarity.norm($"embedding").as("nrm"))
    val cents = emb
      .filter($"vec_id" % operators.Similarity.centModulusFor(spark, sf)
        === 7)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"),
        $"nrm".as("c_nrm"))
    sources.Writers.writeIvfIndex(cents,
      operators.Similarity.ivfAssignment(emb, cents), ivfDir)
    val served = spark.sql(
      s"SELECT * FROM hybrid_serve('$lexDir', '$ivfDir', 'embeddings')")
    assert(canon(served) == canon(spark.sql(
        "SELECT * FROM hybrid_topk('documents', 'embeddings')")),
      "stored-artifact hybrid serve diverged from the inline fusion")
    // k overrides compose
    val k1 = spark.sql(
      s"SELECT * FROM hybrid_serve('$lexDir', '$ivfDir', 'embeddings', 1)")
    assert(k1.collect().nonEmpty && k1.collect().forall(_.getInt(3) <= 1))
    // a v2 lexical artifact serves the default slice identically, so
    // hybrid_serve is layout-agnostic on its lexical leg
    val v2Dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_hyblex2").toString
    sources.Writers.rmrf(new java.io.File(v2Dir))
    sources.Writers.writeLexIndexV2(p, sz, v2Dir, buckets = 16)
    assert(canon(spark.sql(
        s"SELECT * FROM hybrid_serve('$v2Dir', '$ivfDir', 'embeddings')")) ==
      canon(served))
    intercept[Exception] {
      spark.sql(
        s"SELECT * FROM hybrid_serve('/nonexistent/graft_lex', '$ivfDir', " +
          "'embeddings')").collect()
    }
    Seq(lexDir, ivfDir, v2Dir).foreach(d =>
      sources.Writers.rmrf(new java.io.File(d)))
  }

  test("index_fsck on a V2 index: misbucketed_postings appended, " +
      "zero when clean, fires on a file moved across buckets") {
    // the v2 layout's own integrity class: a posting file in the
    // wrong gb dir is invisible to every pruned serve that should
    // have scored its rows — the stamp-dispatched check must catch
    // exactly that, and must NOT appear for v1 artifacts.
    register()
    import spark.implicits._
    val docs = sources.Tables.documents(spark, sf)
    docs.createOrReplaceTempView("fsck_v2_docs")
    val (p, sz) = operators.Similarity.lexIndex(docs)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fsck_v2").toString
    sources.Writers.rmrf(new java.io.File(dir))
    sources.Writers.writeLexIndexV2(p, sz, dir, buckets = 16)
    def checksOf(q: String): Map[String, Long] =
      spark.sql(q).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val clean = checksOf(
      s"SELECT * FROM index_fsck('$dir', 'fsck_v2_docs')")
    assert(clean.contains("misbucketed_postings"),
      "v2 stamp did not append the bucket-integrity check")
    assert(clean.values.forall(_ == 0L),
      s"clean v2 index must audit to all-zeros: $clean")
    // corrupt: copy one posting file into a DIFFERENT bucket dir
    val (fs, root) = sources.Writers.fsOf(spark, s"$dir/postings")
    val gbDirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gb="))
      .map(_.getPath).sortBy(_.getName)
    assert(gbDirs.length >= 2, "fixture drift: need >=2 bucket dirs")
    val srcFile = fs.listStatus(gbDirs.head)
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val dstFile = new org.apache.hadoop.fs.Path(
      gbDirs.last, "misplaced-" + srcFile.getName)
    org.apache.hadoop.fs.FileUtil.copy(fs, srcFile, fs, dstFile, false,
      spark.sparkContext.hadoopConfiguration)
    val dirty = checksOf(
      s"SELECT * FROM index_fsck('$dir', 'fsck_v2_docs')")
    assert(dirty("misbucketed_postings") > 0L,
      "a posting file moved across buckets did not fire the check")
    sources.Writers.rmrf(new java.io.File(dir))
  }

  test("degenerate query inputs return EMPTY results, never throw: " +
      "an empty query view through the pruned serve, a sub-shingle text") {
    // edge contract pins: (a) an EMPTY query view through knn_serve's
    // read-pruned path builds an empty probed-cell filter (isin with
    // zero values) — the scan prunes to nothing and the serve returns
    // zero rows, it must not fail at analysis; (b) a free-text query
    // shorter than one 3-token shingle has no query postings, so BM25
    // returns zero rows — a prompt typo degrades, it doesn't error.
    register()
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tvf_edge_idx").toString
    sources.Writers.rmrf(new java.io.File(dir))
    val emb = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding",
        operators.Similarity.norm($"embedding").as("nrm"))
    val cents = emb
      .filter($"vec_id" % operators.Similarity.centModulusFor(spark, sf)
        === 7)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"),
        $"nrm".as("c_nrm"))
    sources.Writers.writeIvfIndex(cents,
      operators.Similarity.ivfAssignment(emb, cents), dir)
    sources.Tables.embeddings(spark, sf).filter($"vec_id" < 0)
      .createOrReplaceTempView("q_empty_emb")
    assert(spark.sql(s"SELECT * FROM knn_serve('$dir', 'embeddings', " +
      "'q_empty_emb')").collect().isEmpty)
    assert(spark.sql(
      "SELECT * FROM bm25_topk('documents', query => 'ab')")
      .collect().isEmpty)
    sources.Writers.rmrf(new java.io.File(dir))
  }

  test("graft_refresh TVF: reports eviction state per memo") {
    // the memo-invalidation verb's SQL surface (PlanSpec pins the
    // re-count behavior; here: the returned row is honest about
    // whether anything was evicted)
    register()
    val r0 = spark.sql(
      "SELECT * FROM graft_refresh('graft_no_such_view')").collect()(0)
    assert(r0.getString(0) == "graft_no_such_view" &&
      !r0.getBoolean(1) && !r0.getBoolean(2))
    sources.Tables.embeddings(spark, sf)
      .createOrReplaceTempView("emb_refresh_v")
    spark.sql("SELECT * FROM knn_topk('emb_refresh_v')") // populates memo
    val r1 = spark.sql(
      "SELECT * FROM graft_refresh('emb_refresh_v')").collect()(0)
    assert(r1.getBoolean(1), "a populated count memo must report eviction")
  }

  test("table_fsck TVF: zeros on a clean chain, flips on corruption") {
    // the audit family's operational surface: point the fsck at any
    // chain dir from SQL. Clean chain -> all four checks zero; delete
    // one claimed bucket dir outside the vacuum protocol -> the
    // dangling check flips, through the exact manifestAuditChecks
    // arithmetic dq08's oracle hash-verifies.
    register()
    import spark.implicits._
    val dest = java.nio.file.Files
      .createTempDirectory("graft_tvf_fsck").toString
    sources.Writers.rmrf(new java.io.File(dest))
    val cutoff = "1997-01-01"
    val orders = sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate",
        $"o_orderstatus", $"o_totalprice")
    operators.WriterQueries.scd2WriteVersion(
      operators.WriterQueries.scd2History(operators.WriterQueries
        .scd2Changes(orders.filter($"o_orderdate" < cutoff))), dest, 0L)
    operators.WriterQueries.scd2MergeStep(dest, 0L,
      orders.filter($"o_orderdate" >= cutoff))
    def fsck(): Map[String, Long] =
      spark.sql(s"SELECT * FROM table_fsck('$dest')").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val clean = fsck()
    assert(clean.keySet == Set("dangling_claims", "misrouted_rows",
      "stale_claims", "unmanifested_buckets"))
    clean.foreach { case (k, n) => assert(n == 0L, s"clean chain $k=$n") }
    // external retention outside the vacuum protocol
    val (fs, root) = sources.Writers.fsOf(spark, dest)
    val claimed = operators.WriterQueries
      .scd2DiskBuckets(spark, dest).collectFirst { case (b, 1L) => b }
    assert(claimed.nonEmpty, "chain has no v1 buckets to corrupt")
    fs.delete(new org.apache.hadoop.fs.Path(root,
      s"v1/bucket=${claimed.get}"), true)
    assert(fsck()("dangling_claims") == 1L, "fsck missed the corruption")
  }

  test("index_fsck TVF: zeros on clean lex + IVF indexes, all checks " +
      "flip on corruption, layout auto-detected") {
    // round-15 verdict ask #2: table_fsck covered the SCD2 chain but
    // the two INDEX audits (dq06/dq07) ran only inside fixture-bound
    // builders. Both layouts are exercised through REAL write cycles;
    // the corruption is dq06/dq07's own staleness recipe (snapshot
    // index vs a corpus with additions + deletions + drift), so every
    // check fires on a data-derived count.
    register()
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, substring_index, transform, when}
    def checksOf(sql: String): Map[String, Long] =
      spark.sql(sql).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // LEXICAL: index the even-doc snapshot, audit against it -> zeros
    val docs = sources.Tables.documents(spark, sf)
    docs.filter($"doc_id" % 2 === 0).createOrReplaceTempView("fsck_snap_docs")
    val lexDir = java.nio.file.Files
      .createTempDirectory("graft_idxfsck_lex").toString
    sources.Writers.rmrf(new java.io.File(lexDir))
    val (p, sz) = operators.Similarity
      .lexIndex(spark.table("fsck_snap_docs"))
    sources.Writers.writeLexIndex(p, sz, lexDir)
    val clean = checksOf(s"SELECT * FROM index_fsck('$lexDir', 'fsck_snap_docs')")
    assert(clean.keySet == Set("missing_docs", "orphaned_docs",
      "orphaned_postings", "size_drift"))
    assert(clean.values.forall(_ == 0L),
      s"clean lexical index audited non-zero: $clean")
    // the corpus as it stands "now": odd docs appeared (missing_docs),
    // some evens deleted (orphaned_*), some texts truncated (size_drift)
    docs.filter($"doc_id" % 11 =!= 5)
      .select($"doc_id",
        when($"doc_id" % 13 === 2, substring_index($"text", " ", 20))
          .otherwise($"text").as("text"))
      .createOrReplaceTempView("fsck_cur_docs")
    val dirty = checksOf(s"SELECT * FROM index_fsck('$lexDir', 'fsck_cur_docs')")
    assert(dirty("missing_docs") > 0 && dirty("orphaned_docs") > 0 &&
      dirty("orphaned_postings") > 0 && dirty("size_drift") > 0,
      s"lexical corruption did not fire all four checks: $dirty")
    // IVF: index the even-vec snapshot under a frozen sampled
    // quantizer, audit against it -> zeros
    val emb = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding",
        operators.Similarity.norm($"embedding").as("nrm"))
    val snap = emb.filter($"vec_id" % 2 === 0)
    snap.select($"vec_id", $"embedding")
      .createOrReplaceTempView("fsck_snap_emb")
    // remainder 8, not the registry's 7: the snapshot is the EVEN ids
    // and centModulus is even at any scale, so `% mod === 7` would
    // select zero centroids (an empty centroids/ dir can't even be
    // read back)
    val cents = snap
      .filter($"vec_id" % operators.Similarity.centModulus(snap.count()) === 8)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"),
        $"nrm".as("c_nrm"))
    assert(cents.count() > 0, "degenerate test fixture: no centroids")
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft_idxfsck_ivf").toString
    sources.Writers.rmrf(new java.io.File(ivfDir))
    sources.Writers.writeIvfIndex(cents,
      operators.Similarity.ivfAssignment(snap, cents), ivfDir)
    val kclean = checksOf(s"SELECT * FROM index_fsck('$ivfDir', 'fsck_snap_emb')")
    assert(kclean.keySet == Set("missing_vecs", "orphaned_vecs",
      "assignment_drift"))
    assert(kclean.values.forall(_ == 0L),
      s"clean IVF index audited non-zero: $kclean")
    // "now": odd vecs appeared, some evens deleted, some re-embedded
    // (negation moves the nearest-centroid argmax deterministically)
    sources.Tables.embeddings(spark, sf).filter($"vec_id" % 11 =!= 5)
      .select($"vec_id",
        transform($"embedding",
          x => x * when($"vec_id" % 13 === 2, lit(-1.0f))
            .otherwise(lit(1.0f))).as("embedding"))
      .createOrReplaceTempView("fsck_cur_emb")
    val kdirty = checksOf(s"SELECT * FROM index_fsck('$ivfDir', 'fsck_cur_emb')")
    assert(kdirty("missing_vecs") > 0 && kdirty("orphaned_vecs") > 0 &&
      kdirty("assignment_drift") > 0,
      s"IVF corruption did not fire all three checks: $kdirty")
    // a dir that is no index at all fails loudly at build
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM index_fsck('/nonexistent/graft_x', 'documents')")
    }
    assert(e.getMessage.contains("not a stored index"),
      s"unexpected: ${e.getMessage}")
  }

  test("neardup_pairs TVF: SQL call == d03's registered plan") {
    // dedup-family SQL closure (the bm25_topk motivation applied to
    // the most operationally used pipeline): the TVF returns
    // minhashPairsOf's logical plan verbatim, so equality here rides
    // d03's hash-verified oracle transitively.
    register()
    val viaSql = spark.sql("SELECT * FROM neardup_pairs('documents')")
    val viaDsl = SparkEntry.queries("d03_minhash_lsh")(spark, sf)
    assert(viaSql.columns.sorted.sameElements(viaDsl.columns.sorted))
    assert(canon(viaSql) == canon(viaDsl))
  }

  test("dedup_clusters TVF: SQL call == d06b's registered plan, and " +
      "composes over a filtered view") {
    register()
    val viaSql = spark.sql("SELECT * FROM dedup_clusters('documents')")
    val viaDsl = SparkEntry.queries("d06b_dup_clusters_lsh")(spark, sf)
    assert(viaSql.columns.sorted.sameElements(viaDsl.columns.sorted))
    assert(canon(viaSql) == canon(viaDsl))
    // the named relation must BITE: clustering half the corpus is not
    // the full answer restricted (pairs across the cut disappear)
    import spark.implicits._
    sources.Tables.documents(spark, sf).filter($"doc_id" % 2 === 0)
      .createOrReplaceTempView("docs_even_dc")
    val half = spark.sql("SELECT * FROM dedup_clusters('docs_even_dc')")
    assert(half.filter($"doc_id" % 2 =!= 0).isEmpty)
    assert(canon(half) != canon(viaDsl))
  }

  test("dedup_clusters memoizes the plan-build contraction per view " +
      "definition and re-arms on re-registration") {
    // round-15 verdict "what's wrong" #1, the heavier half: the star
    // contraction ran its full driver-rounds clustering on EVERY
    // spark.sql of the same text (even EXPLAIN). The memo must make
    // repeat invocations splice the cached plan (zero clustering
    // jobs) and a changed view definition re-cluster.
    register()
    import spark.implicits._
    sources.Tables.documents(spark, sf)
      .createOrReplaceTempView("docs_cc_memo")
    val m0 = plans.TvfClusterPlans.misses
    val first = spark.sql("SELECT * FROM dedup_clusters('docs_cc_memo')")
    assert(plans.TvfClusterPlans.misses - m0 == 1)
    val second = spark.sql("SELECT * FROM dedup_clusters('docs_cc_memo')")
    spark.sql("SELECT * FROM dedup_clusters('docs_cc_memo')").explain()
    assert(plans.TvfClusterPlans.misses - m0 == 1,
      "repeat invocations (and EXPLAIN) must reuse the memoized plan")
    assert(canon(second) == canon(first))
    sources.Tables.documents(spark, sf).filter($"doc_id" % 2 === 0)
      .createOrReplaceTempView("docs_cc_memo")
    val third = spark.sql("SELECT * FROM dedup_clusters('docs_cc_memo')")
    assert(plans.TvfClusterPlans.misses - m0 == 2,
      "a re-registered view definition must re-cluster")
    assert(third.filter($"doc_id" % 2 =!= 0).isEmpty)
  }

  test("retrieval TVFs reject malformed arguments loudly") {
    register()
    // a non-positive k still fails the literal check ('five' would now
    // parse as a query-VIEW name under the round-16 grammar and fail
    // at catalog resolution instead — also loudly)
    val badK = intercept[Exception] {
      spark.sql("SELECT * FROM bm25_topk('documents', 0)").collect()
    }
    assert(badK.getMessage.contains("positive integer literal"),
      s"unexpected: ${badK.getMessage}")
    val badView = intercept[Exception] {
      spark.sql("SELECT * FROM bm25_topk('documents', 'no_such_view_xyz')")
        .collect()
    }
    assert(badView.getMessage.contains("no_such_view_xyz"),
      s"unexpected: ${badView.getMessage}")
    val badTable = intercept[Exception] {
      spark.sql("SELECT * FROM hybrid_topk('documents')").collect()
    }
    assert(badTable.getMessage.contains("string literals") ||
      badTable.getMessage.contains("usage:"),
      s"unexpected: ${badTable.getMessage}")
  }
}
