package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Scalar function surface (SURVEY.md §2.7, Appendix A): string, date,
  * math, conditional, and hash families exercised over the fixture
  * tables with cross-engine oracles. All expressions are Spark builtins
  * (codegen'd) — the reference's 230 scalar UDFs map onto these
  * (241/287 name-identical; gap functions in graft.functions). */
object Functions {

  val q39StringFuncs: Q = Q(
    "q39_string_funcs",
    """SELECT c_custkey,
      |  upper(c_name) AS uname,
      |  length(c_name) AS name_len,
      |  reverse(c_mktsegment) AS rseg,
      |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS natpad,
      |  concat(c_name, '|', c_mktsegment) AS tagged,
      |  substr(c_name, 10, 9) AS name_id,
      |  strpos(c_name, '#') AS hash_pos,
      |  replace(c_name, 'Customer#', '') AS bare_id,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS xseg,
      |  split_part(c_name, '#', 2) AS id_part,
      |  trim(concat('  ', c_mktsegment, ' ')) AS trimmed
      |FROM customer WHERE c_custkey < 500""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d).filter($"c_custkey" < 500).select(
      $"c_custkey",
      upper($"c_name").as("uname"),
      length($"c_name").as("name_len"),
      reverse($"c_mktsegment").as("rseg"),
      lpad($"c_nationkey".cast("string"), 4, "0").as("natpad"),
      concat($"c_name", lit("|"), $"c_mktsegment").as("tagged"),
      substring($"c_name", 10, 9).as("name_id"),
      instr($"c_name", "#").as("hash_pos"),
      regexp_replace($"c_name", "Customer#", "").as("bare_id"),
      translate($"c_mktsegment", "AEIOU", "aeiou").as("xseg"),
      element_at(split($"c_name", "#"), 2).as("id_part"),
      trim(concat(lit("  "), $"c_mktsegment", lit(" "))).as("trimmed"))
  }

  val q40DateFuncs: Q = Q(
    "q40_date_funcs",
    """SELECT o_orderkey,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(extract(year FROM o_orderdate) AS INT) AS yr,
      |  CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
      |  CAST(extract(month FROM o_orderdate) AS INT) AS mth,
      |  CAST(extract(day FROM o_orderdate) AS INT) AS dom,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
      |       AS INT) AS days_since,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts
      |FROM orders WHERE o_orderkey < 1000""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d).filter($"o_orderkey" < 1000).select(
      $"o_orderkey",
      date_trunc("month", $"o_orderdate").as("month_start"),
      year($"o_orderdate").as("yr"),
      quarter($"o_orderdate").as("qtr"),
      month($"o_orderdate").as("mth"),
      dayofmonth($"o_orderdate").as("dom"),
      last_day($"o_orderdate").as("month_end"),
      datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
        .as("days_since"),
      unix_timestamp($"o_orderdate").as("unix_ts"))
  }

  val q41MathFuncs: Q = Q(
    "q41_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  round(sqrt(l_quantity), 6) AS sqrt_qty,
      |  round(ln(l_extendedprice), 6) AS ln_price,
      |  round(pow(1.0 + l_discount, 2), 6) AS growth_sq,
      |  round(abs(l_quantity - 25.0), 2) AS dev_qty,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
      |  l_orderkey % 7 AS mod7,
      |  CAST(l_linenumber << 2 AS INT) AS shifted,
      |  CAST(l_linenumber & 3 AS INT) AS anded,
      |  CAST(xor(l_linenumber, 5) AS INT) AS xored,
      |  to_base(l_linenumber, 16) AS hexed,
      |  round(greatest(l_quantity, l_discount * 100.0), 2) AS gmax,
      |  CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sgn
      |FROM lineitem WHERE l_orderkey < 200""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).filter($"l_orderkey" < 200).select(
      $"l_orderkey", $"l_linenumber",
      round(sqrt($"l_quantity"), 6).as("sqrt_qty"),
      round(log($"l_extendedprice"), 6).as("ln_price"),
      round(pow(lit(1.0) + $"l_discount", 2), 6).as("growth_sq"),
      round(abs($"l_quantity" - 25.0), 2).as("dev_qty"),
      floor($"l_extendedprice").as("floor_price"),
      ceil($"l_extendedprice").as("ceil_price"),
      ($"l_orderkey" % 7).as("mod7"),
      shiftleft($"l_linenumber", 2).as("shifted"),
      $"l_linenumber".bitwiseAND(3).as("anded"),
      $"l_linenumber".bitwiseXOR(5).as("xored"),
      hex($"l_linenumber").as("hexed"),
      round(greatest($"l_quantity", $"l_discount" * 100.0), 2).as("gmax"),
      signum($"l_quantity" - 25.0).as("sgn"))
  }

  val q42Conditionals: Q = Q(
    "q42_conditionals",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 300000 THEN 'high'
      |       WHEN o_totalprice > 100000 THEN 'mid'
      |       ELSE 'low' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
      |  if(o_orderpriority = '1-URGENT', 1, 0) AS urgent,
      |  least(o_totalprice, 250000.0) AS capped
      |FROM orders WHERE o_orderkey < 2000""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d).filter($"o_orderkey" < 2000).select(
      $"o_orderkey",
      when($"o_totalprice" > 300000, "high")
        .when($"o_totalprice" > 100000, "mid")
        .otherwise("low").as("bucket"),
      coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status2"),
      when($"o_orderpriority" === "1-URGENT", 1).otherwise(0).as("urgent"),
      least($"o_totalprice", lit(250000.0)).as("capped"))
  }

  val q43Hash: Q = Q(
    "q43_hash",
    """SELECT c_custkey,
      |  md5(c_name) AS h_md5,
      |  sha256(c_name) AS h_sha256,
      |  base64(CAST(c_mktsegment AS BLOB)) AS b64,
      |  length(md5(c_name)) AS h_len
      |FROM customer WHERE c_custkey < 300""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d).filter($"c_custkey" < 300).select(
      $"c_custkey",
      md5($"c_name").as("h_md5"),
      sha2($"c_name", 256).as("h_sha256"),
      base64($"c_mktsegment".cast("binary")).as("b64"),
      length(md5($"c_name")).as("h_len"))
  }

  /** q43b: `hive_hash` — the reference hash() semantic twin
    * (GenericUDFHash; registered in HiveCompat on Catalyst's codegen'd
    * HiveHash, the hive-bucketing-compat algorithm). For INTEGRAL args
    * Hive's hash is pure arithmetic — a 31-fold of the int values —
    * so the oracle recomputes it exactly, proving the registered
    * function end-to-end; string/bool/null/multi-arg semantics are
    * FunctionSpec-pinned. Users migrating data bucketed on Hive's
    * hash() re-derive their bucket ids with this function. */
  val q43bHiveHash: Q = Q(
    "q43b_hive_hash",
    """SELECT c_custkey,
      |  CAST(31 * c_custkey + c_nationkey AS INT) AS hh
      |FROM customer WHERE c_custkey < 300""".stripMargin) { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.registerAll(s)
    Tables.customer(s, d).filter($"c_custkey" < 300)
      .selectExpr("c_custkey", "hive_hash(c_custkey, c_nationkey) AS hh")
  }

  /** ngrams aggregator over real text (graft custom Aggregator,
    * functions/NGrams.scala). The aggregator's small-k mode prunes
    * partial buffers (partition-dependent estimates — the reference's
    * precision-factor semantics; exact-value FunctionSpec tests pin
    * it). THIS query runs the aggregator in its exact regime instead:
    * k is set far above the corpus' distinct-bigram count, so the
    * prune threshold (4·k) is never reached, every partial count is
    * exact, and the top-5-per-lang rank (freq DESC, bigram ASC
    * tie-break) is recomputable bit-for-bit by the DuckDB oracle.
    * The struct array is flattened to one scalar row per (lang,
    * bigram): the driver's comparator cannot hash array cells. */
  val q44NgramsDocs: Q = Q(
    "q44_ngrams_docs",
    """WITH t AS (SELECT lang, string_split(text, ' ') AS ws
      |           FROM documents),
      |u AS (SELECT lang, ws, unnest(range(1, len(ws))) AS i FROM t),
      |c AS (SELECT lang, ws[i] || ' ' || ws[i+1] AS bigram,
      |        count(*) AS freq
      |      FROM u GROUP BY 1, 2),
      |r AS (SELECT lang, bigram, freq, row_number() OVER (
      |        PARTITION BY lang ORDER BY freq DESC, bigram) AS rk
      |      FROM c)
      |SELECT lang, bigram, CAST(freq AS DOUBLE) AS freq
      |FROM r WHERE rk <= 5""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.registerAll(s)
    Tables.documents(s, d).createOrReplaceTempView("documents_v")
    s.sql(
      """SELECT lang, bigram, freq FROM (
        |  SELECT lang, concat_ws(' ', b.ngram) AS bigram,
        |    b.estfrequency AS freq,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY b.estfrequency DESC, concat_ws(' ', b.ngram)) AS rk
        |  FROM (SELECT lang, ngrams(split(text, ' '), 2, 100000) AS tb
        |        FROM documents_v GROUP BY lang)
        |  LATERAL VIEW explode(tb) t AS b) WHERE rk <= 5""".stripMargin)
  }

  /** context_ngrams: most frequent words following 'the' per language
    * (reference GenericUDAFContextNGrams — null slots are the counted
    * wildcards). Same exact-regime device as q44 (k ≫ distinct
    * followers → no pruning → DuckDB-recomputable); the estimating
    * small-k mode stays pinned in FunctionSpec. */
  val q44bContextNgrams: Q = Q(
    "q44b_context_ngrams",
    """WITH t AS (SELECT lang, string_split(text, ' ') AS ws
      |           FROM documents),
      |u AS (SELECT lang, ws, unnest(range(1, len(ws))) AS i FROM t),
      |c AS (SELECT lang, ws[i + 1] AS follower, count(*) AS freq
      |      FROM u WHERE ws[i] = 'the' GROUP BY 1, 2),
      |r AS (SELECT lang, follower, freq, row_number() OVER (
      |        PARTITION BY lang ORDER BY freq DESC, follower) AS rk
      |      FROM c)
      |SELECT lang, follower, CAST(freq AS DOUBLE) AS freq
      |FROM r WHERE rk <= 5""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.registerAll(s)
    Tables.documents(s, d).createOrReplaceTempView("documents_vb")
    s.sql(
      """SELECT lang, follower, freq FROM (
        |  SELECT lang, concat_ws(' ', b.ngram) AS follower,
        |    b.estfrequency AS freq,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY b.estfrequency DESC, concat_ws(' ', b.ngram)) AS rk
        |  FROM (SELECT lang,
        |          context_ngrams(split(text, ' '),
        |                         array('the', CAST(NULL AS STRING)),
        |                         100000) AS cg
        |        FROM documents_vb GROUP BY lang)
        |  LATERAL VIEW explode(cg) t AS b) WHERE rk <= 5""".stripMargin)
  }


  /** q66: the try_* error-safe family (try_cast / try_divide). The
    * reference's semantics are SILENT-NULL on conversion failure and
    * division by zero (non-ANSI Hive); Spark 4 defaults to ANSI
    * (errors). try_* is the per-expression bridge: NULL-on-error under
    * ANSI, identical to Hive's behavior, without globally disabling
    * ANSI's overflow/cast safety. (FunctionSpec additionally pins that
    * `spark.sql.ansi.enabled=false` reproduces the reference's bare
    * CAST semantics when a user wants whole-session Hive compat.)
    * Oracle: DuckDB TRY_CAST + an explicit zero-guarded division. */
  val q66TryFuncs: Q = Q(
    "q66_try_funcs",
    """SELECT CAST(o_orderkey % 7 AS BIGINT) AS k, count(*) AS n,
      |  CAST(count(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT))
      |    AS BIGINT) AS n_valid_casts,
      |  CAST(count(*) - count(TRY_CAST(o_orderpriority AS INT))
      |    AS BIGINT) AS n_null_casts,
      |  CAST(sum(CAST(CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |    ELSE o_totalprice / (o_orderkey % 3) END AS DECIMAL(18,6)))
      |    AS DOUBLE) AS div_sum
      |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_totalprice",
        expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").as("vc"),
        expr("try_cast(o_orderpriority AS INT)").as("nc"),
        try_divide($"o_totalprice",
          when($"o_orderkey" % 3 === 0, lit(0))
            .otherwise($"o_orderkey" % 3)).as("dv"))
      .groupBy(($"o_orderkey" % 7).cast("long").as("k"))
      .agg(count(lit(1)).as("n"),
        count($"vc").as("n_valid_casts"),
        (count(lit(1)) - count($"nc")).as("n_null_casts"),
        sum($"dv".cast("decimal(18,6)")).cast("double").as("div_sum"))
  }

  val all: Seq[Q] = Seq(q39StringFuncs, q40DateFuncs, q41MathFuncs,
    q42Conditionals, q43Hash, q43bHiveHash, q44NgramsDocs, q44bContextNgrams,
    q66TryFuncs)
}
