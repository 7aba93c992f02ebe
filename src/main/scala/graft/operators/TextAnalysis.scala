package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines: corpus
  * statistics, quality scoring, token counting, n-gram language ID and
  * winnowing document fingerprints.
  *
  * Everything is map-side higher-order expressions (codegen'd) followed
  * by one aggregation — at 100 TB these are embarrassingly parallel
  * scans whose only shuffle is the final small group-by. */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  /** t01: per-language corpus statistics. */
  val t01CorpusStats: Q = Q(
    "t01_corpus_stats",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
      |  round(avg(length(text)), 4) AS avg_chars,
      |  round(avg(n_chars), 4) AS avg_declared_chars
      |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
    // Oracle integer sums are CAST to BIGINT: DuckDB's sum(int) returns
    // HUGEINT, which pandas narrows to float64 — a driver-side dtype
    // mismatch vs Spark's int64 even when every value is identical. The
    // int-valued averages are exact (integer sums are associative in
    // doubles far below 2^53), so they need no decimal treatment.
    import s.implicits._
    Tables.documents(s, d).groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks($"text")).cast("long")).as("total_tokens"),
        round(avg(size(toks($"text"))), 4).as("avg_tokens"),
        round(avg(length($"text")), 4).as("avg_chars"),
        round(avg($"n_chars"), 4).as("avg_declared_chars"))
  }

  /** t02: per-document quality score — length band, stopword ratio,
    * mean word length, type-token ratio; weighted into [0,1]. The
    * components are the standard heuristic-filter features (C4-style)
    * computed with integer/array expressions only. */
  val t02QualityScore: Q = Q(
    "t02_quality_score",
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    length(text) AS n_chars_actual,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS n_stop,
      |    len(list_distinct(string_split(text, ' '))) AS n_types
      |  FROM documents)
      |SELECT doc_id, lang, n_tokens, n_stop, n_types,
      |  round(CAST(n_chars_actual AS DOUBLE) / n_tokens, 6) AS avg_wordlen,
      |  round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
      |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
      |  round(
      |    0.4 * (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END)
      |    + 0.3 * least(CAST(n_stop AS DOUBLE) / n_tokens * 10.0, 1.0)
      |    + 0.3 * (CAST(n_types AS DOUBLE) / n_tokens), 6) AS quality
      |FROM f""".stripMargin) { (s, d) =>
    import s.implicits._
    val stop = Seq("the", "a", "and", "of", "to")
    val t = toks($"text")
    Tables.documents(s, d).select(
      $"doc_id", $"lang",
      size(t).as("n_tokens"),
      length($"text").as("n_chars_actual"),
      size(filter(t, x => x.isInCollection(stop))).as("n_stop"),
      size(array_distinct(t)).as("n_types"))
      .select($"doc_id", $"lang", $"n_tokens", $"n_stop", $"n_types",
        round($"n_chars_actual".cast("double") / $"n_tokens", 6)
          .as("avg_wordlen"),
        round($"n_stop".cast("double") / $"n_tokens", 6).as("stop_ratio"),
        round($"n_types".cast("double") / $"n_tokens", 6).as("ttr"),
        round(
          lit(0.4) * when($"n_tokens".between(20, 80), 1.0).otherwise(0.5)
            + lit(0.3) * least($"n_stop".cast("double") / $"n_tokens" * 10.0,
              lit(1.0))
            + lit(0.3) * ($"n_types".cast("double") / $"n_tokens"), 6)
          .as("quality"))
  }

  /** t03: token counting — whitespace tokens, regex word tokens, and a
    * BPE-ish subword estimate (≈ chars/4, the common ~4-chars-per-token
    * heuristic). */
  val t03TokenCount: Q = Q(
    "t03_token_count",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+')) AS word_tokens,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS subword_est
      |FROM documents""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select($"doc_id",
      size(toks($"text")).as("ws_tokens"),
      size(regexp_extract_all($"text", lit("[a-z]+"), lit(0)))
        .as("word_tokens"),
      ceil(length($"text") / 4.0).as("subword_est"))
  }

  /** t04: n-gram language ID, trained in-pipeline. A deterministic
    * train split (even doc_ids) builds per-language token log-lift
    * profiles (P(token|lang) vs P(token) with add-one smoothing); the
    * held-out split is scored by summing lifts of its tokens per
    * language (one inverted-index join + argmax) and the result is
    * cross-tabulated against the declared lang.
    *
    * Fully distributed: the profile is a (token, lang, lift) table
    * joined token-wise — no driver-side model object, so vocabulary
    * size is unbounded. (On this synthetic fixture the text is
    * vocabulary-identical across langs, so accuracy hovers at chance —
    * the mechanism, not the fixture, is what production reuses.)
    *
    * Oracle-safe: the per-doc argmax margin between the top-2 language
    * scores is >= 5e-3 on this fixture — nine orders of magnitude above
    * double-summation jitter — so the confusion matrix is stable
    * cross-engine. (DuckDB `ln`, not `log`, which is log10 there.) */
  val t04LangId: Q = Q(
    "t04_langid",
    """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |            FROM documents),
      |train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
      |lt AS (SELECT lang, count(*) AS lang_n FROM train GROUP BY lang),
      |tt AS (SELECT tok, count(*) AS tok_n FROM train GROUP BY tok),
      |c AS (SELECT lang, tok, count(*) AS c FROM train GROUP BY lang, tok),
      |profile AS (
      |  SELECT c.tok AS p_tok, c.lang AS cand_lang,
      |    ln(((c.c + 1.0) / (lt.lang_n + 1.0)) / ((tt.tok_n + 1.0) / 1.0))
      |      AS lift
      |  FROM c JOIN lt USING (lang) JOIN tt ON c.tok = tt.tok),
      |test AS (SELECT doc_id, lang AS true_lang, tok FROM tok
      |         WHERE doc_id % 2 = 1),
      |scored AS (
      |  SELECT doc_id, true_lang, cand_lang, sum(lift) AS score
      |  FROM test JOIN profile ON tok = p_tok
      |  GROUP BY doc_id, true_lang, cand_lang),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY score DESC, cand_lang) AS rk FROM scored)
      |SELECT true_lang AS lang, cand_lang AS predicted, count(*) AS n
      |FROM r WHERE rk = 1 GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val tokens = docs.select($"doc_id", $"lang",
      explode(toks($"text")).as("tok"))
    val train = tokens.filter($"doc_id" % 2 === 0)
    val langTotals = train.groupBy($"lang")
      .agg(count(lit(1)).as("lang_n"))
    val tokTotals = train.groupBy($"tok").agg(count(lit(1)).as("tok_n"))
    val counts = train.groupBy($"lang", $"tok").agg(count(lit(1)).as("c"))
    val profile = counts
      .join(broadcast(langTotals), "lang")
      .join(tokTotals, "tok")
      .select($"tok".as("p_tok"), $"lang".as("cand_lang"),
        log((($"c" + 1.0) / ($"lang_n" + 1.0)) /
          (($"tok_n" + 1.0) / lit(1.0))).as("lift"))
    val test = tokens.filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"lang".as("true_lang"), $"tok")
    val scored = test.join(profile, $"tok" === $"p_tok")
      .groupBy($"doc_id", $"true_lang", $"cand_lang")
      .agg(sum($"lift").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score".desc, $"cand_lang")
    scored
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .groupBy($"true_lang".as("lang"), $"cand_lang".as("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  /** t05: winnowing fingerprints (Schleimer et al. MOSS scheme) over
    * 3-word shingles: positional shingle hashes, min over each 4-shingle
    * window, distinct. Shingle-level granularity instead of char 8-grams
    * keeps the hash count at |tokens| (not |chars|) per document — ~8×
    * less hashing at identical detection semantics for word-level
    * plagiarism/overlap. Both engines use md5-derived ranks so the
    * oracle matches exactly. */
  val t05Fingerprint: Q = Q(
    "t05_fingerprint",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    [substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8)
      |     FOR i IN range(1, len(t) - 1)] AS grams
      |  FROM toks),
      |f AS (
      |  SELECT doc_id,
      |    list_distinct([list_min(grams[j:j+3])
      |                   FOR j IN range(1, len(grams) - 2)]) AS fps
      |  FROM g)
      |SELECT doc_id, len(fps) AS n_fp, list_min(fps) AS min_fp,
      |       list_max(fps) AS max_fp
      |FROM f""".stripMargin) { (s, d) =>
    import s.implicits._
    // NOTE: a pure array formulation (slice over a transform-produced
    // grams column) gets inlined by CollapseProject — every slice(grams,
    // j, 4) re-evaluates the WHOLE md5 array, turning O(L) hashing into
    // O(L²). Generate the grams once with posexplode and take the
    // 4-window min with a window function instead: linear work, one
    // shuffle bounded by |shingles|. (The shingle array itself is built
    // via the lambda-bound token array — functions.Grams — so the split
    // also evaluates once.)
    val grams = transform(
      graft.functions.Grams.wordGrams(toks($"text"), 3),
      g => md5(g).substr(lit(1), lit(8)))
    val exploded = Tables.documents(s, d)
      .select($"doc_id", posexplode(grams).as(Seq("pos", "g")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos").rowsBetween(-3, 0)
    exploded
      .select($"doc_id", $"pos", min($"g").over(w).as("fp"))
      .filter($"pos" >= 3) // first complete 4-gram window
      .groupBy($"doc_id")
      .agg(countDistinct($"fp").as("n_fp"),
        min($"fp").as("min_fp"), max($"fp").as("max_fp"))
      .select($"doc_id", $"n_fp".cast("long").as("n_fp"), $"min_fp",
        $"max_fp")
  }

  /** t06: Gopher-style repetition filters — top-bigram fraction and
    * duplicate-word fraction, the standard signals for boilerplate /
    * generated-text removal. Linear: one explode of a transform-built
    * bigram array (built once, exploded once — NOT sliced per index,
    * which CollapseProject would turn quadratic) and two aggregations;
    * shuffle volume is |distinct (doc, bigram)|. */
  val t06GopherQuality: Q = Q(
    "t06_gopher_quality",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |b AS (SELECT doc_id, len(t) AS n_tokens,
      |        len(list_distinct(t)) AS n_types,
      |        unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bg
      |      FROM toks),
      |c AS (SELECT doc_id, n_tokens, n_types, bg, count(*) AS c
      |      FROM b GROUP BY 1, 2, 3, 4),
      |a AS (SELECT doc_id, n_tokens, n_types, max(c) AS top_bg,
      |        CAST(sum(c) AS BIGINT) AS n_bg
      |      FROM c GROUP BY 1, 2, 3)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  round(CAST(top_bg AS DOUBLE) / n_bg, 6) AS top_bigram_frac,
      |  round(1 - CAST(n_types AS DOUBLE) / n_tokens, 6) AS dup_word_frac,
      |  (CAST(top_bg AS DOUBLE) / n_bg <= 0.2
      |   AND 1 - CAST(n_types AS DOUBLE) / n_tokens <= 0.3) AS keep_flag
      |FROM a""".stripMargin) { (s, d) =>
    import s.implicits._
    // Map-only formulation: the per-doc top-bigram count is a
    // run-length maximum over the SORTED bigram array — sort + one
    // linear aggregate() pass per row, no explode, no shuffle
    // (PlanSpec pins the zero-Exchange plan). The explode+groupBy
    // alternative shuffles |corpus|·(L-1) gram rows twice: measured
    // 3.9 s vs 0.6 s at sf0.1, and at 100 TB the shuffle IS the cost.
    // State is (prev gram, current run, max run); the null initial
    // prev makes the first comparison fail into run=1 naturally.
    val t = toks($"text")
    val topRun = graft.functions.Grams.bindArray(
      array_sort(graft.functions.Grams.wordGrams(t, 2))) { sorted =>
      aggregate(
        sorted,
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("mx")),
        (st, g) => {
          val run = when(st.getField("prev") === g,
            st.getField("run") + 1L).otherwise(lit(1L))
          struct(g.as("prev"), run.as("run"),
            greatest(st.getField("mx"), run).as("mx"))
        },
        st => st.getField("mx"))
    }
    Tables.documents(s, d)
      .select($"doc_id", size(t).cast("long").as("n_tokens"),
        size(array_distinct(t)).as("n_types"),
        topRun.as("top_bg"),
        (size(t) - 1).cast("long").as("n_bg"))
      .filter($"n_bg" >= 1)
      .select($"doc_id", $"n_tokens",
        round($"top_bg".cast("double") / $"n_bg", 6).as("top_bigram_frac"),
        round(lit(1) - $"n_types".cast("double") / $"n_tokens", 6)
          .as("dup_word_frac"),
        ($"top_bg".cast("double") / $"n_bg" <= 0.2 &&
          lit(1) - $"n_types".cast("double") / $"n_tokens" <= 0.3)
          .as("keep_flag"))
  }

  /** t07: PII scrubbing — email/phone redaction with both the redacted
    * content (md5-checked cross-engine) and per-doc redaction counts.
    * The fixture text carries no PII, so a deterministic synthetic
    * email+phone per doc is injected first; production points the same
    * two regexp_replace calls at raw text. Map-only — embarrassingly
    * parallel at any scale. */
  val t07PiiScrub: Q = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\b\\d{3}-\\d{4}\\b"
    Q(
      "t07_pii_scrub",
      s"""WITH inj AS (
         |  SELECT doc_id,
         |    'contact u' || doc_id || '@example.com ' || text ||
         |    ' call 555-01' || lpad((doc_id % 100)::VARCHAR, 2, '0') AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(raw, '$emailRe')) AS n_emails,
         |  len(regexp_extract_all(raw, '$phoneRe')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(raw, '$emailRe', '[EMAIL]', 'g'),
         |      '$phoneRe', '[PHONE]', 'g')) AS content_hash
         |FROM inj""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          concat(lit("contact u"), $"doc_id", lit("@example.com "), $"text",
            lit(" call 555-01"),
            lpad(($"doc_id" % 100).cast("string"), 2, "0")).as("raw"))
        .select($"doc_id",
          size(regexp_extract_all($"raw", lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all($"raw", lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          md5(regexp_replace(regexp_replace($"raw", emailRe, "[EMAIL]"),
            phoneRe, "[PHONE]")).as("content_hash"))
    }
  }

  /** t08: benchmark decontamination — the eval-leakage gate every
    * training pipeline runs before a corpus ships. A held-out
    * "benchmark" split (deterministic id slice, standing in for the
    * eval sets) contributes its distinct 5-token shingles; every
    * remaining document reports how many of its distinct shingles
    * appear in that set and is flagged when any do.
    *
    * 100 TB shape: the benchmark shingle set is tiny relative to the
    * corpus (eval suites are MBs, corpora are TBs) — broadcast it; the
    * corpus side is one explode + map-side distinct + broadcast left
    * join + re-aggregate keyed by doc_id. No corpus-sized shuffle of
    * anything but (doc_id, shingle) pairs. */
  val t08Decontaminate: Q = Q(
    "t08_decontaminate",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
      |                t[i+3] || ' ' || t[i+4]
      |                FOR i IN range(1, len(t) - 3)]) AS g5
      |      FROM toks),
      |bench AS (SELECT DISTINCT g5 FROM g WHERE doc_id % 50 = 13),
      |corpus AS (SELECT doc_id, g5, (bench.g5 IS NOT NULL)::INT AS hit
      |           FROM g LEFT JOIN bench USING (g5)
      |           WHERE doc_id % 50 <> 13)
      |SELECT doc_id, count(*) AS n_shingles,
      |  CAST(sum(hit) AS BIGINT) AS n_contaminated,
      |  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS contam_frac,
      |  (sum(hit) = 0) AS keep_flag
      |FROM corpus GROUP BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val g5 = graft.functions.Grams.wordGrams(toks($"text"), 5)
    val grams = Tables.documents(s, d)
      .select($"doc_id", explode(g5).as("g5")).distinct()
    val bench = grams.filter($"doc_id" % 50 === 13)
      .select($"g5").distinct().withColumn("hit", lit(1))
    grams.filter($"doc_id" % 50 =!= 13)
      .join(broadcast(bench), Seq("g5"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce($"hit", lit(0))).as("n_contaminated"))
      .select($"doc_id", $"n_shingles", $"n_contaminated",
        round($"n_contaminated".cast("double") / $"n_shingles", 6)
          .as("contam_frac"),
        ($"n_contaminated" === 0).as("keep_flag"))
  }

  /** t09: corpus-boilerplate coverage — the C4 "remove any line seen
    * more than once" pass, at shingle granularity (this corpus has no
    * line structure). 3-token shingles occurring in >= 5 distinct
    * documents are boilerplate (headers, footers, navigation chrome in
    * real crawls); each document reports what fraction of its shingle
    * instances are boilerplate and a cleaned token estimate.
    *
    * ONE corpus explode, reused: per-(doc, gram) instance counts are
    * aggregated first (the explode's only shuffle); document frequency
    * is a second, much smaller aggregate OVER those pairs; the (tiny,
    * heavy-hitter) boilerplate survivors broadcast back onto the same
    * pair table. The raw gram stream is never shuffled twice, and
    * rare grams never travel to the join. */
  val t09Boilerplate: Q = Q(
    "t09_boilerplate",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |g AS (SELECT doc_id,
      |        unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                FOR i IN range(1, len(t) - 1)]) AS g3
      |      FROM toks),
      |df AS (SELECT g3, count(DISTINCT doc_id) AS df FROM g GROUP BY g3),
      |bp AS (SELECT g3 FROM df WHERE df >= 5),
      |j AS (SELECT doc_id, (bp.g3 IS NOT NULL)::INT AS hit
      |      FROM g LEFT JOIN bp USING (g3))
      |SELECT doc_id, count(*) AS n_grams,
      |  CAST(sum(hit) AS BIGINT) AS n_boiler,
      |  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS boiler_frac,
      |  (CAST(sum(hit) AS DOUBLE) / count(*) <= 0.1) AS keep_flag
      |FROM j GROUP BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val g3 = graft.functions.Grams.wordGrams(toks($"text"), 3)
    val pairCounts = Tables.documents(s, d)
      .select($"doc_id", explode(g3).as("g3"))
      .groupBy($"doc_id", $"g3").agg(count(lit(1)).as("c"))
    val boiler = pairCounts
      .groupBy($"g3").agg(count(lit(1)).as("df"))
      .filter($"df" >= 5)
      .select($"g3").withColumn("hit", lit(1))
    pairCounts.join(broadcast(boiler), Seq("g3"), "left")
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"),
        sum(when($"hit".isNotNull, $"c").otherwise(0L)).as("n_boiler"))
      .select($"doc_id", $"n_grams", $"n_boiler",
        round($"n_boiler".cast("double") / $"n_grams", 6).as("boiler_frac"),
        ($"n_boiler".cast("double") / $"n_grams" <= 0.1).as("keep_flag"))
  }

  /** t10: per-document salient terms — the TF-IDF keyword-extraction
    * shape (term frequency per doc, document frequency across the
    * corpus, top-k per doc). Ranking is by (tf DESC, df ASC, term ASC):
    * integer-exact and bit-reproducible across engines, where the
    * canonical tf·ln(N/df) double score is NOT — Java's Math.log and
    * DuckDB's libm ln can disagree in the last ulp, and a hashed
    * comparator turns that into a coin flip. The float score is a
    * trivial per-row epilogue if a consumer wants it; the RANKING is
    * what the operator is for.
    *
    * 100 TB: tf is one shuffle on (doc_id, term) with map-side combine;
    * df is a vocabulary-sized re-aggregation of tf (NOT a second corpus
    * scan); the tf⋈df join shuffles on term (vocab can be billions of
    * rows at corpus scale — never broadcast it); the per-doc top-k is a
    * rank window that plans as WindowGroupLimit (bounded heap per key,
    * partial before the shuffle — asserted in PlanSpec). */
  val t10SalientTerms: Q = Q(
    "t10_salient_terms",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |             FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |ranked AS (SELECT doc_id, term, tf, df,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY tf DESC, df ASC, term ASC) AS rk
      |  FROM tf JOIN df USING (term))
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df
      |FROM ranked WHERE rk <= 3""".stripMargin) { (s, d) =>
    import s.implicits._
    val tf = Tables.documents(s, d)
      .select($"doc_id", explode(toks($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id")
          .orderBy($"tf".desc, $"df".asc, $"term".asc)).cast("long"))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"term", $"tf", $"df")
  }

  /** t11: char-weighted repetition signals — the Gopher repetition
    * filters t06's count-based bigram metrics do NOT cover: the
    * fraction of n-gram CHARACTER MASS sitting in duplicated 3-grams,
    * and the character mass taken by the single most frequent 3-gram
    * (Rae et al. 2021 §A1.1 measures repetition in characters, not
    * occurrences, so long repeated phrases weigh more than short
    * ones). Top gram ties break on the lexicographically smallest
    * gram, so the answer is engine- and run-stable.
    *
    * 100 TB shape: gram counting, the top-gram window and the final
    * rollup all cluster on doc_id(-prefixed) keys; per-key cardinality
    * is bounded by one document's length, so skew is impossible by
    * construction. All arithmetic is integer-exact until two final
    * divisions of identical doubles. */
  val t11Repetition: Q = Q(
    "t11_repetition",
    """WITH g AS (
      |  SELECT doc_id,
      |    unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |            FOR i IN range(1, len(t) - 1)]) AS g3
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t
      |        FROM documents)),
      |c AS (
      |  SELECT doc_id, g3, count(*) AS c,
      |    CAST(length(g3) AS BIGINT) AS l
      |  FROM g GROUP BY doc_id, g3)
      |SELECT doc_id,
      |  CAST(sum(c) AS BIGINT) AS n_grams,
      |  CAST(CAST(sum(CASE WHEN c > 1 THEN l * c ELSE 0 END) AS DOUBLE)
      |    / sum(l * c) AS DOUBLE) AS dup_gram_char_frac,
      |  CAST(CAST((min({'nc': -c, 'g3': g3, 'mass': l * c})).mass
      |      AS DOUBLE)
      |    / sum(l * c) AS DOUBLE) AS top_gram_char_frac
      |FROM c GROUP BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    // The top gram is picked with min(struct(-count, gram, mass))
    // instead of a row_number window: the struct-min is a plain
    // aggregate (map-side combinable, partial+final split, no per-doc
    // sort) and its lexicographic order gives exactly (count DESC,
    // gram ASC). Both engines compare structs field-by-field with
    // binary string order, so the tie-break is engine-stable. (A
    // fully map-side run-length-over-sorted-array variant — t06's
    // trick — was measured SLOWER here: Spark evaluates aggregate()
    // lambdas interpreted, and an 8-field struct state per element
    // costs more than the codegen'd explode+groupBy it avoids.)
    Tables.documents(s, d)
      .select($"doc_id",
        explode(graft.functions.Grams.wordGrams(toks($"text"), 3)).as("g3"))
      .groupBy($"doc_id", $"g3")
      .agg(count(lit(1)).as("c"))
      .withColumn("l", length($"g3").cast("long"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"),
        (sum(when($"c" > 1, $"l" * $"c").otherwise(0L)).cast("double")
          / sum($"l" * $"c")).as("dup_gram_char_frac"),
        (min(struct((-$"c").as("nc"), $"g3",
          ($"l" * $"c").as("mass"))).getField("mass").cast("double")
          / sum($"l" * $"c")).as("top_gram_char_frac"))
  }

  /** t12: unigram-LM surprisal scoring — the perplexity-proxy quality
    * filter (CCNet/Gopher style) with the in-pipeline trained model of
    * t04: a deterministic train split (even doc_ids) fits add-one-
    * smoothed unigram probabilities P(tok) = (c+1)/(N+V); each held-out
    * doc is scored by its mean token surprisal -ln P(tok) (OOV tokens
    * smoothed to c=0), and the 3 highest-surprisal (most "unnatural")
    * docs per language are flagged.
    *
    * Fully distributed, no driver-side model: the count table is joined
    * token-wise (inverted-index shape, one shuffle on tok), the per-doc
    * mean is one doc-keyed aggregate, and the per-lang top-3 rank
    * compiles to WindowGroupLimit — Spark pushes the k=3 limit into a
    * map-side per-partition heap BEFORE the lang shuffle, so at 100 TB
    * no language ever sorts its full document set.
    *
    * Oracle-safe by the t04 argument: ln() is libm (last-ulp divergence
    * cross-engine, t10's measured finding), so surprisal VALUES are
    * never emitted — only rank-derived rows, whose doc-to-doc margins
    * (~1e-3 on this fixture) sit eleven orders above ulp jitter; ties
    * break on doc_id. n_toks is an exact integer. */
  val t12LmScore: Q = Q(
    "t12_lm_score",
    """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |            FROM documents),
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
      |FROM r WHERE rk <= 3""".stripMargin) { (s, d) =>
    import s.implicits._
    val tokens = Tables.documents(s, d)
      .select($"doc_id", $"lang", explode(toks($"text")).as("tok"))
    val train = tokens.filter($"doc_id" % 2 === 0).select($"tok")
    val nv = train.agg(count(lit(1)).as("n"),
      countDistinct($"tok").as("v"))
    val cnt = train.groupBy($"tok").agg(count(lit(1)).as("c"))
    val scored = tokens.filter($"doc_id" % 2 === 1)
      .join(cnt, Seq("tok"), "left")
      .crossJoin(broadcast(nv))
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_toks"),
        avg(-log((coalesce($"c", lit(0)) + 1.0) / ($"n" + $"v")))
          .as("surprisal"))
    val w = Window.partitionBy($"lang")
      .orderBy($"surprisal".desc, $"doc_id")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"lang", $"rk", $"doc_id", $"n_toks".cast("long").as("n_toks"))
  }

  /** t08b: NEAR-dup decontamination — t08's exact 5-gram gate catches
    * verbatim eval leakage; this catches the PARAPHRASED kind (eval
    * questions lightly edited into training docs), which is what
    * production decontamination actually hunts. The benchmark slice
    * (t08's doc_id % 50 = 13) becomes the small side of d12's
    * batch-vs-corpus near-dup machinery: band-index the benchmark,
    * probe every remaining doc, exact-verify candidates at Jaccard ≥
    * 0.5. The corpus side is salted with suffix-perturbed copies of
    * the benchmark docs (d12's device) — true paraphrased leakage by
    * construction, so the gate's flagging is exercised, and the two
    * NATURAL near-dup contaminations at this fixture are caught too.
    *
    * Pure composition of hash-verified stages: corpusBandIndex +
    * nearDupAgainstCorpus are d12/w06/st15's shared machinery, and
    * the oracle recomputes the full MinHash→band→verify chain in SQL
    * (the portable md5 hash family).
    *
    * 100 TB: eval suites are MBs against TB corpora — the benchmark
    * band index is broadcast-class, corpus-side work is one signature
    * pass plus its own bucket collisions; no corpus×corpus stage. */
  val t08bNearDecontaminate: Q = Q(
    "t08b_near_decontaminate",
    """WITH bench AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 50 = 13),
      |rest AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 13
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    text || ' zq1 zq2 zq3 zq4 zq5 zq6' AS text
      |  FROM documents WHERE doc_id % 50 = 13),
      |alld AS (SELECT 'c' AS side, doc_id, text FROM bench
      |         UNION ALL SELECT 'b' AS side, doc_id, text FROM rest),
      |toks AS (SELECT side, doc_id, string_split(text, ' ') AS t
      |         FROM alld),
      |sh AS (SELECT DISTINCT side, doc_id,
      |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      |       FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
      |hs AS (SELECT side, doc_id,
      |         ('0x' || substr(md5(g), 1, 8))::BIGINT % 2147483647 AS lo,
      |         ('0x' || substr(md5(g), 9, 8))::BIGINT % 2147483647 AS hi
      |       FROM sh),
      |mins AS (SELECT side, doc_id, i,
      |           min((lo + i * hi) % 2147483647) AS mh
      |         FROM hs, LATERAL (SELECT unnest(range(0, 64)) AS i) ii
      |         GROUP BY side, doc_id, i),
      |bandhash AS (SELECT side, doc_id, i // 4 AS band,
      |               string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bh
      |             FROM mins GROUP BY side, doc_id, i // 4),
      |cands AS (SELECT DISTINCT b.doc_id AS batch_id,
      |            c.doc_id AS corpus_id
      |          FROM bandhash b JOIN bandhash c
      |            ON b.band = c.band AND b.bh = c.bh
      |          WHERE b.side = 'b' AND c.side = 'c'),
      |sizes AS (SELECT side, doc_id, count(*) AS n FROM sh
      |          GROUP BY side, doc_id),
      |inter AS (SELECT cd.batch_id, cd.corpus_id, count(*) AS inter
      |          FROM cands cd
      |          JOIN sh a ON a.side = 'b' AND a.doc_id = cd.batch_id
      |          JOIN sh b ON b.side = 'c' AND b.doc_id = cd.corpus_id
      |            AND a.g = b.g
      |          GROUP BY cd.batch_id, cd.corpus_id),
      |ver AS (SELECT i.batch_id,
      |          max(round(CAST(inter AS DOUBLE) /
      |            (s1.n + s2.n - inter), 6)) AS best_jaccard
      |        FROM inter i
      |        JOIN sizes s1 ON s1.side = 'b' AND s1.doc_id = i.batch_id
      |        JOIN sizes s2 ON s2.side = 'c' AND s2.doc_id = i.corpus_id
      |        WHERE 2 * inter >= (s1.n + s2.n - inter)
      |        GROUP BY i.batch_id)
      |SELECT b.doc_id, (v.best_jaccard IS NULL) AS keep_flag,
      |  v.best_jaccard
      |FROM rest b LEFT JOIN ver v ON v.batch_id = b.doc_id"""
      .stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val bench = docs.filter($"doc_id" % 50 === 13)
    val leaked = bench.select(($"doc_id" + 1000000L).as("doc_id"),
      concat($"text", lit(" zq1 zq2 zq3 zq4 zq5 zq6")).as("text"))
    val corpus = docs.filter($"doc_id" % 50 =!= 13).unionByName(leaked)
    val benchSh = bench.select($"doc_id".as("corpus_id"),
      Dedup.shingles(Dedup.toks($"text")).as("sh_c"))
    Dedup.nearDupAgainstCorpus(corpus,
        Dedup.corpusBandIndex(bench), benchSh)
      .select($"doc_id", $"best_jaccard".isNull.as("keep_flag"),
        $"best_jaccard")
  }

  val all: Seq[Q] = Seq(t01CorpusStats, t02QualityScore, t03TokenCount,
    t04LangId, t05Fingerprint, t06GopherQuality, t07PiiScrub,
    t08Decontaminate, t08bNearDecontaminate, t09Boilerplate,
    t10SalientTerms, t11Repetition, t12LmScore)
}
