package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** End-to-end corpus-cleaning pipeline — the composition a real
  * training-data run executes: quality filter → near-duplicate removal
  * (keep the lowest doc_id of each pair) → per-language corpus stats.
  * Composes the t02 quality scorer and d04 exact-Jaccard pair operators
  * unchanged; the oracle chains the same CTEs, so the WHOLE pipeline is
  * differential-tested, not just its stages.
  *
  * At 100 TB the only change is swapping the d04 ground-truth stage for
  * d03's MinHash+LSH candidates — same pair schema, same removal rule:
  * that swap is REGISTERED as [[c01bCorpusCleanLsh]] (the round-8 sf1
  * step measured this form ~105x on 10x data through the shared-shingle
  * self-join; the LSH twin reads ~2x). */
object Pipeline {

  val c01CorpusClean: Q = Q(
    "c01_corpus_clean",
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    length(text) AS n_chars_actual,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS n_stop,
      |    len(list_distinct(string_split(text, ' '))) AS n_types
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, lang, n_tokens,
      |    round(
      |      0.4 * (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END)
      |      + 0.3 * least(CAST(n_stop AS DOUBLE) / n_tokens * 10.0, 1.0)
      |      + 0.3 * (CAST(n_types AS DOUBLE) / n_tokens), 6) AS quality
      |  FROM f),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      |       FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |dupes AS (SELECT DISTINCT doc_b FROM pairs p
      |          JOIN sizes s1 ON p.doc_a = s1.doc_id
      |          JOIN sizes s2 ON p.doc_b = s2.doc_id
      |          WHERE 2 * inter >= (s1.n + s2.n - inter))
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(quality)
      |    AS avg_quality
      |FROM q
      |WHERE quality >= 0.5
      |  AND doc_id NOT IN (SELECT doc_b FROM dupes)
      |GROUP BY lang""".stripMargin) { (s, d) =>
    import s.implicits._
    // total_tokens CAST to BIGINT in the oracle (DuckDB sum(int) is
    // HUGEINT → float64 in pandas, a dtype mismatch vs Spark's int64);
    // avg_quality summed exactly in decimal space (quality is rounded
    // to 6 dp per row, so the decimal(18,6) cast is lossless) — double
    // summation order would otherwise jitter the mean's last ulp.
    val quality = TextAnalysis.t02QualityScore.build(s, d)
      .select($"doc_id", $"lang", $"n_tokens", $"quality")
    val dupes = Dedup.d04NgramJaccard.build(s, d)
      .select($"doc_b").distinct()
    quality
      .filter($"quality" >= 0.5)
      .join(dupes, quality("doc_id") === dupes("doc_b"), "left_anti")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens".cast("long")).as("total_tokens"),
        Exact.davg($"quality").as("avg_quality"))
  }

  /** c01b: the corpus-cleaning pipeline on its 100 TB dedup stage —
    * the swap c01's scaladoc promises ("at 100 TB the only change is
    * swapping the d04 ground-truth stage for d03's MinHash+LSH
    * candidates"), now a registered, oracled query instead of a
    * comment: the quality scorer, removal rule (drop every doc_b of a
    * pair), and stats stage are c01's VERBATIM; only the pair stage is
    * d03's banded candidates + exact verification. The round-8 sf1
    * step motivated it with numbers: c01 read ~105x on 10x data (the
    * shared-shingle self-join grows with dup density), while the LSH
    * stage's band buckets stay bounded. Oracle parity is recall-
    * independent — DuckDB recomputes the identical hash family, so
    * both engines drop the same doc set. */
  val c01bCorpusCleanLsh: Q = Q(
    "c01b_corpus_clean_lsh",
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS n_stop,
      |    len(list_distinct(string_split(text, ' '))) AS n_types
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, lang, n_tokens,
      |    round(
      |      0.4 * (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END)
      |      + 0.3 * least(CAST(n_stop AS DOUBLE) / n_tokens * 10.0, 1.0)
      |      + 0.3 * (CAST(n_types AS DOUBLE) / n_tokens), 6) AS quality
      |  FROM f),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      |       FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
      |hs AS (SELECT doc_id,
      |         ('0x' || substr(md5(g), 1, 8))::BIGINT % 2147483647 AS lo,
      |         ('0x' || substr(md5(g), 9, 8))::BIGINT % 2147483647 AS hi
      |       FROM sh),
      |mins AS (SELECT doc_id, i, min((lo + i * hi) % 2147483647) AS mh
      |         FROM hs, LATERAL (SELECT unnest(range(0, 64)) AS i) ii
      |         GROUP BY doc_id, i),
      |bandhash AS (SELECT doc_id, i // 4 AS band,
      |               string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bh
      |             FROM mins GROUP BY doc_id, i // 4),
      |cands AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |          FROM bandhash x JOIN bandhash y
      |            ON x.band = y.band AND x.bh = y.bh
      |              AND x.doc_id < y.doc_id),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
      |          FROM cands c
      |          JOIN sh a ON a.doc_id = c.doc_a
      |          JOIN sh b ON b.doc_id = c.doc_b AND a.g = b.g
      |          GROUP BY c.doc_a, c.doc_b),
      |dupes AS (SELECT DISTINCT doc_b FROM inter p
      |          JOIN sizes s1 ON p.doc_a = s1.doc_id
      |          JOIN sizes s2 ON p.doc_b = s2.doc_id
      |          WHERE 2 * inter >= (s1.n + s2.n - inter))
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(quality)
      |    AS avg_quality
      |FROM q
      |WHERE quality >= 0.5
      |  AND doc_id NOT IN (SELECT doc_b FROM dupes)
      |GROUP BY lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val quality = TextAnalysis.t02QualityScore.build(s, d)
      .select($"doc_id", $"lang", $"n_tokens", $"quality")
    val dupes = Dedup.minhashPairs(s, d, numHashes = 64, bands = 16)
      .select($"doc_b").distinct()
    quality
      .filter($"quality" >= 0.5)
      .join(dupes, quality("doc_id") === dupes("doc_b"), "left_anti")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens".cast("long")).as("total_tokens"),
        Exact.davg($"quality").as("avg_quality"))
  }

  /** c02: the full ingest-to-splits run — quality gate (t02 scorer,
    * >= 0.5) → cross-corpus segment dedup over the SURVIVORS (d09's
    * segments/canonical helpers; docs whose every segment is a
    * non-canonical duplicate drop out entirely) → token recount on the
    * CLEANED text → deterministic hash split (p01's md5-prefix device)
    * → per-(split, lang) corpus stats. Every stage is the registered
    * operator's own code path, and the oracle chains the same CTEs, so
    * the composition is differential-tested end to end — the number a
    * trainer actually consumes (post-dedup token budget per split) is
    * the thing being checked.
    *
    * 100 TB: stages stay independently shuffled on well-distributed
    * keys (doc hash → segment hash → doc_id → (split, lang)); nothing
    * re-materializes raw text after the segment explode, and the
    * quality gate runs FIRST so the expensive dedup only sees
    * survivors. */
  val c02IngestToSplits: Q = Q(
    "c02_ingest_splits",
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS n_stop,
      |    len(list_distinct(string_split(text, ' '))) AS n_types
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, lang,
      |    round(
      |      0.4 * (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END)
      |      + 0.3 * least(CAST(n_stop AS DOUBLE) / n_tokens * 10.0, 1.0)
      |      + 0.3 * (CAST(n_types AS DOUBLE) / n_tokens), 6) AS quality
      |  FROM f),
      |keep AS (SELECT doc_id, lang, quality FROM q WHERE quality >= 0.5),
      |d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |      WHERE doc_id IN (SELECT doc_id FROM keep)),
      |segs AS (
      |  SELECT doc_id, st // 10 AS pos,
      |    list_slice(ws, st + 1, st + 10) AS seg_l
      |  FROM (SELECT doc_id, ws,
      |          unnest(range(0, greatest(len(ws), 1), 10)) AS st
      |        FROM d)),
      |k AS (SELECT doc_id, pos, len(seg_l) AS n_words,
      |        md5(array_to_string(seg_l, ' ')) AS sh,
      |        doc_id * 100000 + pos AS kk
      |      FROM segs),
      |c AS (SELECT sh, count(*) AS n, min(kk) AS first_k
      |      FROM k GROUP BY sh),
      |pd AS (SELECT k.doc_id, sum(k.n_words) AS clean_tokens
      |       FROM k JOIN c USING (sh)
      |       WHERE c.n = 1 OR k.kk = c.first_k
      |       GROUP BY k.doc_id),
      |r AS (SELECT keep.lang, keep.quality, pd.clean_tokens,
      |        CASE WHEN substr(md5(keep.doc_id::VARCHAR), 1, 2) < 'e6'
      |               THEN 'train'
      |             WHEN substr(md5(keep.doc_id::VARCHAR), 1, 2) < 'f3'
      |               THEN 'val'
      |             ELSE 'test' END AS split
      |      FROM keep JOIN pd ON keep.doc_id = pd.doc_id)
      |SELECT split, lang, count(*) AS n_docs,
      |  CAST(sum(clean_tokens) AS BIGINT) AS total_tokens,
      |  CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(quality)
      |    AS avg_quality
      |FROM r GROUP BY split, lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val keep = TextAnalysis.t02QualityScore.build(s, d)
      .filter($"quality" >= 0.5)
      .select($"doc_id", $"lang", $"quality")
    val docs = graft.sources.Tables.documents(s, d)
      .join(keep.select($"doc_id"), Seq("doc_id"), "left_semi")
    val perDoc = Dedup.segmentsWithKeep(Dedup.segments(docs))
      .filter($"keep")
      .groupBy($"doc_id")
      .agg(sum($"n_words").as("clean_tokens"))
    val h2 = substring(md5($"doc_id".cast("string")), 1, 2)
    perDoc.join(keep, "doc_id")
      .select($"lang", $"quality", $"clean_tokens",
        when(h2 < "e6", "train").when(h2 < "f3", "val")
          .otherwise("test").as("split"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"clean_tokens").as("total_tokens"),
        Exact.davg($"quality").as("avg_quality"))
  }

  /** c03: pretraining-corpus funnel — the round-3 operators composed
    * end to end the way a corpus build runs them: dq02's source-level
    * gate first (drop whole domains before touching their documents —
    * the cheapest cut), d01's exact dedup on the survivors (canonical =
    * min doc_id per content hash), a token-count quality floor, then
    * p07's packing BUDGET (concat-and-chunk means examples =
    * ceil(tokens/2048) exactly — no window needed for the count).
    * Emitted: the funnel table (stage, docs, tokens) every corpus run
    * reports, all exact integer arithmetic.
    *
    * 100 TB shape: stage order is the cost order — the source gate is
    * one domain-keyed aggregate over hashes already computed map-side;
    * dedup shuffles only gated survivors; quality is map-only; the
    * budget is one scalar aggregate. Nothing re-reads text after the
    * first scan (base carries (source, hash, token count) only). */
  val c03PretrainFunnel: Q = Q(
    "c03_pretrain_funnel",
    """WITH base AS (SELECT doc_id, source,
      |         len(string_split(text, ' ')) AS n_toks, md5(text) AS h
      |       FROM documents),
      |src AS (SELECT source FROM base GROUP BY source
      |        HAVING 5*(count(*) - count(DISTINCT h)) <= count(*)
      |           AND 10*(count(*) FILTER (WHERE n_toks < 30)) <= 3*count(*)
      |           AND sum(n_toks) >= 15*count(*)),
      |g AS (SELECT b.* FROM base b JOIN src USING (source)),
      |d AS (SELECT g.* FROM g JOIN (SELECT h, min(doc_id) AS md FROM g
      |        GROUP BY h) m ON g.h = m.h AND g.doc_id = m.md),
      |q AS (SELECT * FROM d WHERE n_toks >= 30)
      |SELECT 1 AS stage_no, 'all' AS stage, count(*) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM base
      |UNION ALL SELECT 2, 'source_gate', count(*),
      |  CAST(sum(n_toks) AS BIGINT) FROM g
      |UNION ALL SELECT 3, 'dedup', count(*),
      |  CAST(sum(n_toks) AS BIGINT) FROM d
      |UNION ALL SELECT 4, 'quality', count(*),
      |  CAST(sum(n_toks) AS BIGINT) FROM q
      |UNION ALL SELECT 5, 'packed',
      |  CAST((sum(n_toks) + 2047) // 2048 AS BIGINT),
      |  CAST(sum(n_toks) AS BIGINT) FROM q""".stripMargin) { (s, d) =>
    import s.implicits._
    // ONE text scan, then never again: the narrow hashed base
    // (doc_id, source, token count, content hash — no text) is
    // materialized via localCheckpoint, so the stage aggregates below
    // re-read a 4-column frame, not the corpus. (The first cut of this
    // query expressed each stage as its own aggregate over the shared
    // lineage — the runtime plan re-scanned documents.parquet 22 times
    // with only 6 exchanges reused. At 100 TB that is the difference
    // between one corpus read and twenty-two; on a cluster the
    // checkpoint is persist(DISK_ONLY) of the same frame.)
    val base = Tables.documents(s, d)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_toks"),
        md5($"text").as("h"))
      .localCheckpoint()
    val srcKeep = base.groupBy($"source")
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct($"h")).as("dup"),
        count(when($"n_toks" < 30, 1)).as("short"),
        sum($"n_toks").as("toks"))
      .filter(lit(5) * $"dup" <= $"n" && lit(10) * $"short" <= lit(3) * $"n"
        && $"toks" >= lit(15) * $"n")
      .select($"source", lit(true).as("keep_src"))
    // canonical = min doc_id per content hash AMONG gated rows; no
    // broadcast hint — canon is corpus-sized at scale (one row per
    // distinct hash), the shuffle join is the honest plan
    val canon = base.join(srcKeep, Seq("source"))
      .groupBy($"h".as("ch")).agg(min($"doc_id").as("md"))
    // every stage becomes a row-level flag; the funnel is then ONE
    // aggregate over the flagged frame + a 1-row stack unpivot
    val flags = base
      .join(srcKeep, Seq("source"), "left")
      .join(canon, $"h" === $"ch", "left")
      .select($"n_toks",
        coalesce($"keep_src", lit(false)).as("gated"),
        (coalesce($"keep_src", lit(false)) && $"doc_id" === $"md")
          .as("is_canon"))
      .withColumn("is_q", $"is_canon" && $"n_toks" >= 30)
    flags.agg(
      count(lit(1)).as("d1"), sum($"n_toks").as("t1"),
      count(when($"gated", 1)).as("d2"),
      sum(when($"gated", $"n_toks")).as("t2"),
      count(when($"is_canon", 1)).as("d3"),
      sum(when($"is_canon", $"n_toks")).as("t3"),
      count(when($"is_q", 1)).as("d4"),
      sum(when($"is_q", $"n_toks")).as("t4"))
      .selectExpr(
        """stack(5,
          |  1, 'all',         d1,                          CAST(t1 AS BIGINT),
          |  2, 'source_gate', d2,                          CAST(t2 AS BIGINT),
          |  3, 'dedup',       d3,                          CAST(t3 AS BIGINT),
          |  4, 'quality',     d4,                          CAST(t4 AS BIGINT),
          |  5, 'packed',      CAST((t4 + 2047) DIV 2048 AS BIGINT),
          |                                                 CAST(t4 AS BIGINT)
          |) AS (stage_no, stage, n_docs, n_tokens)""".stripMargin)
  }

  /** c04: MIX-BUILD pipeline — the round-7 operators composed the way
    * a training-mix construction runs them: p10's temperature
    * rebalancing first (per-source keep rates ∝ n^0.7 under a 40%
    * budget — whole-source-level decisions are the cheapest cut), then
    * p09's exact stratified cap on the survivors (exactly ceil(50%·n)
    * per language via the scale-safe stratified rank), reported as the
    * per-language mix table (docs in, docs kept, tokens kept) every
    * mix build publishes. Both stages reuse the standalone operators'
    * salted hash decisions VERBATIM — determinism composes: the docs
    * c04 keeps are exactly the p10-kept docs that p09's rank admits,
    * reproducible on any cluster shape, and the oracle chains the
    * same CTEs so the whole composition is differential-tested.
    *
    * 100 TB shape: one per-source count + broadcast rate table +
    * map-only mix filter (p10's shape), then the stratified rank's
    * narrow checkpoint + (lang, 2-hex bucket) windows + broadcast
    * offsets (p09's shape), one final aggregate. Text is scanned
    * once; the rank covers (doc_id, lang, token count, hash) only. */
  val c04MixBuild: Q = Q(
    "c04_mix_build",
    """WITH counts AS (SELECT source, count(*) AS n_orig
      |               FROM documents GROUP BY source),
      |w AS (SELECT source, n_orig,
      |        CAST(floor(pow(n_orig, 0.7) * 1000000) AS BIGINT) AS wgt
      |      FROM counts),
      |r AS (SELECT source, n_orig,
      |        least(1.0,
      |          CAST(0.4 AS DOUBLE) * (SELECT sum(n_orig) FROM counts)
      |            * wgt / (SELECT sum(wgt) FROM w) / n_orig) AS rate
      |      FROM w),
      |mix AS (
      |  SELECT d.doc_id, d.lang, d.text FROM documents d
      |  JOIN r ON d.source = r.source
      |  WHERE r.rate >= 1.0
      |     OR substr(md5(d.doc_id::VARCHAR || ':tmp'), 1, 4) <
      |        lpad(lower(to_hex(CAST(floor(r.rate * 65536) AS BIGINT))),
      |             4, '0')),
      |s AS (SELECT doc_id, lang,
      |        len(string_split(text, ' ')) AS n_toks,
      |        md5(doc_id::VARCHAR || ':ss') AS h
      |      FROM mix),
      |rk AS (SELECT *,
      |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
      |          AS rk,
      |        count(*) OVER (PARTITION BY lang) AS n FROM s)
      |SELECT lang, CAST(max(n) AS BIGINT) AS n_mix,
      |  CAST(count(*) AS BIGINT) AS n_strat,
      |  CAST(sum(n_toks) AS BIGINT) AS strat_tokens
      |FROM rk WHERE rk <= ceil(0.5 * n)
      |GROUP BY lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    // stage 1 = p10's shared rate table + keep decision (same salt →
    // identical kept set), projected to the narrow rank frame
    val mix = docs
      .join(broadcast(Splits.temperatureRates(docs)), "source")
      .filter(Splits.keepAtRate($"doc_id", ":tmp", $"rate"))
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_toks"),
        md5(concat($"doc_id".cast("string"), lit(":ss"))).as("h"))
    // stage 2 = p09's shared exact stratified take at 50% (the helper
    // checkpoints the mix once for its quota and rank consumers)
    Splits.stratifiedTake(mix, 0.5)
      .groupBy($"lang")
      .agg(max($"n_stratum").as("n_mix"), count(lit(1)).as("n_strat"),
        sum($"n_toks").as("strat_tokens"))
  }

  val all: Seq[Q] = Seq(c01CorpusClean, c01bCorpusCleanLsh,
    c02IngestToSplits, c03PretrainFunnel, c04MixBuild)
}
