package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Deterministic dataset splitting for training pipelines: a
  * content-independent hash of the stable document id buckets every
  * row into train/val/test with NO coordination, NO sampling state and
  * NO order dependence — the same doc lands in the same split on any
  * cluster, any partitioning, any day. (Never split on row position or
  * rand(): both change under repartitioning.)
  *
  * The bucket is the first two hex chars of md5(doc_id) compared as
  * strings ('e6'/256 ≈ 90%, 'f3' ≈ +5%), which both engines compute
  * identically — no integer parsing of hex involved. */
object Splits {

  val p01TrainSplit: Q = Q(
    "p01_train_split",
    """WITH s AS (SELECT doc_id, substr(md5(doc_id::VARCHAR), 1, 2) AS h
      |           FROM documents)
      |SELECT CASE WHEN h < 'e6' THEN 'train'
      |            WHEN h < 'f3' THEN 'val'
      |            ELSE 'test' END AS split,
      |  count(*) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM s GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    splitAssignment(Tables.documents(s, d))
      .groupBy($"split")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
  }

  /** p01's deterministic split device as a reusable frame — (doc_id,
    * split) via the md5-prefix thresholds. Shared with dq05 so the
    * leakage audit scores the EXACT split assignment the pipeline
    * ships, not a reimplementation that could drift. */
  def splitAssignment(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id",
        substring(md5($"doc_id".cast("string")), 1, 2).as("h"))
      .select($"doc_id",
        when($"h" < "e6", "train")
          .when($"h" < "f3", "val")
          .otherwise("test").as("split"))
  }

  /** p02: stratified training-mix rebalancing — downsample every
    * language stratum to the smallest stratum's size (an equal-count
    * mix), deterministically. The per-language keep rate is
    * min(n)/n(lang); a row is kept when the first 4 hex chars of
    * md5(doc_id || ':mix') fall below the rate's 16-bit hex threshold
    * (the ':mix' salt decorrelates this decision from p01's split
    * assignment). No rand(), no per-partition state: the same document
    * survives on any cluster shape, and re-running the pipeline after
    * appending data only re-decides rows whose stratum rate changed.
    *
    * 100 TB shape: one count per stratum (tiny aggregate), broadcast
    * back as a rate table; the keep decision is map-only. Expected kept
    * count is rate*n with binomial jitter — the point is determinism
    * and one-pass scalability, not exact-n sampling (p09 is the
    * exact-count form, via the scale-safe stratified rank). */
  val p02TrainingMix: Q = Q(
    "p02_training_mix",
    """WITH counts AS (SELECT lang, count(*) AS n_orig
      |               FROM documents GROUP BY lang),
      |rates AS (SELECT lang, n_orig,
      |            CAST((SELECT min(n_orig) FROM counts) AS DOUBLE) / n_orig
      |              AS rate
      |          FROM counts),
      |kept AS (
      |  SELECT d.lang FROM documents d JOIN rates r ON d.lang = r.lang
      |  WHERE r.rate >= 1.0
      |     OR substr(md5(d.doc_id::VARCHAR || ':mix'), 1, 4) <
      |        lpad(lower(to_hex(CAST(floor(r.rate * 65536) AS BIGINT))),
      |             4, '0'))
      |SELECT r.lang, r.n_orig, count(k.lang) AS n_kept,
      |  round(r.rate, 6) AS target_rate,
      |  round(CAST(count(k.lang) AS DOUBLE) / r.n_orig, 6) AS achieved_rate
      |FROM rates r LEFT JOIN kept k ON r.lang = k.lang
      |GROUP BY r.lang, r.n_orig, r.rate""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_orig"))
    val minN = counts.agg(min($"n_orig").as("mn"))
    val rates = counts.crossJoin(broadcast(minN))
      .select($"lang", $"n_orig",
        ($"mn".cast("double") / $"n_orig").as("rate"))
    val kept = docs.join(broadcast(rates), "lang")
      .filter($"rate" >= 1.0 ||
        substring(md5(concat($"doc_id".cast("string"), lit(":mix"))), 1, 4) <
          lpad(lower(hex(floor($"rate" * 65536).cast("bigint"))), 4, "0"))
      .select($"lang".as("k_lang"))
    rates.join(kept, $"lang" === $"k_lang", "left")
      .groupBy($"lang", $"n_orig", $"rate")
      .agg(count($"k_lang").as("n_kept"))
      .select($"lang", $"n_orig", $"n_kept",
        round($"rate", 6).as("target_rate"),
        round($"n_kept".cast("double") / $"n_orig", 6).as("achieved_rate"))
  }

  /** p03: balanced shard packing — assign documents to 16 training
    * shards so per-shard token totals are even: order by token count
    * DESC (ties by doc_id) and deal round-robin, the distributed
    * approximation of LPT bin packing (true LPT is inherently
    * sequential; descending round-robin keeps the imbalance within the
    * largest single document). Fully deterministic → fully oracled,
    * including the exact max-min token imbalance.
    *
    * 100 TB: the rank covers only (doc_id, n_tokens) — a narrow
    * doc-count-sized relation, NOT the corpus text — and runs as the
    * two-pass distributed prefix sum ([[Ranks.globalRank]]): range
    * partition, per-partition rank, broadcast offsets; no
    * single-reducer sort. The shard assignment then joins back by
    * doc_id if the text is needed. For corpora where even that rank
    * is too hot, the salted-striping fallback (hash(doc_id) % shards)
    * trades the balance guarantee for zero coordination. */
  val p03ShardPack: Q = Q(
    "p03_shard_pack",
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      |           FROM documents),
      |r AS (SELECT doc_id, n_tokens,
      |        row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
      |      FROM t),
      |s AS (SELECT CAST((rn - 1) % 16 AS BIGINT) AS shard_id,
      |        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT)
      |          AS shard_tokens
      |      FROM r GROUP BY 1)
      |SELECT shard_id, n_docs, shard_tokens,
      |  CAST(max(shard_tokens) OVER () - min(shard_tokens) OVER ()
      |    AS BIGINT) AS max_imbalance
      |FROM s""".stripMargin) { (s, d) =>
    import s.implicits._
    // global LPT rank via the two-pass distributed prefix sum (Ranks):
    // the previous row_number().over(Window.orderBy(...)) sorted every
    // (doc_id, n_tokens) pair in ONE task — at 100 TB a driver-adjacent
    // bottleneck. Rank values (and so the round-robin deal) unchanged.
    val t = Tables.documents(s, d)
      .select($"doc_id", size(split($"text", " ")).as("n_tokens"))
    // bucket = fixed-width band of -n_tokens (64-token bands):
    // ascending bands == descending token order, so the bucket is
    // order-respecting, and — unlike the raw value, whose bucket
    // COUNT is the number of DISTINCT lengths (10^5+ for long-doc
    // corpora, blowing up the B×B offsets join) — the band count is
    // bounded by maxLen/64 regardless of how many distinct lengths
    // occur. Band SIZES follow the length histogram's band mass; a
    // pathologically peaked corpus (most docs truncated at one
    // length) concentrates one band, for which the documented
    // salted-striping fallback above is the escape hatch.
    val shards = Ranks
      .globalRank(t, floor(-$"n_tokens" / 64.0).cast("long"),
        Seq($"n_tokens".desc, $"doc_id"), "rn")
      .groupBy((($"rn" - 1) % 16).cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").cast("long").as("shard_tokens"))
    // the over-all max-min spread: broadcast the 1-row bounds aggregate
    // instead of a constant-partition window (Catalyst folds a lit(1)
    // partition key away, leaving a single-partition WindowExec)
    val bounds = shards.agg(
      (max($"shard_tokens") - min($"shard_tokens")).cast("long")
        .as("max_imbalance"))
    shards.crossJoin(broadcast(bounds))
  }

  /** p04: sliding-window document chunking — the standard
    * fixed-context-length prep step (chunk of 100 words, stride 80 →
    * 20-word overlap). Entirely map-side: split once, explode the
    * start offsets, slice per start — no shuffle anywhere, fan-out
    * bounded by ceil(len/stride) per document. The chunk md5 keys
    * downstream chunk-level dedup (d01) without re-materializing text.
    * Last chunk is allowed short (standard trainer behavior). */
  val p04ChunkDocs: Q = Q(
    "p04_chunk_docs",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
      |           FROM documents)
      |SELECT doc_id,
      |  start // 80 AS chunk_id,
      |  len(list_slice(ws, start + 1, start + 100)) AS chunk_words,
      |  md5(array_to_string(list_slice(ws, start + 1, start + 100), ' '))
      |    AS chunk_hash
      |FROM (SELECT doc_id, ws,
      |        unnest(range(0, greatest(len(ws), 1), 80)) AS start
      |      FROM d)""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", $"ws",
        explode(sequence(lit(0), greatest(size($"ws") - 1, lit(0)),
          lit(80))).as("start"))
      .select($"doc_id",
        ($"start" / 80).cast("long").as("chunk_id"),
        size(slice($"ws", $"start" + 1, lit(100))).as("chunk_words"),
        md5(concat_ws(" ", slice($"ws", $"start" + 1, lit(100))))
          .as("chunk_hash"))
  }

  /** p05: deterministic weighted sampling without replacement —
    * priority sampling (Duffield/Lund/Thorup): priority = w/u with u
    * uniform from the content-independent doc hash; the top-k
    * priorities are the sample. Longer documents (weight = n_chars)
    * are proportionally more likely, yet the choice is a pure function
    * of doc_id — reproducible on any cluster, any partitioning.
    *
    * Numeric portability (why not A-ES u^(1/w)): libm pow/ln differ in
    * the last ulp across engines, which can flip near-tied ranks and
    * change top-k MEMBERSHIP. Here u = (v + 0.5) / 2^24 with integer
    * v from 6 md5 hex chars — v+0.5 is exact, the 2^24 divide is
    * exact (power of two), and w/u is ONE correctly-rounded IEEE
    * division — bit-identical everywhere, so the oracle can hash the
    * priorities themselves.
    *
    * 100 TB shape: map-side key computation + TakeOrderedAndProject
    * (per-partition bounded heaps, then a k-row merge on one reducer —
    * the same plan as q03). The ':wrs' salt decorrelates the draw from
    * p01's split and p02's mix decisions. */
  val p05WeightedSample: Q = Q(
    "p05_weighted_sample",
    """WITH pri AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(n_chars AS DOUBLE) / (
      |      ((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':wrs'), 1, 1)) - 1) * 1048576
      |      + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':wrs'), 2, 1)) - 1) * 65536
      |      + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':wrs'), 3, 1)) - 1) * 4096
      |      + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':wrs'), 4, 1)) - 1) * 256
      |      + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':wrs'), 5, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':wrs'), 6, 1)) - 1)
      |      + 0.5) / 16777216.0) AS priority
      |  FROM documents)
      |SELECT doc_id, lang, n_chars, priority
      |FROM pri ORDER BY priority DESC, doc_id LIMIT 50""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val v = conv(substring(md5(concat($"doc_id".cast("string"),
        lit(":wrs"))), 1, 6), 16, 10).cast("double")
      Tables.documents(s, d)
        .select($"doc_id", $"lang", $"n_chars",
          ($"n_chars".cast("double") / ((v + 0.5) / 16777216.0))
            .as("priority"))
        .orderBy($"priority".desc, $"doc_id")
        .limit(50)
  }

  /** p06: deterministic per-epoch shuffle — multi-epoch training wants
    * a DIFFERENT global permutation of the corpus each epoch, without
    * any engine RNG (rand() changes under repartitioning) and without a
    * global sort per epoch at materialization time. The permutation key
    * is md5(doc_id ':e' epoch): content-independent, epoch-salted, so
    * epoch 0 and epoch 1 orders are decorrelated but each is identical
    * on any cluster shape, any day, any partitioning.
    *
    * Emitted here: the first 4 docs of each epoch's order (the
    * verifiable prefix) plus the corpus size — enough for the oracle to
    * pin all three permutations. The full-scale materialization path is
    * the same expression as a sort key for the epoch's shard write
    * (w02's partitioned write, ordered by the key within shards); the
    * top-k prefix itself compiles to WindowGroupLimit per-partition
    * heaps, never a full sort. */
  val p06EpochShuffle: Q = Q(
    "p06_epoch_shuffle",
    """WITH e AS (SELECT unnest([0, 1, 2]) AS epoch),
      |keyed AS (
      |  SELECT e.epoch, d.doc_id,
      |    md5(d.doc_id::VARCHAR || ':e' || e.epoch::VARCHAR) AS k
      |  FROM documents d CROSS JOIN e),
      |r AS (SELECT epoch, doc_id, k, row_number() OVER (
      |        PARTITION BY epoch ORDER BY k, doc_id) AS pos
      |      FROM keyed)
      |SELECT CAST(epoch AS INT) AS epoch, CAST(pos AS INT) AS pos,
      |  doc_id, k AS shuffle_key
      |FROM r WHERE pos <= 4""".stripMargin) { (s, d) =>
    import s.implicits._
    val epochs = s.range(0, 3).select($"id".cast("int").as("epoch"))
    val keyed = Tables.documents(s, d).select($"doc_id")
      .crossJoin(broadcast(epochs))
      .select($"epoch", $"doc_id",
        md5(concat($"doc_id".cast("string"), lit(":e"),
          $"epoch".cast("string"))).as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"epoch").orderBy($"k", $"doc_id")
    keyed.withColumn("pos", row_number().over(w)).filter($"pos" <= 4)
      .select($"epoch", $"pos".cast("int").as("pos"), $"doc_id",
        $"k".as("shuffle_key"))
  }

  /** p07: sequence packing — the GPT-style concat-and-chunk that turns
    * variable-length documents into fixed 2048-token training examples
    * with zero padding waste: documents are laid out in p06's epoch-0
    * deterministic order, a running token prefix-sum assigns each doc
    * the bin its FIRST token lands in, and a doc whose span crosses a
    * boundary is the bin's straddler (split across examples, attention-
    * masked downstream). Every bin then holds ~budget tokens exactly —
    * no per-bin first-fit search, which is what makes this the packing
    * that scales: one sort + one prefix sum, both O(n log n).
    *
    * The prefix sum runs as the two-pass distributed form
    * ([[Ranks.runningSum]]: range-partition, local cumsum, broadcast
    * offsets) — no single-reducer sort even for the global order; in
    * production the same expressions typically also run per SHARD
    * (p01/p03 partition first), shrinking each prefix-sum domain
    * further. Emitted: the first 10 bins' integer stats (exact
    * prefix-sum arithmetic, fully hash-oracled). */
  val p07SequencePack: Q = Q(
    "p07_sequence_pack",
    """WITH ordered AS (SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
      |       md5(doc_id::VARCHAR || ':e0') AS k FROM documents),
      |c AS (SELECT doc_id, n_toks, sum(n_toks) OVER (ORDER BY k, doc_id
      |        ROWS UNBOUNDED PRECEDING) AS cum FROM ordered),
      |b AS (SELECT doc_id, n_toks,
      |        CAST((cum - n_toks) // 2048 AS BIGINT) AS bin,
      |        CAST((cum - 1) // 2048 AS BIGINT) AS bin_end FROM c)
      |SELECT CAST(bin AS INT) AS bin, count(*) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
      |  CAST(count(*) FILTER (WHERE bin_end > bin) AS BIGINT) AS n_straddle
      |FROM b WHERE bin < 10 GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    // the running token prefix-sum is the two-pass distributed form
    // (Ranks.runningSum) — bit-identical cum values (integer sums),
    // no single-partition window; see also the per-shard note above
    val toks = Tables.documents(s, d)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_toks"),
        md5(concat($"doc_id".cast("string"), lit(":e0"))).as("k"))
    // bucket = first two hex chars of the md5 sort key: 256 uniform
    // buckets whose string order IS the k order. Integer DIV, not
    // floor(double /): token totals beyond 2^53 would silently lose
    // exactness in the double quotient (oracle uses //)
    Ranks.runningSum(toks, substring($"k", 1, 2), Seq($"k", $"doc_id"),
      $"n_toks", "cum")
      .selectExpr("doc_id", "n_toks",
        "(cum - n_toks) DIV 2048 AS bin",
        "(cum - 1) DIV 2048 AS bin_end")
      .filter($"bin" < 10)
      .groupBy($"bin".cast("int").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_toks").cast("long").as("total_tokens"),
        count(when($"bin_end" > $"bin", 1)).cast("long").as("n_straddle"))
  }

  /** p08: DSIR-style importance weighting for domain-relevant data
    * selection (Xie et al., "Data Selection for Language Models via
    * Importance Resampling", 2023): score every document by
    * the log likelihood ratio of a TARGET domain's hashed-feature
    * distribution vs the raw corpus's, then keep the top-weighted docs
    * per source. Features are md5-hashed word buckets (B = 256, the
    * portable-hash idiom of d03); the target here is the `lang = 'en'`
    * slice standing in for "quality domain sample".
    *
    * Exactness design: the per-FEATURE log ratio is quantized ONCE to
    * an integer milli-nat score l_f = floor(1000 * (ln p_T(f) -
    * ln p_R(f))) (add-1 smoothing) — the only float op in the whole
    * query, and floor() only flips across engines if libm's ln lands
    * within ~1e-13 of a quantization boundary. Every per-DOCUMENT
    * score is then an exact BIGINT sum of those integers — partition-
    * order-independent, so byte-identical duplicate documents tie
    * EXACTLY and the (score DESC, doc_id) rank is deterministic. The
    * float-sum alternative (sum of per-word doubles) would jitter at
    * ulp level between runs and engines, making ranks of tied
    * duplicates unstable.
    *
    * Scale shape: feature table is B rows (two corpus scans with
    * map-side-combined 256-key aggregates — the shuffle carries at
    * most B rows per map partition), scoring is explode → BROADCAST
    * join against the B-row score table → one doc_id-keyed exact sum
    * (t12's shape), and the per-source top-3 plans as WindowGroupLimit
    * per-partition heaps. No driver-side collect; the 100 TB cost is
    * two text scans + one doc-keyed shuffle. */
  val p08Dsir: Q = Q(
    "p08_dsir",
    """WITH wf AS (SELECT doc_id, lang,
      |         ('0x' || substr(md5(w), 1, 6))::BIGINT % 256 AS f
      |       FROM (SELECT doc_id, lang,
      |               unnest(string_split(text, ' ')) AS w
      |             FROM documents)),
      |feat AS (SELECT f, count(*) AS r_f,
      |           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_f
      |         FROM wf GROUP BY f),
      |tot AS (SELECT sum(r_f) AS rr, sum(t_f) AS tt FROM feat),
      |scores AS (SELECT f,
      |             CAST(floor(1000.0 * (ln((t_f + 1.0) / (tt + 256.0))
      |               - ln((r_f + 1.0) / (rr + 256.0)))) AS BIGINT) AS l_f
      |           FROM feat, tot),
      |ds AS (SELECT doc_id, CAST(sum(l_f) AS BIGINT) AS score_milli
      |       FROM wf JOIN scores USING (f) GROUP BY doc_id),
      |r AS (SELECT d.source, ds.doc_id, ds.score_milli,
      |        row_number() OVER (PARTITION BY d.source
      |          ORDER BY ds.score_milli DESC, ds.doc_id) AS rk
      |      FROM ds JOIN documents d USING (doc_id))
      |SELECT source, CAST(rk AS INT) AS rk, doc_id, score_milli
      |FROM r WHERE rk <= 3""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val words = docs
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("w"))
      .select($"doc_id", $"lang",
        (conv(substring(md5($"w"), 1, 6), 16, 10).cast("long") % 256)
          .as("f"))
    // checkpoint the B-row feature table: tot and scores both read it,
    // so the corpus is exploded twice (feat + docScore), not three
    // times — same recompute-by-design budget as t12's token table
    val feat = words.groupBy($"f").agg(
      count(lit(1)).as("r_f"),
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("t_f"))
      .localCheckpoint()
    val tot = feat.agg(sum($"r_f").as("rr"), sum($"t_f").as("tt"))
    val scores = feat.crossJoin(broadcast(tot))
      .select($"f",
        floor(lit(1000.0) *
          (log(($"t_f" + 1.0) / ($"tt" + 256.0)) -
            log(($"r_f" + 1.0) / ($"rr" + 256.0)))).cast("long").as("l_f"))
    val docScore = words.join(broadcast(scores), Seq("f"))
      .groupBy($"doc_id").agg(sum($"l_f").as("score_milli"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"score_milli".desc, $"doc_id")
    docs.select($"doc_id", $"source").join(docScore, Seq("doc_id"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"source", $"rk", $"doc_id", $"score_milli")
  }

  /** p09: EXACT-fraction stratified sampling — exactly ceil(20%·n) of
    * each language stratum, selected by deterministic hash order
    * (md5(doc_id ':ss'): content-independent, salt-decorrelated from
    * p01/p02's decisions, reproducible on any cluster shape). The
    * expected-rate threshold form (p02) has binomial jitter; training
    * mixes with contractual stratum sizes need the exact count.
    *
    * 100 TB shape: a per-stratum rank is the classic single-task trap
    * when strata are few and huge (`PARTITION BY lang` = one task per
    * language). [[Ranks.stratumRank]] avoids it: windows partition on
    * (lang, 2-hex-char hash bucket) — 256 small groups per stratum,
    * and the prefix widens with the data if a 1/1280th corpus slice
    * still overfills a task — with broadcast per-(lang,bucket) offsets
    * stitching the global per-stratum rank; the quota join is a
    * |strata|-row broadcast. No empty-partitionSpec window anywhere
    * (the registry invariant PlanSpec enforces). */
  val p09StratifiedExact: Q = Q(
    "p09_stratified_exact",
    """WITH s AS (SELECT doc_id, lang,
      |             md5(doc_id::VARCHAR || ':ss') AS h FROM documents),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
      |          AS rk,
      |        count(*) OVER (PARTITION BY lang) AS n FROM s)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id
      |FROM r WHERE rk <= ceil(0.2 * n)""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"lang",
        md5(concat($"doc_id".cast("string"), lit(":ss"))).as("h"))
    stratifiedTake(docs, 0.2)
      .select($"lang", $"rk", $"doc_id")
  }

  /** Per-source temperature keep rates — shared by p10 and c04 so the
    * documented composition invariant (c04's mix stage keeps EXACTLY
    * the p10-kept docs) is structural, not a copy kept in sync by
    * hand. Sampling mass for source s is n_s^α, floor-quantized to
    * integer micro-units (exact BIGINT denominator — a raw double sum
    * is aggregation-order-dependent across engines); rate = budget ·
    * p_s / n_s capped at 1.0. Returns (source, n_orig, rate).
    *
    * The fixture corpora have UNIFORM per-source counts, so the driver
    * oracle only exercises the single-rate corner of this math;
    * SkewSpec drives the skewed path — distinct rates, the ≥1.0 cap,
    * and sub-0x1000 thresholds whose hex needs the lpad leading
    * zeros — against an independent Scala derivation. */
  def temperatureRates(docs: org.apache.spark.sql.DataFrame,
      alpha: Double = 0.7, budget: Double = 0.4)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_orig"))
    val w = counts.select($"source", $"n_orig",
      floor(pow($"n_orig", alpha) * 1000000).cast("long").as("wgt"))
    val tot = w.agg(sum($"n_orig").as("tn"), sum($"wgt").as("tw"))
    w.crossJoin(broadcast(tot))
      .select($"source", $"n_orig",
        least(lit(1.0),
          lit(budget) * $"tn" * $"wgt" / $"tw" / $"n_orig").as("rate"))
  }

  /** The deterministic keep decision at a (broadcast) rate: the md5
    * hex-threshold trick shared by p02/p10/c04 — salt decorrelates
    * operators; the lpad keeps sub-0x1000 thresholds 4 chars wide. */
  def keepAtRate(docId: org.apache.spark.sql.Column, salt: String,
      rate: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    rate >= 1.0 ||
      substring(md5(concat(docId.cast("string"), lit(salt))), 1, 4) <
        lpad(lower(hex(floor(rate * 65536).cast("bigint"))), 4, "0")

  /** Exact-fraction stratified take — shared by p09 and c04: rank per
    * language in deterministic (h, doc_id) order via the scale-safe
    * [[Ranks.stratumRank]] and keep exactly ceil(frac·n) per stratum.
    * Input must carry (doc_id, lang, h); all input columns survive,
    * plus `rk` and the per-stratum pre-cap count `n_stratum`. The
    * input is localCheckpointed once here — the quota aggregate and
    * the rank both read the narrow frame, not the upstream lineage
    * twice (at cluster scale: persist(DISK_ONLY)). */
  def stratifiedTake(df: org.apache.spark.sql.DataFrame, frac: Double)
      : org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val base = df.localCheckpoint()
    // NULL-SAFE quota join: the SQL twin's `PARTITION BY lang` ranks a
    // null-lang stratum like any other, and stratumRank's internals
    // already join strata with <=> — a using-column join here would
    // silently drop that stratum at the last step.
    val quotas = base.groupBy($"lang")
      .agg(count(lit(1)).as("n_stratum"),
        ceil(count(lit(1)) * frac).cast("long").as("quota"))
      .withColumnRenamed("lang", "__q_lang")
    Ranks.stratumRank(base, Seq($"lang"), substring($"h", 1, 2),
        Seq($"h", $"doc_id"), "rk")
      .join(broadcast(quotas), $"lang" <=> $"__q_lang")
      .drop("__q_lang")
      .filter($"rk" <= $"quota")
  }

  /** p10: TEMPERATURE-based mixture sampling — the canonical
    * multilingual/multi-source rebalancing: sampling mass for source s
    * is n_s^α (α = 0.7 here), so low-resource sources are boosted
    * relative to their raw share without the equal-count flattening of
    * p02 (α=1 keeps the natural mix, α=0 is uniform). The overall
    * budget is 40% of the corpus; each source's keep rate is
    * budget · p_s / n_s with p_s ∝ n_s^α, capped at 1.0 (upsampling
    * past 1 means repetition — an epoch concern (p06), not a keep
    * decision). The keep decision itself is p02's deterministic
    * hex-threshold on md5(doc_id ':tmp') — salt-decorrelated from
    * p01/p02/p09, reproducible on any cluster shape.
    *
    * Exactness: n^0.7 is floor-quantized to integer MICRO-units per
    * source (one pow per row, the p08 posture), so the mixture
    * denominator Σ n^0.7 is an exact BIGINT sum — a raw double sum
    * there is aggregation-order-dependent across engines and would
    * make the rate table flake at floor boundaries. The remaining
    * multiply/divide chain is DOUBLE on both engines with the same
    * left association — the oracle writes `CAST(0.4 AS DOUBLE)`
    * because DuckDB otherwise parses the literal as DECIMAL and
    * multiplies exactly before its one double division, a different
    * rounding chain that could flip the kept set when a rate lands
    * exactly on a floor(rate*65536) boundary. Same IEEE ops in the
    * same order on identical integer inputs ⇒ the broadcast rate
    * table matches the oracle's bit-for-bit.
    *
    * 100 TB shape: one count aggregate per source, two scalar
    * subqueries over the |sources|-row table, the rate table broadcast
    * back, keep decision map-only, one final aggregate. */
  val p10TemperatureMix: Q = Q(
    "p10_temperature_mix",
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
      |kept AS (
      |  SELECT d.source FROM documents d JOIN r ON d.source = r.source
      |  WHERE r.rate >= 1.0
      |     OR substr(md5(d.doc_id::VARCHAR || ':tmp'), 1, 4) <
      |        lpad(lower(to_hex(CAST(floor(r.rate * 65536) AS BIGINT))),
      |             4, '0'))
      |SELECT r.source, r.n_orig, count(k.source) AS n_kept,
      |  round(r.rate, 6) AS target_rate
      |FROM r LEFT JOIN kept k ON r.source = k.source
      |GROUP BY r.source, r.n_orig, r.rate""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val rates = temperatureRates(docs)
    val kept = docs.join(broadcast(rates), "source")
      .filter(keepAtRate($"doc_id", ":tmp", $"rate"))
      .select($"source".as("k_source"))
    rates.join(kept, $"source" === $"k_source", "left")
      .groupBy($"source", $"n_orig", $"rate")
      .agg(count($"k_source").as("n_kept"))
      .select($"source", $"n_orig", $"n_kept",
        round($"rate", 6).as("target_rate"))
  }

  /** p11: LEAK-FREE GROUP SPLIT — the REPAIR for what dq05 audits.
    * dq05 reports near-dup pairs crossing the train/val/test boundary;
    * the principled fix is not to move individual leaked docs (each
    * move can create a new leak with the doc's OTHER near-dups) but to
    * split by NEAR-DUP CLUSTER: every doc is assigned the split of its
    * cluster representative (d06b's connected components over d03's
    * LSH pairs; singletons represent themselves), so no detected
    * near-dup pair can cross a split BY CONSTRUCTION — both endpoints
    * share a cluster id, hence a representative, hence a split.
    * Singleton docs (the overwhelming majority) get md5(doc_id) —
    * p01's exact device — so the repair perturbs only clustered docs
    * and the 90/5/5 rates hold up to cluster-size jitter. The residual
    * leak risk is exactly d03's measured recall gap (SCALE artifact
    * d03 rows), not a property of this operator.
    *
    * Output is the per-doc assignment WITH the representative (the
    * audit trail: rep != doc_id marks a doc whose split was decided by
    * its cluster). Oracle chains d06b's recursive-CC SQL with p01's
    * split CASE — the whole repair differential-tested end-to-end.
    *
    * 100 TB shape: d03's banded self-join + the star-contraction CC
    * dominate (both shipped scale paths); the assignment itself is one
    * left join of the corpus against the (small) clustered-doc table
    * and a map-side md5. */
  val p11LeakfreeSplit: Q = Q(
    "p11_leakfree_split",
    s"""${Dedup.LshCcCtes},
      |reps AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep
      |         FROM documents d LEFT JOIN clusters c
      |           ON d.doc_id = c.doc_id)
      |SELECT doc_id, rep,
      |  CASE WHEN substr(md5(rep::VARCHAR), 1, 2) < 'e6' THEN 'train'
      |       WHEN substr(md5(rep::VARCHAR), 1, 2) < 'f3' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM reps""".stripMargin) { (s, d) =>
    import s.implicits._
    val clusters = Dedup.connectedComponentsStars(
      Dedup.minhashPairs(s, d, numHashes = 64, bands = 16)
        .select($"doc_a", $"doc_b"))
      .select($"node".as("doc_id"), $"label".as("cluster_id"))
    Tables.documents(s, d).select($"doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("rep"))
      .select($"doc_id", $"rep",
        when(substring(md5($"rep".cast("string")), 1, 2) < "e6", "train")
          .when(substring(md5($"rep".cast("string")), 1, 2) < "f3", "val")
          .otherwise("test").as("split"))
  }

  val all: Seq[Q] = Seq(p01TrainSplit, p02TrainingMix, p03ShardPack,
    p04ChunkDocs, p05WeightedSample, p06EpochShuffle, p07SequencePack,
    p08Dsir, p09StratifiedExact, p10TemperatureMix, p11LeakfreeSplit)
}
