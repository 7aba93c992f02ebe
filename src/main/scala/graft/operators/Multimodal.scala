package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Multimodal column handling: opaque binary payloads + typed metadata
  * structs, with decode / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[MultimodalStub.decodeStub]]); the
  * Spark-side plumbing — BinaryType columns, metadata structs, typed
  * Dataset batch processing via mapPartitions (the JVM analogue of
  * mapInPandas batch UDFs: one iterator per partition, bounded memory,
  * no per-row UDF dispatch), frame explode — is real and oracle-checked
  * where expressible.
  *
  * 100 TB notes: payloads stay opaque bytes end-to-end (no driver
  * materialization); per-partition batch decode amortizes codec init;
  * frame sampling multiplies rows, so it runs AFTER any filter pushdown
  * and feeds map-side aggregation. */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      format: String, n_bytes: Long)
  final case class MediaFeatures(doc_id: Long, format: String,
      n_bytes: Long, checksum: String, feature_dim: Int, feature_norm: Double)

  /** m01: binary payload + metadata struct + frame sampling, fully
    * declarative (payload synthesized deterministically from text — the
    * fixture set has no real media column). */
  val m01BinaryFrames: Q = Q(
    "m01_binary_frames",
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  md5(text) AS checksum,
      |  CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0) AS INT)
      |    AS n_frames,
      |  md5(substr(text, 1, 64)) AS first_frame_sig
      |FROM documents""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id",
      octet_length($"text".cast("binary")).as("n_bytes"),
      md5($"text").as("checksum"),
      ceil(octet_length($"text".cast("binary")) / 64.0).cast("int")
        .as("n_frames"),
      md5(substring($"text", 1, 64)).as("first_frame_sig"))
  }

  /** m02: typed-Dataset batch decode via mapPartitions with the stubbed
    * codec — the production shape for real decoders (one codec context
    * per partition, bounded memory, no per-row dispatch). HASH-ORACLED
    * since round 15: the stub's banded byte-sums are integer-valued
    * (see [[MultimodalStub.decodeStub]]), so the emitted norm is
    * sqrt(exact BIGINT) — one correctly-rounded op both engines agree
    * on to the bit — and DuckDB replays the whole "decode" from the
    * same payload bytes (the m03 CTE pattern). What stays genuinely
    * engine-side — the mapPartitions execution shape — is pinned by
    * MultimodalSpec; the oracle proves the ARITHMETIC and the
    * metadata (dims by format, byte counts, checksums).
    *
    * PARITY PRECONDITION (round-15 advice): the oracle bands by
    * CHARACTER (ascii over length) while the pipeline bands the UTF-8
    * BYTES of text.cast(binary) — identical iff the corpus is pure
    * ASCII. DuckDB 1.0 cannot index blob bytes (no substring/get_bit
    * over BLOB), so the precondition is ASSERTED instead of the oracle
    * rewritten: MultimodalSpec fails loudly if any fixture doc carries
    * a multi-byte character. The same precondition covers the whole
    * character-banded family (m03/m03b/m04/m05). */
  val m02BatchDecode: Q = Q(
    "m02_batch_decode",
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'img/fake-rgb'
      |         ELSE 'audio/fake-pcm' END AS format,
      |    CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 8 END AS dim,
      |    text FROM documents),
      |b2 AS (
      |  SELECT doc_id, (i - 1) % dim AS band,
      |    ascii(substr(text, CAST(i AS INT), 1)) AS v
      |  FROM m, LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) r),
      |sums AS (SELECT doc_id, band, CAST(sum(v) AS BIGINT) AS s
      |         FROM b2 GROUP BY doc_id, band),
      |norms AS (SELECT doc_id, sqrt(CAST(sum(s * s) AS DOUBLE))
      |            AS feature_norm
      |          FROM sums GROUP BY doc_id)
      |SELECT m.doc_id, m.format,
      |  CAST(octet_length(CAST(m.text AS BLOB)) AS BIGINT) AS n_bytes,
      |  md5(m.text) AS checksum, CAST(m.dim AS INT) AS feature_dim,
      |  coalesce(n.feature_norm, 0.0) AS feature_norm
      |FROM m LEFT JOIN norms n USING (doc_id)""".stripMargin) { (s, d) =>
    // LEFT JOIN + coalesce (the m03 oracle's convention): an
    // empty-payload doc has no band rows on the SQL side but the
    // pipeline still emits its row with norm 0.0 — an inner join would
    // silently drop it from the oracle only (review finding, round 15)
    decodePipeline(s, d).toDF()
  }

  def decodePipeline(s: SparkSession, d: String): Dataset[MediaFeatures] = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("payload"),
        (when($"doc_id" % 2 === 0, "img/fake-rgb")
          .otherwise("audio/fake-pcm")).as("format"),
        octet_length($"text".cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRow]
    media.mapPartitions { batch =>
      // One codec context per partition (amortized init), like a
      // mapInPandas batch: decode each payload to a feature vector.
      batch.map { row =>
        val feat = MultimodalStub.decodeStub(row.payload, row.format)
        MediaFeatures(row.doc_id, row.format, row.n_bytes,
          MultimodalStub.hexChecksum(row.payload), feat.length,
          math.sqrt(feat.map(x => x * x).sum))
      }
    }
  }

  final case class ImgFeat(doc_id: Long, f: Array[Double], nrm: Double)

  /** m03: the multimodal → similarity bridge — binary payloads are
    * feature-extracted per partition (the m02 batch-decode shape) and
    * fed straight into cosine top-k (the s01 shape): "find similar
    * media" end-to-end without any real codec in the container.
    *
    * Features are 16 banded BYTE SUMS kept integer-valued: band sums
    * stay far below 2^53, so products and the 16-term dot are EXACT in
    * doubles, norms are one correctly-rounded sqrt of an exact
    * integer, and sim = dot/(nrmA*nrmB) evaluates bit-identically in
    * any engine — which is what lets a cross-engine oracle hash the
    * similarity VALUES of a floating-point kNN, not just its ids.
    *
    * 100 TB notes: extraction is one mapPartitions pass (codec init
    * amortized, payloads never leave executors); the all-pairs join is
    * the brute ground truth exactly like s01 — the documented scale
    * path is bucketing the extracted vectors through s02/s04's LSH/IVF
    * instead of changing this operator's contract. */
  val m03MediaSimilarity: Q = Q(
    "m03_media_similarity",
    """WITH imgs AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |bytes AS (
      |  SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text
      |  FROM imgs),
      |b2 AS (
      |  SELECT doc_id, (i - 1) % 16 AS band,
      |    ascii(substr(text, CAST(i AS INT), 1)) AS v
      |  FROM bytes),
      |sums0 AS (
      |  SELECT doc_id, band, CAST(sum(v) AS BIGINT) AS s
      |  FROM b2 GROUP BY doc_id, band),
      |sums AS (
      |  SELECT i.doc_id, d.band, coalesce(s0.s, 0) AS s
      |  FROM imgs i CROSS JOIN (SELECT unnest(range(0, 16)) AS band) d
      |  LEFT JOIN sums0 s0 ON s0.doc_id = i.doc_id AND s0.band = d.band),
      |feat AS (
      |  SELECT doc_id, list(CAST(s AS DOUBLE) ORDER BY band) AS f,
      |    sqrt(CAST(sum(s * s) AS DOUBLE)) AS nrm
      |  FROM sums GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_id, b.doc_id AS neighbor_id,
      |    list_dot_product(a.f, b.f) / (a.nrm * b.nrm) AS sim
      |  FROM feat a JOIN feat b ON a.doc_id <> b.doc_id),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY sim DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT doc_id, neighbor_id, sim FROM r WHERE rn <= 3"""
      .stripMargin) { (s, d) =>
    import s.implicits._
    val feats = mediaFeatures(s, d)
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val a = feats.toDF("doc_id", "f", "nrm")
    val b = feats.toDF("neighbor_id", "fb", "nrmb")
    // codegen'd double kernel — the HOF aggregate(zip_with(...)) form
    // allocates a 16-element array per PAIR and runs interpreted
    val dot = column(graft.functions.DoubleVecDot(
      expression($"f"), expression($"fb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"sim".desc, $"neighbor_id")
    a.join(b, $"doc_id" =!= $"neighbor_id")
      .select($"doc_id", $"neighbor_id",
        (dot / ($"nrm" * $"nrmb")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"doc_id", $"neighbor_id", $"sim")
  }

  /** m03b: media similarity through LSH BUCKETS — the scale path m03's
    * scaladoc defers to ("bucketing the extracted vectors through
    * s02/s04's LSH"), now a registered, oracled query: the same
    * per-partition feature extraction, then candidates restricted to
    * docs sharing at least one 4-bit hyperplane band (2 bands, the s02
    * OR construction — one fat signature over-splits the residual
    * directions and starves recall), exact cosine + top-3 within the
    * candidates (the round-8 sf1 step measured the all-pairs form at
    * 22x on 10x data; here pair work is bounded by band-bucket sizes).
    *
    * MEAN-CENTERING makes hyperplane LSH effective on this data: text
    * byte-sum features all point near the corpus-average direction, so
    * raw hyperplane signs would agree everywhere and collapse to one
    * bucket; the per-band corpus mean is subtracted first and planes
    * cut the RESIDUAL directions. The mean is exact cross-engine: band
    * sums are integers whose corpus totals stay far below 2^53, so the
    * double sum is partition-order-independent and the one division is
    * the same IEEE op in both engines; residuals, plane dots (left
    * fold, matching DuckDB's list_dot_product order), and signs then
    * evaluate bit-identically — which is what lets the oracle recompute
    * the buckets from scratch in SQL (s02's proven pattern, s02's
    * md5 plane family at dim 16). */
  val m03bMediaSimilarityLsh: Q = Q(
    "m03b_media_similarity_lsh",
    """WITH imgs AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |bytes AS (
      |  SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text
      |  FROM imgs),
      |b2 AS (
      |  SELECT doc_id, (i - 1) % 16 AS band,
      |    ascii(substr(text, CAST(i AS INT), 1)) AS v
      |  FROM bytes),
      |sums0 AS (
      |  SELECT doc_id, band, CAST(sum(v) AS BIGINT) AS s
      |  FROM b2 GROUP BY doc_id, band),
      |sums AS (
      |  SELECT i.doc_id, d.band, coalesce(s0.s, 0) AS s
      |  FROM imgs i CROSS JOIN (SELECT unnest(range(0, 16)) AS band) d
      |  LEFT JOIN sums0 s0 ON s0.doc_id = i.doc_id AND s0.band = d.band),
      |feat AS (
      |  SELECT doc_id, list(CAST(s AS DOUBLE) ORDER BY band) AS f,
      |    sqrt(CAST(sum(s * s) AS DOUBLE)) AS nrm
      |  FROM sums GROUP BY doc_id),
      |mv AS (
      |  SELECT list(CAST(ts AS DOUBLE) / n ORDER BY band) AS m
      |  FROM (SELECT band, CAST(sum(s) AS BIGINT) AS ts, count(*) AS n
      |        FROM sums GROUP BY band)),
      |dims AS (SELECT unnest(range(0, 16)) AS i),
      |ps AS (SELECT unnest(range(0, 8)) AS p),
      |planes AS (
      |  SELECT p, list(CAST((('0x' || substr(md5(CAST(p AS VARCHAR)
      |      || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000)
      |      AS DOUBLE) / 1000.0 ORDER BY i) AS pv
      |  FROM ps, dims GROUP BY p),
      |resid AS (
      |  SELECT f.doc_id,
      |    list_transform(range(1, 17), j -> f.f[j] - mv.m[j]) AS r
      |  FROM feat f CROSS JOIN mv),
      |bits AS (
      |  SELECT doc_id, p,
      |    CASE WHEN list_dot_product(r, pv) >= 0 THEN 1 ELSE 0 END AS bit
      |  FROM resid CROSS JOIN planes),
      |sigs AS (
      |  SELECT doc_id, p // 4 AS band,
      |    CAST(sum(bit << (p % 4)) AS BIGINT) AS sig
      |  FROM bits GROUP BY doc_id, p // 4),
      |bsz AS (SELECT band, sig, count(*) AS n FROM sigs
      |        GROUP BY band, sig),
      |sc AS (
      |  SELECT s.doc_id, s.band, s.sig,
      |    ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 4))::BIGINT
      |      % CAST(ceil(CAST(b.n AS DOUBLE) / 256) AS BIGINT) AS cell
      |  FROM sigs s JOIN bsz b ON s.band = b.band AND s.sig = b.sig),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS neighbor_id
      |  FROM sc a JOIN sc b
      |    ON a.band = b.band AND a.sig = b.sig AND a.cell = b.cell
      |      AND a.doc_id <> b.doc_id),
      |pairs AS (
      |  SELECT c.doc_id, c.neighbor_id,
      |    list_dot_product(fa.f, fb.f) / (fa.nrm * fb.nrm) AS sim
      |  FROM cands c
      |  JOIN feat fa ON fa.doc_id = c.doc_id
      |  JOIN feat fb ON fb.doc_id = c.neighbor_id),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY sim DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT doc_id, neighbor_id, sim
      |FROM r WHERE rn <= 3""".stripMargin) { (s, d) =>
    mediaTopKFromSigs(mediaFeatSigs(s, d))
  }

  /** LSH-bucketed candidate pairs from a (doc_id, f, nrm, band, sig)
    * frame: docs sharing AT LEAST ONE band (the s02 OR construction —
    * one fat band over-splits residual directions and starves recall),
    * deduped on ids BEFORE the vectors rejoin.
    * FAT-BUCKET CAP (the d07 salting trade): concentrated features
    * make one residual direction dominate — at the sf1 step the
    * biggest band bucket held ~40% of the corpus, quadratic-grade —
    * so buckets over `cap` docs salt into md5 sub-cells and pair work
    * is bounded by N*cap per band; recall inside a fat bucket decays
    * by the documented ~1/cells, everywhere else is untouched (the
    * fixture's buckets are all under the cap). Factored out so the
    * ScaleStressSpec band-shape experiment measures candidate cost on
    * the REAL pipeline, not a reimplementation. */
  /** The ONE fat-bucket salting formula ([[mediaCandidates]]'s cap
    * contract): rows joined to their (band, sig) bucket size, each doc
    * assigned its md5 sub-cell of ceil(n/cap) cells. Shared by the
    * single- and multi-probe candidate generators so the salting
    * cannot drift between the shipped path and the experiment that
    * measures it. */
  private def withSaltCell(rows: org.apache.spark.sql.DataFrame,
      sizes: org.apache.spark.sql.DataFrame, cap: Int)
      : org.apache.spark.sql.DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    rows.join(broadcast(sizes), Seq("band", "sig"))
      .withColumn("cell",
        conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("long") % ceil($"n" / cap.toDouble).cast("long"))
  }

  private def bucketSizes(banded: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = banded.sparkSession
    import s.implicits._
    banded.groupBy($"band", $"sig").agg(count(lit(1)).as("n"))
  }

  def mediaCandidates(banded: org.apache.spark.sql.DataFrame,
      cap: Int = 256): org.apache.spark.sql.DataFrame = {
    val s = banded.sparkSession
    import s.implicits._
    val salted = withSaltCell(banded, bucketSizes(banded), cap)
    salted.select($"doc_id", $"band", $"sig", $"cell")
      .join(salted.select($"doc_id".as("neighbor_id"), $"band", $"sig",
        $"cell"), Seq("band", "sig", "cell"))
      .filter($"doc_id" =!= $"neighbor_id")
      .select($"doc_id", $"neighbor_id").distinct()
  }

  /** MULTI-PROBE variant of [[mediaCandidates]]: each doc ALSO probes
    * the one-bit-flip neighbors of each band signature (query-side
    * expansion only — the stored side keeps one row per (doc, band)),
    * the standard cheap-recall lever when bucket boundaries split true
    * neighbors. A flipped probe lands in the neighbor bucket under the
    * SAME salting discipline (its md5 cell against THAT bucket's
    * size), so fat-bucket pair work stays bounded by N·cap and the
    * flip multiplies candidate cost by at most 1+bandBits. Probe rows
    * whose flipped signature matches no stored bucket are dropped by
    * the size join. Measured head-to-head against the single-probe
    * shape at 10× (ScaleStressSpec m03b_multiprobe_* rows): recall
    * 0.38 at 2.15× candidates vs single-probe 2×4's 0.26 and 4×2's
    * 0.32 at 1.63× — the highest ceiling of the three at the same
    * ~0.10-recall-per-candidate-unit rate. The registered m03b keeps
    * the cheapest shape (single-probe 2×4); this is the measured
    * turn-it-up knob when a corpus needs the recall. */
  def mediaCandidatesMultiProbe(banded: org.apache.spark.sql.DataFrame,
      cap: Int = 256, bandBits: Int = 4): org.apache.spark.sql.DataFrame = {
    val s = banded.sparkSession
    import s.implicits._
    val sizes = bucketSizes(banded)
    val stored = withSaltCell(banded, sizes, cap)
      .select($"doc_id".as("neighbor_id"), $"band", $"sig", $"cell")
    val probes = withSaltCell(banded.select($"doc_id", $"band",
      explode(array($"sig" +:
        (0 until bandBits).map(b => $"sig".bitwiseXOR(lit(1L << b))): _*))
        .as("sig")), sizes, cap)
      .select($"doc_id", $"band", $"sig", $"cell")
    probes.join(stored, Seq("band", "sig", "cell"))
      .filter($"doc_id" =!= $"neighbor_id")
      .select($"doc_id", $"neighbor_id").distinct()
  }

  /** m03b's exact-cosine + top-3 stages over an explicit candidate
    * frame — split from [[mediaTopKFromSigs]] so the multi-probe
    * experiment reranks through the exact same shipped stages. */
  def mediaTopKOverCandidates(banded: org.apache.spark.sql.DataFrame,
      cands: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = banded.sparkSession
    import s.implicits._
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val vecs = banded.select($"doc_id", $"f", $"nrm")
      .dropDuplicates("doc_id")
    val dot = column(graft.functions.DoubleVecDot(
      expression($"f"), expression($"fb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"sim".desc, $"neighbor_id")
    cands
      .join(vecs, "doc_id")
      .join(vecs.select($"doc_id".as("neighbor_id"), $"f".as("fb"),
        $"nrm".as("nrmb")), "neighbor_id")
      .select($"doc_id", $"neighbor_id",
        (dot / ($"nrm" * $"nrmb")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"doc_id", $"neighbor_id", $"sim")
  }

  /** m03b's candidate + exact-cosine + top-3 stages over a banded
    * signature frame. */
  def mediaTopKFromSigs(banded: org.apache.spark.sql.DataFrame,
      cap: Int = 256): org.apache.spark.sql.DataFrame =
    mediaTopKOverCandidates(banded, mediaCandidates(banded, cap))

  /** m03's per-partition "codec" feature extraction (the
    * decodePipeline contract) — the ONE copy the all-pairs ground
    * truth (m03) and the bucketing path (m03b via [[mediaFeatSigs]])
    * both call: the recall floors and the oracle's mean-centering
    * exactness argument assume bit-identical features, so a second
    * inline copy would be a silent-drift hazard. Materialized once —
    * the dataset feeds the corpus mean and both join sides; with a
    * real decoder at scale a recompute decodes the corpus again. */
  def mediaFeatures(s: SparkSession, d: String): Dataset[ImgFeat] = {
    import s.implicits._
    Tables.documents(s, d)
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val bands = new Array[Double](16)
          var i = 0
          while (i < payload.length) {
            bands(i % 16) += (payload(i) & 0xFF)
            i += 1
          }
          ImgFeat(id, bands, math.sqrt(bands.map(x => x * x).sum))
        }
      }
      .localCheckpoint()
  }

  /** (doc_id, f, nrm, band, sig) — m03's extracted features plus the
    * mean-centered hyperplane BAND signatures m03b buckets on (8
    * planes as 2 bands x 4 bits, two rows per doc). Shared with
    * MultimodalSpec so the bucket-split guard inspects the REAL
    * signature distribution, not a reimplementation. */
  def mediaFeatSigs(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    mediaFeatSigsCfg(s, d, nBands = 2, bandBits = 4)

  /** [[mediaFeatSigs]] with an explicit band shape — the
    * ScaleStressSpec experiment compares the shipped 2 bands × 4 bits
    * against 4 × 2 (more, coarser probes) on the 10× fixture; the
    * production config above is whichever the measured recall/cost
    * trade favors. */
  def mediaFeatSigsCfg(s: SparkSession, d: String, nBands: Int,
      bandBits: Int): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val a = mediaFeatures(s, d).toDF("doc_id", "f", "nrm")
    val mean = a.agg(array((0 until 16).map(i =>
      sum(element_at($"f", i + 1)) / count(lit(1))): _*).as("m"))
    val bandsCol = {
      val bits = Similarity.hyperplaneSketch(
        zip_with($"f", $"m", (x, mm) => x - mm),
        nPlanes = nBands * bandBits, dim = 16)
      array((0 until nBands).map(b => struct(
        lit(b).as("band"),
        aggregate(zip_with(
            slice(bits, lit(b * bandBits + 1), lit(bandBits)),
            sequence(lit(0), lit(bandBits - 1)),
            (bit, i) => bit * call_function("shiftleft", lit(1), i)),
          lit(0), (acc, v) => acc + v).as("sig"))): _*)
    }
    a.crossJoin(broadcast(mean))
      .select($"doc_id", $"f", $"nrm", explode(bandsCol).as("bb"))
      .select($"doc_id", $"f", $"nrm", $"bb.band", $"bb.sig")
  }

  /** m04: SHARED-FRAME pairs across media — the video/audio dedup
    * primitive (shared intros, outros, re-uploads, spliced segments):
    * hash every fixed-size payload frame (m01's 64-byte chunking),
    * drop BOILERPLATE frames appearing in more than 32 media (the
    * d11/t09 document-frequency cap — at corpus scale a frame shared
    * by 1M videos would otherwise emit 10¹² join pairs; a capped
    * frame's posting list bounds pair work at 32²/2 per signature),
    * then join media on the surviving frame hashes and report pairs
    * sharing ≥ 2 frames with their overlap fraction of the shorter
    * payload.
    *
    * Differs from d01/d09 in what it keys on: byte-aligned opaque
    * payload chunks, NO tokenization — the only dedup signal available
    * for media columns where text-side shingles don't exist. Exact
    * duplicates share every frame; byte-shifted near-dups are m03b's
    * feature-space territory (the two are complementary, like d01 vs
    * d03 on text).
    *
    * 100 TB: one map-side chunk+hash pass (frames never leave
    * executors as bytes — only 32-char signatures shuffle), one df
    * aggregate, a capped signature join, two broadcast-size joins for
    * the frame counts. */
  val m04SharedFrames: Q = Q(
    "m04_shared_frames",
    """WITH media AS (SELECT doc_id, text FROM documents
      |               WHERE doc_id % 2 = 0),
      |nf AS (SELECT doc_id,
      |         CAST(ceil(length(text) / 64.0) AS BIGINT) AS n_frames
      |       FROM media),
      |frames AS (SELECT DISTINCT m.doc_id,
      |             md5(substr(m.text, CAST((k - 1) * 64 + 1 AS INT), 64))
      |               AS fh
      |           FROM media m JOIN nf USING (doc_id),
      |             LATERAL (SELECT unnest(range(1, nf.n_frames + 1)) AS k)
      |               kk),
      |rare AS (SELECT fh FROM (
      |           SELECT fh, count(*) AS nd FROM frames GROUP BY fh)
      |         WHERE nd >= 2 AND nd <= 32),
      |ff AS (SELECT f.doc_id, f.fh FROM frames f JOIN rare USING (fh)),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |            CAST(count(*) AS BIGINT) AS n_shared
      |          FROM ff a JOIN ff b
      |            ON a.fh = b.fh AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT doc_a, doc_b, n_shared,
      |  round(CAST(n_shared AS DOUBLE) /
      |    least(na.n_frames, nb.n_frames), 6) AS overlap
      |FROM pairs
      |JOIN nf na ON pairs.doc_a = na.doc_id
      |JOIN nf nb ON pairs.doc_b = nb.doc_id
      |WHERE n_shared >= 2""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d).filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"text",
        ceil(length($"text") / 64.0).cast("long").as("n_frames"))
    // frames are DISTINCT signatures per doc (a frame repeated inside
    // one payload counts once, like d04's shingle sets)
    val frames = media
      .select($"doc_id",
        explode(sequence(lit(1L), $"n_frames")).as("k"), $"text")
      .select($"doc_id",
        md5($"text".substr(($"k" - 1) * 64 + 1, lit(64))).as("fh"))
      .distinct()
    val rare = frames.groupBy($"fh").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= 2 && $"nd" <= 32).select($"fh")
    val ff = frames.join(rare, "fh")
    val nf = media.select($"doc_id", $"n_frames")
    ff.as("a").join(ff.as("b"),
        $"a.fh" === $"b.fh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= 2)
      .join(nf.select($"doc_id".as("doc_a"), $"n_frames".as("na")),
        "doc_a")
      .join(nf.select($"doc_id".as("doc_b"), $"n_frames".as("nb")),
        "doc_b")
      .select($"doc_a", $"doc_b", $"n_shared",
        round($"n_shared" / least($"na", $"nb"), 6).as("overlap"))
  }

  /** m05: ALIGNED shared-frame pairs — m04's dedup signal upgraded
    * with TEMPORAL structure: for each shared-frame pair, the dominant
    * frame-position offset (the delta most shared frames agree on, tie
    * → smallest) and how much of the overlap rides it. A spliced or
    * re-uploaded segment ALIGNS — its shared frames sit at one
    * constant offset (aligned_frac → 1 at the splice delta) — while
    * coincidental boilerplate frames scatter across deltas; that
    * distinction is what lets a video-dedup pipeline cut at segment
    * granularity instead of whole-asset.
    *
    * Positions are each signature's FIRST occurrence in its payload
    * (min k), so the shared-frame SET is exactly m04's and
    * n_aligned ≤ n_shared by construction.
    *
    * 100 TB: m04's df-capped posting lists bound pair work (≤ 32²/2
    * per signature); on top ride one (pair, delta) aggregate and one
    * per-pair window over ≤ n_shared rows — no new corpus-sized
    * shuffle. */
  val m05AlignedFrames: Q = Q(
    "m05_aligned_frames",
    """WITH media AS (SELECT doc_id, text FROM documents
      |               WHERE doc_id % 2 = 0),
      |nf AS (SELECT doc_id,
      |         CAST(ceil(length(text) / 64.0) AS BIGINT) AS n_frames
      |       FROM media),
      |fpos AS (SELECT doc_id, fh, min(k) AS k FROM (
      |           SELECT m.doc_id, kk.k,
      |             md5(substr(m.text, CAST((kk.k - 1) * 64 + 1 AS INT),
      |               64)) AS fh
      |           FROM media m JOIN nf USING (doc_id),
      |             LATERAL (SELECT unnest(range(1, nf.n_frames + 1)) AS k)
      |               kk)
      |         GROUP BY doc_id, fh),
      |rare AS (SELECT fh FROM (
      |           SELECT fh, count(*) AS nd FROM fpos GROUP BY fh)
      |         WHERE nd >= 2 AND nd <= 32),
      |ff AS (SELECT f.doc_id, f.fh, f.k FROM fpos f JOIN rare USING (fh)),
      |hits AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |           a.k - b.k AS delta
      |         FROM ff a JOIN ff b
      |           ON a.fh = b.fh AND a.doc_id < b.doc_id),
      |byd AS (SELECT doc_a, doc_b, delta,
      |          CAST(count(*) AS BIGINT) AS n_at
      |        FROM hits GROUP BY doc_a, doc_b, delta),
      |tot AS (SELECT doc_a, doc_b, CAST(sum(n_at) AS BIGINT) AS n_shared
      |        FROM byd GROUP BY doc_a, doc_b),
      |best AS (SELECT doc_a, doc_b, delta, n_at,
      |           row_number() OVER (PARTITION BY doc_a, doc_b
      |             ORDER BY n_at DESC, delta) AS rk
      |         FROM byd)
      |SELECT t.doc_a, t.doc_b, t.n_shared, b.delta AS best_delta,
      |  b.n_at AS n_aligned,
      |  round(CAST(b.n_at AS DOUBLE) / t.n_shared, 6) AS aligned_frac
      |FROM tot t JOIN best b
      |  ON t.doc_a = b.doc_a AND t.doc_b = b.doc_b AND b.rk = 1
      |WHERE t.n_shared >= 2""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d).filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"text",
        ceil(length($"text") / 64.0).cast("long").as("n_frames"))
    val framesPos = media
      .select($"doc_id",
        explode(sequence(lit(1L), $"n_frames")).as("k"), $"text")
      .select($"doc_id", $"k",
        md5($"text".substr(($"k" - 1) * 64 + 1, lit(64))).as("fh"))
      .groupBy($"doc_id", $"fh").agg(min($"k").as("k"))
    val rare = framesPos.groupBy($"fh").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= 2 && $"nd" <= 32).select($"fh")
    val ff = framesPos.join(rare, "fh")
    val byDelta = ff.as("a").join(ff.as("b"),
        $"a.fh" === $"b.fh" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        ($"a.k" - $"b.k").as("delta"))
      .groupBy($"doc_a", $"doc_b", $"delta")
      .agg(count(lit(1)).as("n_at"))
    val tot = byDelta.groupBy($"doc_a", $"doc_b")
      .agg(sum($"n_at").as("n_shared"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_a", $"doc_b").orderBy($"n_at".desc, $"delta")
    byDelta.withColumn("rk", row_number().over(wBest))
      .filter($"rk" === 1)
      .join(tot, Seq("doc_a", "doc_b"))
      .filter($"n_shared" >= 2)
      .select($"doc_a", $"doc_b", $"n_shared",
        $"delta".as("best_delta"), $"n_at".as("n_aligned"),
        round($"n_at".cast("double") / $"n_shared", 6).as("aligned_frac"))
  }

  val all: Seq[Q] = Seq(m01BinaryFrames, m02BatchDecode,
    m03MediaSimilarity, m03bMediaSimilarityLsh, m04SharedFrames,
    m05AlignedFrames)
}

/** STUB CODEC — stands in for image/audio decoding libraries that are
  * not present in this container. Deterministic by construction so
  * tests and reruns agree; swap `decodeStub` for a real codec binding
  * (JNI/ImageIO/ffmpeg) in production without touching the pipeline. */
object MultimodalStub {

  /** Fake "decode": derives a fixed-dim feature vector from payload
    * bytes (16/8 banded byte-sums — m03's feature convention). NOT a
    * real decoder; a codec binding replaces this function wholesale.
    * The sums are INTEGER-VALUED doubles (≤ n_bytes·255 ≪ 2^53), so
    * every downstream square/sum/sqrt is exact-then-correctly-rounded —
    * the device that graduated m02 from rows-only to hash-oracled (the
    * previous per-byte /255.0 made each band an order-sensitive IEEE
    * sum no other engine could replay; one deferred scaling by a
    * consumer that wants [0,1] features is the same numbers, exact). */
  def decodeStub(payload: Array[Byte], format: String): Array[Double] = {
    val dim = if (format.startsWith("img/")) 16 else 8
    val out = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF).toDouble
      i += 1
    }
    out
  }

  def hexChecksum(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
}
