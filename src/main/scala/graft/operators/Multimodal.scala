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
    * codec — the production shape for real decoders. Rows-only driver
    * check; exact values pinned in MultimodalSpec. */
  val m02BatchDecode: Q = Q.noOracle("m02_batch_decode") { (s, d) =>
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
      |sums AS (
      |  SELECT doc_id, band, CAST(sum(v) AS BIGINT) AS s
      |  FROM b2 GROUP BY doc_id, band),
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
    val feats: Dataset[ImgFeat] = Tables.documents(s, d)
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition "codec" pass, same contract as decodePipeline
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
      // materialized once: the dataset feeds BOTH sides of the pair
      // join, and without this the per-partition codec pass runs twice
      // — with a real decoder at scale, that is decoding the whole
      // corpus twice
      .localCheckpoint()
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

  val all: Seq[Q] = Seq(m01BinaryFrames, m02BatchDecode, m03MediaSimilarity)
}

/** STUB CODEC — stands in for image/audio decoding libraries that are
  * not present in this container. Deterministic by construction so
  * tests and reruns agree; swap `decodeStub` for a real codec binding
  * (JNI/ImageIO/ffmpeg) in production without touching the pipeline. */
object MultimodalStub {

  /** Fake "decode": derives a fixed-dim feature vector from payload
    * bytes (16 banded byte-sums, normalized). NOT a real decoder. */
  def decodeStub(payload: Array[Byte], format: String): Array[Double] = {
    val dim = if (format.startsWith("img/")) 16 else 8
    val out = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0
      i += 1
    }
    out
  }

  def hexChecksum(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
}
