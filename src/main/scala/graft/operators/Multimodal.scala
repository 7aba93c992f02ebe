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

  val all: Seq[Q] = Seq(m01BinaryFrames, m02BatchDecode)
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
