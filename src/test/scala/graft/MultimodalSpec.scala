package graft

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The ONE multi-byte-text predicate: octet_length of the UTF-8
    * bytes != char_length holds exactly when some character needs a
    * multi-byte encoding. Shared by the fixture precondition assert
    * AND its engagement probe below — a copy in each test would let
    * the probe keep passing against a stale predicate after the
    * precondition's was edited (the round-17 review's point). */
  private def multiByteText: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    octet_length(col("text").cast("binary")) =!= length(col("text"))
  }

  test("stub decoder is deterministic and shape-correct") {
    val f1 = operators.MultimodalStub.decodeStub("abc".getBytes, "img/fake-rgb")
    val f2 = operators.MultimodalStub.decodeStub("abc".getBytes, "img/fake-rgb")
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(operators.MultimodalStub
      .decodeStub("abc".getBytes, "audio/fake-pcm").length == 8)
  }

  test("fixture text is ASCII-only — the multimodal oracles' parity precondition") {
    // The m02/m03-family oracles band payloads by CHARACTER
    // (ascii(substr(text, i, 1)) over length(text)) while the Spark
    // pipelines band the UTF-8 BYTES of text.cast(binary). The two
    // agree iff every character is single-byte — i.e. the corpus is
    // pure ASCII (round-15 advice: DuckDB 1.0 has no blob byte
    // indexing, so the precondition is ASSERTED rather than the oracle
    // rewritten). octet_length == char_length holds exactly when no
    // character needs a multi-byte encoding.
    val docs = sources.Tables.documents(spark, sf)
    val nonAscii = docs.filter(multiByteText).count()
    assert(nonAscii == 0L,
      s"$nonAscii documents carry non-ASCII text — the multimodal " +
        "character-banded oracles no longer match the byte-banded " +
        "pipelines; see Multimodal.scala m02 scaladoc")
  }

  test("the ASCII guard guards: a synthetic multi-byte doc trips the " +
      "predicate") {
    // round-16 verdict stretch: the precondition assert above only
    // ever sees the (clean) fixture, so nothing proved the predicate
    // itself catches a violation. One char needing two UTF-8 bytes
    // must — and only it may — trip octet_length != char_length.
    import spark.implicits._
    val fixture = Seq((1L, "plain ascii words"),
      (2L, "café au lait")).toDF("doc_id", "text")
    val trips = fixture.filter(multiByteText)
      .collect().map(_.getLong(0)).toSeq
    assert(trips == Seq(2L),
      s"the guard predicate must catch exactly the multi-byte doc: $trips")
  }

  test("batch decode pipeline: feature dims follow format, checksums match md5") {
    val rows = operators.Multimodal.decodePipeline(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(if (r.format.startsWith("img/")) r.feature_dim == 16
        else r.feature_dim == 8)
      assert(r.checksum.length == 32)
      assert(r.feature_norm > 0.0)
    }
    // checksum agrees with the SQL-side md5 in m01
    val m01 = SparkEntry.queries("m01_binary_frames")(spark, sf)
      .select("doc_id", "checksum").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(20).foreach(r => assert(m01(r.doc_id) == r.checksum))
  }

  test("m03b bucketed media similarity: buckets split, top-3 recall holds") {
    // the scale path must actually BUCKET (mean-centering is what
    // prevents the one-bucket collapse byte-sum features would cause
    // under raw hyperplane signs) and still find most of the all-pairs
    // top-3 — the same recall-vs-ground-truth contract as s02-vs-s01
    val exact = SparkEntry.queries("m03_media_similarity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("m03b_media_similarity_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // 0.52 measured at fixture scale — moderate BY NATURE here: byte-sum
    // features of same-language text are near-parallel (sims ~0.99), so
    // the "true" top-3 is a near-tie ordering that residual buckets can
    // only partially preserve; the floor guards collapse, not ties
    val recall = (lsh & exact).size.toDouble / exact.size
    info(f"m03b top-3 recall vs all-pairs m03: $recall%.4f " +
      f"(${(lsh & exact).size}/${exact.size})")
    assert(recall >= 0.40,
      f"bucketed recall collapsed: $recall%.4f — check mean-centering")
    // the buckets genuinely split (single-bucket collapse would score
    // recall 1.0 by silently doing all-pairs work — the failure mode
    // mean-centering exists to prevent): inspect the REAL signature
    // distribution through the shared helper
    val sigs = operators.Multimodal.mediaFeatSigs(spark, sf)
      .groupBy("band", "sig").count().collect()
      .map(r => r.getLong(2))
    val nDocs = sigs.sum / 2 // two band rows per doc
    info(s"m03b buckets: ${sigs.length} (band, sig) buckets over $nDocs " +
      s"docs, max bucket ${sigs.max}")
    assert(sigs.length >= 8, s"only ${sigs.length} buckets — collapse")
    assert(sigs.max <= nDocs / 2,
      s"dominant bucket holds ${sigs.max}/$nDocs docs — collapse")
  }

  test("m04: shared-frame pairs match an independent driver-side" +
      " recomputation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // recompute with DIFFERENT machinery (String.grouped vs the
    // query's substr arithmetic, a Scala Map vs the df-cap join) at
    // the oracle fixture — an off-by-one in the chunk math or a cap
    // drift shows up as a set difference, not a silently shifted hash
    val d01 = "/root/testdata/sf0.01"
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val media = sources.Tables.documents(spark, d01)
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val frames = media.map { case (id, t) =>
      id -> t.grouped(64).map(md5hex).toSet }.toMap
    val df = frames.values.flatten.toSeq.groupBy(identity)
      .map { case (h, v) => h -> v.size }
    val kept = frames.map { case (id, fs) =>
      id -> fs.filter(h => df(h) >= 2 && df(h) <= 32) }
    val ids = media.map(_._1).sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      shared = (kept(a) & kept(b)).size if shared >= 2
    } yield (a, b, shared.toLong)).toSet
    val got = SparkEntry.queries("m04_shared_frames")(spark, d01)
      .select($"doc_a", $"doc_b", $"n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture has no shared-frame pairs — vacuous")
    assert(got == want,
      s"m04 diverges: extra=${(got -- want).take(5)}, " +
        s"missing=${(want -- got).take(5)}")
  }

  test("m05: dominant-offset alignment matches an independent" +
      " driver-side recomputation and m04's pair set") {
    import spark.implicits._
    val d01 = "/root/testdata/sf0.01"
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val media = sources.Tables.documents(spark, d01)
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // first-occurrence positions via String.grouped (different chunk
    // machinery than the query's substr arithmetic, m04's pattern)
    val pos: Map[Long, Map[String, Long]] = media.map { case (id, t) =>
      id -> t.grouped(64).map(md5hex).zipWithIndex.toSeq
        .groupBy(_._1).map { case (h, ks) => h -> (ks.map(_._2).min + 1L) }
    }.toMap
    val df = pos.values.flatMap(_.keys).toSeq.groupBy(identity)
      .map { case (h, v) => h -> v.size }
    val kept = pos.map { case (id, m) =>
      id -> m.view.filterKeys(h => df(h) >= 2 && df(h) <= 32).toMap }
    val ids = media.map(_._1).sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      shared = (kept(a).keySet & kept(b).keySet).toSeq if shared.size >= 2
    } yield {
      val deltas = shared.map(h => kept(a)(h) - kept(b)(h))
      val byDelta = deltas.groupBy(identity).view.mapValues(_.size)
      val (bestDelta, nAligned) = byDelta.toSeq
        .sortBy { case (dl, n) => (-n, dl) }.head
      (a, b, shared.size.toLong, bestDelta, nAligned.toLong)
    }).toSet
    val got = SparkEntry.queries("m05_aligned_frames")(spark, d01)
      .select($"doc_a", $"doc_b", $"n_shared", $"best_delta",
        $"n_aligned").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(want.nonEmpty, "fixture has no aligned-frame pairs — vacuous")
    assert(got == want,
      s"m05 diverges: extra=${(got -- want).take(5)}, " +
        s"missing=${(want -- got).take(5)}")
    // structural invariants: pair set identical to m04's, and the
    // aligned mass never exceeds the shared mass
    val m04Pairs = SparkEntry.queries("m04_shared_frames")(spark, d01)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(g => (g._1, g._2)) == m04Pairs,
      "m05's pair set drifted from m04's")
    assert(got.forall(g => g._5 <= g._3), "n_aligned exceeds n_shared")
  }
}
