package graft

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stub decoder is deterministic and shape-correct") {
    val f1 = operators.MultimodalStub.decodeStub("abc".getBytes, "img/fake-rgb")
    val f2 = operators.MultimodalStub.decodeStub("abc".getBytes, "img/fake-rgb")
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(operators.MultimodalStub
      .decodeStub("abc".getBytes, "audio/fake-pcm").length == 8)
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
}
