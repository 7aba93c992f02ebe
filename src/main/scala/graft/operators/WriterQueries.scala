package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.{Tables, Writers}

/** Driver-checkable write-path coverage: each query round-trips data
  * through a [[graft.sources.Writers]] sink and aggregates the
  * read-back, so the DuckDB oracle over the ORIGINAL table proves the
  * write was content-preserving (SURVEY.md §2.1-2.2 FileSink rows —
  * previously only plan-shape-tested in PlanSpec).
  */
object WriterQueries {

  private def tmp(d: String, kind: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_wq_${d.replaceAll("[^A-Za-z0-9]", "_")}/$kind"

  /** w01: sort-merge-bucket join content check. The join itself is
    * shuffle-free (PlanSpec asserts zero Exchange); here the JOINED
    * content is differential-checked against a plain oracle join. */
  val w01SmbJoin: Q = Q(
    "w01_smb_join",
    """SELECT o_custkey % 10 AS m, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      |    AS sum_price,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
      |    AS sum_ototal
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    Writers.smbJoin(s, d)
      .groupBy(($"o_custkey" % 10).as("m"))
      .agg(count(lit(1)).as("n"),
        Exact.dsum($"l_extendedprice").as("sum_price"),
        Exact.dsum($"o_totalprice").as("sum_ototal"))
  }

  /** w02: dynamic-partitioned write round-trip (per-lang directories),
    * read back over the partition layout and re-aggregated. */
  val w02PartitionedWrite: Q = Q(
    "w02_partitioned_write",
    """SELECT lang, count(*) AS n,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val dest = tmp(d, "partitioned")
    Writers.writePartitioned(
      Tables.documents(s, d).select($"doc_id", $"text", $"lang"),
      "lang", dest)
    s.read.parquet(dest)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum(length($"text")).cast("long").as("total_chars"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
  }

  /** w03: small-file compaction — 20 shards rewritten to 2, with the
    * file count surfaced through the query itself (countDistinct over
    * input_file_name) and the content re-aggregated. */
  val w03Compaction: Q = Q(
    "w03_compaction",
    """SELECT count(*) AS n, CAST(2 AS BIGINT) AS n_files,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      |    AS sum_price,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem WHERE l_orderkey < 2000""".stripMargin) { (s, d) =>
    import s.implicits._
    val src = tmp(d, "shards")
    val dest = tmp(d, "compacted")
    Tables.lineitem(s, d).filter($"l_orderkey" < 2000)
      .repartition(20)
      .write.mode("overwrite").parquet(src)
    Writers.compact(s, src, dest, targetFiles = 2)
    s.read.parquet(dest)
      .withColumn("src_file", input_file_name())
      .agg(count(lit(1)).as("n"),
        countDistinct($"src_file").as("n_files"),
        Exact.dsum($"l_extendedprice").as("sum_price"),
        countDistinct($"l_orderkey").as("n_orders"))
  }

  val all: Seq[Q] = Seq(w01SmbJoin, w02PartitionedWrite, w03Compaction)
}
