package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Remaining reference-surface odds and ends: virtual columns
  * (TableScanOperator's INPUT__FILE__NAME / BLOCK__OFFSET — SURVEY.md
  * §2.1 maps them to input_file_name() and the _metadata struct) and
  * histogram_numeric (SURVEY.md §2.3). Engine-specific output shapes →
  * rows-only driver checks + MiscSpec assertions. */
object Misc {

  /** v01: virtual file-provenance columns on a parquet scan — now
    * oracle-checked (round-13 verdict ask #5): DuckDB 1.0 exposes the
    * same provenance via `read_parquet(..., filename, file_row_number)`
    * + `read_blob` for the byte size, so the check upgrades from
    * rows-only to a full hash gate. Both sides normalize the engine
    * prefix away (Spark's `file://` URI vs DuckDB's raw path) by
    * projecting the BASENAME; the oracle necessarily pins the driver's
    * verify fixture path (oracle SQL is static text with no dir
    * parameter — `/root/testdata/sf0.01` is the driver's documented
    * verify scale, TESTDATA.md). */
  val v01VirtualCols: Q = Q(
    "v01_virtual_cols",
    """SELECT regexp_extract(p.filename, '[^/]+$') AS src_file,
      |  b.size AS file_size, count(*) AS n_rows,
      |  CAST(max(p.file_row_number) AS BIGINT) AS max_idx
      |FROM read_parquet('/root/testdata/sf0.01/documents.parquet',
      |                  filename=true, file_row_number=true) p
      |JOIN read_blob('/root/testdata/sf0.01/documents.parquet') b
      |  ON p.filename = b.filename
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        regexp_extract(input_file_name(), "[^/]+$", 0).as("src_file"),
        col("_metadata.file_size").as("file_size"),
        col("_metadata.row_index").as("row_index"))
      .groupBy($"src_file", $"file_size")
      .agg(count(lit(1)).as("n_rows"), max($"row_index").as("max_idx"))
  }

  /** v02: histogram_numeric sketch (reference GenericUDAFHistogramNumeric
    * — same builtin name in Spark). Bins are exploded to one scalar row
    * per (flag, bin) — the driver's comparator sorts rows in pandas and
    * cannot hash array cells. Stays rows-only: the Ben-Haim/Tom-Tov
    * sketch's bin centers are merge-order-dependent, so no cross-engine
    * oracle exists; MiscSpec pins exact bin values on a fixed input. */
  val v02Histogram: Q = Q.noOracle("v02_histogram") { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(expr("histogram_numeric(l_quantity, 5)").as("hist"),
        count(lit(1)).as("n"))
      .select($"l_returnflag", $"n", posexplode($"hist").as(Seq("bin", "b")))
      .select($"l_returnflag", $"n", $"bin",
        $"b.x".as("bin_center"), $"b.y".as("bin_count"))
  }

  val all: Seq[Q] = Seq(v01VirtualCols, v02Histogram)
}
