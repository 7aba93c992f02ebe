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

  /** v01: virtual file-provenance columns on a parquet scan. */
  val v01VirtualCols: Q = Q.noOracle("v01_virtual_cols") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", input_file_name().as("src_file"),
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
