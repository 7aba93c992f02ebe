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

  /** v02b: FIXED-boundary histogram — the differential-oracled twin
    * of v02 (round-14 verdict ask #6: the histogram CAPABILITY was
    * oracled nowhere; v02's Ben-Haim/Tom-Tov bin centers are
    * merge-order-dependent by design, so it stays the spec-pinned
    * sketch row while this query carries the hash gate). Five
    * equal-width bins per group over [min, max] of l_quantity, with
    * ALL bin arithmetic in integer space so both engines compute
    * bit-identical bins: quantities are exact in cents (q100 =
    * l_quantity*100 — the fixture's values are integer-valued
    * doubles), and bin = ((q100-min100)*5) div (max100-min100+1) is
    * pure BIGINT arithmetic — no float division whose floor could
    * differ by an ulp across engines. q_min/q_max (context columns)
    * are one double division of exact integers — single IEEE op,
    * deterministic.
    *
    * 100 TB: two passes over the fact column (the textbook fixed-bin
    * bill — extremes, then binning), extremes broadcast (one row per
    * group), bin counts map-side combined; swap pass one for stored
    * column stats (w05's min/max skipping metadata) when the table is
    * ANALYZEd. */
  val v02bHistogramFixed: Q = Q(
    "v02b_histogram_fixed",
    """WITH q AS (SELECT l_returnflag,
      |             CAST(l_quantity * 100 AS BIGINT) AS q100
      |           FROM lineitem),
      |ext AS (SELECT l_returnflag, min(q100) AS min100,
      |          max(q100) AS max100
      |        FROM q GROUP BY 1),
      |b AS (SELECT q.l_returnflag,
      |        CAST(((q100 - min100) * 5) // (max100 - min100 + 1)
      |          AS INT) AS bin,
      |        min100, max100
      |      FROM q JOIN ext USING (l_returnflag))
      |SELECT l_returnflag, bin, CAST(count(*) AS BIGINT) AS bin_count,
      |  CAST(min100 AS DOUBLE) / 100.0 AS q_min,
      |  CAST(max100 AS DOUBLE) / 100.0 AS q_max
      |FROM b GROUP BY l_returnflag, bin, min100, max100"""
      .stripMargin) { (s, d) =>
    import s.implicits._
    val q = Tables.lineitem(s, d)
      .select($"l_returnflag", ($"l_quantity" * 100).cast("long").as("q100"))
    val ext = q.groupBy($"l_returnflag")
      .agg(min($"q100").as("min100"), max($"q100").as("max100"))
    q.join(broadcast(ext), "l_returnflag")
      .select($"l_returnflag",
        expr("CAST(((q100 - min100) * 5) DIV (max100 - min100 + 1) AS INT)")
          .as("bin"),
        $"min100", $"max100")
      .groupBy($"l_returnflag", $"bin", $"min100", $"max100")
      .agg(count(lit(1)).as("bin_count"))
      .select($"l_returnflag", $"bin", $"bin_count",
        ($"min100".cast("double") / 100.0).as("q_min"),
        ($"max100".cast("double") / 100.0).as("q_max"))
  }

  val all: Seq[Q] = Seq(v01VirtualCols, v02Histogram, v02bHistogramFixed)
}
