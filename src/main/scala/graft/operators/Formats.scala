package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Source/sink format coverage (SURVEY.md §2.2): CSV, JSON, ORC, Avro
  * round-trips. Each query writes a slice of the fixture data in the
  * target format, reads it back, and aggregates — the oracle runs the
  * same aggregate on the original parquet, so the round-trip must be
  * lossless end-to-end (schema, values, nulls).
  *
  * Writes land in a per-scale temp dir (deterministic path, overwrite
  * mode); at production scale these are the same `df.write.format(...)`
  * calls pointed at distributed storage. */
object Formats {

  private def tmp(d: String, fmt: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_fmt_${d.replaceAll("[^A-Za-z0-9]", "_")}/$fmt"

  private def roundTrip(s: SparkSession, d: String, fmt: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import s.implicits._
    val src = Tables.supplier(s, d)
    val dest = tmp(d, fmt)
    src.write.format(fmt).options(options).mode("overwrite").save(dest)
    val r = s.read.format(fmt).options(options)
    val back = (if (fmt == "csv" || fmt == "json")
      r.schema(src.schema) else r).load(dest)
    back.groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"), Exact.dsum($"s_acctbal").as("bal"),
        min($"s_name").as("first_name"))
  }

  private val oracleAgg =
    """SELECT s_nationkey, count(*) AS n,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal,
      |  min(s_name) AS first_name
      |FROM supplier GROUP BY s_nationkey""".stripMargin

  val f01Csv: Q = Q("f01_csv_roundtrip", oracleAgg) { (s, d) =>
    roundTrip(s, d, "csv", Map("header" -> "true"))
  }

  val f02Json: Q = Q("f02_json_roundtrip", oracleAgg) { (s, d) =>
    roundTrip(s, d, "json")
  }

  val f03Orc: Q = Q("f03_orc_roundtrip", oracleAgg) { (s, d) =>
    roundTrip(s, d, "orc")
  }

  /** f04: binaryFile source — whole-file opaque-bytes ingestion (the
    * entry path for multimodal payloads; SURVEY.md §2.2). The
    * environment ships avro core libs but NOT the spark-avro connector,
    * so Avro round-trip is not coverable here (documented gap).
    * Rows-only check: file listing is not DuckDB-expressible. */
  val f04BinaryFile: Q = Q.noOracle("f04_binaryfile") { (s, d) =>
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(s"$d/documents.parquet")
      .agg(count(lit(1)).as("n_files"),
        sum(octet_length($"content")).as("total_bytes"))
  }

  /** f06: parquet compression codecs (reference table-property codec
    * surface, SURVEY.md §2.2): write gzip/snappy/zstd, read each back,
    * and prove via input_file_name that the codec actually landed in
    * the file names — content identical across codecs per the oracle. */
  val f06ParquetCodecs: Q = Q(
    "f06_parquet_codecs",
    """SELECT codec, count(*) AS n,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal,
      |  true AS ext_ok
      |FROM supplier
      |CROSS JOIN (SELECT unnest(['gzip', 'snappy', 'zstd']) AS codec)
      |GROUP BY codec""".stripMargin) { (s, d) =>
    import s.implicits._
    val ext = Map("gzip" -> ".gz.parquet", "snappy" -> ".snappy.parquet",
      "zstd" -> ".zstd.parquet")
    Seq("gzip", "snappy", "zstd").map { c =>
      val dest = tmp(d, s"parquet_$c")
      Tables.supplier(s, d).write.option("compression", c)
        .mode("overwrite").parquet(dest)
      s.read.parquet(dest)
        .select($"s_acctbal", lit(c).as("codec"),
          input_file_name().endsWith(ext(c)).as("has_ext"))
    }.reduce(_ unionByName _)
      .groupBy($"codec")
      .agg(count(lit(1)).as("n"), Exact.dsum($"s_acctbal").as("bal"),
        min($"has_ext").as("ext_ok"))
  }

  /** f05: text-format read (the reference's LazySimpleSerDe delimited
    * path): write lineitem keys as delimited text lines, read with
    * spark.read.text + split. */
  val f05Text: Q = Q(
    "f05_text_lines",
    """SELECT count(*) AS n, min(line) AS first_line FROM (
      |  SELECT l_orderkey || '|' || l_linenumber AS line
      |  FROM lineitem WHERE l_orderkey < 100)""".stripMargin) { (s, d) =>
    import s.implicits._
    val dest = tmp(d, "text")
    Tables.lineitem(s, d).filter($"l_orderkey" < 100)
      .select(concat($"l_orderkey", lit("|"), $"l_linenumber").as("value"))
      .write.mode("overwrite").text(dest)
    s.read.text(dest)
      .agg(count(lit(1)).as("n"), min($"value").as("first_line"))
  }

  val all: Seq[Q] = Seq(f01Csv, f02Json, f03Orc, f04BinaryFile, f05Text,
    f06ParquetCodecs)
}
