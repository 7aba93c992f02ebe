package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the ten fixture tables (FIXTURES.md).
  *
  * All reads go through `spark.read.parquet` so the native vectorized
  * reader, predicate pushdown and column pruning apply (SURVEY.md §2.2:
  * the reference's ORC SARG / `CombineHiveInputFormat` machinery maps to
  * the Spark datasource layer for free). At 100 TB the same call works
  * unchanged over a partitioned table root — Spark does partition
  * discovery + pruning from the directory layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred-SCHEMA cache (round-18 optimization): every
    * `spark.read.parquet(path)` call eagerly reads a parquet footer on
    * the driver to infer the schema — a bench/verify run builds each
    * fixture table's DataFrame hundreds of times, paying hundreds of
    * redundant footer reads for ten immutable files. The key mixes
    * path + length + mtime, so a regenerated fixture (the tmp/sf1
    * stress generator) re-infers instead of serving a stale schema.
    * Metadata only — no query RESULT is ever cached here (the
    * no-result-memo rule): every query still computes from the parquet
    * bytes. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]

  private def cachedSchema(spark: SparkSession, path: String)
      : org.apache.spark.sql.types.StructType = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p) // missing file fails loudly, like read
    val key = s"$path@${st.getLen}:${st.getModificationTime}"
    schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else {
      val path = s"$dir/$name.parquet"
      spark.read.schema(cachedSchema(spark, path)).parquet(path)
    }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.parquet` has carried `ts` under two encodings across fixture
    * generations: INT64 TIMESTAMP(NANOS) — which the Spark parquet reader
    * rejects ([PARQUET_TYPE_ILLEGAL]), so it is read as long and
    * floor-converted to microsecond TimestampType, the same truncation
    * DuckDB applies casting timestamp_ns → timestamp — and plain
    * unadjusted timestamp[us], which lands directly as TimestampType
    * (GraftSession pins inferTimestampNTZ=false). Branch on the read
    * schema so both generations load identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/events.parquet"
    // same schema cache as table(); the nanosAsLong conf above governs
    // both the one-time inference and every subsequent scan, so the
    // cached schema (ts: long under the NANOS encoding) replays
    // identically
    val raw = s.read.schema(cachedSchema(s, path)).parquet(path)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every fixture table as a temp view so `spark.sql` can
    * address them by the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
