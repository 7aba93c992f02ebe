package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // Dev affordance: trailing args restrict the dump to named queries
    // (driver always calls with exactly two args — full sweep).
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // The engine's pinned config (GraftSession) matters here, not just in
    // tests: inferTimestampNTZ=false keeps the fixtures' unadjusted
    // timestamp[us] columns on TimestampType (streaming watermarks hard-
    // reject NTZ event time), and UTC/AQE/extensions keep Verify's plans
    // identical to the ones the specs pin.
    // cpus override AFTER configure: Builder.config is last-write-wins
    // and configure() pins shuffle.partitions=32, which would silently
    // swallow the SPARK_GRAFT_CPUS sizing (Bench orders it the same way)
    val spark = GraftSession.configure(SparkSession.builder()
        .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.registerAll(spark)
    new java.io.File(outDir).mkdirs()
    // Dump timestamps UNADJUSTED (timestamp_ntz): the fixtures' naive
    // timestamp[us] columns make the DuckDB oracle emit tz-naive values,
    // and the driver's dtype-sensitive pandas comparator crashes on a
    // tz-aware-vs-naive mismatch. The session is UTC-pinned, so the cast
    // is value-preserving — it only changes the parquet annotation.
    def naiveTs(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.foldLeft(df) {
        case (d, f) if f.dataType ==
            org.apache.spark.sql.types.TimestampType =>
          d.withColumn(f.name, org.apache.spark.sql.functions
            .col(f.name).cast(org.apache.spark.sql.types.TimestampNTZType))
        case (d, _) => d
      }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try naiveTs(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
