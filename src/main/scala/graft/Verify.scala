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
    // ... and RECURSIVELY: a timestamp nested inside a struct/array/map
    // (e.g. a query projecting asofJoin's _carried struct whole) must be
    // rewritten too, or the nested field dumps tz-adjusted and trips the
    // same comparator. Cast to the recursively-rewritten type — Spark
    // casts complex types field-by-field, and the session is UTC-pinned
    // so every leaf cast is value-preserving.
    import org.apache.spark.sql.types._
    def denaive(dt: DataType): DataType = dt match {
      case TimestampType => TimestampNTZType
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = denaive(f.dataType))))
      case a: ArrayType => a.copy(elementType = denaive(a.elementType))
      case m: MapType =>
        m.copy(keyType = denaive(m.keyType), valueType = denaive(m.valueType))
      case other => other
    }
    def naiveTs(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.foldLeft(df) { case (d, f) =>
        val target = denaive(f.dataType)
        if (target == f.dataType) d
        else d.withColumn(f.name,
          org.apache.spark.sql.functions.col(f.name).cast(target))
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
