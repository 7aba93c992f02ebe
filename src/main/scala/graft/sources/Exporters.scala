package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** EXPORT / IMPORT — the reference's table-relocation surface
  * (SURVEY.md §2.2 sinks): a self-describing directory holding the
  * table data plus metadata (exact Catalyst schema + partition spec),
  * so the table can be recreated on another cluster/metastore without
  * the source catalog being reachable.
  *
  * Spark-first shape: data stays columnar parquet (not the reference's
  * serde-specific copy); metadata is the Catalyst schema JSON — any
  * Spark can import it; partition layout is preserved so imports keep
  * partition pruning. */
object Exporters {

  private def write(spark: SparkSession, path: org.apache.hadoop.fs.Path,
      content: String): Unit = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  private def read(spark: SparkSession,
      path: org.apache.hadoop.fs.Path): String = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      "UTF-8")
    finally in.close()
  }

  /** Export a DataFrame (or spark.table(...)) as a self-describing
    * directory: `data/` parquet + `_graft_schema.json` (exact Catalyst
    * schema) + `_graft_partitions.txt` (one partition column per line). */
  def exportTable(df: DataFrame, dest: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(s"$dest/data")
    write(spark, new org.apache.hadoop.fs.Path(dest, "_graft_schema.json"),
      df.schema.json)
    write(spark, new org.apache.hadoop.fs.Path(dest, "_graft_partitions.txt"),
      partitionCols.mkString("\n"))
  }

  /** Import an exported directory as a managed catalog table. Schema
    * comes from the metadata file, NOT parquet inference, so imports
    * are exact even where inference would widen or reorder. */
  def importTable(spark: SparkSession, src: String, table: String): Unit = {
    val schema = DataType.fromJson(read(spark,
      new org.apache.hadoop.fs.Path(src, "_graft_schema.json")))
      .asInstanceOf[StructType]
    val partCols = read(spark,
      new org.apache.hadoop.fs.Path(src, "_graft_partitions.txt"))
      .split("\n").filter(_.nonEmpty).toSeq
    val df = spark.read.schema(schema).parquet(s"$src/data")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // in-memory catalogs orphan managed-table dirs across JVMs (see
    // Writers.writeBucketed) — clear the location before recreating
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val lfs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (lfs.exists(loc)) lfs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .saveAsTable(table)
  }
}
