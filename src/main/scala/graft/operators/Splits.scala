package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Deterministic dataset splitting for training pipelines: a
  * content-independent hash of the stable document id buckets every
  * row into train/val/test with NO coordination, NO sampling state and
  * NO order dependence — the same doc lands in the same split on any
  * cluster, any partitioning, any day. (Never split on row position or
  * rand(): both change under repartitioning.)
  *
  * The bucket is the first two hex chars of md5(doc_id) compared as
  * strings ('e6'/256 ≈ 90%, 'f3' ≈ +5%), which both engines compute
  * identically — no integer parsing of hex involved. */
object Splits {

  val p01TrainSplit: Q = Q(
    "p01_train_split",
    """WITH s AS (SELECT doc_id, substr(md5(doc_id::VARCHAR), 1, 2) AS h
      |           FROM documents)
      |SELECT CASE WHEN h < 'e6' THEN 'train'
      |            WHEN h < 'f3' THEN 'val'
      |            ELSE 'test' END AS split,
      |  count(*) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM s GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        substring(md5($"doc_id".cast("string")), 1, 2).as("h"))
      .select($"doc_id",
        when($"h" < "e6", "train")
          .when($"h" < "f3", "val")
          .otherwise("test").as("split"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
  }

  val all: Seq[Q] = Seq(p01TrainSplit)
}
