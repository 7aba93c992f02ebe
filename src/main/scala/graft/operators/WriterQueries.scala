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

  /** w04: MERGE INTO semantics (ANSI/Hive-ACID upsert DML) expressed
    * Spark-first — the engine-level core every table-format MERGE
    * compiles down to: ONE equi-join of target and change-batch on the
    * merge key, then per-row predicates for the WHEN branches (matched
    * + op=D → delete, matched + op=U → update, not-matched + op=I →
    * insert, everything else keeps the target row). The change batch is
    * derived deterministically from orders (key%7: 0→update with a
    * 10% exact-decimal price bump, 3→delete, 5→insert under a shifted
    * key) so the post-merge state is fully DuckDB-oracled, action by
    * action.
    *
    * 100 TB: cost is one shuffle join keyed on the merge key (AQE
    * handles skew); rewriting only touched files is a table-format
    * concern (copy-on-write vs merge-on-read) layered ABOVE this plan —
    * pair with the dynamic-partition overwrite sink (Streams
    * .upsertWindowTotals) for the partition-granular variant. */
  val w04MergeUpsert: Q = Q(
    "w04_merge_upsert",
    """WITH src AS (
      |  SELECT CASE WHEN o_orderkey % 7 = 5
      |              THEN o_orderkey + 10000000 ELSE o_orderkey END AS s_key,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 'U'
      |         WHEN o_orderkey % 7 = 3 THEN 'D' ELSE 'I' END AS op,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) *
      |         CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE) AS new_price,
      |    o_totalprice AS src_price
      |  FROM orders WHERE o_orderkey % 7 IN (0, 3, 5)),
      |m AS (SELECT t.o_orderkey AS t_key, t.o_totalprice, s.s_key, s.op,
      |        s.new_price, s.src_price
      |      FROM orders t FULL JOIN src s ON t.o_orderkey = s.s_key),
      |merged AS (
      |  SELECT coalesce(t_key, s_key) AS key,
      |    CASE WHEN t_key IS NULL THEN 'inserted'
      |         WHEN op = 'U' THEN 'updated' ELSE 'kept' END AS action,
      |    CASE WHEN t_key IS NULL THEN src_price
      |         WHEN op = 'U' THEN new_price ELSE o_totalprice END AS fp
      |  FROM m
      |  WHERE (t_key IS NOT NULL AND (s_key IS NULL OR op = 'U'))
      |     OR (t_key IS NULL AND op = 'I'))
      |SELECT action, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(fp AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
      |  min(key) AS min_key, max(key) AS max_key
      |FROM merged GROUP BY action""".stripMargin) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val t = Tables.orders(s, d)
      .select($"o_orderkey".as("t_key"), $"o_totalprice")
    val src = Tables.orders(s, d)
      .filter($"o_orderkey" % 7 isin (0, 3, 5))
      .select(
        when($"o_orderkey" % 7 === 5, $"o_orderkey" + 10000000L)
          .otherwise($"o_orderkey").as("s_key"),
        when($"o_orderkey" % 7 === 0, "U")
          .when($"o_orderkey" % 7 === 3, "D")
          .otherwise("I").as("op"),
        ($"o_totalprice".cast(DecimalType(18, 2)) *
          lit(new java.math.BigDecimal("1.1"))).cast("double")
          .as("new_price"),
        $"o_totalprice".as("src_price"))
    t.join(src, $"t_key" === $"s_key", "full_outer")
      .filter(($"t_key".isNotNull && ($"s_key".isNull || $"op" === "U")) ||
        ($"t_key".isNull && $"op" === "I"))
      .select(coalesce($"t_key", $"s_key").as("key"),
        when($"t_key".isNull, "inserted")
          .when($"op" === "U", "updated").otherwise("kept").as("action"),
        when($"t_key".isNull, $"src_price")
          .when($"op" === "U", $"new_price")
          .otherwise($"o_totalprice").as("fp"))
      .groupBy($"action")
      .agg(count(lit(1)).as("n"), Exact.dsum($"fp").as("total_price"),
        min($"key").as("min_key"), max($"key").as("max_key"))
  }

  val all: Seq[Q] = Seq(w01SmbJoin, w02PartitionedWrite, w03Compaction,
    w04MergeUpsert)
}
