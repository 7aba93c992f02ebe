package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Set operations (SURVEY.md §2.6): UNION ALL/DISTINCT, INTERSECT
  * [ALL|DISTINCT], EXCEPT [ALL|DISTINCT]. Spark rewrites intersect/except
  * to semi/anti joins (`ReplaceIntersectWithSemiJoin` etc.) exactly as
  * the reference's Calcite `HiveIntersectRewriteRule`/
  * `HiveExceptRewriteRule` lower them to agg+join. */
object SetOps {

  val q24UnionAll: Q = Q(
    "q24_union_all",
    """SELECT k, count(*) AS n FROM (
      |  SELECT c_nationkey AS k FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS k FROM supplier
      |) GROUP BY k""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d).select($"c_nationkey".as("k"))
      .union(Tables.supplier(s, d).select($"s_nationkey".as("k")))
      .groupBy($"k").agg(count(lit(1)).as("n"))
  }

  val q25UnionDistinct: Q = Q(
    "q25_union_distinct",
    """SELECT count(*) AS n FROM (
      |  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
      |  UNION
      |  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
      |)""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).filter($"l_returnflag" === "R")
      .select($"l_suppkey".as("k"))
      .union(Tables.lineitem(s, d).filter($"l_returnflag" === "A")
        .select($"l_suppkey".as("k")))
      .distinct()
      .agg(count(lit(1)).as("n"))
  }

  /** INTERSECT / EXCEPT (distinct) + their ALL multiset variants, each
    * reduced to a count so one query exercises all four operators. */
  val q26IntersectExcept: Q = Q(
    "q26_intersect_except",
    """SELECT 'intersect' AS op, count(*) AS n FROM
      |  (SELECT l_partkey FROM lineitem INTERSECT
      |   SELECT p_partkey FROM part WHERE p_size > 25)
      |UNION ALL
      |SELECT 'except' AS op, count(*) AS n FROM
      |  (SELECT p_partkey FROM part EXCEPT
      |   SELECT l_partkey FROM lineitem)
      |UNION ALL
      |SELECT 'intersect_all' AS op, count(*) AS n FROM
      |  (SELECT l_suppkey FROM lineitem INTERSECT ALL
      |   SELECT l_partkey FROM lineitem)
      |UNION ALL
      |SELECT 'except_all' AS op, count(*) AS n FROM
      |  (SELECT l_suppkey FROM lineitem EXCEPT ALL
      |   SELECT s_suppkey FROM supplier)""".stripMargin) { (s, d) =>
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val counted = Seq(
      "intersect" -> li.select($"l_partkey")
        .intersect(Tables.part(s, d).filter($"p_size" > 25)
          .select($"p_partkey")),
      "except" -> Tables.part(s, d).select($"p_partkey")
        .except(li.select($"l_partkey")),
      "intersect_all" -> li.select($"l_suppkey")
        .intersectAll(li.select($"l_partkey")),
      "except_all" -> li.select($"l_suppkey")
        .exceptAll(Tables.supplier(s, d).select($"s_suppkey")))
    counted.map { case (opName, df) =>
      df.agg(count(lit(1)).as("n")).select(lit(opName).as("op"), $"n")
    }.reduce(_ union _)
  }

  val all: Seq[Q] = Seq(q24UnionAll, q25UnionDistinct, q26IntersectExcept)
}
