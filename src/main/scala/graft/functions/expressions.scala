package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for reference gap functions that are NOT
  * expressible as rewrites over Spark builtins (SURVEY.md Appendix A GAP
  * rows; reference implementations under
  * hive-exec!org.apache.hadoop.hive.ql.udf.generic.*).
  *
  * Rewrite-expressible gaps (floor_day, mask_first_n, field, …) live in
  * [[HiveCompat]] as expression-tree builders instead — per the
  * decision table in SURVEY.md §7.3, a custom Expression is only written
  * when composition genuinely can't express the semantics.
  */

/** `sort_array_by(array<struct>, fieldName..., ['ASC'|'DESC'])` —
  * reference: GenericUDFSortArrayByField (SURVEY.md Appendix A).
  * Sorts an array of structs by one or more named fields.
  *
  * CodegenFallback: per-row sort of a small in-memory array; not on the
  * codegen hot path (operates on already-collected arrays, and whole-stage
  * codegen falls back gracefully around it).
  */
case class SortArrayByField(children: Seq[Expression])
    extends Expression with CodegenFallback {

  private def arrayExpr: Expression = children.head

  private lazy val elemType: StructType =
    arrayExpr.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]

  private lazy val (fieldNames: Seq[String], ascending: Boolean) = {
    val rest = children.tail.map(_.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => String.valueOf(other)
    })
    if (rest.nonEmpty && (rest.last.equalsIgnoreCase("ASC") ||
        rest.last.equalsIgnoreCase("DESC")))
      (rest.init, rest.last.equalsIgnoreCase("ASC"))
    else (rest, true)
  }

  private lazy val fieldOrdinals: Seq[(Int, DataType)] = fieldNames.map { f =>
    val i = elemType.fieldIndex(f)
    (i, elemType.fields(i).dataType)
  }

  override def nullable: Boolean = arrayExpr.nullable
  override def dataType: DataType = arrayExpr.dataType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    arrayExpr.dataType match {
      case ArrayType(_: StructType, _) if children.size >= 2 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sort_array_by expects (array<struct<...>>, fieldName..., [ASC|DESC])")
    }
  }

  override def eval(input: InternalRow): Any = {
    val arr = arrayExpr.eval(input)
    if (arr == null) return null
    val data = arr.asInstanceOf[ArrayData]
    val rows = (0 until data.numElements()).map { i =>
      data.getStruct(i, elemType.size).copy()
    }
    val ord: Ordering[InternalRow] = new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var k = 0
        while (k < fieldOrdinals.length) {
          val (i, dt) = fieldOrdinals(k)
          val av = if (a.isNullAt(i)) null else a.get(i, dt)
          val bv = if (b.isNullAt(i)) null else b.get(i, dt)
          val c = (av, bv) match {
            case (null, null) => 0
            case (null, _) => -1
            case (_, null) => 1
            case (x, y) =>
              PhysicalDataType.ordering(dt)
                .asInstanceOf[Ordering[Any]].compare(x, y)
          }
          if (c != 0) return if (ascending) c else -c
          k += 1
        }
        0
      }
    }
    new GenericArrayData(rows.sorted(ord).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Access to per-type orderings without depending on private Catalyst
  * helpers: interprets the common atomic types directly. */
private[functions] object PhysicalDataType {
  def ordering(dt: DataType): Ordering[_] = dt match {
    case IntegerType => Ordering.Int
    case LongType => Ordering.Long
    case ShortType => Ordering.Short
    case ByteType => Ordering.Byte
    case DoubleType => Ordering.Double.TotalOrdering
    case FloatType => Ordering.Float.TotalOrdering
    case BooleanType => Ordering.Boolean
    case DateType => Ordering.Int
    case TimestampType => Ordering.Long
    case StringType => new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    }
    case d: DecimalType => new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        a.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .compareTo(b.asInstanceOf[org.apache.spark.sql.types.Decimal])
    }
    case other =>
      throw new IllegalArgumentException(s"sort_array_by: unsupported sort key type $other")
  }
}

/** `in_file(str, filename)` — reference: GenericUDFInFile. True when the
  * string equals any line of the (executor-local) file. The line set is
  * lazily loaded once per expression instance per executor — bounded
  * memory, no driver collect. */
case class InFile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  @transient private lazy val lines: java.util.HashSet[String] = {
    val f = right.eval(null)
    require(f != null, "in_file: filename must be a non-null literal")
    val set = new java.util.HashSet[String]()
    val src = scala.io.Source.fromFile(f.toString)
    try src.getLines().foreach(set.add) finally src.close()
    set
  }

  override def nullSafeEval(str: Any, file: Any): Any =
    lines.contains(str.toString)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
