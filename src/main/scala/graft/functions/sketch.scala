package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency lookup against a serialized Count-Min sketch — the
  * READ side Spark doesn't ship: the built-in `count_min_sketch`
  * aggregate produces the binary sketch (mergeable, counters are
  * additive so merge order is irrelevant), but nothing in the registry
  * can query it. Returns estimateCount(value): always >= the true
  * count, and <= true + eps*N with the sketch's configured confidence
  * (the one-sided CMS error bound q81's verdict asserts).
  *
  * Interpreted-only (no doGenCode): the probe side is a handful of
  * heavy-hitter rows, never a corpus scan — deserialization cost is
  * bounded by [[sketchCache]] so a 10-row probe pays ONE readFrom, not
  * ten. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  // one deserialized sketch per distinct binary payload per partition —
  // identity-keyed because the same sketch row is what crossJoin
  // replicates to every probe
  @transient private lazy val sketchCache =
    new java.util.IdentityHashMap[AnyRef, CountMinSketch]()

  override def nullSafeEval(sk: Any, v: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    var cms = sketchCache.get(bytes)
    if (cms == null) {
      cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      sketchCache.put(bytes, cms)
    }
    cms.estimateCount(v.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
