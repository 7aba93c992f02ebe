package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the similarity operators
  * (SURVEY.md §7.3: custom Expression where composition is too slow).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates an intermediate 64-element array per PAIR — at N² pair
  * counts that dominates the runtime. These expressions loop directly
  * over the unsafe array data with zero allocation inside whole-stage
  * codegen. Summation is strictly left-to-right in double precision, so
  * results are bit-identical to both the HOF formulation and DuckDB's
  * list_dot_product — oracle compatibility is preserved.
  */

/** dot(a, b) over array<float> in double precision. STRICT on length
  * (round-16 self-review): the explicit-query TVF forms make ragged
  * vectors user-reachable — a 32-dim query against the 64-dim corpus
  * must throw, not return a plausible truncated similarity (the
  * LongVecDot discipline applied to the float kernels). */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw LongVecDot.lengthMismatch(n, y.numElements())
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.LongVecDot.lengthMismatch(
         |    $n, $b.numElements());
         |}
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc +=
         |    (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** dot(a, b) over array<bigint> in EXACT long arithmetic — the kernel
  * d07b's fixed-point pair stage runs at N²-bounded pair counts (the
  * HOF formulation's per-pair intermediate array measured 3x the whole
  * stage). Exact while |Σ aᵢbᵢ| < 2⁶³ — the caller's documented grid
  * bound; overflow wraps like any long arithmetic, identical to the
  * oracle's BIGINT only below the bound, which d07b's scaladoc pins.
  *
  * STRICT on length: mismatched array lengths THROW (round-15 advice)
  * instead of silently truncating to the shorter vector — d07b's
  * oracle hardcodes the fixture's 64 dims, so a ragged embedding
  * would otherwise change the dot on the Spark side only and drift
  * from the oracle without any signal. */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lvec_dot expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw LongVecDot.lengthMismatch(n, y.numElements())
    }
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.LongVecDot.lengthMismatch(
         |    $n, $b.numElements());
         |}
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Σ(aᵢ−bᵢ)² over two array<bigint> columns in EXACT long arithmetic —
  * the squared-distance twin of [[LongVecDot]], shared by the PQ
  * family's ADC/rerank kernels (s07/s07b) and d07b's one Lloyd round.
  * The HOF formulation (`aggregate(zip_with((x,y) -> (x-y)*(x-y)))`)
  * allocates a dims-length intermediate array per PAIR at N·k pair
  * counts (the header's cost note); this loops over the unsafe array
  * data with zero allocation inside whole-stage codegen. Strict
  * left-to-right summation, exact while the caller's grid bound keeps
  * |Σ| < 2⁶³ (the LongVecDot contract) — bit-identical to the HOF form
  * and the oracle's BIGINT algebra below that bound. STRICT on length,
  * same rationale as the dot kernels. */
case class LongVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lvec_sqdist expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw LongVecDot.lengthMismatch(n, y.numElements())
    }
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.LongVecDot.lengthMismatch(
         |    $n, $b.numElements());
         |}
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  ${ev.value}_acc += $d * $d;
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object LongVecDot {
  /** Shared by ALL the dot kernels' interpreted and codegen paths so
    * they can never disagree on the failure mode (must be public —
    * generated code calls it from another package). */
  def lengthMismatch(a: Int, b: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"vector dot kernel: array length mismatch ($a vs $b) — dots are" +
        " only defined over equal-dimension vectors; ragged inputs" +
        " would silently truncate instead of erroring")
}

/** Euclidean norm over array<float> in double precision. */
case class FloatVecNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      s += x.getFloat(i).toDouble * x.getFloat(i).toDouble
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  ${ev.value}_acc +=
         |    (double) $a.getFloat($i) * (double) $a.getFloat($i);
         |}
         |${ev.value} = Math.sqrt(${ev.value}_acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** dot(a, b) over array<double> — same contract as [[FloatVecDot]] for
  * double-typed feature vectors (m03's integer-valued band sums stay
  * exact in doubles; a float kernel would round products past 2^24 and
  * break oracle bit-parity). Strict left-to-right summation. */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dvec_dot expects (array<double>, array<double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw LongVecDot.lengthMismatch(n, y.numElements())
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.LongVecDot.lengthMismatch(
         |    $n, $b.numElements());
         |}
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
