package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Exact dot product of two `array<float>` columns as a native
  * codegen'd Catalyst expression.
  *
  * Numerics: each per-position product is computed in double
  * (exact — two 24-bit mantissas always fit in 53), rounded to 15
  * decimal places onto a scaled-long grid, and accumulated with exact
  * integer addition. The result is therefore independent of both
  * accumulation order and SIMD/fma differences, and equals
  * `sum(cast(x*y as decimal(18,15)))` — the form a SQL oracle can
  * state — while running as a tight generated loop instead of an
  * interpreted higher-order fold.
  *
  * At scale this is the kernel under brute-force ANN scoring and
  * embedding dedup: one fused loop per pair, no per-element object
  * allocation, fully inside whole-stage codegen.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    // Both children must be array<float>: getFloat on any other array
    // type would silently reinterpret raw bytes (user-reachable via the
    // registered SQL function float_vec_dot).
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      val side = if (isFloatArray(left.dataType)) "right" else "left"
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<float> on both sides, got $side=" +
          s"${if (side == "left") left.dataType else right.dataType} " +
          s"(left=${left.dataType}, right=${right.dataType})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = FloatVecDot.checkedLength(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += FloatVecDot.scaled(x.getFloat(i), y.getFloat(i))
      i += 1
    }
    acc / FloatVecDot.SCALE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val cls = FloatVecDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $cls.checkedLength($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $cls.scaled($a.getFloat($i), $b.getFloat($i));
         |}
         |${ev.value} = $acc / $cls.SCALE();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_vec_dot"
}

object FloatVecDot {
  /** 10^15: the decimal grid the products are rounded onto. */
  val SCALE: Double = 1e15

  /** Dimension mismatch is a data bug (e.g. 512-d query vs 768-d
    * corpus); silently truncating to min(n) would yield plausible but
    * meaningless scores, so it fails loudly instead.
    */
  def checkedLength(n1: Int, n2: Int): Int = {
    if (n1 != n2) {
      throw new IllegalArgumentException(
        s"float_vec_dot: vector dimensions differ ($n1 vs $n2)")
    }
    n1
  }

  /** Exact double product rounded half-up onto the scaled-long grid —
    * the same rounding `cast(double as decimal(18,15))` applies.
    */
  def scaled(x: Float, y: Float): Long = {
    val p = x.toDouble * y.toDouble
    val s = p * SCALE
    // BigDecimal-exact HALF_UP rounding only matters within 1 ulp of a
    // grid midpoint; Math.round (= floor(x+0.5)) agrees there for the
    // magnitudes embeddings produce, and is branch-free.
    if (s >= 0) Math.round(s) else -Math.round(-s)
  }

  /** Column-level API. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))
}
