package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Polynomial rolling-hash document fingerprint over an
  * `array<string>` of words, as a native codegen'd Catalyst
  * expression: `acc = (acc * 31 + md5_32(word)) mod 1e9+7`, starting
  * from 0, where `md5_32` is the first 4 bytes of the word's MD5
  * digest read big-endian (== the first 8 hex chars parsed base-16 —
  * the engine-agnostic form a SQL oracle can state).
  *
  * Replaces the interpreted `aggregate(transform(words, md5...))`
  * higher-order fold, which Spark cannot compile into whole-stage
  * codegen (each element allocates a lambda frame and evaluates an
  * expression tree): here the whole fold is one generated call into a
  * tight loop with a thread-reused digest instance. Identical results
  * by construction: for >= 2 words the running `mod` agrees with a
  * single trailing `mod` (the gate filters 1-word docs for exactly
  * that reason — DuckDB's list_reduce seeds with the first element
  * unreduced).
  *
  * Null handling matches the fold it replaces: a null words array or
  * a null element yields NULL (aggregate's merge on null is null).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<string>, got $other")
    }

  // a null ELEMENT nulls the whole fingerprint, so the boxed-Long
  // return carries the nullability (UnaryExpression handles null input)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    RollingFingerprint.hashWords(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = RollingFingerprint.getClass.getName.stripSuffix("$") +
        "$.MODULE$"
      val boxed = ctx.freshName("fp")
      s"""
         |Object $boxed = $cls.hashWords($a);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Long) $boxed).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprint = copy(child = newChild)

  override def prettyName: String = "rolling_fingerprint"
}

object RollingFingerprint {
  val Mod: Long = 1000000007L

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The whole fold in one compiled loop; boxed so a null element can
    * surface as a NULL result (matching the interpreted fold).
    */
  def hashWords(arr: ArrayData): java.lang.Long = {
    val d = md.get()
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      // digest() resets the instance, so one thread-local is reused
      // across every word of every row on the thread
      val dig = d.digest(arr.getUTF8String(i).getBytes)
      val h = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
      acc = (acc * 31 + h) % Mod
      i += 1
    }
    acc
  }

  /** Column-level API. */
  def of(words: Column): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(words)))
}
