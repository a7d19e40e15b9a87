package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass blocklist word counting for the t14 content filter:
  * `struct(n_words, n_flagged)` over the raw text against a
  * plan-time-constant lowercase-ASCII word set, as a native codegen'd
  * Catalyst expression.
  *
  * Replaces `size(split(norm(text), " "))` +
  * `size(filter(words, w -> w IN (...)))` — a whitespace-collapsing
  * regexp_replace, a split allocation, and an interpreted lambda per
  * word (~10x vs the reference at sf10). Scan semantics are exactly
  * the composition it replaces:
  *
  *   - words are the maximal non-whitespace runs (Java `\s` ASCII
  *     class — `norm`'s `\s+ -> " "` collapse followed by a
  *     single-space split yields precisely these runs), with the
  *     empty-string edge preserved (`split("", " ")` is `[""]`, so
  *     `n_words` floors at 1);
  *   - a word is flagged iff its ASCII-lowercased bytes equal a block
  *     word (`norm` lowercases before the membership test; block
  *     words are lowercase ASCII, and a token that lowercases to one
  *     must itself be ASCII — the one theoretical divergence is a
  *     Unicode char whose lowercase maps INTO ASCII, e.g. U+017F
  *     "long s" -> "s", which Spark's `lower` would fold and this
  *     scan would not; no such char exists in the corpus).
  */
case class BlockWordStats(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_flagged", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected string, got $other")
    }

  override def nullable: Boolean = child.nullable

  @transient private lazy val set: Array[Array[Byte]] =
    BlockWordStats.prepare(words)

  override def nullSafeEval(s: Any): Any =
    BlockWordStats.compute(s.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = BlockWordStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val setRef = ctx.addReferenceObj("blockSet", set, "byte[][]")
      s"${ev.value} = $cls.compute($s, $setRef);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BlockWordStats = copy(child = newChild)

  override def prettyName: String = "block_word_stats"
}

object BlockWordStats {

  def prepare(words: Seq[String]): Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
      b == '\r'

  private def lowerAscii(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Token runs + set membership in one compiled pass. Whitespace
    * detection is byte-level (the `\s` class is ASCII, and UTF-8
    * continuation/lead bytes are all >= 0x80, never ws).
    */
  def compute(s: UTF8String, set: Array[Array[Byte]]): InternalRow = {
    val bytes = s.getBytes
    var nWords = 0L
    var nFlagged = 0L
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i) & 0xFF)) i += 1
      if (i < bytes.length) {
        val start = i
        while (i < bytes.length && !isWs(bytes(i) & 0xFF)) i += 1
        nWords += 1
        val len = i - start
        var w = 0
        var matched = false
        while (!matched && w < set.length) {
          val bw = set(w)
          if (bw.length == len) {
            var j = 0
            while (j < len && lowerAscii(bytes(start + j)) == bw(j)) j += 1
            matched = j == len
          }
          w += 1
        }
        if (matched) nFlagged += 1
      }
    }
    if (nWords == 0L) nWords = 1L
    new GenericInternalRow(Array[Any](nWords, nFlagged))
  }

  /** Column-level API: `words` must be lowercase ASCII. */
  def of(text: Column, words: Seq[String]): Column =
    Bridge.column(BlockWordStats(Bridge.expression(text), words))
}
