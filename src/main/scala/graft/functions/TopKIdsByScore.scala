package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Per-group top-k ids by score as a native
  * [[TypedImperativeAggregate]] — the scale-correct group-wise top-k.
  *
  * Runs in ObjectHashAggregateExec with a real PARTIAL mode: each map
  * task reduces its input to at most k (score, id) pairs per group
  * before the shuffle, so a 1000-executor aggregation over any corpus
  * ships `groups x k` tiny buffers per partition — no window, no
  * whole-partition sort, no per-row encoder round-trip (the typed
  * `Aggregator` alternative pays an InternalRow -> JVM-object decode
  * per input row; this one reads the two child expressions off the
  * unsafe row directly).
  *
  * Ordering is (score desc, id asc): ties are deterministic and match
  * `row_number() OVER (ORDER BY score DESC, id)` — the oracle
  * formulation. NULL score or id rows are ignored, like rows a window
  * oracle would rank last and the k-filter would drop.
  *
  * Reference behavior: top-k-per-group query shape
  * (AlexanderVR/dbt-parquet functional tests exercise it through
  * window materializations).
  */
case class TopKIdsByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_ids expects (double, bigint), got " +
        s"(${score.dataType.sql}, ${id.dataType.sql})")

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  // strict-weak order: a ranks ahead of b
  private def ahead(as: Double, ai: Long, bs: Double, bi: Long): Boolean =
    as > bs || (as == bs && ai < bi)

  // Buffer invariant: sorted by (score desc, id asc), length <= k, so
  // the common per-row case is one comparison against the current kth.
  override def update(buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s == null || i == null) return buf
    val sv = s.asInstanceOf[Double]
    val iv = i.asInstanceOf[Long]
    if (buf.length == k) {
      val (ws, wi) = buf(k - 1)
      if (!ahead(sv, iv, ws, wi)) return buf
    }
    var pos = buf.length
    var j = 0
    while (j < buf.length && pos == buf.length) {
      val (es, ei) = buf(j)
      if (ahead(sv, iv, es, ei)) pos = j
      j += 1
    }
    buf.insert(pos, (sv, iv))
    if (buf.length > k) buf.remove(k)
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)],
      b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (b.isEmpty) return a
    val out = ArrayBuffer.empty[(Double, Long)]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && {
        val (as_, ai) = a(i); val (bs, bi) = b(j)
        ahead(as_, ai, bs, bi)
      })
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
    }
    out
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map(_._2).toArray)

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { out += ((bb.getDouble(), bb.getLong())); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKIdsByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKIdsByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKIdsByScore =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "topk_ids"
}

object TopKIdsByScore {
  /** `topkIds(score, id, k)`: array of the k ids with the highest
    * scores in the group, ordered (score desc, id asc). */
  def topkIds(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKIdsByScore(
      Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}
