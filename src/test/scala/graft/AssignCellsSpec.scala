package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmSim

/** Pins the r15 assignment rewrite: [[LlmSim.assignCells]] (pure
  * projection — score all cells in-row, sort the k-element array,
  * explode top-nprobe) must select EXACTLY the rows the r8-r14
  * broadcast-join + row_number-window form selected, for both the
  * raw-dot and the normalized (cosine) ranking, including ties.
  * The rewrite removed an Exchange+Sort of n×k embedding-carrying
  * rows from every IVF consumer (s3/s3b/s4/s4b/d11); this spec is
  * what keeps a future edit from silently changing the assignment.
  */
class AssignCellsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceAssign(
      df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Int, Seq[Float])], nprobe: Int,
      normalize: Boolean): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val centDf = broadcast(cents.toDF("cent_id", "cent_v"))
    val dot = graft.functions.FloatVecDot.dot(col("embedding"), col("cent_v"))
    val scored =
      if (normalize)
        dot / sqrt(graft.functions.FloatVecDot.dot(
          col("embedding"), col("embedding")))
      else dot
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_dot").desc, col("cent_id"))
    df.join(centDf)
      .withColumn("cent_dot", scored)
      .withColumn("cent_rank", row_number().over(w))
      .filter(col("cent_rank") <= nprobe)
      .select(col("vec_id"), col("cent_id"), col("cent_dot"))
  }

  test("projection assignment == window assignment (raw + cosine, with ties)") {
    import spark.implicits._
    // deterministic vectors incl. exact ties: vec 7's embedding makes
    // equal dots against centroids 2 and 5 (identical vectors), so the
    // cent_id ASC tiebreak is exercised, not just the dot ordering
    val dim = 8
    def vec(seed: Long): Seq[Float] =
      Seq.tabulate(dim)(i => (((seed * 31 + i * 7) % 13) - 6).toFloat / 4f)
    val cents: Seq[(Int, Seq[Float])] =
      (0 until 6).map(c => c -> (if (c == 5) vec(2) else vec(c))) // 5 == 2
    val vecs = (0L until 40L).map(v => (v, vec(v % 9))).toDF(
      "vec_id", "embedding")
    for (nprobe <- Seq(1, 2, 3); normalize <- Seq(false, true)) {
      val got = LlmSim.assignCells(vecs, col("embedding"), nprobe, cents,
          normalize)
        .select(col("vec_id"), col("cent_id"), col("cent_dot"))
      val want = referenceAssign(vecs, cents, nprobe, normalize)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"assignment sets differ at nprobe=$nprobe normalize=$normalize")
    }
  }
}
