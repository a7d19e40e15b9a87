package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKIdsByScore

/** The native top-k aggregate under q46: value parity against the
  * window-oracle formulation, deterministic tie handling, buffer
  * serialization, and the plan property the design exists for — a
  * partial ObjectHashAggregate below the shuffle, no Window operator.
  */
class TopKNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q46 matches the window formulation on the customer table") {
    val got = graft.SparkEntry.queries("q46_topk_agg")(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val want = spark.read.parquet(s"${TestSpark.SF}/customer.parquet")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("c_nationkey").cast("long"), col("c_custkey"),
        col("rank").cast("long"))
      .orderBy(col("c_nationkey"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("ties break on id asc; nulls are ignored; buffers round-trip") {
    import TopKIdsByScore.topkIds
    val df = spark.createDataFrame(Seq(
      (1L, java.lang.Double.valueOf(5.0), java.lang.Long.valueOf(30L)),
      (1L, java.lang.Double.valueOf(5.0), java.lang.Long.valueOf(10L)),
      (1L, java.lang.Double.valueOf(5.0), java.lang.Long.valueOf(20L)),
      (1L, java.lang.Double.valueOf(9.0), java.lang.Long.valueOf(99L)),
      (1L, null.asInstanceOf[java.lang.Double], java.lang.Long.valueOf(1L)),
      (2L, java.lang.Double.valueOf(1.0), null.asInstanceOf[java.lang.Long])))
      .toDF("g", "s", "i")
      // force >1 partition so partial buffers really serialize + merge
      .repartition(3)
    val got = df.groupBy(col("g"))
      .agg(topkIds(col("s"), col("i"), 3).as("ids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList))
      .toMap
    // score desc first, then id asc among the 5.0 ties; nulls skipped
    assert(got(1L) == List(99L, 10L, 20L))
    // group 2's only row has a null id -> empty result, not a crash
    assert(got(2L) == Nil)
  }

  test("plan: partial ObjectHashAggregate below the shuffle, no Window") {
    import TopKIdsByScore.topkIds
    val df = spark.read.parquet(s"${TestSpark.SF}/customer.parquet")
      .groupBy(col("c_nationkey"))
      .agg(topkIds(col("c_acctbal"), col("c_custkey"), 3).as("ids"))
    df.collect()
    // string-match the final adaptive plan: AQE wraps materialized
    // stages in leaf QueryStageExec nodes, so a tree collect can't
    // reach the partial side
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_ids"),
      s"expected a map-side partial topk_ids below the shuffle:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate, got:\n$plan")
    assert(!plan.contains("Window"),
      s"native top-k must not fall back to a window:\n$plan")
  }
}
