package graft

import org.scalatest.funsuite.AnyFunSuite

/** The point of c_bucketed_join: both sides pre-bucketed on the join
  * key means the join itself introduces no shuffle.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join plans without a shuffle before the join") {
    // at sf0.001 the dim side broadcasts (also shuffle-free); disable
    // broadcast so the plan must rely on the bucket layout, as it
    // would with two fact-sized sides at scale
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      runAssertions()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  private def runAssertions(): Unit = {
    val df = SparkEntry.queries("c_bucketed_join")(spark, TestSpark.SF)
    df.collect() // force AQE to finalize the plan
    // textual assertion — AQE wraps subtrees in leaf QueryStage nodes,
    // so a typed collect would not descend into them
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scans must use the bucket layout:\n$plan")
    // the only exchange allowed is the post-join groupBy/orderBy —
    // never a repartition of the join keys
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"join inputs must not be reshuffled:\n$plan")
  }
}
