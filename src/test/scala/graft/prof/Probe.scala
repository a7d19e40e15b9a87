package graft.prof

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explain = args.headOption.contains("--explain")
    val names = if (explain) args.tail else args
    if (explain) {
      for (name <- names) {
        println(s"========== $name ==========")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    } else for (name <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      // full-plan action, same as graft.Bench since r10
      val n = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
