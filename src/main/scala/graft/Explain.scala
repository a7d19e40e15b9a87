package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan (and, with
  * SPARK_GRAFT_RUN=1, the post-execution adaptive plan) of the named
  * queries — the `.explain("formatted")` review loop SURVEY §3's plan
  * audits come from.
  *
  * Usage: runMain graft.Explain <sfDir> <query> [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"========== $name ==========")
      df.explain("formatted")
      if (sys.env.get("SPARK_GRAFT_RUN").contains("1")) {
        df.count()
        println(s"---------- $name (final adaptive plan) ----------")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
