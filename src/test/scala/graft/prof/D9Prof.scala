package graft.prof

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage attribution for d9_contamination (r11 verdict task #1):
  * where does the residual go after the r12 text-mode scanner?
  *
  * Arms (each timed as full-plan toRdd.count(), 3 runs):
  *   scan     — documents scan + lower, count only (the I/O floor)
  *   shingle  — + text-mode WordShingleSigs + explode (corpus side)
  *   shingleA — the r11 array-mode form (regexp_replace+trim+split)
  *   semi     — + the bench distinct + left-semi probe
  *   full     — the shipped gate (adds per-doc count agg + outer join)
  *
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf10 Test/runMain graft.prof.D9Prof [arms...]
  */
object D9Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("D9PROF_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val s = e.stageInfo
            val run = s.taskMetrics.executorRunTime / 1e3
            val cpu = s.taskMetrics.executorCpuTime / 1e9
            println(f"[stage] id=${s.stageId}%3d tasks=${s.numTasks}%3d " +
              f"run=${run}%7.2fs cpu=${cpu}%7.2fs ${s.name.take(60)}")
          }
        })

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def shText = docs.select(col("doc_id"),
      explode(graft.functions.WordShingleSigs.of(lower(col("text")), 5))
        .as("g"))
    def shArray = docs.select(col("doc_id"),
      explode(graft.functions.WordShingleSigs.of(
        split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "),
        5)).as("g"))

    def semiOf(sh: => DataFrame) = {
      val bench = sh.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      sh.filter(col("doc_id") % 97 =!= 0).join(bench, Seq("g"), "left_semi")
    }

    def fullBcast = {
      val docs0 = docs
      val sh = docs0.select(col("doc_id"),
        explode(graft.functions.WordShingleSigs.of(lower(col("text")), 5))
          .as("g"))
      val bench = sh.filter(col("doc_id") % 97 === 0)
        .select(col("g")).distinct().cache()
      val nb = bench.count()
      println(s"[d9prof] bench distinct sigs = $nb")
      val cnt = sh.filter(col("doc_id") % 97 =!= 0)
        .join(bench, Seq("g"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cont"))
      docs0.filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
        .join(cnt, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_cont"), lit(0L)).as("n_cont"),
          (coalesce(col("n_cont"), lit(0L)) > 0).as("contaminated"))
        .orderBy(col("doc_id"))
    }

    val arms: Map[String, () => DataFrame] = Map(
      "fullB" -> (() => fullBcast),
      "scan" -> (() => docs.select(col("doc_id"), lower(col("text")).as("t"))),
      "shingle" -> (() => shText),
      "shingleA" -> (() => shArray),
      "semi" -> (() => semiOf(shText)),
      "semiA" -> (() => semiOf(shArray)),
      "full" -> (() => graft.SparkEntry.queries("d9_contamination")(spark, sfDir)))

    val names = if (args.nonEmpty) args.toSeq else
      Seq("scan", "shingle", "shingleA", "semi", "full")
    for (name <- names) {
      val f = arms(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f().queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"[d9prof] $name%-9s median=$med%8.2fs runs=${
        times.map(t => f"${t._1}%.2f").mkString(",")} rows=${times.head._2}")
    }
    spark.stop()
  }
}
