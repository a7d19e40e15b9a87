package graft.prof

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r13 verdict task #2: the measured batch-equivalent A/B that q39
  * and q67's weak-row adjudication was missing (q61 got it in r10-12;
  * these two never did).
  *
  * Arms (one JVM, interleaved, 3 runs each after warm-up):
  *   q39_stream — the shipped key: micro-batch windowed aggregate,
  *                complete-mode memory sink, state store
  *   q39_batch  — the IDENTICAL aggregate as a batch DataFrame (the
  *                oracle's plan shape): same watermarkless groupBy
  *                window + decimal sum + format/sort
  *   q67_stream — the shipped key: foreachBatch latest-state merge
  *                into a catalog table
  *   q67_batch  — per-user argmax (max_by struct) + one CTAS write of
  *                the same result table
  *
  * The stream-minus-batch delta IS the micro-batch + state machinery
  * cost the ratio row charges to the engine; the batch arm is what a
  * batch user would pay for the same answer.
  *
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf100 Test/runMain graft.prof.StreamEquivProf
  */
object StreamEquivProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def events = spark.read.parquet(s"$sfDir/events.parquet")

    def q39Batch: DataFrame = q39BatchWith(
      sum(col("value").cast(DecimalType(18, 6))).cast("double"))

    // the r14 port's batch arm: the dsum scaled-long route
    def q39BatchDsum: DataFrame =
      q39BatchWith(graft.functions.Dnum.dsum(col("value"), 6))

    def q39BatchWith(total: org.apache.spark.sql.Column): DataFrame =
      events
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), total.as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("hour"), col("event_type"))

    def q67Batch: DataFrame = {
      val latest = events
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("ts"), col("event_id"), col("event_type"),
            col("value")),
          struct(col("ts"), col("event_id"))).as("s"))
        .select(col("user_id"), unix_micros(col("s.ts")).as("ts_us"),
          col("s.event_id").as("event_id"),
          col("s.event_type").as("event_type"), col("s.value").as("value"))
        .orderBy(col("user_id"))
      // land it like q67 does: one parquet write of the state table
      val out = graft.queries.Q.scratch(spark, "sequiv") + "/latest"
      latest.write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }

    def time(mk: () => DataFrame): Seq[Double] =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted

    val arms = Seq[(String, () => DataFrame)](
      "q39_stream" -> (() =>
        graft.SparkEntry.queries("q39_stream_window")(spark, sfDir)),
      "q39_batch" -> (() => q39Batch),
      "q39_batch_dsum" -> (() => q39BatchDsum),
      "q67_stream" -> (() =>
        graft.SparkEntry.queries("q67_stream_merge")(spark, sfDir)),
      "q67_batch" -> (() => q67Batch))
    for (pass <- 1 to 2; (name, mk) <- arms) {
      if (pass == 1) mk().queryExecution.toRdd.count() // warm
      val ts = time(mk)
      println(f"== pass$pass $name%-11s median ${ts(1)}%.3f s  " +
        f"(${ts.mkString(", ")})")
    }
    spark.stop()
  }
}
