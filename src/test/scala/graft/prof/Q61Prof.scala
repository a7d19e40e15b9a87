package graft.prof

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch profiling main for q61_stream_join's floor attribution
  * (r9 verdict task #4): where do the ~50 s at sf100 go?
  *
  * Arms (select via args; default all):
  *   batch   — the SAME join expressed as a batch DataFrame (no
  *             streaming machinery): the pure scan+join floor.
  *   mem     — the gate as shipped (memory sink, single drain).
  *   parquet — identical stream but a durable parquet sink: isolates
  *             the memory sink's driver-side row accumulation.
  * Conf overrides come from SPARK_GRAFT_EXTRA_CONF (k=v;k=v), e.g.
  * spark.sql.shuffle.partitions=8 or the RocksDB state store — set
  * BEFORE the streaming query starts (state-store partitioning is
  * fixed at query start).
  *
  * A StreamingQueryListener prints each micro-batch's durationMs
  * breakdown (addBatch / getBatch / walCommit) and state-operator
  * metrics from the progress event — the per-stage evidence.
  */
object Q61Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    if (sys.env.get("SPARK_GRAFT_PROGRESS").forall(_ != "0"))
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          println(s"[q61prof] progress batch=${p.batchId} " +
            s"rows=${p.numInputRows} durationMs=${p.durationMs} " +
            s"state=${p.stateOperators.map(so =>
              s"(rows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
                s"removed=${so.numRowsRemoved} commitMs=${so.commitTimeMs} " +
                s"memUsed=${so.memoryUsedBytes})").mkString(";")}")
        }
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    val arms = if (args.nonEmpty) args.toSeq else Seq("batch", "mem", "parquet")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt

    def time(tag: String)(body: => Unit): Unit = (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      body
      println(f"[q61prof] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def batchJoin(): DataFrame = {
      val ev = graft.queries.Q.events(spark, sfDir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      clicks.join(buys,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 2 HOURS"))
        .select(col("c_user").as("user_id"), col("click_id"),
          col("purchase_id"),
          expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000")
            .as("lag_secs"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    }

    arms.foreach {
      case "batch" =>
        time("batch")(batchJoin().queryExecution.toRdd.count())
      case "mem" =>
        time("mem") {
          graft.streaming.StreamOps.clickPurchaseJoin(spark, sfDir,
            s"$sfDir/events.parquet", glob = "events.parquet",
            maxFilesPerTrigger = None, watermark = "1 hour",
            queryName = "graft_q61_prof")
            .queryExecution.toRdd.count()
        }
      case "parquet" =>
        time("parquet") {
          val out = graft.queries.Q.scratch(spark, "q61prof")
          graft.streaming.StreamOps.clickPurchaseJoin(spark, sfDir,
            s"$sfDir/events.parquet", glob = "events.parquet",
            maxFilesPerTrigger = None, watermark = "1 hour",
            queryName = "graft_q61_prof_pq", sinkDir = Some(out))
            .queryExecution.toRdd.count()
          graft.queries.Q.cleanScratch(spark)
        }
      case other => sys.error(s"unknown arm: $other")
    }
    spark.stop()
  }
}
