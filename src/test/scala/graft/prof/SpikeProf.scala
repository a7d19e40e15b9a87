package graft.prof

import org.apache.spark.sql.SparkSession

/** r13 verdict task #1: the sf300 scale-spike measurement main.
  *
  * Times ONE key (warm + 2 measured runs, min and max printed) at one
  * SF dir in a fresh JVM — leaner than graft.Explain's warm+3 because
  * the sf300 legs are disk-bound (41 GB of parquet evicts everything
  * from page cache) and a third run buys little against the spike's
  * wall-clock budget. Between runs the shuffle files of the previous
  * run are explicitly reaped (System.gc + cleaner drain): a single
  * sf300 leg of the heavy exchange keys holds ~18 GB of shuffle
  * scratch, and this sandbox has ~21 GB free beside the data — two
  * runs' files coexisting would ENOSPC the leg (measured live: the
  * interrupted first spike attempt drove the fs to 100%).
  *
  * Usage: Test/runMain graft.prof.SpikeProf <sfDir> <key>
  */
object SpikeProf {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, key) = args.take(2)
    // Default: the engine's scale-aware fan-out (r15, EngineDefaults.
    // initialShufflePartitions) — the spike re-run verifies q62's
    // pinned shuffle_hash build survives sf300 with NO hand override
    // (r14 with static 32: "Can't acquire 536870912 bytes to build
    // hash relation"). SPARK_GRAFT_SHUFFLE pins BOTH knobs for
    // regression arms (e.g. =32 reproduces the r14 failure).
    val base = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (sys.env.get("SPARK_GRAFT_SHUFFLE") match {
      case Some(shuffle) => graft.core.EngineDefaults(base
        .config("spark.sql.shuffle.partitions", shuffle)
        .config(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          shuffle))
      case None => graft.core.EngineDefaults.scaled(
        base.config("spark.sql.shuffle.partitions", "32"), sfDir, 32)
    }).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(key)

    def reap(): Unit = {
      // completed runs' ShuffleDependencies are unreachable now; a
      // full GC lets ContextCleaner enqueue them and the sleep lets
      // it delete the files before the next run starts writing
      System.gc()
      Thread.sleep(4000)
    }

    q(spark, sfDir).queryExecution.toRdd.count() // warm
    reap()
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      q(spark, sfDir).queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      reap()
      t
    }.sorted
    println(f"== $key%-22s $sfDir min ${ts.head}%.3f s  max ${ts.last}%.3f s")
    spark.stop()
  }
}
