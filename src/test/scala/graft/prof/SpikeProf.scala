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
    // SPARK_GRAFT_SHUFFLE: the sf300 follow-up arm — q62's
    // shuffle_hash build exceeds per-partition execution memory at
    // sf300 with the static 32 (measured: "Can't acquire 536870912
    // bytes to build hash relation"), the live demonstration of the
    // SURVEY §3 sizing rule that shuffle partitions scale with data
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
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
