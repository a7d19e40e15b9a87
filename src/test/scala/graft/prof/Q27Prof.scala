package graft.prof

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 verdict task 5: q27's one untried lever.
  *
  * Shipped (r13): three single-distinct passes, each RESCANNING the
  * 2-column parquet projection, joined on the 4-row flag key
  * (measured 14.58/15.55 s vs 18.65/21.61 s for the Expand form at
  * sf100). The hypothesis to kill or adopt: sharing ONE scan across
  * the passes beats three parquet decodes of the same columns.
  *
  * Arms (run interleaved, fresh JVM per invocation; pass arm names
  * as args or no args = all):
  *   - shipped    — the Relational2 production form (3 scans)
  *   - cached     — the same 3 passes over a cache()+count()
  *                  materialized 3-column base (1 scan + 3 cache
  *                  reads; the "shared pre-projected scan" — a
  *                  literal shared exchange is impossible here, the
  *                  three passes hash on different keys, so the
  *                  storage layer is the only sharing point)
  *   - fused      — 2 scans: the partkey pass goes two-level
  *                  (groupBy(flag, pk).count → groupBy(flag)
  *                  count+sum) so ndp and n ride ONE scan/exchange;
  *                  suppkey stays its own single-distinct pass
  *
  * Usage: SPARK_DRIVER_MEM=64g Test/runMain graft.prof.Q27Prof <sfDir> [arm ...]
  */
object Q27Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf10")
    val spark = graft.core.EngineDefaults.scaled(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"), sfDir, 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def base: DataFrame = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_partkey"), col("l_suppkey"))

    def threePass(b: DataFrame): DataFrame = {
      val ndp = b.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("ndp"))
      val nds = b.groupBy(col("l_returnflag").as("flag_s"))
        .agg(countDistinct(col("l_suppkey")).as("nds"))
      val n = b.groupBy(col("l_returnflag").as("flag_n"))
        .agg(count(lit(1)).as("n"))
      ndp.join(nds, col("l_returnflag") <=> col("flag_s"))
        .join(n, col("l_returnflag") <=> col("flag_n"))
        .select(col("l_returnflag"), col("ndp"), col("nds"), col("n"))
        .orderBy(col("l_returnflag"))
    }

    def shipped(): DataFrame =
      graft.SparkEntry.queries("q27_countd")(spark, sfDir)

    def fused(): DataFrame = {
      val b = base
      val pk = b.groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("ndp"), sum(col("cnt")).as("n"))
      val nds = b.groupBy(col("l_returnflag").as("flag_s"))
        .agg(countDistinct(col("l_suppkey")).as("nds"))
      pk.join(nds, col("l_returnflag") <=> col("flag_s"))
        .select(col("l_returnflag"), col("ndp"), col("nds"), col("n"))
        .orderBy(col("l_returnflag"))
    }

    def time(mk: () => DataFrame, label: String,
        before: () => Unit = () => (), after: () => Unit = () => ())
        : Unit = {
      before()
      mk().queryExecution.toRdd.count() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      after()
      println(f"== q27/$label%-10s $sfDir min ${ts.head}%.3f s  max ${ts.last}%.3f s")
      System.gc(); Thread.sleep(3000)
    }

    val arms = if (args.length > 1) args.tail.toSeq
      else Seq("shipped", "cached", "fused")
    arms.foreach {
      case "shipped" => time(() => shipped(), "shipped")
      case "fused" => time(() => fused(), "fused")
      case "cached" =>
        // cache once OUTSIDE the timed window? No — the scan+cache
        // write is part of this form's real cost on a first run, but
        // a production pipeline would amortize it across the three
        // passes within one action graph. Report BOTH: cold includes
        // materialization, warm is the 3 passes over a hot cache.
        val b = base.cache()
        val t0 = System.nanoTime()
        b.count()
        val mat = (System.nanoTime() - t0) / 1e9
        println(f"== q27/cache-mat  $sfDir ${mat}%.3f s (scan+materialize)")
        time(() => threePass(b), "cached-hot",
          after = () => ())
        b.unpersist(blocking = true)
      case other => sys.error(s"unknown arm: $other (want shipped|" +
        "cached|fused)")
    }
    spark.stop()
  }
}
