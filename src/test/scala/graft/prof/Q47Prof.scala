package graft.prof

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 verdict task #5: refresh q47's r8-era hot/cold attribution on
  * current code against Spark 4's stock AQE skew handling.
  *
  * Arms (interleaved in ONE JVM, 3-run medians each, two passes):
  *   shipped   — the hot/cold split as shipped (hot key aggregated
  *               join-free, cold keys joined plain)
  *   stock     — the oracle's literal shape: CASE-map the hot key and
  *               join everything, leaving the 30%-on-one-key skew to
  *               AQE's OptimizeSkewedJoin (sort-merge default)
  *   stock_shj — stock with a shuffle_hash hint on the dim (the
  *               shipped cold path's join strategy, for a like-for-
  *               like strategy comparison)
  *
  * A shuffle-partition sweep (SPARK_GRAFT_SHUFFLE=64/128) is run as
  * separate invocations — partition count is a session constant.
  *
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf100 Test/runMain graft.prof.Q47Prof
  */
object Q47Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"shuffle.partitions=$shuffle")

    def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")

    def shipped: DataFrame =
      graft.SparkEntry.queries("q47_salted_join")(spark, sfDir)

    def stock(shj: Boolean): DataFrame = {
      val f = lineitem.select(
        when(col("l_orderkey") % 100 < 30, lit(0L))
          .otherwise(col("l_orderkey")).as("k"),
        col("l_extendedprice"))
      val dim = orders.select(col("o_orderkey"), col("o_orderpriority"))
      f.join(if (shj) dim.hint("shuffle_hash") else dim,
          col("k") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Dnum.dsum(col("l_extendedprice"), 2).as("total"))
        .orderBy(col("o_orderpriority"))
    }

    def time(df: => DataFrame): Seq[Double] =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted

    val arms = Seq[(String, () => DataFrame)](
      "shipped" -> (() => shipped),
      "stock" -> (() => stock(false)),
      "stock_shj" -> (() => stock(true)))
    for (pass <- 1 to 2; (name, mk) <- arms) {
      if (pass == 1) mk().queryExecution.toRdd.count() // warm
      val ts = time(mk())
      println(f"== pass$pass $name%-10s median ${ts(1)}%.3f s  " +
        f"(${ts.mkString(", ")})")
    }
    spark.stop()
  }
}
