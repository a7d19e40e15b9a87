package graft.prof

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r11 verdict task #2: audit the anomalous scan-agg tail
  * (q58 12.6x, q55 6.3x, q50 7.9x, q51 3.6x at sf100).
  *
  * Floor arms isolate the scan cost the queries sit on:
  *   o3   — orders scan decoding (status, priority, totalprice):
  *          the string-decode floor under q58/q55
  *   o2   — orders scan decoding (orderkey, totalprice): the numeric
  *          floor under q50
  *   li1  — lineitem scan with the q51 pushed filter (one branch)
  * Variant arms:
  *   q50d — q50 with dsum instead of the per-row decimal cast
  *   q51c — q51 with ONE pushed-filter scan cached, both set-ops fed
  *          from it (shipped form scans lineitem four times)
  *
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf100 Test/runMain graft.prof.TailProf [arms...]
  */
object TailProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def q51cached = {
      val base = lineitem.filter(col("l_orderkey") <= 1500)
        .select(col("l_orderkey"), col("l_partkey")).cache()
      base.count()
      val a = base.filter(col("l_orderkey") <= 1000).select(col("l_partkey"))
      val b = base.filter(col("l_orderkey").between(500, 1500))
        .select(col("l_partkey"))
      val inter = a.intersectAll(b).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect_all"))
      val exc = a.exceptAll(b).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except_all"))
      inter.union(exc).select(col("op"), col("n")).orderBy(col("op"))
    }

    val arms: Map[String, () => DataFrame] = Map(
      "o3" -> (() => orders.select(col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"))),
      "o2" -> (() => orders.select(col("o_orderkey"), col("o_totalprice"))),
      "li1" -> (() => lineitem.filter(col("l_orderkey") <= 1000)
        .select(col("l_partkey"))),
      "q58" -> (() => graft.SparkEntry.queries("q58_bool_agg")(spark, sfDir)),
      "q55" -> (() => graft.SparkEntry.queries("q55_cube")(spark, sfDir)),
      "q50" -> (() => graft.SparkEntry.queries("q50_sample")(spark, sfDir)),
      "q50d" -> (() => orders
        .filter(pmod(col("o_orderkey") * 2654435761L, lit(100)) < 10)
        .agg(count(lit(1)).as("n_sampled"),
          graft.functions.Dnum.dsum(col("o_totalprice"), 2)
            .as("sampled_total"))),
      "q51" -> (() => graft.SparkEntry.queries("q51_setops_all")(spark, sfDir)),
      "q51c" -> (() => q51cached))

    val names = if (args.nonEmpty) args.toSeq else
      Seq("o3", "o2", "li1", "q58", "q55", "q50", "q50d", "q51", "q51c")
    for (name <- names) {
      val f = arms(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f().queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"[tailprof] $name%-5s median=$med%8.2fs runs=${
        times.map(t => f"${t._1}%.2f").mkString(",")} rows=${times.head._2}")
    }
    spark.stop()
  }
}
