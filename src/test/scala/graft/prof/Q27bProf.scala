package graft.prof

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 verdict task #3: the q27b rsd-cost curve.
  *
  * Measures the HLL-only operator (two-level pre-dedup aggregate, no
  * exact companion, no verdict projection) at rsd 0.05 (Spark's
  * default) / 0.023 / 0.01 at the given SF dir, 3-run medians after a
  * warm-up, plus the per-flag relative error of each estimate against
  * the exact distinct count — the accuracy side of the dial the
  * timing side is traded against. The DuckDB arm
  * (approx_count_distinct, its fixed-precision sketch) is run by
  * tools/q27b_duckdb.py in the same window.
  *
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf100 Test/runMain graft.prof.Q27bProf
  */
object Q27bProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def hllOnly(rsd: Double): DataFrame =
      lineitem
        .groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag")).agg(
          approx_count_distinct(col("l_partkey"), rsd).as("approx_ndp"))
        .orderBy(col("l_returnflag"))

    // Single-level arm: the two-level pre-dedup exists to keep the HLL
    // buffer off the Expand's distinct-side groups — but that Expand
    // only appears when approx and countDistinct share ONE aggregate.
    // An HLL-only aggregate has no Expand: 3 sketch buffers per task,
    // one narrow scan, map-side partial.
    def hllDirect(rsd: Double): DataFrame =
      lineitem
        .groupBy(col("l_returnflag")).agg(
          approx_count_distinct(col("l_partkey"), rsd).as("approx_ndp"))
        .orderBy(col("l_returnflag"))

    // Split-gate arm (the q27 lesson applied to q27b): exact distinct
    // + n in one single-distinct pass (Expand-free), HLL in its own
    // direct pass, joined on the 3-row flag key.
    def splitGate(rsd: Double): DataFrame = {
      val ex = lineitem.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")).as("exact_ndp"),
        count(lit(1)).as("n"))
      val ap = lineitem.groupBy(col("l_returnflag").as("flag_a")).agg(
        approx_count_distinct(col("l_partkey"), rsd).as("approx_ndp"))
      ex.join(ap, col("l_returnflag") <=> col("flag_a"))
        .select(col("l_returnflag"), col("exact_ndp"), col("n"),
          (abs(col("approx_ndp") - col("exact_ndp"))
            <= col("exact_ndp") * 0.02).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    }

    // Shipped-gate arm: the current q27b (two-level pre-dedup carrying
    // exact + approx + n in the top aggregate).
    def shippedGate(rsd: Double): DataFrame =
      lineitem
        .groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag")).agg(
          approx_count_distinct(col("l_partkey"), rsd).as("approx_ndp"),
          count(col("l_partkey")).as("exact_ndp"),
          sum(col("cnt")).as("n"))
        .select(col("l_returnflag"), col("exact_ndp"), col("n"),
          (abs(col("approx_ndp") - col("exact_ndp"))
            <= col("exact_ndp") * 0.02).as("approx_ok"))
        .orderBy(col("l_returnflag"))

    def time(df: => DataFrame): Seq[Double] =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted

    // accuracy: one exact pass, then per-rsd estimates
    val exact = lineitem
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_ndp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"exact ndp per flag: $exact")

    val arms: Seq[(String, Double => DataFrame)] =
      if (args.isEmpty)
        Seq("twolevel" -> (hllOnly _), "direct" -> (hllDirect _),
          "splitgate" -> (splitGate _), "shippedgate" -> (shippedGate _))
      else args.toSeq.map {
        case a @ "twolevel" => a -> (hllOnly _)
        case a @ "direct" => a -> (hllDirect _)
        case a @ "splitgate" => a -> (splitGate _)
        case a @ "shippedgate" => a -> (shippedGate _)
        case other => sys.error(s"unknown arm: $other (want twolevel|" +
          "direct|splitgate|shippedgate)")
      }
    for ((name, mk) <- arms; rsd <- Seq(0.05, 0.023, 0.01)) {
      mk(rsd).queryExecution.toRdd.count() // warm
      val ts = time(mk(rsd))
      val errs =
        if (name == "twolevel" || name == "direct") {
          val est = mk(rsd).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          exact.map { case (f, e) =>
            f -> f"${math.abs(est(f) - e).toDouble / e * 100}%.3f%%"
          }.toString
        } else
          mk(rsd).collect().map(r =>
            s"${r.getString(0)}:ok=${r.getBoolean(3)}").mkString(",")
      println(f"== $name%-11s rsd=$rsd%-6s median ${ts(1)}%.3f s  " +
        f"(${ts.mkString(", ")})  $errs")
    }
    spark.stop()
  }
}
