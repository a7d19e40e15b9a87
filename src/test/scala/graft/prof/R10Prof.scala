package graft.prof

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.SparkEntry

/** Scratch profiling main for the round-10 measurement tasks (r9
  * verdict items 2/6/8 + the q68b crossover): NOT part of the driver
  * contract. Each arm re-runs a shipped query's floor A/B under the
  * r10 full-plan bench action (queryExecution.toRdd.count) —
  * count-pruning could have flattered either side of the r7/r8 A/Bs
  * that the current forms were adopted from.
  *
  * Arms (args; default none — name them explicitly):
  *   q63jobs  — stock q63 with a job listener printing per-job wall
  *              time (the per-level attribution evidence).
  *   q63cache — q63 with the recursion's dimension side cached once
  *              (each UnionLoop level otherwise re-scans the full
  *              customer parquet).
  *   q3 q5    — stock (raw narrow shuffle) vs per-orderkey pre-agg,
  *              interleaved in one JVM, 3 runs each.
  *   q12      — stock fold-then-join vs semi-join decomposition.
  *   q7       — shipped hash-anti vs unhinted SMJ.
  *   q28      — stock (exchange-reuse) vs explicit persist of the
  *              shared CTE subtree.
  *   q62      — stock, isolated 3 runs (pair with a back-to-back
  *              DuckDB leg for the protocol row).
  *   q68b     — parse-once variant vs 5 per-field get_json_object
  *              re-parses (the crossover the gate exists to measure).
  */
object R10Prof {
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def full(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def t(name: String): DataFrame = graft.queries.Q.t(spark, sfDir, name)

    /** Interleave named arms A,B,A,B,… with one untimed warm-up each. */
    def ab(tag: String, arms: (String, () => DataFrame)*): Unit = {
      arms.foreach { case (_, mk) => full(mk()) }
      (1 to runs).foreach { i =>
        arms.foreach { case (arm, mk) =>
          val t0 = System.nanoTime()
          val n = full(mk())
          println(f"[r10prof] $tag/$arm run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      }
    }

    // ─── q63: per-level job attribution + cached-dim arm ───
    def q63(cacheDim: Boolean): DataFrame = {
      val s = org.apache.spark.sql.graftbridge.Bridge.cloneSession(spark)
      s.conf.set("spark.sql.cteRecursionRowLimit", (1 << 30).toString)
      val dim = graft.queries.Q.t(s, sfDir, "customer").select(col("c_custkey"))
      val rec = if (cacheDim) { val c = dim.cache(); c.count(); c } else dim
      rec.createOrReplaceTempView("graft_cust_prof")
      s.sql("""WITH RECURSIVE h(c, depth) AS (
          SELECT c_custkey, 0 FROM graft_cust_prof WHERE c_custkey < 10
          UNION ALL
          SELECT k.c_custkey, h.depth + 1
          FROM graft_cust_prof k JOIN h ON k.c_custkey div 10 = h.c
          WHERE k.c_custkey >= 10)
        SELECT cast(depth as bigint) AS depth, count(*) AS n,
          cast(sum(c) as bigint) AS key_sum
        FROM h GROUP BY depth ORDER BY depth""")
    }

    args.foreach {
      case "q63jobs" =>
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit =
            starts.put(j.jobId, (System.nanoTime(),
              Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
          override def onJobEnd(j: SparkListenerJobEnd): Unit = {
            Option(starts.remove(j.jobId)).foreach { case (t0, d) =>
              println(f"[r10prof] q63 job ${j.jobId}: ${(System.nanoTime() - t0) / 1e9}%.2f s  $d")
            }
          }
        })
        full(q63(cacheDim = false)) // warm
        println("[r10prof] ---- warm pass done; timed pass jobs follow ----")
        val t0 = System.nanoTime()
        full(q63(cacheDim = false))
        Thread.sleep(500)
        println(f"[r10prof] q63/stock total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      case "q63cache" =>
        ab("q63", "stock" -> (() => q63(false)), "cache" -> (() => q63(true)))

      case "q3" =>
        def base = {
          val cust = t("customer").filter(col("c_mktsegment") === "BUILDING")
          val ord = t("orders").filter(col("o_orderdate") < lit("1998-01-01"))
          val li = t("lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
            .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          val custKeys = cust.select(col("c_custkey")).cache()
          custKeys.count()
          val ordF = ord
            .join(custKeys, col("o_custkey") === col("c_custkey"), "left_semi")
            .select(col("o_orderkey"), col("o_orderdate"))
          (li, ordF)
        }
        def raw = {
          val (li, ordF) = base
          li.join(ordF.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("l_orderkey"), col("o_orderdate"))
            .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
            .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
        }
        def preagg = {
          val (li, ordF) = base
          val liAgg = li.groupBy(col("l_orderkey"))
            .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
          liAgg.join(ordF.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
            .select(col("l_orderkey"), col("o_orderdate"), col("revenue"))
            .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
        }
        ab("q3", "raw" -> (() => raw), "preagg" -> (() => preagg))

      case "q5" =>
        def parts = {
          val region = t("region").filter(col("r_name") === "ASIA")
          val asiaN = t("nation")
            .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))
          val custA = t("customer")
            .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
            .select(col("c_custkey"), col("n_nationkey")).cache()
          custA.count()
          val ord = t("orders")
            .filter(col("o_orderdate") >= lit("1995-06-01") &&
              col("o_orderdate") < lit("1999-01-01"))
          val ordA = ord.select(col("o_orderkey"), col("o_custkey"))
            .join(custA, col("o_custkey") === col("c_custkey"))
            .select(col("o_orderkey"), col("n_nationkey"))
          val liF = t("lineitem")
            .join(t("supplier").select(col("s_suppkey")),
              col("l_suppkey") === col("s_suppkey"), "left_semi")
            .select(col("l_orderkey"),
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast(DecimalType(18, 4)).as("rev1"))
          (asiaN, ordA, liF)
        }
        def raw = {
          val (asiaN, ordA, liF) = parts
          liF.join(ordA.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("n_nationkey")).agg(sum(col("rev1")).as("rev"))
            .join(broadcast(asiaN), Seq("n_nationkey"))
            .select(col("n_name"), col("rev").cast("double").as("revenue"))
            .orderBy(col("revenue").desc, col("n_name"))
        }
        def preagg = {
          val (asiaN, ordA, liF) = parts
          val liAgg = liF.groupBy(col("l_orderkey")).agg(sum(col("rev1")).as("rev0"))
          liAgg.join(ordA.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("n_nationkey")).agg(sum(col("rev0")).as("rev"))
            .join(broadcast(asiaN), Seq("n_nationkey"))
            .select(col("n_name"), col("rev").cast("double").as("revenue"))
            .orderBy(col("revenue").desc, col("n_name"))
        }
        ab("q5", "raw" -> (() => raw), "preagg" -> (() => preagg))

      case "q12" =>
        def li = t("lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01"))
          .select(col("l_orderkey"), col("l_linestatus"))
        def stock = {
          val ord = t("orders").select(col("o_orderkey"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L).as("is_high"))
          li.hint("shuffle_hash").join(ord, col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("l_linestatus"))
            .agg(sum(col("is_high")).as("high_line_count"),
              sum(lit(1L) - col("is_high")).as("low_line_count"))
            .orderBy(col("l_linestatus"))
        }
        def semi = {
          val highKeys = t("orders")
            .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .select(col("o_orderkey"))
          val high = li.join(highKeys.hint("shuffle_hash"),
              col("l_orderkey") === col("o_orderkey"), "left_semi")
            .groupBy(col("l_linestatus")).agg(count(lit(1)).as("high_line_count"))
          val total = li.groupBy(col("l_linestatus")).agg(count(lit(1)).as("n_total"))
          total.join(high, Seq("l_linestatus"))
            .select(col("l_linestatus"), col("high_line_count"),
              (col("n_total") - col("high_line_count")).as("low_line_count"))
            .orderBy(col("l_linestatus"))
        }
        ab("q12", "stock" -> (() => stock), "semi" -> (() => semi))

      case "q7" =>
        def base = {
          val ord = t("orders").filter(col("o_orderdate") >= lit("2000-01-01"))
          (t("customer"), ord)
        }
        def agg(j: DataFrame): DataFrame = j
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_acctbal"))
          .orderBy(col("c_mktsegment"))
        def anti = { val (c, o) = base
          agg(c.join(o.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"), "left_anti")) }
        def smj = { val (c, o) = base
          agg(c.join(o.hint("merge"), col("c_custkey") === col("o_custkey"), "left_anti")) }
        ab("q7", "anti" -> (() => anti), "smj" -> (() => smj))

      case "q28" =>
        def build(persist: Boolean): DataFrame = {
          val custrev = t("orders").groupBy(col("o_custkey"))
            .agg(dsum(col("o_totalprice")).as("rev"))
          val withSeg0 = custrev.join(t("customer").hint("shuffle_hash"),
              col("o_custkey") === col("c_custkey"))
            .select(col("c_custkey"), col("c_mktsegment"), col("rev"))
          val withSeg = if (persist) { val p = withSeg0.persist(); p.count(); p }
            else withSeg0
          val segavg = withSeg.groupBy(col("c_mktsegment").as("seg"))
            .agg((sum(col("rev").cast(DecimalType(18, 2))).cast("double") /
              count(lit(1))).as("seg_avg"))
          withSeg.join(segavg, col("c_mktsegment") === col("seg"))
            .filter(col("rev") > col("seg_avg") * lit(1.5))
            .select(col("c_custkey"), col("c_mktsegment"), col("rev"), col("seg_avg"))
            .orderBy(col("c_custkey"))
        }
        ab("q28", "stock" -> (() => build(false)),
          "persist" -> (() => { spark.catalog.clearCache(); build(true) }))

      case "q62" =>
        ab("q62", "stock" -> (() => SparkEntry.queries("q62_nation_pairs")(spark, sfDir)))

      case "q68b" =>
        def js = concat(
          lit("{\"id\":"), col("event_id"),
          lit(",\"ty\":\""), col("event_type"),
          lit("\",\"u\":"), col("user_id"),
          lit(",\"fv\":"), floor(col("value")).cast("long"),
          lit(",\"p\":"), col("props"),
          lit("}"))
        def variant = SparkEntry.queries("q68b_variant_multi")(spark, sfDir)
        def reparse = graft.queries.Q.events(spark, sfDir)
          .select(js.as("j"))
          .select(
            get_json_object(col("j"), "$.ty").as("ty"),
            get_json_object(col("j"), "$.id").cast("long").as("id"),
            get_json_object(col("j"), "$.u").cast("long").as("u"),
            get_json_object(col("j"), "$.fv").cast("long").as("fv"),
            get_json_object(col("j"), "$.p.k").cast("long").as("k"))
          .groupBy(col("ty"))
          .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"),
            sum(col("u")).as("u_sum"), sum(col("fv")).as("fv_sum"),
            sum(col("k")).as("k_sum"))
          .orderBy(col("ty"))
        ab("q68b", "variant" -> (() => variant), "reparse5" -> (() => reparse))

      case other => sys.error(s"unknown arm: $other")
    }
    spark.stop()
  }
}
