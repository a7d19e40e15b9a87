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

    // q4 A/B arms (r11 verdict task #4): both corpus-proportional
    // sides shuffle for the left-semi — which exchange-cutting lever
    // actually bites?
    def q4With(shHint: Boolean, distinctLi: Boolean): DataFrame = {
      val ord = orders
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      var li: DataFrame = lineitem.filter(col("l_quantity") > 45)
        .select(col("l_orderkey"))
      if (distinctLi) li = li.distinct()
      val liH = if (shHint) li.hint("shuffle_hash") else li
      ord.join(liH, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }
    def withConf(kv: (String, String)*)(f: => DataFrame): DataFrame = {
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      f
    }

    println("[tailprof] bloomFilter.enabled default = " + spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.enabled") +
      ", creationSideThreshold default = " + spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"))
    def noBloom(f: => DataFrame): DataFrame = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")(f)

    val arms: Map[String, () => DataFrame] = Map(
      // q27b split (r11 verdict task #4): the gate's exact-count
      // verdict vs the HLL-only operator a user actually runs
      "q27b" -> (() =>
        graft.SparkEntry.queries("q27b_approx_countd")(spark, sfDir)),
      "q27bop" -> (() => lineitem.groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_ndp"),
        count(lit(1)).as("n")).orderBy(col("l_returnflag"))),
      "q27" -> (() => noBloom(
        graft.SparkEntry.queries("q27_countd")(spark, sfDir))),
      // m1 encoder-tax A/B (r11 verdict task #5): the typed
      // mapPartitions path vs an all-codegen projection computing the
      // SAME stub features (upper bound of a native expression port),
      // and the shipped form without its output sort.
      "m1" -> (() =>
        graft.SparkEntry.queries("m1_multimodal")(spark, sfDir)),
      "m1sql" -> (() => {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        docs.select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          (lit(64L) + octet_length(col("text")).cast("long") % 256L)
            .as("width"),
          (lit(64L) + (octet_length(col("text")).cast("long") * 31L) % 256L)
            .as("height"),
          ascii(col("text").substr(lit(1), lit(1))).cast("long")
            .as("first_byte"),
          ascii(col("text").substr(length(col("text")), lit(1))).cast("long")
            .as("last_byte"))
          .orderBy(col("doc_id"))
      }),
      "m1nosort" -> (() => {
        import spark.implicits._
        val media = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text").cast("binary").as("payload"),
            lit("utf8-text").as("format"))
          .as[graft.queries.Multimodal.MediaIn]
        // stubDecode, inlined (it is private in Multimodal)
        media.mapPartitions(_.map { m =>
          val n = m.payload.length.toLong
          graft.queries.Multimodal.MediaFeat(m.doc_id, n,
            64L + n % 256L, 64L + (n * 31L) % 256L,
            if (n > 0) m.payload.head.toLong & 0xFF else -1L,
            if (n > 0) m.payload.last.toLong & 0xFF else -1L)
        }).toDF()
      }),
      "q4" -> (() => noBloom(
        graft.SparkEntry.queries("q4_semijoin")(spark, sfDir))),
      "q4sh" -> (() => noBloom(q4With(shHint = true, distinctLi = false))),
      "q4dist" -> (() => noBloom(q4With(shHint = false, distinctLi = true))),
      "q4shdist" -> (() => noBloom(q4With(shHint = true, distinctLi = true))),
      "q4bloom" -> (() => withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
          (1L << 30).toString)(
        q4With(shHint = false, distinctLi = false))),
      "q4shbloom" -> (() => withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
          (1L << 30).toString)(
        q4With(shHint = true, distinctLi = false))),
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
