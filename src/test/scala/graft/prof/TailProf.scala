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
    def customer = spark.read.parquet(s"$sfDir/customer.parquet")
    def events = spark.read.parquet(s"$sfDir/events.parquet")

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
      "q51c" -> (() => q51cached),

      // ── r13 verdict task 3: never-isolated >2x tail (q9/q14/q15/q28)
      // Floor arms expose the scan/agg each query sits on.
      "q9" -> (() => graft.SparkEntry.queries("q9_topk")(spark, sfDir)),
      // q9's scan floor: same 4 columns, no top-k
      "o4" -> (() => orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderdate"))),
      "q14" -> (() => graft.SparkEntry.queries("q14_union")(spark, sfDir)),
      // q14 with ONE filtered scan cached, both unions fed from it
      // (shipped form scans orders four times — the q51c pattern)
      "q14c" -> (() => {
        val base = orders.filter(col("o_orderstatus").isin("F", "O"))
          .select(col("o_orderstatus").as("st"), col("o_custkey").as("key"))
          .cache()
        base.count()
        val a = base.filter(col("st") === "F").select(col("key"))
        val b = base.filter(col("st") === "O").select(col("key"))
        val unionAll = a.union(b).agg(count(lit(1)).as("n_all"))
        val unionDistinct = a.union(b).distinct()
          .agg(count(lit(1)).as("n_distinct"))
        unionAll.crossJoin(unionDistinct)
      }),
      // q14's scan floor: one pass over (status, custkey)
      "o5" -> (() => orders.select(col("o_orderstatus"), col("o_custkey"))),
      "q15" -> (() => graft.SparkEntry.queries("q15_setops")(spark, sfDir)),
      // q15 with the two-year scan cached, both set-ops fed from it
      "q15c" -> (() => {
        val base = orders
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
          .select(col("o_custkey"),
            (col("o_orderdate") >= lit("1996-01-01")).as("y96"))
          .cache()
        base.count()
        val y95 = base.filter(!col("y96")).select(col("o_custkey"))
        val y96 = base.filter(col("y96")).select(col("o_custkey"))
        val inter = y95.intersect(y96).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("intersect"))
        val exc = y95.except(y96).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except"))
        inter.union(exc).select(col("op"), col("n")).orderBy(col("op"))
      }),
      "q28" -> (() => graft.SparkEntry.queries("q28_cte")(spark, sfDir)),
      // q28's aggregate floor: the 15M-group custrev subtree alone
      "q28agg" -> (() => orders.groupBy(col("o_custkey"))
        .agg(graft.functions.Dnum.dsum(col("o_totalprice"), 2).as("rev"))),

      // ── r13 verdict task 7: q63 pointer-jumping A/B. The shipped
      // WITH RECURSIVE runs one Spark job per recursion LEVEL (8 at
      // sf100); this arm resolves every node to its root in
      // ceil(log2(depth)) = 4 doubling self-joins. Roots (c < 10) map
      // to themselves at distance 0, so the join stays total and
      // finalized rows pass through unchanged.
      "q63" -> (() =>
        graft.SparkEntry.queries("q63_recursive_cte")(spark, sfDir)),
      "q63pj" -> (() => {
        val c0 = customer.select(col("c_custkey").cast("long").as("c"))
        var t = c0.select(col("c"),
          when(col("c") < 10, col("c"))
            .otherwise((col("c") / 10).cast("long")).as("a"),
          when(col("c") < 10, lit(0L)).otherwise(lit(1L)).as("d"))
        for (_ <- 1 to 4) {
          val j = t.select(col("c").as("jc"), col("a").as("ja"),
            col("d").as("jd"))
          t = t.join(j, col("a") === col("jc"))
            .select(col("c"), col("ja").as("a"),
              (col("d") + col("jd")).as("d"))
        }
        t.groupBy(col("d").as("depth"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("key_sum"))
          .orderBy(col("depth"))
      }),

      // ── r13: runtime-bloom investigation, closed REJECTED.
      // q5's orderkey join is ~10% selective over a 600M-row lineitem
      // exchange. (1) Catalyst's InjectRuntimeFilter never fires for
      // it — the cache+count-materialized dims are InMemoryRelation
      // leaves with no visible filter-over-scan, verified at sf1/sf100
      // with creationSideThreshold/maxNumItems/maxNumBits/
      // applicationSideScanSizeThreshold all raised: zero injections.
      // (2) A hand-planned probe-side bloom (stat.bloomFilter fpp 0.01
      // over the cached ordA, a codegen mightContainLong predicate
      // pushed to the lineitem scan) measured interleaved in one JVM
      // at sf100: bloomed 21.94/23.06 s vs plain 18.50/19.48 s — the
      // probe's random access into the 18 MB sketch duplicates the
      // cost the join's own hash probe pays anyway, so it only saved
      // shuffle I/O that was not the bottleneck. The helper was
      // removed from src/main (it would be dead weight); this note +
      // the decomposition arms below are the record.
      "q5" -> (() => graft.SparkEntry.queries("q5_multijoin")(spark, sfDir)),
      "q62" -> (() =>
        graft.SparkEntry.queries("q62_nation_pairs")(spark, sfDir)),
      // q5 decomposition: the liF subtree without the orderkey
      // exchange (scan + supplier semi + scaled-long project), and the
      // ordA subtree alone — what remains is the 600M-row exchange +
      // join + 25-group agg.
      "q5li" -> (() => {
        val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
        lineitem
          .join(sup.select(col("s_suppkey")),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .select(col("l_orderkey"),
            graft.functions.DoubleToScaledLong.of(
              col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("rev1"))
          .agg(count(lit(1)).as("n"), sum(col("rev1")).as("s"))
      }),
      "q5ord" -> (() => {
        val nation = spark.read.parquet(s"$sfDir/nation.parquet")
        val region = spark.read.parquet(s"$sfDir/region.parquet")
          .filter(col("r_name") === "ASIA")
        val asiaN = nation
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val custA = customer
          .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_nationkey"))
        orders
          .filter(col("o_orderdate") >= lit("1995-06-01") &&
            col("o_orderdate") < lit("1999-01-01"))
          .select(col("o_orderkey"), col("o_custkey"))
          .join(custA, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("n_nationkey"))
          .agg(count(lit(1)).as("n"))
      }),
      // ── r13: q27 split-aggregate A/B. The shipped form's
      // RewriteDistinctAggregates Expand puts 3x the corpus (1.8B rows
      // at sf100) through the partial aggregate; this arm runs each
      // distinct as its own Expand-free single-distinct pass plus a
      // map-side count, joined on the 4-row group key.
      "q27split" -> (() => {
        val base = lineitem.select(col("l_returnflag"), col("l_partkey"),
          col("l_suppkey"))
        val ndp = base.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("ndp"))
        val nds = base.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_suppkey")).as("nds"))
        val n = base.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"))
        ndp.join(nds, Seq("l_returnflag")).join(n, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("ndp"), col("nds"), col("n"))
          .orderBy(col("l_returnflag"))
      }),

      // ── r13 verdict task 6: q68b decomposition. Which part of the
      // 36.5 s sf100 row is floor vs avoidable?
      "q68b" -> (() =>
        graft.SparkEntry.queries("q68b_variant_multi")(spark, sfDir)),
      // construction floor: build the JSON bytes, no parse
      "q68bconcat" -> (() => events.select(concat(
          lit("{\"id\":"), col("event_id"),
          lit(",\"ty\":\""), col("event_type"),
          lit("\",\"u\":"), col("user_id"),
          lit(",\"fv\":"), floor(col("value")).cast("long"),
          lit(",\"p\":"), col("props"),
          lit("}")).as("js"))
        .agg(sum(octet_length(col("js"))).as("b"))),
      // parse floor: construct + try_parse_json + ONE extraction
      "q68bparse" -> (() => events.select(try_parse_json(concat(
          lit("{\"id\":"), col("event_id"),
          lit(",\"ty\":\""), col("event_type"),
          lit("\",\"u\":"), col("user_id"),
          lit(",\"fv\":"), floor(col("value")).cast("long"),
          lit(",\"p\":"), col("props"),
          lit("}"))).as("v"))
        .select(expr("variant_get(v, '$.id', 'bigint')").as("id"))
        .agg(sum(col("id")).as("id_sum"))),
      // known-schema comparison: from_json into a typed struct (what a
      // user with a fixed schema would write) — isolates the variant
      // ENCODE tax from the JSON tokenizer cost
      "q68bfj" -> (() => {
        val js = concat(
          lit("{\"id\":"), col("event_id"),
          lit(",\"ty\":\""), col("event_type"),
          lit("\",\"u\":"), col("user_id"),
          lit(",\"fv\":"), floor(col("value")).cast("long"),
          lit(",\"p\":"), col("props"),
          lit("}"))
        val sch = "id BIGINT, ty STRING, u BIGINT, fv BIGINT, p STRUCT<k: BIGINT>"
        events.select(from_json(js, org.apache.spark.sql.types.StructType
            .fromDDL(sch)).as("j"))
          .select(col("j.ty").as("ty"), col("j.id").as("id"),
            col("j.u").as("u"), col("j.fv").as("fv"),
            col("j.p.k").as("k"))
          .groupBy(col("ty"))
          .agg(count(lit(1)).as("n"),
            sum(col("id")).as("id_sum"),
            sum(col("u")).as("u_sum"),
            sum(col("fv")).as("fv_sum"),
            sum(col("k")).as("k_sum"))
          .orderBy(col("ty"))
      }),
      // multi-eval probe: materialize the parsed variant through an
      // exchange so the parse provably runs once, then extract 5
      "q68bx" -> (() => {
        val parsed = events.select(try_parse_json(concat(
            lit("{\"id\":"), col("event_id"),
            lit(",\"ty\":\""), col("event_type"),
            lit("\",\"u\":"), col("user_id"),
            lit(",\"fv\":"), floor(col("value")).cast("long"),
            lit(",\"p\":"), col("props"),
            lit("}"))).as("v"))
          .repartition(32)
        parsed.select(
            expr("variant_get(v, '$.ty', 'string')").as("ty"),
            expr("variant_get(v, '$.id', 'bigint')").as("id"),
            expr("variant_get(v, '$.u', 'bigint')").as("u"),
            expr("variant_get(v, '$.fv', 'bigint')").as("fv"),
            expr("variant_get(v, '$.p.k', 'bigint')").as("k"))
          .groupBy(col("ty"))
          .agg(count(lit(1)).as("n"),
            sum(col("id")).as("id_sum"),
            sum(col("u")).as("u_sum"),
            sum(col("fv")).as("fv_sum"),
            sum(col("k")).as("k_sum"))
          .orderBy(col("ty"))
      }))

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
