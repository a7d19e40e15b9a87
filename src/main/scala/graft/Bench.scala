package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times at
  * `SPARK_GRAFT_SF_DIR`.
  *
  * A first untimed warm-up pass runs every query so the measured
  * numbers report steady-state engine throughput rather than one-off
  * JVM class-loading / whole-stage-codegen compilation (JMH-style; the
  * cold-start cost is amortized to zero on any long-lived cluster).
  * Set SPARK_GRAFT_WARMUP=0 to measure cold.
  *
  * Each query is then timed on SPARK_GRAFT_RUNS (default 3) full
  * passes and reported as the per-query MEDIAN across passes — round-2
  * showed single-pass times swinging 2-15x on unchanged code from JIT /
  * GC / scheduler interference, which made the bench unable to detect
  * real regressions. `value` is the sum of medians; `spread` is the
  * max over queries of (max-min)/median across passes, a noise
  * indicator for the run.
  */
object Bench {

  /** Contention sentinel (r15, verdict task 3). BENCH_r14's 163 s
    * total (vs r13's 89 s on mostly-unchanged code) was the round's
    * own still-live protocol JVM stepping on the driver bench —
    * unchanged keys blew up 20x and a turn went to re-litigating
    * phantom regressions. Rather than refuse to start (the driver's
    * bench run must never deadlock on a stray process), the run
    * STAMPS what else was live: any non-ancestor JVM that looks like
    * an sbt/graft process (forked bench JVMs carry an opaque
    * `java @/tmp/sbt-args...` cmdline, so any sbt-launched java
    * counts) and any DuckDB oracle replay. Peers are sampled at start
    * and at end and unioned — a leg that starts mid-run still marks
    * the output. `contended: 0` is the clean-room claim; readers of
    * BENCH_r{N} treat anything else as non-comparable.
    */
  def liveGraftPeers(): Seq[String] = {
    val self = {
      val b = scala.collection.mutable.Set[Long]()
      var h = ProcessHandle.current()
      b += h.pid()
      while (h.parent().isPresent) { h = h.parent().get(); b += h.pid() }
      b.toSet
    }
    val procs = Option(new java.io.File("/proc").listFiles())
      .getOrElse(Array.empty)
    procs.toSeq.filter(f => f.getName.forall(_.isDigit)).flatMap { f =>
      if (self.contains(f.getName.toLong)) None
      else try {
        val cmd = new String(java.nio.file.Files.readAllBytes(
          f.toPath.resolve("cmdline"))).replace('\u0000', ' ').trim
        val jvm = cmd.contains("java") &&
          (cmd.contains("sbt") || cmd.contains("graft"))
        val oracle = cmd.contains("python") && cmd.contains("duckdb")
        if (jvm || oracle) Some(s"${f.getName}: ${cmd.take(120)}")
        else None
      } catch { case _: Throwable => None }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val peersAtStart = liveGraftPeers()
    // scale-aware initial fan-out (r15): shuffle.partitions stays the
    // static core count (streaming state stores and any non-adaptive
    // path keep their round-over-round layout), but the AQE initial
    // partition number derives from the input dir's bytes so pinned
    // shuffle_hash builds fit execution memory at ANY SF — see
    // EngineDefaults.initialShufflePartitions
    val spark = graft.core.EngineDefaults.scaled(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus), sfDir, cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      // default 100-entry codegen class cache evicts between the
      // warm-up and measured passes with ~90 queries in flight,
      // re-paying multi-second janino compiles for the widest plans
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v": ad-hoc optimizer-conf A/B runs
    // (same contract as graft.Explain; protocol legs leave it unset)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    // SPARK_GRAFT_EXCLUDE: comma-separated prefixes to leave out of a
    // run (e.g. "c_" to skip the engine WRITE gates at a scale factor
    // whose transient write+shuffle footprint exceeds the local disk —
    // the oracle replay must then skip the same keys for comparability)
    //
    // Bench action (r10, was Dataset.count() r1-r9): execute the FULL
    // physical plan via queryExecution.toRdd.count(). Plain count()
    // lets Catalyst prune work that doesn't change cardinality — a
    // window whose columns the count never reads collapses to a bare
    // scan — which under-measured window-heavy queries relative to the
    // DuckDB replay's fetchall (two r9 gates, q66/t19, were fully
    // count-degenerate and needed a FORCE special case; that flag is
    // retired now that full-plan is the only action). toRdd runs every
    // operator and materializes every output row per-partition without
    // collecting to the driver — the Spark analog of the replay's
    // fetchall, minus the driver transfer both engines would equally
    // skip on a cluster.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.count()
    val excl = sys.env.getOrElse("SPARK_GRAFT_EXCLUDE", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    // SPARK_GRAFT_ONLY: comma-separated prefixes to RESTRICT a run to
    // (e.g. "c_" to measure just the engine write gates at a scale
    // factor whose full-suite footprint the disk can't hold)
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => excl.exists(n.startsWith))
      .filter(n => only.isEmpty || only.exists(n.startsWith))
    // Query-major measurement (r9; was run-major): warm up a query,
    // time its `runs` passes back-to-back, then drop the app's scratch
    // root before moving on. Gates recreate their scratch databases on
    // every invocation, so transient disk is bounded by ONE gate's
    // footprint instead of the whole suite's accumulation — the
    // difference between c_compact_cluster fitting at sf100 (its two
    // lineitem copies alone are ~27 GB) and dying on a full disk under
    // 43 GB of other gates' dead tables. Per-query medians are
    // unchanged in meaning; back-to-back passes also sample less
    // cross-query JIT/GC interference than the interleaved order did.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val perQuery: Map[String, Seq[Double]] = names.map { name =>
      if (warmup) {
        try run(SparkEntry.queries(name)(spark, sfDir))
        catch { case _: Throwable => () }
      }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try run(SparkEntry.queries(name)(spark, sfDir))
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      graft.queries.Q.cleanScratch(spark)
      // Shuffle files are reaped by ContextCleaner only when the
      // driver GCs — a 64 GB heap can go many corpus-scale queries
      // without one, stacking tens of GB of dead shuffle data (the
      // second sf100 disk-pressure source after scratch). One explicit
      // GC per query, outside every timed window, keeps the floor flat.
      System.gc()
      name -> times
    }.toMap
    val samples: Seq[Map[String, Double]] =
      (0 until runs).map(i => names.map(n => n -> perQuery(n)(i)).toMap)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // A failed query's elapsed-to-exception is not a throughput
    // sample: report it as null and keep it out of the total/spread so
    // a fast-failing query cannot deflate the headline number.
    val ok = names.filterNot(failed.contains)
    val med = ok.map(n => n -> median(samples.map(_(n)))).toMap
    val spread = (0.0 +: ok.map { n =>
      val xs = samples.map(_(n))
      if (med(n) > 0) (xs.max - xs.min) / med(n) else 0.0
    }).max
    val qs = names.map(n =>
        "\"" + n + "\":" + med.get(n).map(_.toString).getOrElse("null"))
      .mkString("{", ",", "}")
    // Per-query spread ((max-min)/median across passes) on the full
    // line only: the r12 protocol auto-isolates high-spread leg rows
    // (q1's 27.1-vs-5.4 and d9's 88.8-vs-80.4 proved a single leg
    // median can misgrade a plan 5x under host throttle).
    val qspreads = ok.map { n =>
      val xs = samples.map(_(n))
      val sp = if (med(n) > 0) (xs.max - xs.min) / med(n) else 0.0
      "\"" + n + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, sp)
    }.mkString("{", ",", "}")
    // When anything failed the headline total is NOT comparable with
    // other rounds (the sum silently shrank), so report it as null and
    // expose the partial sum separately as total_ok + n_failed.
    val totalOk = med.values.sum
    val total = if (failed.isEmpty) totalOk.toString else "null"
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Full-precision per-query map: its own line (local tooling reads
    // this; at 125 queries it is ~5 KB and cannot fit the driver's
    // 2000-char stdout tail window, which is why BENCH_r1..r8 all
    // carry "parsed": null).
    // contention stamp: peers sampled at start ∪ end (see liveGraftPeers)
    val peers = (peersAtStart ++ liveGraftPeers()).distinct
    val peersJson = peers.map(p => "\"" + p.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\"").mkString("[", ",", "]")
    val fullLine = s"""{"metric":"queries_full","value":$total,"unit":"sec","queries":$qs,"qspreads":$qspreads,"sf":"$sfDir","runs":$runs,"spread":$spread,"total_ok":$totalOk,"n_failed":${failed.size},"failed":$failedJson,"contended":${peers.size},"peers":$peersJson}"""
    println(fullLine)
    // Headline line LAST and compact (≤ ~1.5 KB): aggregates plus the
    // 25 slowest queries at 3 decimals — everything a regression read
    // needs, sized to survive the driver's tail capture intact. The
    // truncated per-query map is named "slowest" (r10; was "queries"),
    // so a parser of the old single-line format fails loudly instead of
    // silently reading a 25-key subset as the full map.
    def r3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val slow = ok.sortBy(n => -med(n)).take(25)
      .map(n => "\"" + n + "\":" + r3(med(n))).mkString("{", ",", "}")
    val headline = s"""{"metric":"total","value":$total,"unit":"sec","slowest":$slow,"n_queries":${names.size},"queries_shown":"25 slowest of ${names.size}; full map on queries_full line and in bench_full.json","sf":"$sfDir","runs":$runs,"spread":${r3(spread)},"total_ok":${r3(totalOk)},"n_failed":${failed.size},"failed":$failedJson,"contended":${peers.size}}"""
    // Machine-parseable artifacts: stdout framing (sbt's [info]/[success]
    // wrappers) defeated tail-parsing for nine straight rounds, so the
    // same two JSON documents are also written as files in the CWD the
    // driver launches from (the repo root).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_headline.json"), headline + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), fullLine + "\n")
    // Driver-visible per-query map (r16, PERF_r15 postmortem): the
    // full-precision map lives on the queries_full line (~5 KB) and in
    // bench_full.json, but the driver's regression comparator only sees
    // a 2000-char stdout TAIL — r15's PERF came back with n_common: 0
    // because no line that fits the window carried the map. The map
    // itself (137 keys × ~23 chars at 3 decimals) can never fit one
    // window together with the headline, so it is chunked into ≤900-char
    // {"metric":"queries_part","i":I,"k":K,...} lines printed right
    // before the final headline: a tail reader always gets the last
    // chunk(s) intact, and a whole-stdout reader reconstructs all K.
    val partLines = {
      val pairs = names.map(n =>
        "\"" + n + "\":" + med.get(n).map(r3).getOrElse("null"))
      val chunks = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      pairs.foreach { p =>
        if (chunks.last.map(_.length + 1).sum + p.length > 900)
          chunks += scala.collection.mutable.ArrayBuffer[String]()
        chunks.last += p
      }
      val k = chunks.size
      chunks.zipWithIndex.map { case (c, i) =>
        s"""{"metric":"queries_part","i":$i,"k":$k,"queries":${
          c.mkString("{", ",", "}")},"sf":"$sfDir","runs":$runs}"""
      }.toSeq
    }
    spark.stop()
    // Printed after SparkSession teardown so no late Spark/log4j writer
    // can interleave; the compact headline stays the ABSOLUTE last line.
    partLines.foreach(println)
    println(headline)
  }
}
