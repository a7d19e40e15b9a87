package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantic specs over the full SparkEntry inventory. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has either an oracle or a documented reason") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only by design: engine-specific hashing / approximation
    assert(noOracle == Set("q27b_approx_countd", "d2_dedup_minhash",
      "d4_dedup_simhash", "s2_ann_lsh", "s3_ann_ivf"))
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = SparkEntry.queries(name)(spark, TestSpark.SF)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}

/** s2's LSH candidates must be a subset of the exact ranking and
  * achieve non-trivial recall vs. the s1 brute-force baseline.
  */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def recallOf(name: String): Double = {
    val brute = SparkEntry.queries("s1_ann_brute")(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries(name)(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty, s"$name produced no results")
    val recall = (brute intersect approx).size.toDouble / brute.size
    info(f"$name recall@5 = $recall%.2f (${approx.size} hits)")
    recall
  }

  // Deterministic pipelines (seeded hyperplanes / seeded k-means, exact
  // decimal dot products), so the floors are hard assertions, not flaky
  // statistical bounds. Measured: s2 = 0.96, s3 = 0.94 at sf0.001.
  test("s2_ann_lsh recall vs s1_ann_brute") {
    assert(recallOf("s2_ann_lsh") >= 0.9,
      "LSH recall@5 regressed below 0.9")
  }

  test("s3_ann_ivf recall vs s1_ann_brute") {
    assert(recallOf("s3_ann_ivf") >= 0.94,
      "IVF recall@5 regressed below 0.94")
  }
}

/** The exact-moment formulations in q25 must agree with Spark's
  * builtin statistical aggregates (proves the builtins' semantics are
  * covered even though the oracle uses the mergeable-moment form).
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q25 exact moments match builtin stddev/var/corr") {
    val cust = spark.read.parquet(s"${TestSpark.SF}/customer.parquet")
    val builtin = cust.groupBy(col("c_mktsegment")).agg(
      stddev_samp(col("c_acctbal")).as("sd"),
      var_samp(col("c_acctbal")).as("vr"),
      corr(col("c_acctbal"), col("c_custkey")).as("cr"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val moments = SparkEntry.queries("q25_stats_agg")(spark, TestSpark.SF)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).toMap
    for ((seg, (sd, vr, cr)) <- builtin) {
      val (msd, mvr, mcr) = moments(seg)
      assert(math.abs(sd - msd) < 1e-6, s"stddev mismatch in $seg")
      assert(math.abs(vr - mvr) < 1e-4, s"variance mismatch in $seg")
      assert(math.abs(cr - mcr) < 1e-6, s"corr mismatch in $seg")
    }
  }
}

/** Streaming window agg must equal its batch formulation. */
class StreamParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q39 streaming result equals q38 batch result") {
    val stream = SparkEntry.queries("q39_stream_window")(spark, TestSpark.SF)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q38_events_window")(spark, TestSpark.SF)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(stream == batch)
  }
}
