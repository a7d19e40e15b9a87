package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins t7_stratified_sample's threshold-selection invariant (r14
  * verdict task 8): the rewrite's correctness rests on the
  * percentile_approx(0.12, accuracy 10⁴) overshoot band PROVABLY
  * containing the exact top-ceil(10%) of every language — rank error
  * ≤ n/10⁴ leaves a true rank ≥ 0.1199·n ≥ ceil(0.1·n), exact below
  * the sketch's compression threshold. A future edit of the 0.12 /
  * 10⁴ parameters that breaks the bound must fail HERE, on an
  * adversarial corpus, not silently ship a lossy sample.
  *
  * Adversarial shapes exercised:
  *   - extreme language skew (a 20k-row dominant stratum next to
  *     n ∈ {1,2,3,9,11} singletons where ceil is the whole band),
  *   - an all-duplicate-text language (every md5 identical: the
  *     threshold ties with EVERY row, tie inclusion via <= must keep
  *     them all as candidates and the rank window must still cut
  *     exactly ceil(10%)),
  *   - texts engineered so md5 order ≠ doc_id order (the band is a
  *     hash-order band, not an id-order band).
  */
class T7BandBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("candidate band contains the exact top-10% on a skewed corpus " +
      "and the selection matches the full-sort form bit-for-bit") {
    import spark.implicits._
    val sizes = Map("dom" -> 20000, "n1" -> 1, "n2" -> 2, "n3" -> 3,
      "n9" -> 9, "n11" -> 11, "mid" -> 997, "dup" -> 100)
    var id = 0L
    val rows = sizes.toSeq.sortBy(_._1).flatMap { case (lang, n) =>
      (0 until n).map { i =>
        id += 1
        // "dup": one shared text (single md5 value — the full-tie
        // stratum); others: per-row text whose hash order scrambles
        // relative to doc_id order
        val text = if (lang == "dup") "same text every row"
          else s"doc $lang ${i * 2654435761L % n} payload $i"
        (id, text, lang, "src", text.length.toLong)
      }
    }
    val dir = Files.createTempDirectory("graft-t7band").toString
    try {
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(4)
        .write.parquet(s"$dir/documents.parquet")

      // the shipped operator
      val got = SparkEntry.queries("t7_stratified_sample")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

      // the full-window reference form (the pre-r14 baseline / the
      // oracle's semantics): exact rank over EVERY row
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("h"), col("doc_id"))
      val nW = Window.partitionBy(col("lang"))
      val want = docs
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(nW))
        .filter(col("rn") <= ceil(col("n") * 0.1))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

      assert(got === want,
        "threshold selection diverged from the exact full-sort form")
      // per-language cardinality: exactly ceil(10%) of each stratum
      val gotPerLang = got.groupBy(_._2).view.mapValues(_.size).toMap
      sizes.foreach { case (lang, n) =>
        assert(gotPerLang.getOrElse(lang, 0) === math.ceil(n * 0.1).toInt,
          s"lang $lang: wrong sample size")
      }

      // the band-superset invariant itself (sharper than end-to-end
      // equality: it localizes a parameter regression to the sketch
      // bound rather than to a downstream window bug)
      // 13 hex chars = 52 bits: double-exact inside percentile_approx
      // (15 chars = 60 bits rounded in the sketch and THIS SPEC failed:
      // the returned threshold landed below the true minimum on small
      // strata, emptying their bands)
      def hkey(c: org.apache.spark.sql.Column) =
        conv(substring(c, 1, 13), 16, 10).cast("long")
      val stats = docs.groupBy(col("lang")).agg(
          count(lit(1)).as("n"),
          percentile_approx(hkey(col("h")), lit(0.12), lit(10000))
            .as("thr"))
      val bandCounts = docs.join(stats.select(col("lang").as("l2"),
            col("thr"), col("n")), col("lang") === col("l2"))
        .filter(hkey(col("h")) <= col("thr"))
        .groupBy(col("lang")).agg(count(lit(1)).as("band"),
          first(col("n")).as("n"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2)))
      bandCounts.foreach { case (lang, band, n) =>
        assert(band >= math.ceil(n * 0.1).toLong,
          s"lang $lang: band $band < ceil(10% of $n) — the " +
            "percentile_approx overshoot no longer covers the quota")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
