package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-corpus pins for the round-9 reshape/time-series/retrieval
  * gates (q65/q66/t17). The driver oracle checks them against DuckDB
  * at sf0.01; these specs pin the SEMANTICS on inputs small enough to
  * verify by hand, so an oracle-SQL bug cannot silently agree with a
  * Spark-side bug.
  */
class Relational5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gate(name: String, dir: String) =
    graft.queries.Relational5.queries(name).build(spark, dir)

  test("q65_unpivot melts each measure to its own row") {
    val out = gate("q65_unpivot", TestSpark.SF)
    val rows = out.collect()
    val flags = rows.map(_.getString(0)).distinct.sorted
    assert(rows.length == flags.length * 3,
      "3 measure rows per returnflag")
    // melted value must equal the direct aggregate
    val direct = spark.read
      .parquet(s"${TestSpark.SF}/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.filter(_.getString(1) == "sum_qty").foreach { r =>
      assert(r.getDouble(2) == direct(r.getString(0)),
        s"sum_qty for ${r.getString(0)}")
    }
  }

  test("q66_gap_fill carries the last purchase value forward per user") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q66").toString
    Seq(
      (1L, 1000000L, 7L, "view", 0.0),
      (2L, 2000000L, 7L, "purchase", 5.5),
      (3L, 3000000L, 7L, "click", 0.0),
      (4L, 4000000L, 7L, "purchase", 9.0),
      (5L, 5000000L, 7L, "view", 0.0),
      (6L, 1500000L, 8L, "view", 0.0)
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = gate("q66_gap_fill", tmp).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None
        else Some(r.getDouble(3))))
    assert(got.toSeq == Seq(
      7L -> None, 7L -> Some(5.5), 7L -> Some(5.5), 7L -> Some(9.0),
      7L -> Some(9.0), 8L -> None))
  }

  test("q68_variant yields NULL on malformed JSON, matching the oracle") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q68").toString
    Seq((1L, """{"k": 7}""", new java.sql.Timestamp(0L)),
        (2L, "not json {", new java.sql.Timestamp(0L)),
        (3L, null.asInstanceOf[String], new java.sql.Timestamp(0L)))
      .toDF("event_id", "props", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = gate("q68_variant", dir).collect()
    assert(rows.length == 2, s"expected {7, NULL} groups, got ${rows.toSeq}")
    val nullGroup = rows.find(_.isNullAt(0)).get
    assert(nullGroup.getLong(1) == 2, "malformed + null props group as NULL")
    val sevens = rows.find(r => !r.isNullAt(0) && r.getLong(0) == 7).get
    assert(sevens.getLong(1) == 1 && sevens.getLong(2) == 7)
  }

  test("t17_bm25 matches the hand-computed Okapi score") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_t17").toString
    // 4 docs; "spark" appears twice in doc 0 (dl=4) and once in doc 1
    // (dl=2); docs 2/3 match nothing
    Seq(
      (0L, "spark spark window sort", "en", "web", 23L),
      (1L, "spark join", "en", "web", 10L),
      (2L, "sort merge", "en", "web", 10L),
      (3L, "agg scan", "en", "web", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = gate("t17_bm25", tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 4.0
    val avgdl = (4 + 2 + 2 + 2) / 4.0
    def okapi(tf: Double, dl: Double, df: Double): Double = {
      val idfSpark = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      idfSpark * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }
    // "window" df=1 contributes to doc 0 as well
    val exp0 = okapi(2, 4, 2) + okapi(1, 4, 1)
    val exp1 = okapi(1, 2, 2)
    assert(got.keySet == Set(0L, 1L), "only matching docs are scored")
    // gate output is rounded to 6 dp — allow the half-ulp of that grid
    assert(math.abs(got(0L) - exp0) < 2e-6, s"doc0: ${got(0L)} vs $exp0")
    assert(math.abs(got(1L) - exp1) < 2e-6, s"doc1: ${got(1L)} vs $exp1")
  }
}
