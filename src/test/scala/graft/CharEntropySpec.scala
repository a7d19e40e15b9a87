package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CharEntropyStats

/** The codegen'd CharEntropyStats must be result-identical to the
  * interpreted HOF histogram it replaced in t16: same code-point
  * alphabet, same ascending-code-point entropy accumulation order
  * (bit-identical doubles, not just round(6)-identical).
  */
class CharEntropySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The pre-r11 t16 arm, verbatim. */
  private def interpreted(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("chars", split(col("s"), ""))
      .withColumn("counts", expr(
        """transform(array_sort(array_distinct(chars)),
             c -> size(filter(chars, x -> x = c)))"""))
      .select(col("id"),
        size(col("chars")).cast("long").as("n_chars"),
        size(col("counts")).cast("long").as("n_distinct"),
        expr("""aggregate(counts, cast(0.0 as double),
             (acc, c) -> acc - (c / cast(size(chars) as double))
               * log2(c / cast(size(chars) as double)))""").as("entropy"))

  private def native(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), CharEntropyStats.of(col("s")).as("st"))
      .select(col("id"), col("st.n_chars_norm").as("n_chars"),
        col("st.n_distinct_chars").as("n_distinct"),
        col("st.entropy").as("entropy"))

  test("parity with the interpreted histogram on the real corpus") {
    val docs = spark.read.parquet(s"${TestSpark.SF}/documents.parquet")
      .select(col("doc_id").as("id"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("s"))
    val n = docs.count()
    assert(n > 0)
    // inner join on every column: bit-identical doubles join, any
    // divergence drops the row
    val matched = native(docs).join(interpreted(docs),
      Seq("id", "n_chars", "n_distinct", "entropy")).count()
    assert(matched == n,
      s"native and interpreted entropy stats must agree on all $n docs")
  }

  test("edge cases: single char, repeats, multi-byte, null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a")),
      (2L, Some("aaaa")),
      (3L, Some("abab")),
      (4L, Some("héllo wörld 漢字")),
      (5L, None: Option[String]))
      .toDF("id", "s")
    val nat = native(df).orderBy(col("id")).collect()
    val interp = interpreted(df.filter(col("s").isNotNull))
      .orderBy(col("id")).collect()
    // null input -> null struct -> null fields
    assert(nat(4).isNullAt(1) && nat(4).isNullAt(3))
    (0 until 4).foreach { i =>
      assert(nat(i).getLong(1) == interp(i).getLong(1), s"n_chars row $i")
      assert(nat(i).getLong(2) == interp(i).getLong(2), s"n_distinct row $i")
      assert(nat(i).getDouble(3) == interp(i).getDouble(3), s"entropy row $i")
    }
    // exact known value: "abab" -> p=.5 each -> entropy 1.0
    assert(nat(2).getDouble(3) == 1.0)
  }

  test("empty string: documented (0, 0, 0.0) divergence from split") {
    import spark.implicits._
    val r = Seq((1L, "")).toDF("id", "s")
    val row = native(r).collect()(0)
    assert(row.getLong(1) == 0L && row.getLong(2) == 0L &&
      row.getDouble(3) == 0.0)
  }
}
