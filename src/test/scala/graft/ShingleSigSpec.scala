package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordShingleSigs

/** Parity gate for [[WordShingleSigs]]: on the corpus, the 16-byte
  * signature domain must be a faithful (injective) image of the
  * 5-gram string domain — same distinct count globally, same per-doc
  * contamination counts as the string-keyed d9 form it replaced — and
  * the construction must encode word boundaries and positions.
  */
class ShingleSigSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sigsOf(words: Seq[String], n: Int): Seq[Seq[Byte]] = {
    val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      words.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
    val out = WordShingleSigs.compute(a, n)
    (0 until out.numElements()).map(i => out.getBinary(i).toSeq)
  }

  test("window count, width and <n behavior") {
    assert(sigsOf(Seq("a", "b", "c", "d"), 5).isEmpty)
    assert(sigsOf(Seq("a", "b", "c", "d", "e"), 5).size === 1)
    assert(sigsOf(Seq("a", "b", "c", "d", "e", "f"), 5).size === 2)
    assert(sigsOf(Seq("a", "b", "c", "d", "e"), 5).head.size === 16)
  }

  test("equal windows hash equal; position and boundary are encoded") {
    val s1 = sigsOf(Seq("x", "a", "b", "c", "d", "e"), 5)
    val s2 = sigsOf(Seq("a", "b", "c", "d", "e", "y"), 5)
    // same 5-gram (a b c d e) at different positions → same sig
    assert(s1(1) === s2.head)
    // different word split of the same character stream → different sig
    assert(sigsOf(Seq("ab", "c", "d", "e", "f"), 5).head !==
      sigsOf(Seq("a", "bc", "d", "e", "f"), 5).head)
    // order matters
    assert(sigsOf(Seq("a", "b", "c", "d", "e"), 5).head !==
      sigsOf(Seq("b", "a", "c", "d", "e"), 5).head)
  }

  test("corpus: sig domain is injective on the realized 5-gram set") {
    val docs = spark.read.parquet(s"${TestSpark.SF}/documents.parquet")
      .withColumn("words",
        split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "))
    val strings = docs.filter(size(col("words")) >= 5)
      .select(explode(transform(sequence(lit(1), size(col("words")) - 4),
        i => concat_ws(" ", slice(col("words"), i, lit(5))))).as("g"))
    val sigs = docs.select(
      explode(WordShingleSigs.of(col("words"), 5)).as("g"))
    val nStr = strings.agg(countDistinct(col("g"))).head().getLong(0)
    val nSig = sigs.agg(countDistinct(col("g"))).head().getLong(0)
    assert(nStr > 0)
    assert(nStr === nSig)
    assert(strings.count() === sigs.count())
  }

  test("text mode ≡ array mode: corpus and adversarial whitespace") {
    // corpus: the byte-level whitespace tokenizer must produce exactly
    // the sig stream of the split() array form, doc for doc
    val docs = spark.read.parquet(s"${TestSpark.SF}/documents.parquet")
    val viaArray = docs.select(col("doc_id"),
      posexplode(WordShingleSigs.of(
        split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "),
        5)))
    val viaText = docs.select(col("doc_id"),
      posexplode(WordShingleSigs.of(lower(col("text")), 5)))
    assert(viaArray.exceptAll(viaText).count() === 0L)
    assert(viaText.exceptAll(viaArray).count() === 0L)
    assert(viaText.count() > 0L)
    // adversarial edges: every \s char, runs, edges, multi-byte words,
    // ws-only and empty text
    import spark.implicits._
    val edge = Seq(
      "a b c d e f",
      "  a\t\tb\ncd\fe\rf  ",
      "\ta b c d e\n",
      "héllo wörld 漢字 one two three",
      "a b c d", // < n words
      "   \t\n ", // ws-only
      "").zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "s")
    val ea = edge.select(col("doc_id"), posexplode(WordShingleSigs.of(
      split(lower(trim(regexp_replace(col("s"), "\\s+", " "))), " "), 5)))
    val et = edge.select(col("doc_id"),
      posexplode(WordShingleSigs.of(lower(col("s")), 5)))
    assert(ea.exceptAll(et).count() === 0L)
    assert(et.exceptAll(ea).count() === 0L)
    // the tab/newline-run doc must still produce 2 windows (6 words)
    assert(et.filter(col("doc_id") === 1).count() === 2L)
  }

  test("d9 per-doc contamination counts match the string-keyed form") {
    val docs = spark.read.parquet(s"${TestSpark.SF}/documents.parquet")
      .withColumn("words",
        split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "))
    def counts(sh: org.apache.spark.sql.DataFrame) = {
      val bench = sh.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      sh.filter(col("doc_id") % 97 =!= 0).join(bench, Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cont"))
    }
    val oldSh = docs.filter(size(col("words")) >= 5)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("words")) - 4),
          i => concat_ws(" ", slice(col("words"), i, lit(5))))).as("g"))
    val newSh = docs.select(col("doc_id"),
      explode(WordShingleSigs.of(col("words"), 5)).as("g"))
    val diff = counts(oldSh).as("a")
      .join(counts(newSh).as("b"), Seq("doc_id"), "full_outer")
      .filter(not(col("a.n_cont") <=> col("b.n_cont")))
    assert(diff.count() === 0L)
  }
}
