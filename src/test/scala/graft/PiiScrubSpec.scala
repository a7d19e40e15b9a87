package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PiiScrub

/** The hand-compiled PiiScrub scanner must reproduce java.util.regex
  * (= Spark's regexp_count / regexp_replace engine) match-for-match
  * on the two t5 patterns — including backtracking edges (multi-dot
  * domains, `{1,2}` retreat, email matches consuming phone prefixes)
  * and scan-resume semantics after a match.
  */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"

  /** Reference implementation: exactly what the pre-r11 query ran. */
  private def ref(s: String): (Long, Long, String) = {
    val em = java.util.regex.Pattern.compile(emailRe)
    val ph = java.util.regex.Pattern.compile(phoneRe)
    def count(p: java.util.regex.Pattern, x: String): Long = {
      val m = p.matcher(x); var n = 0L
      while (m.find()) n += 1
      n
    }
    val clean = ph.matcher(em.matcher(s).replaceAll("<EMAIL>"))
      .replaceAll("<PHONE>")
    (count(em, s), count(ph, s), clean)
  }

  private def nat(s: String): (Long, Long, String) = {
    val r = PiiScrub.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString)
  }

  test("handpicked backtracking edges") {
    val cases = Seq(
      "plain text no pii",
      "a@b.co",
      "a@b.co.uk, tail",
      "user..na@me-x.org2x rest",
      "ab@cd@ef.gh",
      "9a@b.co and x.y%+-z@sub.domain.io!",
      "a@b.c",            // 1-letter tld: no match
      "a@.co",            // empty domain head: no match
      "@b.co a@ b@c",     // assorted non-matches
      "+1 555-1234",
      "+12 555-1234",
      "+123 555-1234",    // {1,2} then space fails at 3rd digit -> no match
      "+1 5555-1234",     // {3} exact: no match
      "+1 555-12345",     // 5th digit after {4}: still matches first 4
      "+1 555-123",       // short tail: no match
      "++1 555-1234",     // second '+' starts the match
      "+1 555-1234@ab.co still here", // email eats the phone tail
      "mail a@b.co then +9 123-4567 done",
      "two a@b.co b@c.de and +1 111-2222 +2 333-4444",
      "unicode héllo wörld 漢字 a@b.co +1 555-0000 ok",
      "")
    cases.foreach { s =>
      assert(nat(s) == ref(s), s"divergence on [$s]")
    }
  }

  test("randomized adversarial alphabet, 10k strings") {
    // deterministic seed; alphabet is heavily weighted toward the
    // pattern's special chars so matches and near-misses are dense
    val rnd = new scala.util.Random(0xC0FFEE)
    val alphabet = "aB1@.+-_% 5<>\n\té".toCharArray
    (1 to 10000).foreach { i =>
      val len = rnd.nextInt(40)
      val s = new String(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))))
      assert(nat(s) == ref(s), s"divergence on random #$i: [$s]")
    }
  }

  test("corpus parity through the full t5 query shape") {
    val dirty = spark.read.parquet(s"${TestSpark.SF}/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"),
          lit("@mail.example.com or +1 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
          .as("dirty"))
    val n = dirty.count()
    val matched = dirty
      .select(col("doc_id"), col("dirty"),
        PiiScrub.of(col("dirty")).as("pii"))
      .filter(
        col("pii.n_emails") === regexp_count(col("dirty"), lit(emailRe)) &&
        col("pii.n_phones") === regexp_count(col("dirty"), lit(phoneRe)) &&
        col("pii.clean") === regexp_replace(
          regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))
      .count()
    assert(matched == n, s"PiiScrub must agree on all $n docs")
  }
}
