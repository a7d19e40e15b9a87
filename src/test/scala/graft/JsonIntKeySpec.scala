package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonIntKey

/** Contract tests for the native JSON scalar extractor behind q40:
  * integral top-level key or NULL, full-document validation (garbage
  * AFTER the key still nulls the row), strict JSON (no leading zeros,
  * no unescaped control chars, JSON-only whitespace), long-range
  * boundaries, and hand-scan/Jackson-path agreement on the shapes
  * that dispatch differently.
  */
class JsonIntKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cases: Seq[(String, Option[Long])] = Seq(
    // flat happy paths (hand-scan)
    ("""{"k": 5}""", Some(5L)),
    ("""{"k":-3}""", Some(-3L)),
    ("""{ "k"  :  7  }""", Some(7L)),
    ("""{"a":1,"k":2}""", Some(2L)),
    ("""{"k":1,"a":2}""", Some(1L)),
    ("""{"k":0}""", Some(0L)),
    ("""{"k":-0}""", Some(0L)),
    ("""{"a":"v,","k":6}""", Some(6L)), // in-string comma can't fool it
    ("""{"b":"k","k":7}""", Some(7L)), // "k" as a VALUE is not a key
    ("""{"é":"ü","k":3}""", Some(3L)), // multibyte neighbors
    ("""{"k":1,"k":2}""", Some(1L)), // duplicate: first wins
    // missing key
    ("""{}""", None),
    ("""{"a":1}""", None),
    ("""{"xk":3}""", None),
    ("""{"kk":4}""", None),
    // non-integral / non-number values
    ("""{"k":12.5}""", None),
    ("""{"k":1.0}""", None),
    ("""{"k":1e3}""", None),
    ("""{"k":true}""", None),
    ("""{"k":null}""", None),
    // quoted integrals coerce (json_extract_string + cast semantics)
    ("""{"k":"8"}""", Some(8L)),
    ("""{"k":"-12"}""", Some(-12L)),
    ("""{"k":"+7"}""", Some(7L)),
    ("""{"k":" 8 "}""", Some(8L)), // cast trims whitespace
    ("""{"k":"008"}""", Some(8L)), // cast takes leading zeros
    ("""{"k":"9223372036854775807"}""", Some(Long.MaxValue)),
    ("""{"k":"9223372036854775808"}""", None),
    ("""{"k":"-9223372036854775808"}""", Some(Long.MinValue)),
    ("""{"k":"8.5"}""", None), // non-integral string stays NULL
    ("""{"k":"8.0"}""", None),
    ("""{"k":""}""", None),
    ("""{"k":"-"}""", None),
    ("""{"k":"x8"}""", None),
    ("""{"a":"9","k":1}""", Some(1L)), // non-key strings never parse
    // long-range boundaries
    ("""{"k":9223372036854775807}""", Some(Long.MaxValue)),
    ("""{"k":9223372036854775808}""", None),
    ("""{"k":-9223372036854775808}""", Some(Long.MinValue)),
    ("""{"k":-9223372036854775809}""", None),
    ("""{"k":99999999999999999999999}""", None),
    // malformed: strict JSON, validated to end-of-input
    ("""{"k":012}""", None), // leading zero
    ("""{"k":1,}""", None), // trailing comma
    ("""{"k":1}x""", None), // trailing garbage
    ("""{"k":1 "a":2}""", None), // missing comma
    ("""{zzz,"k":2}""", None),
    ("""{"a":"x","k":1,zzz}""", None), // garbage AFTER the key
    ("""{not json""", None),
    ("""""", None),
    ("""5""", None), // valid JSON, not an object
    ("""[{"k":1}]""", None),
    ("{\f\"k\":1}", None), // form feed is NOT JSON whitespace
    ("{\"a\":\"x\ny\",\"k\":1}", None), // raw control char in string
    // nested / escaped: Jackson path
    ("""{"a":{"k":5}}""", None), // nested k is not top-level
    ("""{"a":{"x":1},"k":9}""", Some(9L)),
    ("""{"k":[1]}""", None),
    ("""{"a":[1,2],"k":3}""", Some(3L)),
    ("""{"a":"x\"y","k":9}""", Some(9L)),
    ("""{"k":1,"a":"A"}""", Some(1L)),
    ("""{"a":[1],"k":2,zzz}""", None), // malformed after k, deep path
    ("""{"a":{"k":1},"k":2,"k":3}""", Some(2L)), // dup via Jackson
    ("""{"a":[1],"k":"9"}""", Some(9L)), // quoted coercion, deep path
    ("{\"k\":\"\\u0038\"}", Some(8L)) // escaped digits via Jackson
  )

  test("interpreted eval matches the contract on every adversarial case") {
    for ((doc, want) <- cases) {
      val got = Option(JsonIntKey.extract(UTF8String.fromString(doc), "k"))
        .map(_.longValue())
      assert(got == want, s"payload <$doc>: got $got want $want")
    }
  }

  test("codegen path agrees with interpreted eval (and handles NULL input)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("js",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val rows = (cases.map(_._1) :+ null).map(s =>
      org.apache.spark.sql.Row(s)).asJava
    val got = spark.createDataFrame(rows, schema)
      .select(JsonIntKey.of(col("js"), "k").as("k"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val want = cases.map(_._2) :+ None
    assert(got.toSeq == want, "codegen results diverge from expected")
  }

  test("non-ASCII keys match by UTF-8 bytes on both paths") {
    // flat path: unescaped multibyte key
    assert(Option(JsonIntKey.extract(
      UTF8String.fromString("""{"é":7,"k":1}"""), "é")) == Some(7L))
    // Jackson path (nested sibling forces the bail): escaped form of
    // the same key must also match
    assert(Option(JsonIntKey.extract(
      UTF8String.fromString("""{"a":[1],"é":7}"""), "é")) == Some(7L))
    assert(Option(JsonIntKey.extract(
      UTF8String.fromString("""{"é":7}"""), "e")).isEmpty)
  }

  test("agrees with the variant path on the events corpus") {
    val ev = graft.queries.Q.events(spark, TestSpark.SF)
    val n = ev.filter(
      !(JsonIntKey.of(col("props"), "k") <=>
        try_variant_get(try_parse_json(col("props")), "$.k", "long"))).count()
    assert(n == 0, s"$n rows diverge from try_variant_get on the corpus")
  }
}
