package graft

import java.math.RoundingMode

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dnum, DoubleToScaledLong}

/** Parity gate for [[DoubleToScaledLong]] / [[Dnum]]: the scaled-long
  * fast path must be value-identical to the `cast(double as
  * decimal(18,s))` route it replaces — same unscaled integers row by
  * row, same final double after the sum — on corpus data, random
  * full-mantissa doubles, and adversarial half-up boundary
  * constructions.
  */
class DsumParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.SF
  import spark.implicits._

  private def oracle(x: Double, s: Int): Long =
    java.math.BigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("compute matches BigDecimal.valueOf route on adversarial doubles") {
    val rnd = new scala.util.Random(421100)
    val cases = scala.collection.mutable.ArrayBuffer[Double]()
    // corpus-like 2-decimal money/quantity values
    for (_ <- 1 to 20000) cases += rnd.nextInt(20000000) / 100.0
    // full-mantissa products (the disc_price/charge shapes)
    for (_ <- 1 to 20000) {
      val p = rnd.nextInt(20000000) / 100.0
      cases += p * (1.0 - rnd.nextInt(11) / 100.0) *
        (1.0 + rnd.nextInt(9) / 100.0)
    }
    // exact half-up boundaries at each scale: (k + 0.5) / 10^s and
    // the nearest doubles on either side
    for (s <- Seq(2, 4, 6); _ <- 1 to 4000) {
      val k = rnd.nextInt(1 << 28).toLong
      val b = (k + 0.5) / math.pow(10.0, s)
      cases += b
      cases += Math.nextUp(b)
      cases += Math.nextDown(b)
    }
    // random raw-bit doubles in range
    var n = 0
    while (n < 40000) {
      val x = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (java.lang.Double.isFinite(x) && math.abs(x) < 1e11) {
        cases += x; n += 1
      }
    }
    cases += 0.0
    cases += -0.0
    for (s <- Seq(0, 2, 4, 6); x <- cases) {
      val got = DoubleToScaledLong.compute(x, s)
      val want = oracle(x, s)
      assert(got === want, s"x=$x (bits=${java.lang.Double.doubleToLongBits(x)}) scale=$s")
      val gneg = DoubleToScaledLong.compute(-x, s)
      assert(gneg === oracle(-x, s), s"x=${-x} scale=$s")
    }
  }

  test("compute matches the actual Spark cast on a DataFrame") {
    val rnd = new scala.util.Random(7)
    val xs = (1 to 5000).map(_ => rnd.nextInt(20000000) / 100.0 *
      (1.0 - rnd.nextInt(11) / 100.0))
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
    for (s <- Seq(2, 4, 6)) {
      val bad = df.select(
          DoubleToScaledLong.of(col("x"), s).as("fast"),
          unscaled(col("x").cast(DecimalType(18, s))).as("cast"))
        .filter(col("fast") =!= col("cast"))
      assert(bad.count() === 0L)
    }
  }

  /** Unscaled long of a decimal column (the Cast's own output). */
  private def unscaled(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.UnscaledValue(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  test("Dnum.dsum / davg equal the decimal-cast forms, grouped") {
    val rnd = new scala.util.Random(99)
    val rows = (1 to 200000).map { i =>
      val q = (rnd.nextInt(5000) + 1).toDouble
      val p = rnd.nextInt(20000000) / 100.0
      val d = rnd.nextInt(11) / 100.0
      val t = rnd.nextInt(9) / 100.0
      (i % 7, q, p * (1.0 - d) * (1.0 + t))
    }
    val df = spark.createDataFrame(rows).toDF("g", "q", "charge")
    def old(c: org.apache.spark.sql.Column, s: Int) =
      sum(c.cast(DecimalType(18, s))).cast("double")
    val got = df.groupBy(col("g")).agg(
        Dnum.dsum(col("q")).as("s2"),
        Dnum.dsum(col("charge"), 6).as("s6"),
        Dnum.davg(col("charge"), 4).as("a4"),
        old(col("q"), 2).as("o2"),
        old(col("charge"), 6).as("o6"),
        (old(col("charge"), 4) / count(col("charge"))).as("oa4"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(4), s"s2 group ${r.get(0)}")
      assert(r.getDouble(2) === r.getDouble(5), s"s6 group ${r.get(0)}")
      assert(r.getDouble(3) === r.getDouble(6), s"a4 group ${r.get(0)}")
    }
  }

  test("q1 shape on real lineitem: new helpers equal old ones exactly") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
    def old(c: org.apache.spark.sql.Column, s: Int) =
      sum(c.cast(DecimalType(18, s))).cast("double")
    val r = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Dnum.dsum(col("l_quantity")).as("n_qty"),
        old(col("l_quantity"), 2).as("o_qty"),
        Dnum.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).as("n_charge"),
        old(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).as("o_charge"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getDouble(2) === row.getDouble(3), row.toString)
      assert(row.getDouble(4) === row.getDouble(5), row.toString)
    }
  }
}
