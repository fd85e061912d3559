package graft

import org.apache.spark.sql.functions._
import graft.functions.Num

/** Pins the three-way rounding contract: the Column [[Num.fround]]
  * must equal `math.floor(x * p + 0.5) / p` evaluated in PLAIN double
  * arithmetic (the driver-side copies in Clustering/Learning and the
  * semantics of DuckDB's double-typed floor in [[Num.froundSql]]) for
  * EVERY double, not just the finite mid-range. The old
  * `floor(Column)`-based form silently diverged on the tails —
  * Spark's floor(double) returns BIGINT, so NaN became 0 and |x| ≥
  * 2^63 clamped — which the adversarial fixture turned into a
  * cross-engine ANN re-ranking. */
class NumSpec extends SparkSuite {
  import spark.implicits._

  private val cases: Seq[Double] = Seq(
    0.0, -0.0, 1.0, -1.0, 2.675, -2.675, 0.005, -0.005, 0.015,
    123.4567891, -123.4567891, 1e-20, -1e-20, Double.MinPositiveValue,
    4.9e15, 9.3e15, -9.3e15, 1.1e18, 9.3e18, -9.3e18, 1e300, -1e300,
    1.5e308, -1.5e308, Double.MaxValue, Double.MinValue,
    Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
    // tiny-negative-residue neighborhood (ADVICE r10): inputs whose
    // x = c*p + 0.5 lands as close to -0.0 as doubles allow. (Analysis
    // note: x here is Sterbenz-exact on a >= 2^-54 grid, so the
    // pmod-collapsing open interval (-2^-54, 0) is UNREACHABLE from
    // this construction — but the replacement %-based floor doesn't
    // need that argument: it is true floor for EVERY double.)
    -0.005 - math.ulp(0.005), -0.005 + math.ulp(0.005),
    -0.0050000000000000001, -0.00005 - math.ulp(0.00005),
    (-0.5 - math.pow(2, -53)) / 100.0, (-0.5 - math.pow(2, -52)) / 1e6,
    -math.pow(2, -54), -math.pow(2, -53), -math.pow(2, -30),
    -1.0 - math.pow(2, -52), -2.0 + math.pow(2, -51))

  private def oracle(x: Double, digits: Int): Double = {
    val p = math.pow(10, digits)
    math.floor(x * p + 0.5) / p
  }

  test("fround equals plain-double floor rounding over the full double domain") {
    for (digits <- Seq(2, 4, 6)) {
      val got = cases.toDF("x")
        .select(col("x"), Num.fround(col("x"), digits).as("r"))
        .collect()
        .map(r => java.lang.Double.doubleToLongBits(r.getDouble(0)) -> r.getDouble(1))
        .toMap
      cases.foreach { x =>
        val expect = oracle(x, digits)
        val actual = got(java.lang.Double.doubleToLongBits(x))
        // bit-compare so NaN==NaN and -0.0 != 0.0 mismatches surface
        assert(
          java.lang.Double.doubleToLongBits(actual) ==
            java.lang.Double.doubleToLongBits(expect),
          s"fround($x, $digits): got $actual, expect $expect")
      }
    }
  }

  test("fround equals the plain-double oracle on a seeded random sweep") {
    val rng = new scala.util.Random(0xC0FFEE)
    val xs = Seq.fill(20000) {
      // mix magnitudes: uniform (-1,1), scaled, and raw-bits doubles
      rng.nextInt(3) match {
        case 0 => rng.nextDouble() * 2 - 1
        case 1 => (rng.nextDouble() * 2 - 1) * math.pow(10, rng.nextInt(20) - 10)
        case _ =>
          val d = java.lang.Double.longBitsToDouble(rng.nextLong())
          if (d.isNaN) 0.5 else d
      }
    }
    for (digits <- Seq(2, 6)) {
      val got = xs.toDF("x").select(Num.fround(col("x"), digits).as("r"))
        .collect().map(_.getDouble(0))
      xs.zip(got).foreach { case (x, actual) =>
        val expect = oracle(x, digits)
        assert(
          java.lang.Double.doubleToLongBits(actual) ==
            java.lang.Double.doubleToLongBits(expect),
          s"fround($x, $digits): got $actual, expect $expect")
      }
    }
  }

  test("fround NaN/Inf pass through (the adversarial-fixture regression)") {
    val r = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x").select(Num.fround(col("x"), 4).as("r")).collect().map(_.getDouble(0))
    assert(r(0).isNaN)
    assert(r(1) == Double.PositiveInfinity)
    assert(r(2) == Double.NegativeInfinity)
  }
}
