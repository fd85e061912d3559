package graft

import graft.operators.Pca

/** The PCA operator's claims the q132 oracle can't see: the moment
  * pipeline computes the exact sums (hand-checked on a tiny fixture)
  * and the driver eigensolve actually finds the dominant direction
  * (planted-direction recovery), not just a self-consistent pair. */
class PcaSpec extends SparkSuite {

  test("moments match hand-computed sums on a 3-vector fixture") {
    import spark.implicits._
    // e3 quantization of these is exact: 1000x the inputs.
    val emb = Seq(
      Seq(0.001f, 0.002f), Seq(0.003f, 0.005f), Seq(-0.001f, 0.004f))
      .toDF("embedding")
    val e = Pca.quantize(emb)
    val sums = Pca.dimSums(e).collect().map(r => r.getInt(0) -> r.getDecimal(1).longValue()).toMap
    assert(sums == Map(0 -> 3L, 1 -> 11L), s"got $sums") // 1+3-1, 2+5+4
    val prods = Pca.crossProducts(e, d = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).longValue()).toMap
    // p00 = 1+9+1 = 11; p01 = 2+15-4 = 13; p11 = 4+25+16 = 45
    assert(prods == Map((0, 0) -> 11L, (0, 1) -> 13L, (1, 1) -> 45L), s"got $prods")
  }

  test("power iteration recovers a planted dominant direction") {
    val d = 16
    val u = Array.tabulate(d)(i => math.sin(i + 1.0))
    val un = math.sqrt(u.map(x => x * x).sum)
    val uu = u.map(_ / un)
    // cov = 10 * u u^T + 0.1 * I : dominant eigvec = u, lambda ~ 10.1
    val cov = Array.tabulate(d, d)((i, j) =>
      10.0 * uu(i) * uu(j) + (if (i == j) 0.1 else 0.0))
    val (lambda, v, resid) = Pca.powerIterate(cov)
    val cos = math.abs(v.zip(uu).map { case (a, b) => a * b }.sum)
    assert(cos > 0.9999, s"direction not recovered: cos=$cos")
    assert(math.abs(lambda - 10.1) < 1e-6, s"lambda=$lambda")
    assert(resid < 1e-9, s"resid=$resid")
  }

  test("near-degenerate eigengap still converges under the tolerance loop") {
    val d = 8
    // Two close top eigenvalues (1.0 and 0.999) on disjoint axes.
    val cov = Array.tabulate(d, d)((i, j) =>
      if (i == j) (if (i == 0) 1.0 else if (i == 1) 0.999 else 0.1) else 0.0)
    val (lambda, v, resid) = Pca.powerIterate(cov)
    assert(resid < 1e-9, s"resid=$resid")
    assert(math.abs(lambda - 1.0) < 1e-4 && math.abs(v(0)) > 0.99,
      s"lambda=$lambda v0=${v(0)}")
  }
}
