package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal component analysis as a ONE-PASS distributed moment
  * computation plus a bounded driver eigensolve — the in-database ML
  * recipe (same stance as q123's regression-from-moments): the only
  * thing that touches the corpus is an exact integer aggregate; the
  * d×d eigenproblem is driver state bounded by the DIMENSION, never
  * the corpus (the centroid-table discipline).
  *
  * Determinism: embeddings quantize to e3 integers (floor(x·1000+.5) —
  * pure IEEE, identical cross-engine), so every moment sum is an
  * exact integer accumulated in decimal(38,0) (Spark) / HUGEINT
  * (DuckDB) — products bound |e3|² ≈ 3.3·10⁵ per row, so even 10¹²
  * rows stay far inside 38 digits. The covariance eigensolve runs on
  * those exact integers' driver-side doubles; its verdicts
  * (power-iteration residual, λ ≥ trace/d) are self-certifying — a
  * wrong eigenpair fails its own residual — while the DISTRIBUTED
  * part (the moment sums) hash-matches cross-engine via digests.
  */
object Pca {

  /** Per-dimension e3 quantization of an `embedding` array column. */
  def quantize(emb: DataFrame): DataFrame =
    emb.select(expr(
      "transform(embedding, x -> cast(floor(cast(x as double) * 1000 + 0.5) as bigint))")
      .as("e"))

  /** Σ e3_i per dimension (d rows: i, s as decimal(38,0)). */
  def dimSums(e: DataFrame): DataFrame =
    e.select(posexplode(col("e")).as(Seq("i", "v")))
      .groupBy(col("i")).agg(sum(col("v").cast("decimal(38,0)")).as("s"))

  /** Σ e3_i·e3_j for i ≤ j (d(d+1)/2 rows: i, j, p as decimal(38,0)).
    * The pair fan-out is d²/2 per row with map-side partial
    * aggregation into d²/2 groups — network traffic is d²/partition
    * regardless of corpus size. */
  def crossProducts(e: DataFrame): DataFrame =
    e.select(explode(expr(
      """flatten(transform(sequence(0, size(e) - 1),
           i -> transform(sequence(i, size(e) - 1),
             j -> struct(i AS i, j AS j,
               element_at(e, i + 1) * element_at(e, j + 1) AS v))))"""))
      .as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.v").as("v"))
      .groupBy(col("i"), col("j")).agg(sum(col("v").cast("decimal(38,0)")).as("p"))

  /** One-row md5 digest over `valueCol` of a keyed aggregate, in key
    * order — the bounded cross-engine witness for a d- or d²-sized
    * result (mirrors DuckDB's md5(string_agg(v, ',' ORDER BY keys))). */
  def orderedDigest(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.agg(md5(concat_ws(",", expr(
      s"""transform(sort_array(collect_list(struct(${keyCols.mkString(", ")},
          cast($valueCol as string) AS v))), x -> x.v)"""))).as("digest"))

  /** Dominant eigenpair of a symmetric matrix by power iteration
    * (deterministic: uniform start; runs until the relative residual
    * ‖Cv − λv‖/λ reaches `tol` or `maxIters`, checking every 50
    * rounds — a near-degenerate eigengap needs thousands of d² flops,
    * still microseconds of driver time at d = 64). Returns
    * (lambda, v, relative residual). */
  def powerIterate(cov: Array[Array[Double]], tol: Double = 1e-9,
      maxIters: Int = 50000): (Double, Array[Double], Double) = {
    val d = cov.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    def matvec(x: Array[Double]): Array[Double] = {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cov(i)(j) * x(j); j += 1 }
        y(i) = acc
        i += 1
      }
      y
    }
    def residual(x: Array[Double]): (Double, Double) = {
      val cv = matvec(x)
      val lambda = x.zip(cv).map { case (a, b) => a * b }.sum
      val r = math.sqrt(x.zip(cv).map { case (a, b) => val e = b - lambda * a; e * e }.sum)
      (lambda, r / math.max(math.abs(lambda), 1e-300))
    }
    var it = 0
    var rel = Double.MaxValue
    while (it < maxIters && rel > tol) {
      var k = 0
      while (k < 50) {
        val y = matvec(v)
        val n = math.sqrt(y.map(x => x * x).sum)
        if (n > 0) v = y.map(_ / n)
        k += 1
      }
      it += 50
      rel = residual(v)._2
    }
    val (lambda, r) = residual(v)
    (lambda, v, r)
  }

  /** Covariance matrix (doubles) from collected exact moments. */
  def covFromMoments(n: Long, s: Array[BigDecimal], p: Map[(Int, Int), BigDecimal]): Array[Array[Double]] = {
    val d = s.length
    val nd = n.toDouble
    Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      (p((a, b)).toDouble - s(i).toDouble * s(j).toDouble / nd) / nd
    }
  }
}
