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
    *
    * The kernel is a per-partition OUTER-PRODUCT ACCUMULATION into a
    * d²-long local array — one of the rare justified `mapPartitions`
    * cases (the Multimodal rule): expressing the fan-out relationally
    * costs a d²-per-row Generate (measured 3.5 s at sf0.1 — Spark row
    * overhead × n·d² rows), while the loop is n·d² bare multiplies
    * (~10 ms) and emits ONE array row per partition. The d²-row
    * shuffle that follows is partition-count-bounded, and the final
    * sum runs in decimal(38,0). Partial sums stay in Long: |e3|² ≤
    * ~3.3·10⁵ per row keeps a partition safe below 2⁶³ up to ~10¹³
    * rows — far beyond any real partition size (maxPartitionBytes
    * bounds rows-per-partition long before that). */
  def crossProducts(e: DataFrame, d: Int = 64): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val parts = e.select(col("e")).as[Array[Long]]
      .mapPartitions { it =>
        val acc = new Array[Long](d * d)
        while (it.hasNext) {
          val v = it.next()
          require(v.length == d, s"expected $d dims, got ${v.length}")
          var i = 0
          while (i < d) {
            val vi = v(i)
            var j = i
            while (j < d) { acc(i * d + j) += vi * v(j); j += 1 }
            i += 1
          }
        }
        Iterator.single(acc)
      }
    parts.toDF("acc")
      .select(posexplode(col("acc")).as(Seq("k", "v")))
      // Only the upper triangle is accumulated; the lower-triangle
      // zeros must not surface as spurious (i > j) rows.
      .filter(col("k") % d >= expr(s"k div $d"))
      .groupBy(expr(s"cast(k div $d as int)").as("i"),
        (col("k") % d).cast("int").as("j"))
      .agg(sum(col("v").cast("decimal(38,0)")).as("p"))
  }

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
