package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log-bucketed quantile sketch — the DDSketch recipe
  * (Masson, Rim, Lee: "DDSketch: a fast and fully-mergeable quantile
  * sketch with relative-error guarantees", VLDB 2019) as pure
  * DataFrame fragments.
  *
  * A POSITIVE value lands in bucket ceil(log_γ v) with
  * γ = (1+α)/(1-α): bucket b covers (γ^(b-1), γ^b], and the midpoint
  * estimate 2γ^b/(γ+1) is within relative error α of EVERY value in
  * the bucket — a HARD guarantee, not a probabilistic one. The sketch
  * itself is nothing but per-(key, bucket) counts, which buys the
  * three properties the batch-only [[ExactMedian]] cannot offer:
  *
  *  - MERGEABLE: two sketches merge by summing counts — per-shard /
  *    per-day sketches roll up losslessly (the q93 HLL shard shape).
  *  - STREAMING: building it over readStream IS a plain update-mode
  *    streaming aggregation — bounded state (≤ log_γ(max/min) buckets
  *    per key, ~2.3k for doubles spanning 1e-10..1e10 at α=1%), no
  *    custom state store logic, exactly-once under checkpointing. The
  *    streaming gold/stats path gets its quantile story from this
  *    (stream ≡ batch spec in StreamingSpec).
  *  - O(k) extraction: quantiles come from walking the bucket
  *    histogram — every window below is OVER THE AGGREGATE (partition
  *    rows = bucket count), never over data rows.
  *
  * Trade vs [[ExactMedian]]: α-approximate values (α = 1%) from a
  * one-pass mergeable state vs exact values from three batch passes.
  * Use this in streams and shard rollups; use ExactMedian when the
  * gate needs the exact element (q56/q106).
  *
  * Domain contract: values must be > 0 (`sketch` filters; callers
  * with signed data offset or split by sign — the published sketch
  * keeps a mirrored negative store, which composes from two of
  * these). Cross-engine note: bucket indices involve libm `ln`, so
  * sketch ESTIMATES never ride in hash-compared oracle columns — the
  * q45/q92 verdict pattern applies (exact side hash-matches, the
  * α-guarantee is asserted as literal-1 verdicts; see q113).
  */
object LogQuantile {

  val Alpha = 0.01
  val Gamma: Double = (1 + Alpha) / (1 - Alpha)
  private val LnGamma = math.log(Gamma)

  /** Bucket of a positive value: ceil(ln v / ln γ). */
  def bucketOf(v: Column): Column = ceil(log(v) / lit(LnGamma)).cast("long")

  /** Midpoint estimate for bucket b: 2γ^b/(γ+1). */
  def estimateOf(b: Column): Column =
    lit(2.0) * pow(lit(Gamma), b.cast("double")) / lit(Gamma + 1.0)

  /** The sketch state: per-(keys, bucket) counts. A plain aggregate —
    * map-side partials batch-side, update-mode aggregation
    * stream-side, merged across shards by re-aggregating the sum. */
  def sketch(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.filter(value > 0)
      .groupBy((keys.map(col) :+ bucketOf(value).as("__lq_b")): _*)
      .agg(count(lit(1)).as("__lq_c"))

  /** Merge of independently-built sketches (same key schema): sum
    * counts per (keys, bucket). */
  def merge(sketches: Seq[DataFrame], keys: Seq[String]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy((keys.map(col) :+ col("__lq_b")): _*)
      .agg(sum(col("__lq_c")).as("__lq_c"))

  /** Quantile estimates at `ps` (name -> p): the value at rank
    * ceil(p·n) resolved by walking the per-key bucket histogram. One
    * output row per key, one column per p. The rank's bucket contains
    * the true rank-ceil(p·n) element, so each estimate is within α of
    * the exact discrete quantile — the guarantee q113 turns into a
    * verdict. */
  def quantiles(sk: DataFrame, keys: Seq[String], ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 })
    require(ps.map(_._1).distinct.size == ps.size,
      s"duplicate quantile output names: ${ps.map(_._1)}")
    val keyCols = keys.map(col)
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__lq_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = sk.withColumn("__lq_off", coalesce(sum(col("__lq_c")).over(wOff), lit(0L)))
    val totals = sk.groupBy(keyCols: _*).agg(sum(col("__lq_c")).as("__lq_n"))
    val prs = ps.map { case (nm, p) =>
      struct(lit(nm).as("t"),
        greatest(lit(1L), ceil(col("__lq_n") * lit(p)).cast("long")).as("r"))
    }
    val targets = totals
      .select((keyCols :+ explode(array(prs: _*)).as("__lq_pr")): _*)
      .select((keyCols :+ col("__lq_pr.t").as("__lq_t") :+ col("__lq_pr.r").as("__lq_r")): _*)
    val picked = cum.join(broadcast(targets), keys)
      .filter(col("__lq_r") > col("__lq_off") &&
        col("__lq_r") <= col("__lq_off") + col("__lq_c"))
      .select((keyCols :+ col("__lq_t") :+ estimateOf(col("__lq_b")).as("__lq_v")): _*)
    val aggs = ps.map { case (nm, _) =>
      max(when(col("__lq_t") === nm, col("__lq_v"))).as(nm)
    }
    picked.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
