package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.LogQuantile
import graft.streaming.QuantileServe

/** Stream ≡ batch for the served quantile sketch: three micro-batches
  * (each `runOnce` call is a fresh query resumed from the checkpoint,
  * so every batch boundary exercises a stop/restart) must leave a
  * persisted sketch identical BUCKET-FOR-BUCKET to one batch sketch
  * over the concatenated input — the mergeability guarantee DDSketch
  * counts give and the property that makes the streaming serve path
  * trustworthy. Plus the Incremental-style retry: replaying an epoch
  * must not double-count.
  */
class QuantileServeSpec extends SparkSuite {
  import spark.implicits._

  private val keys = Seq("tenant")
  private val ps = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)

  private def wave(seed: Int, n: Int): Seq[(String, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val tenant = s"t${rnd.nextInt(3)}"
      // latency-ish positive values across 4 decades
      tenant -> math.exp(rnd.nextGaussian() * 2.0 + 3.0)
    }
  }

  private def sketchMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getAs[String]("tenant"), r.getAs[Long]("__lq_b")) ->
      r.getAs[Long]("__lq_c")).toMap

  test("3 micro-batches with restarts merge to the batch sketch, bucket-for-bucket") {
    val tmp = Files.createTempDirectory("graft_qserve").toString
    val bronze = s"$tmp/bronze"; val sketch = s"$tmp/sketch"; val ckpt = s"$tmp/ckpt"
    val waves = Seq(wave(1, 400), wave(2, 300), wave(3, 500))
    waves.foreach { w =>
      w.toDF("tenant", "v").write.mode("append").parquet(bronze)
      QuantileServe.runOnce(spark, bronze, keys, "v", sketch, ckpt).awaitTermination()
    }
    val served = QuantileServe.readSketch(spark, sketch)
      .getOrElse(fail("no served sketch"))
    val batch = LogQuantile.sketch(
      waves.flatten.toDF("tenant", "v"), keys, col("v"))
    assert(sketchMap(served) == sketchMap(batch),
      "served sketch diverges from the batch sketch")

    // serving path: estimates within alpha of the exact discrete
    // quantile of everything ingested
    val est = QuantileServe.serveQuantiles(spark, sketch, keys, ps)
      .getOrElse(fail("no quantiles")).collect()
      .map(r => r.getAs[String]("tenant") -> ps.map { case (nm, _) => r.getAs[Double](nm) })
      .toMap
    val byTenant = waves.flatten.groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(_._2).sorted
    }
    byTenant.foreach { case (t, sortedVals) =>
      ps.map(_._2).zip(est(t)).foreach { case (p, got) =>
        val exact = sortedVals(math.max(0, math.ceil(p * sortedVals.size).toInt - 1))
        assert(math.abs(got - exact) <= LogQuantile.Alpha * exact + 1e-9,
          s"tenant $t p=$p: est $got vs exact $exact beyond alpha")
      }
    }
  }

  test("replayed epoch does not double-count (mergeBucketed retry contract)") {
    val tmp = Files.createTempDirectory("graft_qserve_retry").toString
    val sketch = s"$tmp/sketch"
    val b1 = wave(10, 200).toDF("tenant", "v")
    val b2 = wave(11, 250).toDF("tenant", "v")
    QuantileServe.processBatch(spark, b1, keys, "v", sketch, epochId = 0L)
    QuantileServe.processBatch(spark, b2, keys, "v", sketch, epochId = 1L)
    // at-least-once replay of epoch 1 with the same inputs
    QuantileServe.processBatch(spark, b2, keys, "v", sketch, epochId = 1L)
    val served = QuantileServe.readSketch(spark, sketch)
      .getOrElse(fail("no served sketch"))
    val batch = LogQuantile.sketch(b1.unionByName(b2), keys, col("v"))
    assert(sketchMap(served) == sketchMap(batch),
      "replayed epoch changed the merged sketch")
  }
}
