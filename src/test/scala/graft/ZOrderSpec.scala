package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** ZOrder: bit-level correctness of the Morton code against a plain
  * Scala reference, and the layout property the operator exists for —
  * range-partitioned z slices bound BOTH dimensions, where a linear
  * sort bounds only its own key. */
class ZOrderSpec extends SparkSuite {

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  private def grid = {
    import spark.implicits._
    // Full 6-bit × 6-bit grid plus edge values at the 16-bit mask.
    val cells = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    (cells ++ Seq((65535L, 0L), (0L, 65535L), (65535L, 65535L))).toDF("x", "y")
  }

  test("zvalue matches the reference Morton code on a full grid + mask edges") {
    val got = grid
      .withColumn("z", ZOrder.zvalue(col("x"), col("y")))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonRef(x, y, 16), s"($x, $y)")
    }
  }

  test("zvalue is codegen-friendly: plan is a pure narrow projection") {
    val plan = grid.withColumn("z", ZOrder.zvalue(col("x"), col("y")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"),
      s"narrow map expected:\n$plan")
  }

  test("layout bounds both dims per partition; a linear sort does not") {
    import spark.implicits._
    // 64×64 uniform grid; 16 output slices. Every z slice must be a
    // bounding box covering at most 1/4 of EACH axis (a 256-cell z
    // range is a 16×16 box, plus one partial box from range-boundary
    // sampling → ≤ 32 per axis is a safe bound with margin); the
    // x-sorted layout leaves y unbounded (span = the full 64).
    val cells = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def spans(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x") + 1L).as("sx"), (max("y") - min("y") + 1L).as("sy"))
      .select(max("sx").cast("long"), max("sy").cast("long"))
      .collect().head
    val zed = spans(ZOrder.layout(cells, col("x"), col("y"), 16))
    assert(zed.getLong(0) <= 32 && zed.getLong(1) <= 32,
      s"z layout spans: ${zed.getLong(0)} x ${zed.getLong(1)}")
    val linear = spans(cells.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    assert(linear.getLong(1) == 64, "x-sorted layout should leave y unbounded")
  }
}
