package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (left): for every probe row, the most recent build row of
  * the same key with build_time <= probe_time (inclusive), or nulls.
  *
  * Implementation is the scalable union-and-carry-forward form, not a
  * fanout join: tag both sides, sort each key's rows by (time, side,
  * tiebreak) in ONE window, and carry the last build payload forward
  * with last(..., ignoreNulls). Cost = one hash shuffle + per-key sort
  * over |probe| + |build| rows — no (probe × candidate) intermediate,
  * which is what makes it survive 100 TB where the naive
  * join-then-rank explodes on hot keys. (Composition of built-ins per
  * the build rules' preference order — no custom SparkStrategy needed.)
  *
  * Ties: build rows at the same time sort by `buildTiebreak` ascending
  * and the LAST one wins (i.e. highest tiebreak), and a build row at
  * exactly the probe time DOES match (build sorts before probe at
  * equal times).
  */
object AsOfJoin {
  def asOf(
      probe: DataFrame, probeTime: String,
      build: DataFrame, buildTime: String,
      key: String, buildTiebreak: String): DataFrame = {
    val bPayload = struct(build.columns.map(col).toIndexedSeq: _*)
    val b = build.select(
      col(key).as("__k"), col(buildTime).cast("long").as("__t"),
      lit(1).as("__is_b"), col(buildTiebreak).cast("long").as("__tb"),
      bPayload.as("__b"))
    val p = probe.select(
      (Seq(col(key).as("__k"), col(probeTime).cast("long").as("__t"),
        lit(0).as("__is_b"), lit(Long.MaxValue).as("__tb"),
        lit(null).cast(b.schema("__b").dataType).as("__b")) ++
        probe.columns.map(col)): _*)
    val bAligned = b.select(
      (Seq(col("__k"), col("__t"), col("__is_b"), col("__tb"), col("__b")) ++
        probe.columns.map(c => lit(null).cast(probe.schema(c).dataType).as(c))): _*)
    // build rows order before probe rows at equal __t (__is_b desc)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_b").desc, col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    p.unionByName(bAligned)
      .withColumn("__matched", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__is_b") === 0)
      .select((probe.columns.toIndexedSeq.map(col) :+ col("__matched")): _*)
  }
}
