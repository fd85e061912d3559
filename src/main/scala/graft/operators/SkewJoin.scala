package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: replicate the (small-ish) right
  * side `factor` times and scatter the left side's hot keys across the
  * replicas, so one reducer no longer receives an entire hot key's
  * rows. AQE's skew-join handles sort-merge skew adaptively; explicit
  * salting is the deterministic tool when a known hot key (the
  * reference analog: one tracked player with a huge match history)
  * would overflow a single task at 100 TB.
  *
  * The salt is derived from a stable hash of all left columns — not a
  * random number — so results are reproducible run to run.
  */
object SkewJoin {
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val saltedRight = right.crossJoin(
      right.sparkSession.range(factor.toLong).select(col("id").cast("int").as("__salt")))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
