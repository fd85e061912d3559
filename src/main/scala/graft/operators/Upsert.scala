package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S5 — keyed upsert semantics (`update_one({key}, {$set}, upsert=True)`,
  * api_service/main.py:151 and three sibling sites) in batch form:
  * union the base table with the update set and keep the
  * highest-version row per key ("latest wins"). On Delta/Iceberg this
  * is MERGE INTO; this is the storage-agnostic dataframe core, and it
  * scales as one shuffle on the key (the window partitions by key).
  */
object Upsert {
  /** `tiebreak` must make (key, version, tiebreak) a total order or
    * the surviving row is nondeterministic. */
  def latestWins(base: DataFrame, updates: DataFrame,
      key: Seq[String], version: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(version.desc, tiebreak.desc)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
