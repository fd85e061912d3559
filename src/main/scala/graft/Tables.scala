package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over the driver's deterministic test tables
  * (TESTDATA.md). One loader per table so every query declares its scan
  * explicitly — Catalyst prunes columns and pushes filters into the
  * parquet reader from there (SURVEY.md §4: the reference's hand-rolled
  * Mongo projections/predicates map to automatic ColumnPruning +
  * PushDownPredicates here).
  *
  * At 100 TB these would be partitioned/bucketed tables behind a
  * catalog; the loader signature (session + base dir) is the only thing
  * that changes — every operator downstream is written against the
  * DataFrame, not the path.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's TimestampType (micros) cannot represent — reading it throws
    * PARQUET_TYPE_ILLEGAL. We read nanos as a plain LongType
    * (`spark.sql.legacy.parquet.nanosAsLong`) and do all event-time
    * bucketing with exact integer arithmetic on epoch-nanos (never
    * double division: 2024 epoch-nanos ≈ 1.7e18 > 2^53, doubles would
    * silently lose precision). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
