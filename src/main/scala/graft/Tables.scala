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
  /** The events table's `ts` column has shipped in two physical shapes
    * across generator versions: parquet TIMESTAMP(NANOS) (unrepresentable
    * in Spark's micros TimestampType — readable only as a raw LongType
    * via `spark.sql.legacy.parquet.nanosAsLong`) and plain
    * timestamp[us] (surfacing as TIMESTAMP_NTZ when written without a
    * timezone). Every event query does exact integer arithmetic on
    * epoch-NANOS (never double division: 2024 epoch-nanos ≈ 1.7e18 >
    * 2^53, doubles would silently lose precision), so this loader
    * normalizes BOTH shapes to an epoch-nanos LongType `ts`:
    *  - LongType (nanos-as-long): already epoch-nanos, pass through.
    *  - TIMESTAMP_NTZ: the naive wall-clock is UTC by convention (the
    *    DuckDB oracle's `epoch_ns(ts)` makes the same assumption).
    *    `cast` interprets NTZ in the session zone and
    *    `from_utc_timestamp` re-adds that zone's offset, so the
    *    round-trip pins the wall-clock to UTC for ANY session timezone
    *    (identity under the UTC sessions all entry points configure).
    *  - TIMESTAMP (tz-aware): an unambiguous instant; take it directly. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, from_utc_timestamp, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType =>
        val tz = s.conf.get("spark.sql.session.timeZone")
        df.withColumn(
          "ts", unix_micros(from_utc_timestamp(col("ts").cast(TimestampType), tz)) * 1000L)
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported physical type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")

  /** Embeddings load with CORPUS HYGIENE at the ingest boundary: a
    * NULL vector or a vector with a NULL coordinate is a malformed
    * row (a float can be NaN/Inf and still be data; a NULL coordinate
    * is a serialization bug) and never enters the engine — the
    * bronze→silver constraint any production pipeline enforces once
    * at ingest rather than per-query. Without it the engines diverge
    * on every unfiltered vector aggregate: Spark's array HOFs
    * propagate the NULL element (NULL dot, row dropped by filters)
    * while DuckDB's list aggregates IGNORE NULLs (row kept with a
    * shifted value) — a null-coordinate fixture row split 15
    * centroid/ANN queries before this filter. Oracle SQL mirrors via
    * [[graft.functions.VectorFns.embeddingsSql]]; NaN/±Inf hygiene
    * for fixed-point kernels stays the separate, narrower
    * `finiteVec` filter at the encode/moment build. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, forall, lit}
    table(s, d, "embeddings").filter(
      coalesce(forall(col("embedding"), x => x.isNotNull), lit(false)))
  }

  /** The `(doc_id, source, lang, n_tokens)` projection of `documents`,
    * STAGED once per input dir (operators/Staged): whitespace token
    * counts are re-derived by ~9 independent queries (length profiles,
    * quantile gates, packing, curricula, PSI drift, epoch budgets), and
    * each re-derivation is a full `text` scan + split — the single most
    * repeated piece of work in the suite. Staging the 4 narrow columns
    * once turns every later consumer into a column-pruned scan of a
    * text-free table; at 100 TB this is the `token_counts` side table a
    * curation warehouse materializes next to the corpus for exactly
    * this reason. `n_tokens` stays `size()`-native IntegerType so
    * consumers see the exact pre-staging schema and cast as they did.
    *
    * Staleness caveat (round-9 ADVICE): the stage memo keys on the
    * DIRECTORY only — if a test rewrites the documents table into a
    * reused dir within one JVM, this serves the lengths of the OLD
    * table. That is Staged's documented per-JVM contract (cross-
    * process runs always rebuild; a shutdown hook reclaims the disk);
    * tests that regenerate fixtures must use a fresh dir.
    */
  def docLens(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, size, split}
    graft.operators.Staged.parquet(s, s"doclens|$d") {
      documents(s, d).select(col("doc_id"), col("source"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"))
    }
  }
}
