package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator query: the Spark program plus (when expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same
  * parquet tables (Verify.scala dumps it to oracle_sql.json).
  *
  * Conventions keeping the differential hash-compare deterministic
  * (SURVEY.md §5.3):
  *  - every query ends in a TOTAL order (sort keys include a unique id);
  *  - every computed double is `round`-ed; aggregates of 2-decimal money
  *    columns round to 2 (sums of 2-decimal values are exact 2-decimal
  *    rationals, so float noise can't flip the rounding);
  *  - integer-ish aggregates are cast to BIGINT on the DuckDB side
  *    (DuckDB sum(int) returns HUGEINT, Spark returns LongType);
  *  - no wall-clock or nondeterministic columns; timestamps are emitted
  *    as epoch seconds (BIGINT) or formatted strings, never raw
  *    timestamp values.
  */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
