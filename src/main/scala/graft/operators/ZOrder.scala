package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the storage-clustering primitive behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`, which plain Spark lacks. A linear sort order clusters
  * ONE dimension: parquet footer min/max stats stay tight on the sort
  * key and useless on every other column, so a 2-D predicate
  * (customer AND date-range) can skip files on at most one axis.
  * Interleaving the key bits makes every z-contiguous range a bounded
  * bounding-box in BOTH dimensions, so range-partitioned files carry
  * tight min/max on each axis and a scan with either (or both)
  * predicates skips most files.
  *
  * Scale shape: [[zvalue]] is a pure narrow map (32 codegen'd
  * shift/mask terms, no shuffle, no lookup state); [[layout]] is the
  * single range exchange any sorted write already pays —
  * `repartitionByRange(z)` + `sortWithinPartitions(z)` — so z-ordering
  * 100 TB costs exactly what linear-sorting it costs, while buying
  * skipping on every interleaved dimension. No reference analog (the
  * reference stores row JSON in Mongo, `transformer_loader/main.py`);
  * this is part of the at-scale extension surface (SURVEY.md §7.2
  * step 5).
  *
  * Determinism: bit surgery on exact integers — identical in every
  * engine, which is what lets q121's oracle mirror it verbatim
  * ([[zvalueSql]]).
  */
object ZOrder {

  /** Morton code of two non-negative dims, `bits` bits each: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. Inputs are
    * masked to `bits` bits (callers quantize first); output fits in
    * 2·bits bits of a long. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** ANSI-SQL text of [[zvalue]] over BIGINT-typed operand SQL, for
    * DuckDB oracle mirrors — same shift/mask terms, same order. */
  def zvalueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Write-side layout: cluster `df` into `numFiles` range-partitioned,
    * internally sorted slices of z-space — each output file is one
    * tight 2-D bounding box. The caller writes the result with
    * `.write.parquet(...)`; parquet footers then carry per-file min/max
    * on BOTH dims. The `_z` column is dropped from the output (it is
    * derivable, not payload). */
  def layout(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 16): DataFrame = {
    val z = df.withColumn("_z", zvalue(x, y, bits))
    z.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
