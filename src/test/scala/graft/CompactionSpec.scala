package graft

import org.apache.spark.sql.functions._

/** Physical claims of q167's ANN-index compaction that the DuckDB
  * oracle CANNOT see (it checks serve-equivalence plus the aggregate
  * stored_n, which compensating physical errors could leave
  * unchanged — e.g. a compacted cell keeping one dead row while
  * dropping one live row outside every probe's top-3):
  *
  *  1. compacted cells store ZERO tombstoned rows;
  *  2. non-compacted cells are ROW-IDENTICAL to the input index
  *     (serve-through cells are untouched by the rewrite);
  *  3. both regimes are non-empty at the tested SF (the median
  *     threshold's whole point — a fixed cut left the rewrite path
  *     vacuous at every SF).
  *
  * The compacted-cell set is recomputed here INDEPENDENTLY (driver-
  * side median over the ≤|cells|-row audit), so a threshold bug in
  * the query cannot self-certify.
  */
class CompactionSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("q167: compaction's physical contract on the stored index") {
    // Materialize the query once — builds the q163idx and q167store
    // stages; then read both artifacts (the error thunks prove the
    // reads are served from the stage, not rebuilt).
    SparkEntry.queries("q167_ann_compaction")(spark, sfDir).collect()
    val idx = graft.operators.Staged.parquet(spark, s"q163idx|$sfDir")(
      sys.error("q163idx must already be staged"))
    val store = graft.operators.Staged.partitionedParquet(
      spark, s"q167store|$sfDir", "cell")(
      sys.error("q167store must already be staged"))

    // Independent recomputation of the compacted set: per-cell dead
    // fraction (4dp, the query's rounding), discrete median at rank
    // ceil(n/2) ordered by (dead_frac, cell), strict > threshold.
    val audit = idx.groupBy(col("cell"))
      .agg(sum(when(col("is_deleted"), 1L).otherwise(0L)).as("dead_n"),
        count(lit(1)).as("n"))
      .select(col("cell"),
        graft.functions.Num.fround(
          col("dead_n").cast("double") / col("n"), 4).as("dead_frac"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (cell, df) => (df, cell) }
    val thr = audit(math.ceil(audit.length / 2.0).toInt - 1)._2
    val compacted = audit.collect { case (cell, df) if df > thr => cell }.toSet
    val kept = audit.map(_._1).toSet -- compacted

    assert(compacted.nonEmpty, s"no compacted cells at $sfDir — rewrite path vacuous")
    assert(kept.nonEmpty, s"no serve-through cells at $sfDir — threshold degenerate")

    // 1. zero tombstoned rows physically stored in compacted cells
    val deadStored = store
      .filter(col("cell").isInCollection(compacted) && col("is_deleted"))
      .count()
    assert(deadStored == 0, s"$deadStored tombstoned rows stored in compacted cells")
    // ...and the live rows of a compacted cell are all retained
    val liveDiff = idx
      .filter(col("cell").isInCollection(compacted) && !col("is_deleted"))
      .select(col("vec_id"))
      .except(store.filter(col("cell").isInCollection(compacted)).select(col("vec_id")))
      .count()
    assert(liveDiff == 0, s"$liveDiff live rows lost by compaction")

    // 2. non-compacted cells row-identical to the input index (both
    // directions; every column participates)
    val cols = Seq("vec_id", "cell", "nsq", "is_deleted").map(col)
    val keptIdx = idx.filter(col("cell").isInCollection(kept)).select(cols: _*)
    val keptStore = store.filter(col("cell").isInCollection(kept)).select(cols: _*)
    assert(keptIdx.except(keptStore).count() == 0, "index rows missing from store")
    assert(keptStore.except(keptIdx).count() == 0, "store rows absent from index")
    // embeddings round-trip exactly too (array column — compare via
    // a deterministic serialization join)
    val embMismatch = idx.filter(col("cell").isInCollection(kept))
      .select(col("vec_id"), array_join(col("embedding").cast("array<string>"), "|").as("ea"))
      .join(store.filter(col("cell").isInCollection(kept))
        .select(col("vec_id"), array_join(col("embedding").cast("array<string>"), "|").as("eb")),
        Seq("vec_id"))
      .filter(col("ea") =!= col("eb")).count()
    assert(embMismatch == 0, "embedding payload altered in serve-through cells")
  }
}
