package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.queries.Curation

/** Streaming corpus ingest — the continuous form of the curation
  * front-door: documents arrive as a stream, pass the Gopher quality
  * filter, and are exact-deduplicated on content fingerprint with
  * watermark-BOUNDED state, then appended downstream. The analog of
  * [[Incremental]]'s match ingest (extractor/main.py:413-414's
  * idempotent insert), applied to the documents table.
  *
  * Semantics and scale:
  *  - The quality filter is [[Curation.gopherKeepExpr]] — the SAME
  *    definition the batch queries (q80/q84) use, so batch and
  *    streaming curation cannot fork.
  *  - Dedup emits EXACTLY ONE row per content fingerprint within the
  *    watermark horizon. ACROSS micro-batches the earlier batch wins;
  *    WITHIN a micro-batch the surviving duplicate is arbitrary
  *    (state-store read order after the fingerprint shuffle is not
  *    doc_id order) — so the batch-equivalence contract is on the
  *    SET OF FINGERPRINTS, not on which doc_id represents one.
  *  - `ingest_ts` must be the WRITE-time stamp, not business time —
  *    the same contract as [[Incremental]] (a business-time watermark
  *    silently drops late re-polls). State is evicted `dedupDelay`
  *    past the max ingest watermark; the default matches
  *    [[Incremental.DedupDelay]]'s 24 h, which clock skew between
  *    writers cannot plausibly exceed — a tight delay here is a
  *    silent-data-LOSS knob (late rows are discarded, not just
  *    duplicated), so it must dominate worst-case writer skew.
  *    The dedup key is the raw 16-byte digest (`unhex` of the hex
  *    fingerprint), halving state bytes vs the 32-char hex string.
  */
object CorpusIngest {

  /** Curate a STREAMING documents frame
    * (doc_id, ingest_ts timestamp, lang, text): Gopher filter +
    * watermark-bounded per-fingerprint dedup.
    * Output columns: doc_id, ingest_ts, lang, text, fp (hex). */
  def curatedStream(docs: DataFrame, dedupDelay: String = "24 hours"): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(Curation.gopherKeepExpr)
      .withColumn("fp", TextFns.fingerprint(col("text")))
      .withColumn("fp_key", unhex(col("fp")))
      .drop("toks")
      .withWatermark("ingest_ts", dedupDelay)
      .dropDuplicatesWithinWatermark("fp_key")
      .drop("fp_key")
}
