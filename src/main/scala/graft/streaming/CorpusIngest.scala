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
  *  - Dedup keeps the FIRST ARRIVAL of each content fingerprint
  *    (batch q84 keeps min doc_id; identical when delivery follows
  *    doc_id order, and the difference is the documented at-least-once
  *    re-delivery contract otherwise).
  *  - `ingest_ts` must be the WRITE-time stamp, not business time —
  *    the same contract as [[Incremental]] (a business-time watermark
  *    silently drops late re-polls). State is evicted `dedupDelay`
  *    past the max ingest watermark, so dedup memory is bounded by
  *    the re-delivery window, not corpus size; fingerprints are
  *    16-byte keys, so state bytes stay small even at high rates.
  */
object CorpusIngest {

  /** Curate a STREAMING documents frame
    * (doc_id, ingest_ts timestamp, lang, text): Gopher filter +
    * watermark-bounded first-arrival dedup on content fingerprint.
    * Output columns: doc_id, ingest_ts, lang, text, fp. */
  def curatedStream(docs: DataFrame, dedupDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(Curation.gopherKeepExpr)
      .withColumn("fp", TextFns.fingerprint(col("text")))
      .drop("toks")
      .withWatermark("ingest_ts", dedupDelay)
      .dropDuplicatesWithinWatermark("fp")
}
