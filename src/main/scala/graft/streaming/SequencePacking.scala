package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the q81 cross-doc sequence packing: documents
  * arrive as a stream and each language's token stream is cut into
  * fixed [[SeqLen]]-token training sequences that CROSS document
  * boundaries — the continuous version of the packing cut a training
  * pipeline runs before sharding (reference analog: the batch
  * transform chain of transformer_loader/main.py, applied to a feed
  * instead of a snapshot).
  *
  * State per language is O(1): at most SeqLen-1 carried tokens (the
  * incomplete tail sequence), their source doc ids, and the next
  * sequence index — regardless of how many documents ever streamed.
  * Each completed sequence is emitted exactly once (append mode);
  * the in-flight remainder is emitted when the explicit end-of-corpus
  * [[flushMarker]] arrives, so stream output ≡ the batch q81 rows,
  * partial final sequence included (the spec checks row-for-row).
  *
  * Ordering contract (same shape as [[Funnel]]): rows are folded in
  * doc_id order WITHIN a batch, so intra-batch shuffle is harmless;
  * ACROSS batches a language's doc_ids must arrive strictly
  * ascending — late documents need the batch backfill path, not the
  * stream (a packed sequence already emitted cannot be re-cut).
  * To establish that order, `pack` materializes and sorts ONE
  * micro-batch's rows per language — per-invocation memory is
  * batch-sized (a micro-batch is the unit Structured Streaming
  * already holds), while CARRIED state stays O(1) per language.
  */
object SequencePacking {

  val SeqLen = 32

  /** Input document; `flush = true` marks the end-of-corpus flush row
    * for its language (text ignored). The marker is an explicit field,
    * NOT a sentinel doc_id — every Long is a legal document id. Flush
    * rows carry doc_id = Long.MaxValue only so they SORT after every
    * real document in their batch (ties broken by the flag itself). */
  final case class Doc(lang: String, doc_id: Long, text: String, flush: Boolean = false)

  def flushMarker(lang: String): Doc = Doc(lang, Long.MaxValue, "", flush = true)

  /** Carried tail: token i of the in-flight sequence came from
    * carryDocs(i) — needed for the n_docs attribution of the sequence
    * it will complete. Both lists are < SeqLen long by construction. */
  final case class PackState(carryToks: List[String], carryDocs: List[Long], nextSeq: Long)

  /** One packed sequence — the q81 output row shape. */
  final case class SeqOut(lang: String, seq_idx: Long, n_tokens: Long, n_docs: Long, seq_fp: String)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def pack(key: String, docs: Iterator[Doc],
      state: GroupState[PackState]): Iterator[SeqOut] = {
    val st = state.getOption.getOrElse(PackState(Nil, Nil, 0L))
    var toks = st.carryToks.toVector
    var srcs = st.carryDocs.toVector
    var seq = st.nextSeq
    val out = Vector.newBuilder[SeqOut]
    def emit(ts: Vector[String], ds: Vector[Long]): Unit = {
      out += SeqOut(key, seq, ts.length.toLong, ds.distinct.length.toLong,
        md5hex(ts.mkString(" ")))
      seq += 1
    }
    docs.toSeq.sortBy(d => (d.doc_id, d.flush)).foreach { d =>
      if (d.flush) { // flush marker: emit the partial tail
        if (toks.nonEmpty) { emit(toks, srcs); toks = Vector.empty; srcs = Vector.empty }
      } else {
        // limit -1: keep trailing empty tokens, matching Spark SQL's
        // split(text, ' ') the batch query tokenizes with
        val ts = d.text.split(" ", -1).toVector
        toks = toks ++ ts
        srcs = srcs ++ Vector.fill(ts.length)(d.doc_id)
        while (toks.length >= SeqLen) {
          emit(toks.take(SeqLen), srcs.take(SeqLen))
          toks = toks.drop(SeqLen); srcs = srcs.drop(SeqLen)
        }
      }
    }
    state.update(PackState(toks.toList, srcs.toList, seq))
    out.result().iterator
  }

  /** Packed sequences in append mode; each sequence emitted exactly
    * once, in-flight tails flushed by [[flushMarker]] rows. */
  def packed(docs: Dataset[Doc]): Dataset[SeqOut] = {
    implicit val stateEnc = Encoders.product[PackState]
    implicit val outEnc = Encoders.product[SeqOut]
    docs.groupByKey(_.lang)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(pack)
  }
}
