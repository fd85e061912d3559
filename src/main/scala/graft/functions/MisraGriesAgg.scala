package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a mergeable typed Aggregator —
  * the bounded-memory approximate sibling of the exact q77 top-k: at
  * most `k-1` counters per partial aggregate regardless of input size,
  * so a corpus-wide frequent-items scan costs O(k) memory per executor
  * at 100 TB where an exact groupBy count materializes the full
  * vocabulary.
  *
  * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al. 2013,
  * "Mergeable Summaries"): for every item, trueCount − n/k ≤ estimate ≤
  * trueCount, and every item with trueCount > n/k is present in the
  * sketch (n = stream length). Estimates depend on arrival order, so
  * the sketch is spec-verified against its GUARANTEES rather than
  * oracle-hashed (same policy as q45's engine-specific sketches).
  *
  * merge = pointwise sum, then if more than k-1 counters survive,
  * subtract the k-th largest value from all and drop the non-positive —
  * associative-in-guarantee, which is what makes it partial-aggregate
  * and streaming-state safe.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k >= 2, s"need at least 2 counters, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    buf.get(item) match {
      case Some(c) => buf(item) = c + 1
      case None if buf.size < k - 1 => buf(item) = 1L
      case None =>
        // Decrement every counter (the classic "cancel k distinct
        // items" step); drop the ones that hit zero.
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (t, c) => if (c == 1) dead += t else buf(t) = c - 1 }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k - 1) {
      // Subtract the k-th largest surviving value from everything:
      // at most k-1 counters remain positive, and the total subtracted
      // mass stays within the (nA+nB)/k error budget.
      val sub = a.values.toArray.sortWith(_ > _).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (t, c) => if (c - sub <= 0) dead += t else a(t) = c - sub }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] = buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
