package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming form of the q95 event funnel: purchase converts when the
  * same user clicked within the preceding hour. The batch query
  * attributes with a RANGE window frame over the full history; the
  * stream keeps ONE timestamp per user — the latest click seen — plus
  * the four output counters, so state is O(1) per user regardless of
  * how many events the user ever produced (the window form's frame
  * buffer is bounded by the horizon; this is bounded by a constant).
  * The latest click is sufficient because "some click within the
  * horizon" ⟺ "the LATEST click is within the horizon", and the batch
  * query's delay is also measured from the latest in-horizon click —
  * the equivalence the spec checks row-for-row against q95.
  *
  * Ordering contract: rows are folded in (ts, type) order WITHIN a
  * batch (clicks before purchases on ties — exactly the RANGE frame's
  * tie semantics), so any intra-batch arrival shuffle is harmless;
  * ACROSS batches a user's events must arrive STRICTLY after all
  * previously seen event times — equal timestamps must land in the
  * same batch. (Strictness matters for q95 equivalence: a click
  * arriving in a later batch with a timestamp EQUAL to an
  * already-folded purchase could not retro-convert it, while the
  * RANGE frame's inclusive bound would count it.) This is the same
  * write-time watermark contract Incremental documents — late
  * cross-batch data needs the batch backfill path, not the stream.
  * For a continuous deployment, compose with an event-time TTL
  * (StatefulStats.runningStatsWithTtl shows the eviction form) to
  * bound state by the ACTIVE user set.
  */
object Funnel {

  val HourUs: Long = 3600L * 1000 * 1000

  /** Input event: event time in epoch-micros (ts div 1000 from the
    * nanos-as-long events table). */
  final case class Ev(user_id: Long, event_type: String, ts_us: Long)

  final case class FunnelState(
      lastClickUs: Long, hasClick: Boolean,
      nClicks: Long, nPurchases: Long, nConverted: Long,
      minDelayUs: Long, hasDelay: Boolean)

  /** Per-user funnel totals; min_delay_us is None until a conversion
    * happens (matches q95's NULL). */
  final case class FunnelOut(
      user_id: Long, n_clicks: Long, n_purchases: Long, n_converted: Long,
      min_delay_us: Option[Long])

  private val zero = FunnelState(0L, hasClick = false, 0L, 0L, 0L, 0L, hasDelay = false)

  def update(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[FunnelState]): FunnelOut = {
    var st = state.getOption.getOrElse(zero)
    // (ts, type) order: "click" < "purchase" lexicographically, so a
    // click at the purchase's exact timestamp attributes — the RANGE
    // frame's inclusive-tie semantics.
    rows.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
      e.event_type match {
        case "click" =>
          st = st.copy(
            lastClickUs = if (st.hasClick) math.max(st.lastClickUs, e.ts_us) else e.ts_us,
            hasClick = true, nClicks = st.nClicks + 1)
        case "purchase" =>
          val delay = e.ts_us - st.lastClickUs
          val converts = st.hasClick && delay >= 0 && delay <= HourUs
          st = st.copy(
            nPurchases = st.nPurchases + 1,
            nConverted = st.nConverted + (if (converts) 1 else 0),
            minDelayUs = if (converts && (!st.hasDelay || delay < st.minDelayUs)) delay
                         else st.minDelayUs,
            hasDelay = st.hasDelay || converts)
        case _ => ()
      }
    }
    state.update(st)
    FunnelOut(key, st.nClicks, st.nPurchases, st.nConverted,
      if (st.hasDelay) Some(st.minDelayUs) else None)
  }

  /** Streaming (or batch) running funnel in update output mode. */
  def running(rows: Dataset[Ev]): Dataset[FunnelOut] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelOut]
    rows.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
