package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the last-touch attribution (q91,
  * operators.Events.lastTouchAttribution): per user, remember the most
  * recent prior touch (click/view) and stamp each purchase with it as
  * it arrives — attribution-on-ingest instead of a nightly batch
  * window. The batch form's window frame ("all prior rows") collapses
  * to ONE string of state per user, which is the entire point of the
  * streaming shape: the as-of lookup is O(1) per event with bounded
  * state, no matter how long the user's history grows.
  *
  * Ordering discipline is StreamingEvents.orderedAnalytics' frontier
  * contract: rows sort within the micro-batch by (ts_ms, event_id);
  * an event at or below the per-user lexicographic frontier is late
  * and dropped. For frontier-respecting input the emitted
  * attributions equal the batch window's per-purchase channels
  * exactly (asserted in StreamingSpec against q91's operator).
  *
  * (State-schema note: TouchState is the flatMapGroupsWithState state
  * type; changing its fields invalidates existing checkpoints.)
  */
object StreamingAttribution {

  case class TouchInput(user_id: Long, event_id: Long, ts_ms: Long,
                        event_type: String, value: Double)
  /** lastTouch = "" until a touch is seen ("direct" attribution). */
  case class TouchState(lastTouch: String, lastTs: Long, lastId: Long)
  case class Attribution(user_id: Long, event_id: Long, ts_ms: Long,
                         channel: String, value: Double)

  val TouchTypes: Set[String] = Set("click", "view")

  def attribute(events: Dataset[TouchInput]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .filter(e => TouchTypes.contains(e.event_type) || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[TouchInput], state: GroupState[TouchState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts_ms, r.event_id))
          var st = state.getOption.getOrElse(
            TouchState("", Long.MinValue, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
          sorted.foreach { r =>
            if (r.ts_ms < st.lastTs ||
                (r.ts_ms == st.lastTs && r.event_id <= st.lastId)) {
              // at or below the (ts, id) frontier: dropped as late
            } else {
              if (r.event_type == "purchase")
                out += Attribution(user, r.event_id, r.ts_ms,
                  if (st.lastTouch.isEmpty) "direct" else st.lastTouch, r.value)
              val touch =
                if (TouchTypes.contains(r.event_type)) r.event_type else st.lastTouch
              st = TouchState(touch, r.ts_ms, r.event_id)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
