package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q132 session-path miner: emits one record per
  * completed event-type TRIGRAM taken consecutively inside a session
  * (per-user 30-min-gap contract, same as the batch operator). A
  * downstream count over (e1, e2, e3) equals the batch trigram
  * multiset for frontier-respecting input — asserted in StreamingSpec
  * against `Events.sessionPaths`'s support column.
  *
  * State per user is four scalars + two type strings — the (ts, id)
  * frontier and the sliding pair of predecessor types — bounded
  * regardless of history; no session buffer is kept because a trigram
  * is emittable the moment its third event arrives. A gap break only
  * clears the predecessor pair (the q132 contract: trigrams never
  * cross a session boundary), so no timeout is needed — nothing
  * pending ever has to flush on silence, unlike the sessionize twin.
  *
  * Late data: an event at or below the per-user (ts_ms, event_id)
  * LEXICOGRAPHIC frontier is dropped, the same stance (and the same
  * reasoning about equal-ts tiebreaks) as `orderedAnalytics`.
  */
object StreamingPaths {

  case class PathInput(user_id: Long, event_id: Long, ts_ms: Long,
                       event_type: String)
  case class PathState(lastTs: Long, lastId: Long,
                       prev1: String, prev2: String)
  case class PathOut(user_id: Long, e1: String, e2: String, e3: String)

  def sessionTrigrams(events: Dataset[PathInput],
                      gapMs: Long = 30L * 60000L): Dataset[PathOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, PathOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[PathInput], state: GroupState[PathState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts_ms, r.event_id))
          var st = state.getOption.getOrElse(
            PathState(Long.MinValue, Long.MinValue, null, null))
          val out = scala.collection.mutable.ArrayBuffer.empty[PathOut]
          sorted.foreach { r =>
            val late = st.lastTs != Long.MinValue &&
              (r.ts_ms < st.lastTs ||
                (r.ts_ms == st.lastTs && r.event_id <= st.lastId))
            if (!late) {
              val gapBreak =
                st.lastTs != Long.MinValue && r.ts_ms - st.lastTs > gapMs
              val (p1, p2) =
                if (gapBreak) (null, null) else (st.prev1, st.prev2)
              if (p1 != null && p2 != null)
                out += PathOut(user, p1, p2, r.event_type)
              st = PathState(r.ts_ms, r.event_id, p2, r.event_type)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
