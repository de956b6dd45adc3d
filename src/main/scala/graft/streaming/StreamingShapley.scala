package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q466's Shapley funnel attribution
  * (operators.Events.shapleyFunnel): the event-grain work — each
  * user's channel SET (4-bit mask) and conversion flag — is exactly
  * the kind of state a stream keeps incrementally, so the twin folds
  * arriving events into per-user (mask, conv) state with
  * flatMapGroupsWithState (Update mode: every batch re-emits the
  * users whose state changed) and the coalition table + literal-grid
  * Shapley algebra run on the resulting snapshot through the SAME
  * shared [[graft.operators.Events.shapleyFromUsers]] the batch
  * operator uses — the two cannot drift.
  *
  * State per user is two longs — O(1) per key, independent of event
  * count; idempotent under replay (mask OR and conv max are both
  * monotone), asserted batch-exact in StreamingSpec across a
  * micro-batch boundary.
  */
object StreamingShapley {

  case class EventInput(user_id: Long, event_type: String)
  case class UserState(mask: Long, conv: Long)
  case class UserOut(user_id: Long, mask: Long, conv: Long)

  private val channelBit: Map[String, Int] =
    graft.operators.Events.shapleyChannels.zipWithIndex.toMap

  /** Per-user coalition state; emits the user's CURRENT (mask, conv)
    * each time a batch touches it — the downstream snapshot keeps the
    * latest row per user.
    */
  def userMasks(events: Dataset[EventInput]): Dataset[UserOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventInput], state: GroupState[UserState]) =>
          var st = state.getOption.getOrElse(UserState(0L, 0L))
          rows.foreach { e =>
            channelBit.get(e.event_type) match {
              case Some(bit) => st = st.copy(mask = st.mask | (1L << bit))
              case None if e.event_type == "purchase" =>
                st = st.copy(conv = 1L)
              case None => () // non-channel, non-conversion: ignored
            }
          }
          state.update(st)
          Iterator.single(UserOut(uid, st.mask, st.conv))
      }
  }

  /** Batch-side finisher for a memory-sink snapshot of [[userMasks]]
    * output: keep each user's latest row, then run the SHARED
    * coalition/Shapley algebra.
    */
  def shapleyFromSnapshot(spark: SparkSession, snapshot: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val latest = snapshot
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("mask").desc, col("conv").desc)))
      .filter(col("rn") === 1)
      .select(col("mask"), col("conv"))
    graft.operators.Events.shapleyFromUsers(spark, latest)
  }
}
