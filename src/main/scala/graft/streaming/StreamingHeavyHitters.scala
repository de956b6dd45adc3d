package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Misra–Gries heavy hitters: the x04 batch sketch
  * (`TextAnalysis.vocabularyHeavyHitters`) as BOUNDED KEYED STATE —
  * tokens shard by deterministic hash, each shard keeps at most `k`
  * counters forever (the MG invariant), and every micro-batch emits
  * the shard's refreshed counter snapshot (Update mode). A downstream
  * batch merge of the ≤ nShards·k counters yields the global top-k
  * candidates with the classic guarantee: any token with true count
  * > processed/(k+1) within its shard is PRESENT, and estimates
  * undercount by at most processed/(k+1) — spec-asserted against
  * exact counts over a replayed stream.
  *
  * Why this shape at scale: a naive streaming groupBy(token).count()
  * carries state per DISTINCT TOKEN — unbounded on an open
  * vocabulary; this carries nShards·k counters TOTAL, the streaming
  * analogue of x04's "≤ k counters per aggregation buffer".
  *
  * (State-schema note: ShardState is the flatMapGroupsWithState state
  * class — changing it breaks checkpoint compatibility.)
  */
object StreamingHeavyHitters {

  case class ShardState(tokens: Seq[String], counts: Seq[Long],
                        processed: Long)
  case class HHOut(shard: Int, token: String, est_count: Long,
                   shard_processed: Long)

  /** Deterministic shard id — md5-derived like the batch samplers
    * (String.hashCode is stable too, but the md5 route matches the
    * engine-portable convention used everywhere else).
    */
  def shardOf(token: String, nShards: Int): Int =
    math.floorMod(graft.functions.PortableHash.md5PairJvm(token)._1, nShards.toLong).toInt

  def topTokens(tokens: Dataset[String], k: Int = 50,
                nShards: Int = 8): Dataset[HHOut] = {
    import tokens.sparkSession.implicits._
    tokens.groupByKey(shardOf(_, nShards))
      .flatMapGroupsWithState[ShardState, HHOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[String], state: GroupState[ShardState]) =>
          val counters = scala.collection.mutable.HashMap.empty[String, Long]
          var processed = 0L
          state.getOption.foreach { s =>
            s.tokens.zip(s.counts).foreach { case (t, c) => counters(t) = c }
            processed = s.processed
          }
          rows.foreach { t =>
            processed += 1
            counters.get(t) match {
              case Some(c) => counters(t) = c + 1
              case None if counters.size < k => counters(t) = 1L
              case None => // decrement-all: the MG eviction step
                counters.keys.toSeq.foreach { kk =>
                  val nv = counters(kk) - 1
                  if (nv == 0) counters.remove(kk) else counters(kk) = nv
                }
            }
          }
          // deterministic state layout (sorted) so checkpoints and
          // re-runs carry identical bytes
          val sorted = counters.toSeq.sortBy(_._1)
          state.update(ShardState(sorted.map(_._1), sorted.map(_._2), processed))
          sorted.iterator.map { case (t, c) => HHOut(shard, t, c, processed) }
      }
  }
}
