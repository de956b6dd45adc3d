package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming bottom-k hash sample: q44's deterministic stratified
  * selection (per-stratum, md5-hash order) maintained INCREMENTALLY —
  * each stratum keeps the k documents with the smallest
  * (md5(doc_id), doc_id) keys seen so far, so at every point in the
  * stream the sample equals what the batch operator would select from
  * the data replayed so far (spec-asserted). This is the mergeable
  * fixed-size sample a long-running ingest keeps per source/language:
  * state is k pairs per stratum FOREVER — no reservoir randomness, no
  * replay divergence, and unioning two streams' samples re-ranks to
  * the union's sample (bottom-k is a lattice join, like HLL).
  *
  * (State-schema note: StratumState is the flatMapGroupsWithState
  * state class — changing it breaks checkpoint compatibility.)
  */
object StreamingBottomK {

  case class DocIn(doc_id: Long, lang: String)
  case class StratumState(hashes: Seq[Long], ids: Seq[Long],
                          processed: Long)
  case class BKOut(lang: String, doc_id: Long, hash: Long,
                   stratum_processed: Long)

  /** The batch sampler's exact key: first 8 md5 hex digits of the
    * decimal doc_id string, as a long ([[graft.functions.PortableHash
    * .md5Long32]]'s JVM twin), tiebroken by doc_id.
    */
  def hashOf(docId: Long): Long =
    graft.functions.PortableHash.md5PairJvm(docId.toString)._1

  def sample(docs: Dataset[DocIn], k: Int = 20): Dataset[BKOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[StratumState, BKOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[DocIn],
         state: GroupState[StratumState]) =>
          var kept = state.getOption
            .map(s => s.hashes.zip(s.ids))
            .getOrElse(Seq.empty)
          var processed = state.getOption.map(_.processed).getOrElse(0L)
          rows.foreach { d =>
            processed += 1
            kept = ((hashOf(d.doc_id), d.doc_id) +: kept)
              .distinct.sorted.take(k)
          }
          state.update(StratumState(kept.map(_._1), kept.map(_._2),
            processed))
          kept.iterator.map { case (h, id) => BKOut(lang, id, h, processed) }
      }
  }
}
