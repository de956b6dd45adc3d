package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.contentFingerprint

/** Streaming exact dedup — the ingest-time twin of q25: pass a
  * document through iff its whitespace-normalized content fingerprint
  * (the exact q25 expression) has not been seen inside the watermark
  * horizon. Built on the NATIVE
  * `dropDuplicatesWithinWatermark` operator, so state is bounded by
  * construction: one entry per distinct fingerprint only while the
  * fingerprint's event time is newer than `watermark - delay` — the
  * eviction contract a forever-running ingest needs (an unbounded
  * `dropDuplicates` would grow state with corpus distincts).
  *
  * Semantics bound to the batch graded query (StreamingSpec):
  *  - within the horizon, emitted docs == first arrivals == the q25
  *    representative set when replay order is doc_id order;
  *  - past the horizon the operator FORGETS — a re-sent duplicate
  *    re-emits (asserted, not hidden): streaming dedup trades recall
  *    beyond the horizon for bounded state, which is why the batch
  *    q25/q38 passes still run corpus-wide behind it.
  *
  * At 100 TB-scale ingest the state is hash-partitioned by
  * fingerprint across executors (Spark's streaming state store), so
  * horizon length is a per-executor memory dial, not a correctness
  * one.
  */
object StreamingDedup {

  /** Input needs (doc_id, text, event_ts). Output adds content_fp and
    * keeps only first-in-horizon arrivals.
    */
  def firstInHorizon(docs: DataFrame, delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_fp", contentFingerprint(col("text")))
      .withWatermark("event_ts", delay)
      .dropDuplicatesWithinWatermark("content_fp")
}
