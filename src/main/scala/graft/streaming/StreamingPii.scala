package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Pii

/** Streaming twin of the PII redaction pass (q57): scrub-on-ingest.
  * Each micro-batch is redacted at scan speed (`Pii.redactEvents` — a
  * pure codegen'd map, no state, no shuffle) BEFORE the partition-
  * scoped merge, so the destination only ever stores the clean copy
  * plus the audit columns. Idempotency under micro-batch replay is the
  * merge's last-writer-wins contract (asserted in PiiSpec, same shape
  * as StreamingSpec's replay test): redaction is deterministic, so a
  * replayed batch re-merges to the same post-image.
  */
object StreamingPii {

  /** Start the redact-then-merge stream into `destPath`; parameters as
    * [[StreamingMerge.mergeStream]]. The raw `props` column is
    * OVERWRITTEN with the redacted payload before the merge — keeping
    * it would persist the PII in the sink and defeat the scrub; only
    * the clean copy and the audit count ship.
    */
  def redactedMergeStream(events: DataFrame, destPath: String,
                          keys: Seq[String], tsCol: String,
                          versionCol: String): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val scrubbed = Pii.redactEvents(events)
      .withColumn("props", col("props_redacted"))
      .drop("props_redacted")
    StreamingMerge.mergeStream(scrubbed, destPath, keys, tsCol, versionCol)
  }
}
