package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.WritePath

/** Structured Streaming composed with the write path: every
  * micro-batch is upserted into a date-partitioned destination via the
  * partition-scoped copy-on-write merge (`WritePath
  * .mergeDatePartitioned`) — the foreachBatch shape a table format's
  * streaming MERGE INTO executes. Exactly-once per key comes from the
  * merge's last-writer-wins semantics: a replayed micro-batch
  * re-merges to the same post-image (idempotent), which is the
  * standard recovery contract for foreachBatch sinks.
  *
  * Scale posture: each micro-batch rewrites only the partitions its
  * keys touch (the merge collects the affected date set — a tiny
  * driver scalar, same role as a table-format metadata lookup).
  */
object StreamingMerge {

  /** Start a streaming merge of `events` (a streaming DataFrame with
    * `tsCol` and `versionCol`) into `destPath`. Bootstraps the
    * destination from the first batch if it does not exist yet.
    */
  def mergeStream(events: DataFrame, destPath: String, keys: Seq[String],
                  tsCol: String, versionCol: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hPath = new org.apache.hadoop.fs.Path(destPath)
        val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(hPath))
          WritePath.writeDatePartitioned(batch.drop(versionCol), destPath, tsCol)
        else {
          WritePath.mergeDatePartitioned(spark, destPath, batch, keys, tsCol, versionCol)
          ()
        }
      }
      .start()
}
