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
  * re-merges to the same post-image (idempotent — asserted in
  * StreamingSpec), which is the standard recovery contract for
  * foreachBatch sinks.
  *
  * Scale posture: each micro-batch rewrites only the partitions its
  * keys touch (the merge collects the affected date set — a tiny
  * driver scalar, same role as a table-format metadata lookup).
  */
object StreamingMerge {

  /** Start a streaming merge of `events` (a streaming DataFrame with
    * `tsCol` and `versionCol`) into `destPath`, bootstrapping the
    * destination from the first batch — with the SAME last-writer-wins
    * key dedup the merge applies (a first batch carrying in-batch key
    * duplicates must not seed duplicate keys).
    *
    * `versionInSchema`: false (default) treats `versionCol` as a
    * synthetic ordering column and excludes it from the destination
    * schema; set true when the version is a real destination column
    * (e.g. an updatedAt) that must survive — required if
    * `versionCol == tsCol`.
    *
    * Bootstrap detection looks for actual parquet data files, not the
    * directory: a failed or empty first write must not wedge later
    * batches onto an unreadable merge path.
    */
  def mergeStream(events: DataFrame, destPath: String, keys: Seq[String],
                  tsCol: String, versionCol: String,
                  versionInSchema: Boolean = false): StreamingQuery = {
    require(versionCol != tsCol || versionInSchema,
      "versionCol == tsCol implies the version is a real destination column; " +
        "pass versionInSchema = true")
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hPath = new org.apache.hadoop.fs.Path(destPath)
        val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
        // committed data only: files under _temporary (or other
        // underscore/dot-prefixed dirs, which Spark's reader ignores)
        // are uncommitted task output — counting them would wedge a
        // crashed bootstrap onto an unreadable merge path
        def committed(p: org.apache.hadoop.fs.Path): Boolean = {
          var cur = p.getParent
          var ok = true
          while (ok && cur != null && cur.toString.length >= hPath.toString.length) {
            val n = cur.getName
            if (n.startsWith("_") || n.startsWith(".")) ok = false
            cur = cur.getParent
          }
          ok
        }
        val hasData = fs.exists(hPath) && {
          val it = fs.listFiles(hPath, true)
          var found = false
          while (!found && it.hasNext) {
            val f = it.next().getPath
            found = f.getName.endsWith(".parquet") && committed(f)
          }
          found
        }
        if (!hasData) {
          // last-writer-wins dedup against an empty "existing" frame
          // whose schema decides whether versionCol survives
          val empty =
            (if (versionInSchema) batch else batch.drop(versionCol)).limit(0)
          WritePath.writeDatePartitioned(
            WritePath.upsert(empty, batch, keys, versionCol), destPath, tsCol)
        } else {
          WritePath.mergeDatePartitioned(spark, destPath, batch, keys, tsCol, versionCol)
          ()
        }
      }
      .start()
  }
}
