package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Streaming twin of the span-level dedup screen (q65's ingest form):
  * an incoming document stream is split into W-token spans and only
  * NOVEL spans survive — novel meaning (a) not present in the static
  * corpus span-fingerprint set and (b) not already seen earlier in
  * the stream within the watermark horizon. This is the production
  * shape of paragraph dedup: the corpus-wide batch pass (q65) runs
  * once, then ingestion screens incrementally against its output
  * instead of re-running the corpus join per crawl batch.
  *
  * Scale posture: the span explode is stateless scan-speed work; the
  * corpus screen is a stream-static left-anti join (the static side
  * re-plans per micro-batch, so a refreshed corpus snapshot is picked
  * up without restarting); the within-stream screen is
  * dropDuplicatesWithinWatermark keyed by span_fp — one state row per
  * distinct novel fingerprint, evicted once the watermark passes, so
  * state is bounded by ingest rate x horizon, not by corpus size.
  */
object StreamingSpans {

  /** Span-split a streaming doc frame (doc_id, text, ts), carrying the
    * event-time column for watermarking. Same geometry as
    * [[graft.operators.Spans.spanize]].
    */
  def spanizeStream(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), col("ts"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("ts"), col("toks"),
        explode(sequence(lit(0L),
          expr(s"(n + ${w - 1}) div $w") - 1L)).as("span_idx"))
      .select(col("doc_id"), col("ts"), col("span_idx"),
        concat_ws(" ",
          slice(col("toks"), (col("span_idx") * w + 1).cast("int"), lit(w)))
          .as("span_text"))

  /** Novel spans of the incoming stream: corpus screen then
    * within-stream first-occurrence screen. `corpusSpanFps` is a
    * static frame with a `span_fp` column (e.g. q65's kept set, or
    * all corpus span fingerprints).
    */
  def novelSpans(docs: DataFrame, corpusSpanFps: DataFrame,
                 w: Int = 20, watermark: String = "1 hour"): DataFrame =
    spanizeStream(docs, w)
      .withColumn("span_fp", md5(col("span_text")))
      .join(corpusSpanFps.select(col("span_fp")), Seq("span_fp"), "left_anti")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("span_fp")
      .select(col("doc_id"), col("span_idx"), col("span_fp"), col("span_text"))
}
