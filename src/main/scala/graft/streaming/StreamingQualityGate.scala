package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming twin of the round-8 quality screens (q96 readability,
  * q98 script/charset profile): gate-on-ingest. Each micro-batch of
  * documents is scored by the SAME frame-parameterized cores the batch
  * queries use (`TextAnalysis.scriptSignals` / `readabilitySignals` —
  * pure codegen'd maps: no state, no shuffle, watermark-free), then
  * documents failing the gate (mojibake/control-char fraction above
  * threshold, or empty) are dropped BEFORE the partition-scoped merge,
  * so the destination only ever stores admitted documents plus their
  * audit columns. Replay idempotency is the merge's last-writer-wins
  * contract (same shape as StreamingPii): the gates are deterministic,
  * so a replayed batch re-merges to the same post-image.
  */
object StreamingQualityGate {

  /** Start the score-gate-merge stream into `destPath`; stream rows
    * need `text`, the merge `keys`, a `tsCol` date column and a
    * `versionCol` (parameters as [[StreamingMerge.mergeStream]]).
    * Admitted rows carry the audit columns (`script`, `bad_frac`,
    * `fk_grade`, `band`); the intermediate counters are dropped.
    */
  def gatedMergeStream(docs: DataFrame, destPath: String,
                       keys: Seq[String], tsCol: String, versionCol: String,
                       maxBadFrac: Double = 0.01): StreamingQuery = {
    val scored = TextAnalysis.readabilitySignals(TextAnalysis.scriptSignals(docs))
    val gated = scored
      // empty docs have NULL bad_frac AND band 'empty' — one gate each
      .filter(col("band") =!= "empty")
      .filter(col("bad_frac") <= maxBadFrac)
      .drop("n_chars_m", "n_latin", "n_cyrillic", "n_cjk", "n_arabic",
        "n_digit", "n_bad", "latin_frac", "cyrillic_frac", "cjk_frac",
        "digit_frac", "n_sentences", "n_words", "n_syllables")
    StreamingMerge.mergeStream(gated, destPath, keys, tsCol, versionCol)
  }
}
