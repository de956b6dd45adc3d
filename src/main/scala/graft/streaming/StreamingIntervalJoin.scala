package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of q45's
  * range-join shape: a purchases stream enriched with the clicks the
  * same user made in the preceding `windowMs`, as Spark's native
  * watermarked stream-stream inner join. Both sides carry a
  * watermark and the join condition carries the time bound, which is
  * exactly what lets Spark EVICT join state: a buffered click older
  * than `watermark − windowMs` can never match a future purchase and
  * is dropped, so state is bounded by (rate × horizon), not by the
  * stream's life (the unbounded-state trap of an unconstrained
  * stream-stream join).
  *
  * Emitted rows are (purchase, click) pairs — the enrichment grain; a
  * downstream windowed count reproduces q45's per-purchase counts
  * (asserted in StreamingSpec against the batch operator on the same
  * replayed data, including the late-click drop).
  */
object StreamingIntervalJoin {

  /** `clicks` needs (c_user, c_id, c_ts); `purchases` needs
    * (p_user, p_id, p_ts). Inner join on user with
    * p_ts − windowMs ≤ c_ts ≤ p_ts.
    */
  def clicksBeforePurchase(clicks: DataFrame, purchases: DataFrame,
                           windowMs: Long = 3600000L,
                           delay: String = "10 seconds"): DataFrame =
    clicks.withWatermark("c_ts", delay)
      .join(purchases.withWatermark("p_ts", delay),
        col("c_user") === col("p_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMs MILLISECONDS") &&
          col("c_ts") <= col("p_ts"),
        "inner")
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("c_id"), col("c_ts"))

  /** LEFT OUTER variant, purchases driving: a purchase with no click
    * in its window emits null-padded — but only AFTER the watermark
    * proves no matching click can still arrive (the outer row is a
    * negative claim, and the engine must wait until the claim is
    * safe). StreamingSpec demonstrates exactly that deferral: no
    * output at arrival, the null-padded row at the next watermark
    * advance. The same bounded-state eviction as the inner form.
    */
  def purchasesWithClicks(clicks: DataFrame, purchases: DataFrame,
                          windowMs: Long = 3600000L,
                          delay: String = "10 seconds"): DataFrame =
    purchases.withWatermark("p_ts", delay)
      .join(clicks.withWatermark("c_ts", delay),
        col("c_user") === col("p_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMs MILLISECONDS") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("c_id"), col("c_ts"))
}
