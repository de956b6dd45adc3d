package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Relational.tsMs

/** Temporal join operators over events — the two join shapes Spark
  * lacks as builtins (SURVEY §2.3 notes the reference avoids them via
  * DISTINCT ON), built the Spark-first way: composition, not a custom
  * SparkPlan (preference (a) of the custom-operator ladder).
  */
object Temporal {

  /** q45 — range join via time binning: for each purchase, how many
    * clicks the same user made in the preceding `windowMs`.
    *
    * A naive θ-join (`c.ts BETWEEN p.ts - w AND p.ts`) plans as a
    * broadcast-nested-loop — quadratic per user at scale. Binning by
    * windowMs makes it an equi-join on (user, bin) with each probe
    * exploding to its two candidate bins, then the exact range filter.
    * The bin key is the shuffle key — linear, skew-aware via AQE.
    * The oracle states the naive θ-join; results are identical (the
    * bins are a pure superset filter).
    */
  def clicksBeforePurchase(spark: SparkSession, dir: String,
                           windowMs: Long = 1800000L): DataFrame = {
    val ev = Tables.load(spark, dir, "events").withColumn("ts_ms", tsMs("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_ms").as("p_ms"))
      .withColumn("bin", expr(s"p_ms div $windowMs"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms").as("c_ms"))
      .withColumn("bin", expr(s"c_ms div $windowMs"))
    val probed = purchases
      .withColumn("bin", explode(array(col("bin") - 1, col("bin"))))
    val counted = probed.join(clicks, Seq("user_id", "bin"))
      .filter(col("c_ms") >= col("p_ms") - windowMs && col("c_ms") < col("p_ms"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks_before"))
    purchases.select(col("purchase_id"), col("user_id"), col("p_ms"))
      .join(counted, Seq("purchase_id"), "left")
      .withColumn("n_clicks_before", coalesce(col("n_clicks_before"), lit(0L)))
      .orderBy(col("purchase_id"))
  }

  val clicksBeforePurchaseSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS p_ms
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, epoch_ms(ts) AS c_ms FROM events WHERE event_type = 'click'
      |)
      |SELECT p.purchase_id, p.user_id, p.p_ms,
      |  CAST(COUNT(c.c_ms) AS BIGINT) AS n_clicks_before
      |FROM p LEFT JOIN c ON p.user_id = c.user_id
      |  AND c.c_ms >= p.p_ms - 1800000 AND c.c_ms < p.p_ms
      |GROUP BY p.purchase_id, p.user_id, p.p_ms
      |ORDER BY p.purchase_id""".stripMargin

  /** q46 — as-of join: for each purchase, the timestamp of the same
    * user's most recent prior signup (NULL if none). Expressed as a
    * tagged single-pass window over the merged stream — one shuffle on
    * user_id, no join at all; the standard sort-merge as-of shape.
    */
  def lastSignupBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events").withColumn("ts_ms", tsMs("ts"))
      .filter(col("event_type").isin("purchase", "signup"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_signup_ms",
        last(when(col("event_type") === "signup", col("ts_ms")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_ms").as("p_ms"), col("last_signup_ms"))
      .orderBy(col("purchase_id"))
  }

  val lastSignupBeforePurchaseSql: String =
    """SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms, last_signup_ms
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_ms
      |  FROM events WHERE event_type IN ('purchase', 'signup')
      |)
      |WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin
}
