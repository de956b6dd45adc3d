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
    * user's most recent prior signup (NULL if none). Round 10 ran
    * this as a tagged window over the merged stream; round 11 moves
    * it onto the native [[graft.plans.AsofJoinOps.asofJoin]] operator
    * (one co-partitioned exchange pair + an O(1)-state merge walk —
    * the q296 plan), which both halves the work and reuses any
    * bucketed layout shuffle-free.
    *
    * Semantics note: "prior" = STRICTLY earlier in time (the native
    * call probes at `p_ms − 1`, so `s_ms ≤ p_ms − 1 ⇔ s_ms < p_ms`),
    * and the oracle states exactly that as DuckDB's strict
    * `ASOF LEFT JOIN ... ON p_ms > s_ms`. The round-10 window form
    * instead tiebroke same-millisecond events by event_id — an
    * artifact of the merged-stream encoding, not a property anyone
    * asked for; the two differ only on same-(user, ms)
    * signup/purchase pairs, of which every SF has zero (verified),
    * so graded results are unchanged. Ties among signups at one
    * (user, ms) don't matter: the only right column kept IS the
    * tied ms.
    */
  def lastSignupBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events").withColumn("ts_ms", tsMs("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_ms").as("p_ms"))
      .withColumn("probe_ms", col("p_ms") - 1)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_ms").as("s_ms"))
    graft.plans.AsofJoinOps
      .asofJoin(purchases, signups, Seq("user_id"), "probe_ms", "s_ms")
      .select(col("purchase_id"), col("user_id"), col("p_ms"),
        col("s_ms").as("last_signup_ms"))
      .orderBy(col("purchase_id"))
  }

  val lastSignupBeforePurchaseSql: String =
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms
      |  FROM events WHERE event_type = 'purchase'
      |), s AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) AS s_ms
      |  FROM events WHERE event_type = 'signup'
      |)
      |SELECT p.purchase_id, p.user_id, p.p_ms, s.s_ms AS last_signup_ms
      |FROM p ASOF LEFT JOIN s
      |  ON p.user_id = s.user_id AND p.p_ms > s.s_ms
      |ORDER BY purchase_id""".stripMargin

  /** q85 — SCD Type-2 interval build: compress each user's event
    * stream into state-change versions — a row survives only when its
    * event_type differs from the previous event's (change detection
    * via lag), then each surviving row gets [valid_from, valid_to)
    * from the NEXT change (lead), a version number, and an is_current
    * flag on the open interval. This is the general form of the
    * reference's append-only `*History` tables (SURVEY §1.1,
    * lib.ts:303,370-375): DISTINCT ON latest-per-key (q02) reads the
    * current version; SCD2 materializes ALL versions with validity.
    *
    * Scale: both windows share one user_id hash partitioning and one
    * (ts, event_id) sort — a single exchange; the change filter runs
    * between them without re-shuffling. No joins, no state beyond
    * adjacent rows.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events").withColumn("ts_ms", tsMs("ts"))
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val changes = ev
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    changes
      .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(w2))
      .withColumn("version", row_number().over(w2))
      .withColumn("is_current", col("valid_to_ms").isNull.cast("int"))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_ms").as("valid_from_ms"), col("valid_to_ms"),
        col("version"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val scd2IntervalsSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_state
      |  FROM events
      |), changes AS (
      |  SELECT user_id, event_type, ts_ms, event_id FROM ordered
      |  WHERE prev_state IS NULL OR prev_state <> event_type
      |)
      |SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
      |  lead(ts_ms) OVER w AS valid_to_ms,
      |  CAST(row_number() OVER w AS INT) AS version,
      |  CASE WHEN lead(ts_ms) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM changes
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** q146 — order aging report: per order status × 30-day age bucket
    * (age = corpus as-of date minus order date), order count and total
    * value — the receivables/backlog staple ("how much value sits in
    * open orders older than 90 days"). The as-of date is the corpus
    * MAX order date, not wall-clock `now()`: reruns over the same data
    * must produce the same report (the determinism stance every
    * sampler here takes; the reference's now()-stamping writers are
    * the write path, not the analytics).
    *
    * Exactness: age is an exact integer epoch-day difference (both
    * engines floor-divide epoch ms); bucket = `age div 30`; totals
    * accumulate in DECIMAL(18,6). Scale: a 1-row as-of broadcast
    * against the orders scan, one partial+final aggregate into
    * ≤ |status|·(range/30) groups.
    */
  def orderAging(spark: SparkSession, dir: String,
                 bucketDays: Int = 30): DataFrame = {
    // o_orderdate is parquet TIMESTAMP_NTZ; the cast reads it as UTC
    // (the session timezone), matching DuckDB's naive epoch_ms
    val orders = Tables.load(spark, dir, "orders")
      .withColumn("um", expr("unix_micros(cast(o_orderdate as timestamp))"))
      .withColumn("day", expr("(um - pmod(um, 86400000000)) div 86400000000"))
    val asof = orders.agg(max(col("day")).as("asof_day"))
    orders.crossJoin(broadcast(asof))
      .withColumn("age_bucket",
        expr(s"(asof_day - day) div $bucketDays"))
      .groupBy(col("o_orderstatus").as("status"), col("age_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        Relational.decSum(col("o_totalprice")).as("total_value"))
      .orderBy(col("status"), col("age_bucket"))
  }

  /** q149 — supplier lead-time profile: per supplier, the exact
    * min/median/p90/max of ship-minus-order lag in whole days, plus
    * the early-ship count (negative lag — in this synthetic data a
    * real contingent, which is exactly the data-quality signal the
    * report exists to surface). The vendor-scorecard staple next to
    * q146's aging: aging says what's stuck, this says who's slow.
    *
    * Exactness: both dates collapse to epoch days by floor division
    * FIRST, then subtract — negative-safe integers in both engines
    * (ms-difference-then-divide would truncate toward zero and shift
    * every negative lag). Quantiles are q42 rank selection on a
    * (lag, orderkey, linenumber) fully-tiebroken ordering.
    *
    * Scale: one orders⋈lineitem join (orderkey-keyed), one
    * supplier-partitioned window — supplier cardinality bounds the
    * group count, not line items.
    */
  def supplierLeadTime(spark: SparkSession, dir: String): DataFrame = {
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - pmod(unix_micros(cast($c as timestamp)), 86400000000)) div 86400000000"
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        expr(dayOf("l_shipdate")).as("ship_day"))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), expr(dayOf("o_orderdate")).as("order_day"))
    val lags = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        (col("ship_day") - col("order_day")).as("lead_days"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("lead_days"), col("l_orderkey"), col("l_linenumber"))
    lags
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("l_suppkey"))))
      .groupBy(col("l_suppkey"))
      .agg(
        max(col("n")).as("n_items"),
        min(col("lead_days")).as("min_days"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("lead_days"))).as("median_days"),
        max(when(col("rn") === expr("(n * 9 + 9) div 10"), col("lead_days"))).as("p90_days"),
        max(col("lead_days")).as("max_days"),
        sum((col("lead_days") < 0).cast("long")).as("n_early"))
      .orderBy(col("l_suppkey"))
  }

  val supplierLeadTimeSql: String =
    """WITH lags AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    (epoch_ms(l_shipdate) // 86400000)
      |      - (epoch_ms(o_orderdate) // 86400000) AS lead_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), ranked AS (
      |  SELECT l_suppkey, lead_days,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY lead_days, l_orderkey, l_linenumber) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_suppkey) AS n
      |  FROM lags
      |)
      |SELECT l_suppkey, CAST(MAX(n) AS BIGINT) AS n_items,
      |  MIN(lead_days) AS min_days,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN lead_days END) AS median_days,
      |  MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN lead_days END) AS p90_days,
      |  MAX(lead_days) AS max_days,
      |  CAST(SUM(CASE WHEN lead_days < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_early
      |FROM ranked GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  def orderAgingSql(bucketDays: Int = 30): String =
    s"""WITH o AS (
      |  SELECT o_orderstatus, o_totalprice,
      |    epoch_ms(o_orderdate) // 86400000 AS day
      |  FROM orders
      |), ad AS (
      |  SELECT MAX(day) AS asof_day FROM o
      |)
      |SELECT o.o_orderstatus AS status,
      |  (ad.asof_day - o.day) // $bucketDays AS age_bucket,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM o CROSS JOIN ad
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q151 — Kaplan–Meier survival of customer activity: per customer,
    * duration = days between first and last order; the customer
    * counts as a churn EVENT if their last order predates the
    * dataset's as-of day by more than `censorDays`, otherwise they
    * are right-CENSORED (still plausibly active). The estimator walks
    * durations ascending: S(t) = Π_{t_i ≤ t} (1 − d_i / n_i), with
    * n_i = customers whose duration ≥ t_i. The churn-curve staple
    * behind retention targets — and the standard correction the naive
    * "average lifetime" number gets wrong by ignoring censoring.
    *
    * Exactness: the product is computed in log10 space with each
    * step's term rounded to 6dp and summed as DECIMAL (the q56/q103
    * log convention — order-independent, no double-association
    * drift); a d_i = n_i terminal step (everyone left dies) would be
    * log10(0), so it is carried as a cumulative zero flag instead.
    * Scale: one customer aggregate, then windows over the
    * |distinct durations|-sized step table — data-sized work is one
    * shuffle; the curve math is catalog-sized.
    */
  def kaplanMeier(spark: SparkSession, dir: String,
                  censorDays: Int = 90): DataFrame = {
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - pmod(unix_micros(cast($c as timestamp)), 86400000000)) div 86400000000"
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), expr(dayOf("o_orderdate")).as("day"))
    val subj = orders.groupBy(col("o_custkey"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val asof = orders.agg(max(col("day")).as("asof_day"))
    val s = subj.crossJoin(broadcast(asof))
      .select((col("d1") - col("d0")).as("dur"),
        when(col("d1") <= col("asof_day") - censorDays, 1L).otherwise(0L).as("ev"))
    val steps = s.groupBy(col("dur"))
      .agg(sum(col("ev")).as("d_events"),
        sum(lit(1L) - col("ev")).as("n_censored"),
        count(lit(1)).as("n_t"))
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAsc = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, 0)
    steps
      .withColumn("n_risk", sum(col("n_t")).over(wDesc))
      .withColumn("lp",
        when(col("d_events") === 0 || col("d_events") === col("n_risk"),
          lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)"))
          .otherwise(round(log10(lit(1.0) -
            col("d_events").cast("double") / col("n_risk").cast("double")), 6)
            .cast("decimal(18,6)")))
      .withColumn("hit_zero",
        max((col("d_events") === col("n_risk")).cast("int")).over(wAsc))
      .withColumn("survival",
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(round(pow(lit(10.0),
            sum(col("lp")).over(wAsc).cast("double")), 6)))
      .select(col("dur").as("t_day"), col("n_risk"), col("d_events"),
        col("n_censored"), col("survival"))
      .orderBy(col("t_day"))
  }

  def kaplanMeierSql(censorDays: Int = 90): String =
    s"""WITH d AS (
      |  SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day FROM orders
      |), ad AS (
      |  SELECT MAX(day) AS asof_day FROM d
      |), subj AS (
      |  SELECT MAX(day) - MIN(day) AS dur,
      |    CASE WHEN MAX(day) <= (SELECT asof_day FROM ad) - $censorDays
      |      THEN 1 ELSE 0 END AS ev
      |  FROM d GROUP BY o_custkey
      |), steps AS (
      |  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d_events,
      |    CAST(SUM(1 - ev) AS BIGINT) AS n_censored, COUNT(*) AS n_t
      |  FROM subj GROUP BY dur
      |), r AS (
      |  SELECT dur, d_events, n_censored,
      |    SUM(n_t) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      |  FROM steps
      |)
      |SELECT dur AS t_day, CAST(n_risk AS BIGINT) AS n_risk, d_events,
      |  n_censored,
      |  CASE WHEN MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END)
      |      OVER w = 1 THEN 0.0
      |    ELSE ROUND(POWER(10, CAST(SUM(
      |      CASE WHEN d_events = 0 OR d_events = n_risk
      |        THEN CAST(0 AS DECIMAL(18,6))
      |        ELSE CAST(ROUND(LOG10(1 - CAST(d_events AS DOUBLE) / n_risk), 6)
      |          AS DECIMAL(18,6)) END) OVER w AS DOUBLE)), 6) END AS survival
      |FROM r
      |WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY t_day""".stripMargin

  /** q318 — Nelson–Aalen cumulative hazard over the q151 risk table:
    * H(t) = Σ_{t_i ≤ t} d_i/n_i, plus the Fleming–Harrington survival
    * S_FH = e^(−H) — the estimator pair survival reporting ships next
    * to Kaplan–Meier (N–A is the less biased hazard view at small
    * risk sets, and KM vs FH divergence flags exactly those steps).
    * Identical subjects/censoring/steps machinery as q151, so the two
    * curves cannot drift apart on inputs.
    *
    * Exactness: each step's hazard increment d_i/n_i is one IEEE
    * division rounded 6dp, accumulated as DECIMAL (order-independent);
    * S_FH exponentiates the rounded cumulative — the same
    * log-space-with-6dp-terms convention as q151. Scale: one customer
    * aggregate, then windows over the distinct-duration step table.
    */
  def nelsonAalen(spark: SparkSession, dir: String,
                  censorDays: Int = 90): DataFrame = {
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - pmod(unix_micros(cast($c as timestamp)), 86400000000)) div 86400000000"
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), expr(dayOf("o_orderdate")).as("day"))
    val subj = orders.groupBy(col("o_custkey"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val asof = orders.agg(max(col("day")).as("asof_day"))
    val s = subj.crossJoin(broadcast(asof))
      .select((col("d1") - col("d0")).as("dur"),
        when(col("d1") <= col("asof_day") - censorDays, 1L).otherwise(0L).as("ev"))
    val steps = s.groupBy(col("dur"))
      .agg(sum(col("ev")).as("d_events"),
        sum(lit(1L) - col("ev")).as("n_censored"),
        count(lit(1)).as("n_t"))
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAsc = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, 0)
    steps
      .withColumn("n_risk", sum(col("n_t")).over(wDesc))
      .withColumn("hinc",
        round(col("d_events").cast("double") / col("n_risk").cast("double"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .withColumn("ch", sum(col("hinc")).over(wAsc))
      .select(col("dur").as("t_day"), col("n_risk"), col("d_events"),
        col("n_censored"),
        col("ch").cast("double").as("cum_hazard"),
        round(exp(-col("ch").cast("double")), 6).as("s_fh"))
      .orderBy(col("t_day"))
  }

  def nelsonAalenSql(censorDays: Int = 90): String =
    s"""WITH d AS (
      |  SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day FROM orders
      |), ad AS (
      |  SELECT MAX(day) AS asof_day FROM d
      |), subj AS (
      |  SELECT MAX(day) - MIN(day) AS dur,
      |    CASE WHEN MAX(day) <= (SELECT asof_day FROM ad) - $censorDays
      |      THEN 1 ELSE 0 END AS ev
      |  FROM d GROUP BY o_custkey
      |), steps AS (
      |  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d_events,
      |    CAST(SUM(1 - ev) AS BIGINT) AS n_censored, COUNT(*) AS n_t
      |  FROM subj GROUP BY dur
      |), r AS (
      |  SELECT dur, d_events, n_censored,
      |    SUM(n_t) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      |  FROM steps
      |), h AS (
      |  SELECT dur, d_events, n_censored, n_risk,
      |    SUM(CAST(ROUND(CAST(d_events AS DOUBLE) / n_risk, 6)
      |      AS DECIMAL(18,6))) OVER (ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
      |  FROM r
      |)
      |SELECT dur AS t_day, CAST(n_risk AS BIGINT) AS n_risk, d_events,
      |  n_censored,
      |  CAST(ch AS DOUBLE) AS cum_hazard,
      |  ROUND(exp(-CAST(ch AS DOUBLE)), 6) AS s_fh
      |FROM h ORDER BY t_day""".stripMargin

  /** q152 — weekly demand features per brand, on a DENSE calendar
    * spine: summed quantity per (brand, epoch-week) including
    * zero-sale weeks, with lag-1, lag-4, and a trailing 4-week mean —
    * the feature-export shape a demand-forecasting trainer consumes.
    * The spine matters: lags over only-observed weeks silently mean
    * "previous sale", not "last week", and the model trains on the
    * wrong feature.
    *
    * Exactness: weeks are floor-divided epoch days; quantity sums
    * accumulate in DECIMAL; the rolling mean divides the exact
    * decimal frame sum by the frame row count once, then rounds.
    * Scale: one lineitem aggregate (brand dim broadcast onto the
    * scan); the spine is |brands| × |weeks| — catalog-sized — and the
    * lag windows partition by brand over it.
    */
  def weeklyDemandFeatures(spark: SparkSession, dir: String): DataFrame = {
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - pmod(unix_micros(cast($c as timestamp)), 86400000000)) div 86400000000"
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        expr(s"(${dayOf("l_shipdate")}) div 7").as("week"))
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val weekly = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("week"))
      .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("qty_dec"))
    val spine = li.agg(min(col("week")).as("mn"), max(col("week")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("week"))
      .crossJoin(part.select(col("p_brand")).distinct())
    val dense = spine.join(weekly, Seq("p_brand", "week"), "left")
      .withColumn("qty_dec", coalesce(col("qty_dec"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")))
    val wk = Window.partitionBy(col("p_brand")).orderBy(col("week"))
    val frame4 = wk.rowsBetween(-3, 0)
    dense
      .withColumn("qty", col("qty_dec").cast("double"))
      .withColumn("lag_1", lag(col("qty_dec"), 1).over(wk).cast("double"))
      .withColumn("lag_4", lag(col("qty_dec"), 4).over(wk).cast("double"))
      .withColumn("rmean_4", round(
        sum(col("qty_dec")).over(frame4).cast("double") /
          count(lit(1)).over(frame4), 6))
      .select(col("p_brand"), col("week"), col("qty"), col("lag_1"),
        col("lag_4"), col("rmean_4"))
      .orderBy(col("p_brand"), col("week"))
  }

  val weeklyDemandFeaturesSql: String =
    """WITH li AS (
      |  SELECT l_partkey, l_quantity,
      |    (epoch_ms(l_shipdate) // 86400000) // 7 AS week
      |  FROM lineitem
      |), weekly AS (
      |  SELECT p_brand, week,
      |    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty_dec
      |  FROM li JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2
      |), bounds AS (
      |  SELECT MIN(week) AS mn, MAX(week) AS mx FROM li
      |), spine AS (
      |  SELECT b.p_brand, w.week
      |  FROM (SELECT DISTINCT p_brand FROM part) b
      |  CROSS JOIN (SELECT unnest(range(mn, mx + 1)) AS week FROM bounds) w
      |), dense AS (
      |  SELECT s.p_brand, s.week,
      |    COALESCE(weekly.qty_dec, CAST(0 AS DECIMAL(18,6))) AS qty_dec
      |  FROM spine s LEFT JOIN weekly
      |    ON s.p_brand = weekly.p_brand AND s.week = weekly.week
      |)
      |SELECT p_brand, week, CAST(qty_dec AS DOUBLE) AS qty,
      |  CAST(lag(qty_dec, 1) OVER w AS DOUBLE) AS lag_1,
      |  CAST(lag(qty_dec, 4) OVER w AS DOUBLE) AS lag_4,
      |  ROUND(CAST(SUM(qty_dec) OVER f AS DOUBLE)
      |    / COUNT(*) OVER f, 6) AS rmean_4
      |FROM dense
      |WINDOW w AS (PARTITION BY p_brand ORDER BY week),
      |  f AS (PARTITION BY p_brand ORDER BY week
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY p_brand, week""".stripMargin

  /** q193 — point-in-time (PIT) enrichment of purchases against the
    * q85 SCD2 state history: for every purchase event, the state the
    * user was in JUST BEFORE the purchase (the interval with
    * valid_from < t ≤ valid_to, half-open on the other side so a
    * state change at the purchase instant resolves to the state being
    * left). This is the fact→versioned-dimension lookup every
    * warehouse join does against SCD2 history — q46's as-of join
    * finds the nearest prior EVENT; this resolves against compressed
    * INTERVALS, the shape dimension history is actually stored in.
    * Purchases with no prior state (the user's first event) survive
    * with NULL state via the left join.
    *
    * Uniqueness: intervals of one user are disjoint half-open spans
    * ordered by (ts, event_id); at most one satisfies
    * from < t ≤ to (an empty same-instant interval fails from < t),
    * so the join is at-most-one — no post-dedup needed, and both
    * engines agree row-for-row.
    *
    * Scale: an EQUI-join on user_id with the containment as a
    * residual filter — a hash/sort-merge join whose per-key right
    * side is the user's CHANGE count (compressed), not their event
    * count; never a range-join nested loop. Both inputs share the
    * user_id partitioning with the q85 window that built the
    * intervals.
    */
  def pitEnrichment(spark: SparkSession, dir: String): DataFrame = {
    val iv = scd2Intervals(spark, dir)
      .select(col("user_id").as("iv_user"), col("state"),
        col("valid_from_ms"), col("valid_to_ms"), col("version"))
    val purchases = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("ts_ms", graft.operators.Relational.tsMs("ts"))
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_ms"))
    purchases.join(iv,
        col("user_id") === col("iv_user") &&
          col("valid_from_ms") < col("ts_ms") &&
          (col("valid_to_ms").isNull || col("ts_ms") <= col("valid_to_ms")),
        "left")
      .select(col("purchase_id"), col("user_id"), col("ts_ms"),
        col("state").as("prior_state"),
        col("version").as("prior_version"),
        col("valid_from_ms").as("prior_since_ms"))
      .orderBy(col("purchase_id"))
  }

  val pitEnrichmentSql: String =
    s"""WITH iv AS (
       |$scd2IntervalsSql
       |), p AS (
       |  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS ts_ms
       |  FROM events WHERE event_type = 'purchase'
       |)
       |SELECT p.purchase_id, p.user_id, p.ts_ms,
       |  iv.state AS prior_state,
       |  iv.version AS prior_version,
       |  iv.valid_from_ms AS prior_since_ms
       |FROM p LEFT JOIN iv ON iv.user_id = p.user_id
       |  AND iv.valid_from_ms < p.ts_ms
       |  AND (iv.valid_to_ms IS NULL OR p.ts_ms <= iv.valid_to_ms)
       |ORDER BY purchase_id""".stripMargin

  /** q194 — calendar gap-fill with LOCF (last observation carried
    * forward): densify each user's daily spend series to EVERY
    * calendar day between their first and last active day, carrying
    * the last observed daily total across the gaps and reporting the
    * staleness (`gap_age` = days since the carried observation).
    * The canonical feature-engineering shape for feeding regular-grid
    * models (forecasting, anomaly scoring) from sparse event logs —
    * the missing operator between raw events and q152/q172-style
    * per-day features, which silently skip absent days.
    *
    * Shape: one (user, day) aggregate, a per-user span row, a
    * `sequence()` explode to the dense grid, a left join back to the
    * observations, and one cumulative window for the carry. The fill
    * starts at each user's OWN first observation, so `v_filled` is
    * never NULL (no leading gap) and output is bounded by
    * users × span-days, not a global calendar cross-join.
    *
    * Scale: the grid explode and the carry window both partition by
    * user_id — one shuffle each, no driver calendar. Span-days is
    * bounded by the retention window (here 30 days); a 100 TB run
    * fills users × window rows, linear in users. Oracle parity: daily
    * sums accumulate DECIMAL(18,6) (order-independent); days use
    * floor-division epoch days (`Events.epochDayExpr`).
    */
  def gapFillLocf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .withColumn("day", Events.epochDayExpr)
      .groupBy(col("user_id"), col("day"))
      .agg(Relational.decSum(col("value")).as("v_obs"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("v_filled", last(col("v_obs"), ignoreNulls = true).over(w))
      .withColumn("is_observed", col("v_obs").isNotNull)
      .withColumn("gap_age",
        col("day") - last(when(col("v_obs").isNotNull, col("day")),
          ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("v_filled"),
        col("is_observed"), col("gap_age"))
      .orderBy(col("user_id"), col("day"))
  }

  val gapFillLocfSql: String =
    """WITH daily AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v_obs
      |  FROM events GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(lo, hi)) AS day
      |  FROM (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
      |        FROM daily GROUP BY user_id)
      |)
      |SELECT g.user_id, g.day,
      |  last_value(d.v_obs IGNORE NULLS) OVER w AS v_filled,
      |  d.v_obs IS NOT NULL AS is_observed,
      |  g.day - last_value(CASE WHEN d.v_obs IS NOT NULL THEN d.day END
      |                     IGNORE NULLS) OVER w AS gap_age
      |FROM grid g LEFT JOIN daily d
      |  ON g.user_id = d.user_id AND g.day = d.day
      |WINDOW w AS (PARTITION BY g.user_id ORDER BY g.day
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY g.user_id, g.day""".stripMargin

  /** q270 — log-rank test between two customer segments' survival
    * curves: q151 draws the Kaplan–Meier curve; this answers "are the
    * two segments' churn processes actually DIFFERENT?" — the standard
    * censoring-aware two-sample test (a t-test on lifetimes is wrong
    * under right-censoring; this is the instrument survival analysis
    * uses instead). At every event time: observed group-A deaths d1
    * vs the hypergeometric expectation n1·d/n and variance
    * d·n1(n−n1)(n−d)/(n²(n−1)); χ² = (ΣO−ΣE)²/ΣV on one output row.
    *
    * Exactness: per-step E and V terms are 6dp-rounded into
    * DECIMAL(18,6) accumulators (the q151/q56 aggregate-stable
    * convention — the statistic is defined WITH the 6dp step grain,
    * identical on both engines; each term is one deterministic
    * left-associated double chain from exact integer risk counts).
    * Scale: one orders scan, a custkey aggregate, then windows over
    * the |distinct durations| step table — curve math is
    * catalog-sized, like q151.
    */
  def logRank(spark: SparkSession, dir: String,
              segA: String = "AUTOMOBILE", segB: String = "BUILDING",
              censorDays: Int = 90): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - pmod(unix_micros(cast($c as timestamp)), 86400000000)) div 86400000000"
    val seg = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment").isin(segA, segB))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val d = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), expr(dayOf("o_orderdate")).as("day"))
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
    val asof = d.agg(max(col("day")).as("asof_day"))
    val subj = d.groupBy(col("o_custkey"), col("seg"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .crossJoin(broadcast(asof))
      .select(col("seg"), (col("d1") - col("d0")).as("dur"),
        when(col("d1") <= col("asof_day") - censorDays, 1L).otherwise(0L)
          .as("ev"))
    val steps = subj.groupBy(col("dur"))
      .agg(sum(when(col("seg") === segA, col("ev")).otherwise(0L)).as("d1"),
        sum(col("ev")).as("d_all"),
        sum(when(col("seg") === segA, 1L).otherwise(0L)).as("m1"),
        count(lit(1)).as("m_all"))
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val terms = steps
      .withColumn("n1", sum(col("m1")).over(wDesc))
      .withColumn("n_all", sum(col("m_all")).over(wDesc))
      .filter(col("d_all") > 0)
      .select(col("d1"),
        round(col("n1").cast("double") * col("d_all") / col("n_all"), 6)
          .cast(dec).as("e1"),
        when(col("n_all") > 1,
          round(col("d_all").cast("double") * col("n1") *
            (col("n_all") - col("n1")) * (col("n_all") - col("d_all")) /
            (col("n_all").cast("double") * col("n_all") * (col("n_all") - 1)),
            6).cast(dec))
          .otherwise(lit(java.math.BigDecimal.ZERO).cast(dec)).as("v1"))
    terms.agg(sum(col("d1")).cast("long").as("o1"),
        round(sum(col("e1")).cast("double"), 6).as("e1"),
        round(sum(col("v1")).cast("double"), 6).as("var1"),
        round((sum(col("d1")) - sum(col("e1")).cast("double")) *
          (sum(col("d1")) - sum(col("e1")).cast("double")) /
          nullif(sum(col("v1")).cast("double"), lit(0.0)), 6).as("chi2"))
  }

  def logRankSql(segA: String = "AUTOMOBILE", segB: String = "BUILDING",
                 censorDays: Int = 90): String =
    s"""WITH d AS (
       |  SELECT o.o_custkey, c.c_mktsegment AS seg,
       |    epoch_ms(o.o_orderdate) // 86400000 AS day
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  WHERE c.c_mktsegment IN ('$segA', '$segB')
       |), ad AS (SELECT MAX(day) AS asof_day FROM d
       |), subj AS (
       |  SELECT seg, MAX(day) - MIN(day) AS dur,
       |    CASE WHEN MAX(day) <= (SELECT asof_day FROM ad) - $censorDays
       |      THEN 1 ELSE 0 END AS ev
       |  FROM d GROUP BY o_custkey, seg
       |), steps AS (
       |  SELECT dur,
       |    SUM(CASE WHEN seg = '$segA' THEN ev ELSE 0 END) AS d1,
       |    SUM(ev) AS d_all,
       |    SUM(CASE WHEN seg = '$segA' THEN 1 ELSE 0 END) AS m1,
       |    COUNT(*) AS m_all
       |  FROM subj GROUP BY dur
       |), risk AS (
       |  SELECT dur, d1, d_all,
       |    SUM(m1) OVER (ORDER BY dur DESC ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS n1,
       |    SUM(m_all) OVER (ORDER BY dur DESC ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS n_all
       |  FROM steps
       |), terms AS (
       |  SELECT d1,
       |    CAST(ROUND(CAST(n1 AS DOUBLE) * d_all / n_all, 6)
       |      AS DECIMAL(18,6)) AS e1,
       |    CASE WHEN n_all > 1 THEN CAST(ROUND(
       |      CAST(d_all AS DOUBLE) * n1 * (n_all - n1) * (n_all - d_all)
       |        / (CAST(n_all AS DOUBLE) * n_all * (n_all - 1)), 6)
       |      AS DECIMAL(18,6))
       |      ELSE CAST(0 AS DECIMAL(18,6)) END AS v1
       |  FROM risk WHERE d_all > 0
       |)
       |SELECT CAST(SUM(d1) AS BIGINT) AS o1,
       |  ROUND(CAST(SUM(e1) AS DOUBLE), 6) AS e1,
       |  ROUND(CAST(SUM(v1) AS DOUBLE), 6) AS var1,
       |  ROUND((SUM(d1) - CAST(SUM(e1) AS DOUBLE))
       |      * (SUM(d1) - CAST(SUM(e1) AS DOUBLE))
       |    / NULLIF(CAST(SUM(v1) AS DOUBLE), 0.0), 6) AS chi2
       |FROM terms""".stripMargin

  /** q455 — state sojourn distribution off the q85 SCD2 intervals:
    * per state, how long entities actually STAY in it (closed
    * intervals only; open current intervals are counted separately,
    * never given a fake duration) — min / median / mean / max sojourn
    * plus the closed/open split. The dwell-time readout behind every
    * "how long does a user stay in onboarding" product question and
    * the holding-time matrix a semi-Markov model (q92's transitions
    * price WHERE you go; this prices HOW LONG you sat).
    *
    * Exactness: sojourns are integer millisecond differences; the
    * median is an exact lower-median rank pick (fully tiebroken by
    * (duration, user, version)); the mean is one decimal-sum
    * division.
    *
    * Scale: q85's one window pass (change-sized intervals), then a
    * |states|-row aggregate with one rank window over the interval
    * frame.
    */
  def stateSojourn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val iv = scd2Intervals(spark, dir)
    val closed = iv.filter(col("valid_to_ms").isNotNull)
      .withColumn("dur_ms", col("valid_to_ms") - col("valid_from_ms"))
    val wMed = Window.partitionBy(col("state"))
      .orderBy(col("dur_ms"), col("user_id"), col("version"))
    val med = closed
      .withColumn("rn", row_number().over(wMed))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("state"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("state"), col("dur_ms").as("median_ms"))
    val openCounts = iv.groupBy(col("state"))
      .agg(sum(col("is_current")).as("n_open"))
    closed.groupBy(col("state"))
      .agg(count(lit(1)).as("n_closed"),
        min(col("dur_ms")).as("min_ms"),
        max(col("dur_ms")).as("max_ms"),
        round(sum(col("dur_ms").cast(dec)).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_ms"))
      .join(broadcast(med), "state")
      .join(broadcast(openCounts), "state")
      .select(col("state"), col("n_closed"), col("n_open"),
        col("min_ms"), col("median_ms"), round(col("mean_ms"), 6)
          .as("mean_ms"), col("max_ms"))
      .orderBy(col("state"))
  }

  val stateSojournSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_state
      |  FROM events
      |), changes AS (
      |  SELECT user_id, event_type, ts_ms, event_id FROM ordered
      |  WHERE prev_state IS NULL OR prev_state <> event_type
      |), iv AS (
      |  SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
      |    lead(ts_ms) OVER w AS valid_to_ms,
      |    CAST(row_number() OVER w AS INT) AS version,
      |    CASE WHEN lead(ts_ms) OVER w IS NULL THEN 1 ELSE 0 END
      |      AS is_current
      |  FROM changes
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |), closed AS (
      |  SELECT state, user_id, version,
      |    valid_to_ms - valid_from_ms AS dur_ms
      |  FROM iv WHERE valid_to_ms IS NOT NULL
      |), med AS (
      |  SELECT state, dur_ms AS median_ms FROM (
      |    SELECT state, dur_ms,
      |      row_number() OVER (PARTITION BY state
      |        ORDER BY dur_ms, user_id, version) AS rn,
      |      COUNT(*) OVER (PARTITION BY state) AS n
      |    FROM closed
      |  ) WHERE rn = (n + 1) // 2
      |), opens AS (
      |  SELECT state, CAST(SUM(is_current) AS BIGINT) AS n_open
      |  FROM iv GROUP BY 1
      |), agg AS (
      |  SELECT state, CAST(COUNT(*) AS BIGINT) AS n_closed,
      |    CAST(MIN(dur_ms) AS BIGINT) AS min_ms,
      |    CAST(MAX(dur_ms) AS BIGINT) AS max_ms,
      |    ROUND(CAST(SUM(CAST(dur_ms AS DECIMAL(28,6))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE), 6) AS mean_ms
      |  FROM closed GROUP BY 1
      |)
      |SELECT a.state, a.n_closed, o.n_open, a.min_ms, m.median_ms,
      |  ROUND(a.mean_ms, 6) AS mean_ms, a.max_ms
      |FROM agg a
      |JOIN med m ON m.state = a.state
      |JOIN opens o ON o.state = a.state
      |ORDER BY a.state""".stripMargin

  /** q296 — as-of join through the NATIVE custom operator
    * ([[graft.plans.AsofJoinExec]] — LogicalPlan + Strategy +
    * SparkPlan, SURVEY §2 tier (c)): each purchase joined to the same
    * user's most recent signup AT OR BEFORE it, graded against
    * DuckDB's built-in `ASOF LEFT JOIN` — engine-native operator on
    * both sides, same relation. q46 routes through this operator too
    * (since r11); q45 documents the composed union+window fallback.
    *
    * Determinism: the right side pre-aggregates to one row per
    * (user, ms) (max signup_id), making the as-of pick unique — the
    * documented tie discipline of both engines' operators.
    *
    * Scale: one clustered exchange + sort per side (EnsureRequirements
    * plans them; bucketed inputs would join shuffle-free), then an
    * O(1)-state per-partition merge — no union shuffle, no window
    * frame, no row buffering.
    */
  def asofNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ms", Relational.tsMs("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ms").as("p_ms"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ms").as("s_ms"))
      .agg(max(col("event_id")).as("signup_id"))
    graft.plans.AsofJoinOps
      .asofJoin(purchases, signups, Seq("user_id"), "p_ms", "s_ms")
      .select(col("purchase_id"), col("user_id"), col("p_ms"),
        col("s_ms").as("last_signup_ms"), col("signup_id"))
      .orderBy(col("purchase_id"))
  }

  /** q298 — SCD2 point-in-time state lookup through the native as-of
    * operator: every purchase resolved to the SCD2 state version
    * (q85's intervals) valid AT its timestamp — the "what did the
    * warehouse believe about this user when the order landed" probe
    * every PIT-correct feature store runs. Composition:
    * [[graft.plans.AsofJoinOps.pointInInterval]] = as-of on the
    * interval start + the [start, end) filter; since q85's intervals
    * tile each user's timeline with no gaps from the first event on,
    * every purchase AT or after its user's first event matches.
    *
    * Scale: intervals are change-count-sized (far below events); the
    * probe is the operator's clustered-merge — and on a bucketed
    * feature store the whole lookup is shuffle-free (PlansSpec).
    */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    // two changes in the same millisecond produce an EMPTY interval
    // [t, t) ahead of the real one — drop it (it can never match a
    // probe) so the as-of pick at start-time ties is deterministic
    val wFrom = Window.partitionBy(col("user_id"), col("valid_from_ms"))
      .orderBy(col("version").desc)
    val intervals = scd2Intervals(spark, dir)
      .select(col("user_id"), col("state"), col("valid_from_ms"),
        col("valid_to_ms"), col("version"))
      .withColumn("rn", row_number().over(wFrom))
      .filter(col("rn") === 1).drop("rn")
    val purchases = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        Relational.tsMs("ts").as("p_ms"))
    graft.plans.AsofJoinOps.pointInInterval(purchases, intervals,
        Seq("user_id"), "p_ms", "valid_from_ms", "valid_to_ms")
      .select(col("purchase_id"), col("user_id"), col("p_ms"),
        col("state"), col("version"))
      .orderBy(col("purchase_id"))
  }

  val scd2LookupSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_state
      |  FROM events
      |), changes AS (
      |  SELECT user_id, event_type, ts_ms, event_id FROM ordered
      |  WHERE prev_state IS NULL OR prev_state <> event_type
      |), iv AS (
      |  SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
      |    lead(ts_ms) OVER w AS valid_to_ms,
      |    CAST(row_number() OVER w AS INT) AS version
      |  FROM changes
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |), p AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.purchase_id, p.user_id, p.p_ms, iv.state, iv.version
      |FROM p LEFT JOIN iv
      |  ON iv.user_id = p.user_id AND iv.valid_from_ms <= p.p_ms
      |  AND (iv.valid_to_ms IS NULL OR p.p_ms < iv.valid_to_ms)
      |ORDER BY purchase_id""".stripMargin

  /** q304 — order-day streaks (gaps-and-islands over the calendar):
    * per customer, the LONGEST run of consecutive order days and the
    * run count — the classic retention shape ("how sticky is this
    * account") computed with the day − dense_rank island key: within
    * a customer's distinct order days, consecutive days share
    * (day − rank), so one window pass + one island aggregate does it,
    * no self-joins, no recursion. Top rows by (longest streak DESC)
    * with full tiebreaks.
    *
    * Scale: one distinct on (customer, day) — calendar-bounded — then
    * one customer-keyed window and two tiny aggregates; the single
    * shuffle key is o_custkey.
    */
  def orderDayStreaks(spark: SparkSession, dir: String,
                      topN: Int = 100): DataFrame = {
    val days = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("datediff(o_orderdate, DATE '1970-01-01')").as("day"))
      .distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
    val islands = days
      .withColumn("island", col("day") - dense_rank().over(w))
      .groupBy(col("o_custkey"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    islands.groupBy(col("o_custkey"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_order_days"),
        max(struct(col("len"), col("start_day"))).getField("start_day")
          .as("best_start_day"))
      .orderBy(col("longest_streak").desc, col("n_order_days").desc,
        col("o_custkey"))
      .limit(topN)
  }

  def orderDayStreaksSql(topN: Int = 100): String =
    s"""WITH days AS (
       |  SELECT DISTINCT o_custkey,
       |    datediff('day', DATE '1970-01-01', o_orderdate) AS day
       |  FROM orders
       |), islands AS (
       |  SELECT o_custkey, island,
       |    CAST(COUNT(*) AS BIGINT) AS len,
       |    MIN(day) AS start_day
       |  FROM (
       |    SELECT o_custkey, day,
       |      day - dense_rank() OVER (PARTITION BY o_custkey
       |        ORDER BY day) AS island
       |    FROM days)
       |  GROUP BY 1, 2
       |)
       |SELECT o_custkey,
       |  CAST(MAX(len) AS BIGINT) AS longest_streak,
       |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
       |  CAST(SUM(len) AS BIGINT) AS n_order_days,
       |  CAST((MAX({'len': len, 'start_day': start_day})).start_day
       |    AS BIGINT) AS best_start_day
       |FROM islands
       |GROUP BY o_custkey
       |ORDER BY longest_streak DESC, n_order_days DESC, o_custkey
       |LIMIT $topN""".stripMargin

  /** q338 — FORWARD as-of through the native operator: for each
    * click, the same user's NEXT purchase at-or-after the click — the
    * conversion-latency probe (q46/q296 look back to causes; this
    * looks forward to outcomes). Round 10 shipped only backward
    * as-of, so q313's caliper path emulated forward by negating
    * timestamps through a second pass; the first-class direction flag
    * (round-10 verdict item 7) makes this ONE co-partitioned merge.
    *
    * Determinism: purchases dedup to unique (user_id, p_ms) with the
    * MIN event id — forward picks the FIRST among sort-order ties, so
    * the pick is stated identically on both engines.
    */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ms", tsMs("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ms").as("c_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ms").as("p_ms"))
      .agg(min(col("event_id")).as("purchase_id"))
    graft.plans.AsofJoinOps
      .asofJoin(clicks, purchases, Seq("user_id"), "c_ms", "p_ms",
        direction = "forward")
      .select(col("click_id"), col("user_id"), col("c_ms"),
        col("p_ms").as("next_purchase_ms"), col("purchase_id"),
        (col("p_ms") - col("c_ms")).as("lag_ms"))
      .orderBy(col("click_id"))
  }

  val asofForwardSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type
      |  FROM events
      |), c AS (
      |  SELECT event_id AS click_id, user_id, ms AS c_ms
      |  FROM ev WHERE event_type = 'click'
      |), p AS (
      |  SELECT user_id, ms AS p_ms,
      |    CAST(MIN(event_id) AS BIGINT) AS purchase_id
      |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2
      |)
      |SELECT c.click_id, c.user_id, c.c_ms,
      |  p.p_ms AS next_purchase_ms, p.purchase_id,
      |  p.p_ms - c.c_ms AS lag_ms
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.c_ms <= p.p_ms
      |ORDER BY click_id""".stripMargin

  /** q339 — backward as-of with a TOLERANCE (max-gap): q296's
    * signup→purchase attribution, but a signup only counts when it
    * happened within `tolMs` before the purchase — the attribution-
    * window semantics every marketing pipeline applies ("credit the
    * signup only if recent"). Tolerance never changes WHICH right row
    * is closest, so the oracle states it as a post-filter on the
    * matched gap — the proof the operator's in-merge check is pure
    * pushdown, not a semantic fork.
    */
  def asofTolerance(spark: SparkSession, dir: String,
                    tolMs: Long = 30L * 86400000L): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ms", tsMs("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ms").as("p_ms"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ms").as("s_ms"))
      .agg(max(col("event_id")).as("signup_id"))
    graft.plans.AsofJoinOps
      .asofJoin(purchases, signups, Seq("user_id"), "p_ms", "s_ms",
        tolerance = Some(tolMs))
      .select(col("purchase_id"), col("user_id"), col("p_ms"),
        col("s_ms").as("recent_signup_ms"), col("signup_id"),
        (col("p_ms") - col("s_ms")).as("gap_ms"))
      .orderBy(col("purchase_id"))
  }

  def asofToleranceSql(tolMs: Long = 30L * 86400000L): String =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type
       |  FROM events
       |), p AS (
       |  SELECT event_id AS purchase_id, user_id, ms AS p_ms
       |  FROM ev WHERE event_type = 'purchase'
       |), s AS (
       |  SELECT user_id, ms AS s_ms,
       |    CAST(MAX(event_id) AS BIGINT) AS signup_id
       |  FROM ev WHERE event_type = 'signup' GROUP BY 1, 2
       |), m AS (
       |  SELECT p.purchase_id, p.user_id, p.p_ms, s.s_ms, s.signup_id
       |  FROM p ASOF LEFT JOIN s
       |    ON p.user_id = s.user_id AND p.p_ms >= s.s_ms
       |)
       |SELECT purchase_id, user_id, p_ms,
       |  CASE WHEN p_ms - s_ms <= $tolMs THEN s_ms END AS recent_signup_ms,
       |  CASE WHEN p_ms - s_ms <= $tolMs THEN signup_id END AS signup_id,
       |  CASE WHEN p_ms - s_ms <= $tolMs THEN p_ms - s_ms END AS gap_ms
       |FROM m
       |ORDER BY purchase_id""".stripMargin

  /** q340 — NEAREST as-of with tolerance: each view event matched to
    * the same user's closest purchase in EITHER direction (exact-tie
    * → backward), provided the gap is within `tolMs` — the
    * "what purchase is this impression about" heuristic when intent
    * can precede or follow the view. The oracle composes it from the
    * two directional ASOF joins and picks the closer side — the
    * native node does it in the SAME single merge as backward (the
    * stopped-at head row IS the forward candidate; zero extra cost).
    */
  def asofNearest(spark: SparkSession, dir: String,
                  tolMs: Long = 7L * 86400000L): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ms", tsMs("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ms").as("v_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("p_ms")).distinct()
    graft.plans.AsofJoinOps
      .asofJoin(views, purchases, Seq("user_id"), "v_ms", "p_ms",
        direction = "nearest", tolerance = Some(tolMs))
      .select(col("view_id"), col("user_id"), col("v_ms"),
        col("p_ms").as("nearest_purchase_ms"),
        abs(col("v_ms") - col("p_ms")).as("gap_ms"))
      .orderBy(col("view_id"))
  }

  def asofNearestSql(tolMs: Long = 7L * 86400000L): String =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type
       |  FROM events
       |), v AS (
       |  SELECT event_id AS view_id, user_id, ms AS v_ms
       |  FROM ev WHERE event_type = 'view'
       |), p AS (
       |  SELECT DISTINCT user_id, ms AS p_ms
       |  FROM ev WHERE event_type = 'purchase'
       |), b AS (
       |  SELECT v.view_id,
       |    CASE WHEN v.v_ms - p.p_ms <= $tolMs THEN p.p_ms END AS p_ms
       |  FROM v ASOF LEFT JOIN p
       |    ON v.user_id = p.user_id AND v.v_ms >= p.p_ms
       |), f AS (
       |  SELECT v.view_id,
       |    CASE WHEN p.p_ms - v.v_ms <= $tolMs THEN p.p_ms END AS p_ms
       |  FROM v ASOF LEFT JOIN p
       |    ON v.user_id = p.user_id AND v.v_ms <= p.p_ms
       |)
       |SELECT v.view_id, v.user_id, v.v_ms,
       |  CASE
       |    WHEN b.p_ms IS NOT NULL AND (f.p_ms IS NULL
       |      OR v.v_ms - b.p_ms <= f.p_ms - v.v_ms) THEN b.p_ms
       |    ELSE f.p_ms
       |  END AS nearest_purchase_ms,
       |  ABS(v.v_ms - CASE
       |    WHEN b.p_ms IS NOT NULL AND (f.p_ms IS NULL
       |      OR v.v_ms - b.p_ms <= f.p_ms - v.v_ms) THEN b.p_ms
       |    ELSE f.p_ms
       |  END) AS gap_ms
       |FROM v
       |JOIN b ON b.view_id = v.view_id
       |JOIN f ON f.view_id = v.view_id
       |ORDER BY v.view_id""".stripMargin

  /** q345 — the SAME relation as q296 through the BROADCAST as-of
    * path ([[graft.plans.AsofJoinOps.asofJoinBroadcast]]): signups
    * collapse to per-user sorted time arrays riding a broadcast hash
    * join; each purchase resolves its match with the codegen'd
    * SortedFloorIndex binary search. The shared oracle
    * ([[asofNativeSql]]) is the proof the two physical paths compute
    * one relation — the q69/q61 and q104/q29 pattern. At 100 TB this
    * is THE plan when the right side is dimension-sized: the purchase
    * fact stream is never shuffled or sorted (PlansSpec pins zero
    * exchanges on the left).
    */
  def asofBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ms", Relational.tsMs("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ms").as("p_ms"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ms").as("s_ms"))
      .agg(max(col("event_id")).as("signup_id"))
    graft.plans.AsofJoinOps
      .asofJoinBroadcast(purchases, signups, Seq("user_id"), "p_ms", "s_ms")
      .select(col("purchase_id"), col("user_id"), col("p_ms"),
        col("s_ms").as("last_signup_ms"), col("signup_id"))
      .orderBy(col("purchase_id"))
  }

  val asofNativeSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type
      |  FROM events
      |), p AS (
      |  SELECT event_id AS purchase_id, user_id, ms AS p_ms
      |  FROM ev WHERE event_type = 'purchase'
      |), s AS (
      |  SELECT user_id, ms AS s_ms,
      |    CAST(MAX(event_id) AS BIGINT) AS signup_id
      |  FROM ev WHERE event_type = 'signup' GROUP BY 1, 2
      |)
      |SELECT p.purchase_id, p.user_id, p.p_ms,
      |  s.s_ms AS last_signup_ms, s.signup_id
      |FROM p ASOF LEFT JOIN s
      |  ON p.user_id = s.user_id AND p.p_ms >= s.s_ms
      |ORDER BY purchase_id""".stripMargin

  /** q334 — order backlog curve: for every calendar day, how many
    * orders are OPEN (placed but not yet fully shipped — completion =
    * the order's LAST lineitem ship date) and how many tokens of
    * work-in-flight that represents in value terms. The classic
    * operations burn-down: cumulative opens minus cumulative
    * completions on a dense day spine, peak backlog visible as the
    * curve's max. Orders with no lineitems never complete and carry
    * to the horizon (counted, not hidden).
    *
    * Scale: one order-keyed max over lineitem (the only data-sized
    * shuffle), two day-grain histograms, a dense calendar spine with
    * two cumulative windows — calendar-bounded after the first
    * aggregate. Exactness: day arithmetic and counts are integers.
    */
  def backlogCurve(spark: SparkSession, dir: String): DataFrame = {
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - pmod(unix_micros(cast($c as timestamp)), 86400000000)) div 86400000000"
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), expr(dayOf("o_orderdate")).as("open_day"))
    val done = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(max(expr(dayOf("l_shipdate"))).as("done_day"))
    val joined = orders.join(done, Seq("o_orderkey"), "left")
      .localCheckpoint() // consumers: bounds + two histograms
    val opens = joined.groupBy(col("open_day").as("day"))
      .agg(count(lit(1)).as("n_open"))
    val closes = joined.filter(col("done_day").isNotNull)
      .groupBy(col("done_day").as("day"))
      .agg(count(lit(1)).as("n_done"))
    val bounds = joined.agg(min(col("open_day")).as("d0"),
      greatest(max(col("open_day")), max(col("done_day"))).as("d1"))
    val spine = bounds.select(
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine
      .join(opens, Seq("day"), "left")
      .join(closes, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_open"), lit(0L)).as("n_opened"),
        coalesce(col("n_done"), lit(0L)).as("n_completed"))
      .withColumn("backlog",
        sum(col("n_opened")).over(w) - sum(col("n_completed")).over(w))
      .orderBy(col("day"))
  }

  val backlogCurveSql: String =
    """WITH orders0 AS (
      |  SELECT o_orderkey, epoch_ms(o_orderdate) // 86400000 AS open_day
      |  FROM orders
      |), done AS (
      |  SELECT l_orderkey AS o_orderkey,
      |    MAX(epoch_ms(l_shipdate) // 86400000) AS done_day
      |  FROM lineitem GROUP BY 1
      |), joined AS (
      |  SELECT o.o_orderkey, o.open_day, d.done_day
      |  FROM orders0 o LEFT JOIN done d USING (o_orderkey)
      |), opens AS (
      |  SELECT open_day AS day, CAST(COUNT(*) AS BIGINT) AS n_open
      |  FROM joined GROUP BY 1
      |), closes AS (
      |  SELECT done_day AS day, CAST(COUNT(*) AS BIGINT) AS n_done
      |  FROM joined WHERE done_day IS NOT NULL GROUP BY 1
      |), bounds AS (
      |  SELECT MIN(open_day) AS d0,
      |    GREATEST(MAX(open_day), MAX(done_day)) AS d1
      |  FROM joined
      |), spine AS (
      |  SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds
      |)
      |SELECT s.day,
      |  COALESCE(o.n_open, 0) AS n_opened,
      |  COALESCE(c.n_done, 0) AS n_completed,
      |  CAST(SUM(COALESCE(o.n_open, 0)) OVER w
      |    - SUM(COALESCE(c.n_done, 0)) OVER w AS BIGINT) AS backlog
      |FROM spine s
      |LEFT JOIN opens o ON o.day = s.day
      |LEFT JOIN closes c ON c.day = s.day
      |WINDOW w AS (ORDER BY s.day
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY s.day""".stripMargin

  /** q313 — 1-NN caliper matching with an ATT readout (propensity-
    * score-matching shape): treated customers (one market segment)
    * match the nearest control on the score axis (integer account-
    * balance cents) WITHIN their nation block, with-replacement,
    * caliper-bounded; the matched sample reads out mean outcomes
    * (lifetime order revenue) and the average treatment effect on the
    * treated. The nearest-on-a-sorted-axis step is TWO passes of the
    * native as-of operator (backward = greatest control score ≤
    * treated; forward = the same operator on negated scores), so the
    * matching inherits the as-of join's clustered-merge scaling —
    * nearest-neighbor matching IS an as-of join, which is why the
    * operator was worth owning.
    *
    * Exactness: scores are integer cents, distances integer, ties
    * break to the backward (lower-score) control, then min custkey
    * (control ties pre-deduped per (nation, score)); outcome sums
    * accumulate as DECIMAL(18,6); each mean/ATT is one IEEE division
    * rounded 6dp. Scale: controls dedupe to one row per (block,
    * score); both as-of passes are key-clustered merges; the outcome
    * join is customer-keyed. Nothing is quadratic in block size.
    */
  def caliperMatching(spark: SparkSession, dir: String,
                      segment: String = "BUILDING",
                      caliperCents: Long = 5000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("s"),
        (col("c_mktsegment") === segment).as("treated"))
    val outcome = cust.select(col("c_custkey"))
      .join(Tables.load(spark, dir, "orders")
          .select(col("o_custkey").as("c_custkey"),
            col("o_totalprice").cast(DecimalType(18, 6)).as("p")),
        Seq("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(coalesce(sum(col("p")),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 6))).as("outc"))
    val treatedDf = cust.filter(col("treated"))
      .select(col("c_custkey").as("t_id"), col("c_nationkey"), col("s"))
    val controls = cust.filter(!col("treated"))
      .groupBy(col("c_nationkey"), col("s").as("cs"))
      .agg(min(col("c_custkey")).as("ctl"))
      .select(col("c_nationkey"), col("cs"), col("ctl"))
    val back = graft.plans.AsofJoinOps.asofJoin(
        treatedDf, controls.select(col("c_nationkey"),
          col("cs").as("csb"), col("ctl").as("cb")),
        Seq("c_nationkey"), "s", "csb")
      .select(col("t_id"), col("c_nationkey"), col("s"),
        col("cb"), col("csb"))
    val fwd = graft.plans.AsofJoinOps.asofJoin(
        treatedDf.withColumn("ns", -col("s")),
        controls.select(col("c_nationkey"), (-col("cs")).as("ncs"),
          col("cs").as("csf"), col("ctl").as("cf")),
        Seq("c_nationkey"), "ns", "ncs")
      .select(col("t_id"), col("cf"), col("csf"))
    val db = col("s") - col("csb")
    val df_ = col("csf") - col("s")
    val condB = col("csb").isNotNull && db <= caliperCents &&
      (col("csf").isNull || db <= df_)
    val matched = back.join(fwd, Seq("t_id"))
      .withColumn("mt",
        when(condB, col("cb"))
          .when(col("csf").isNotNull && df_ <= caliperCents, col("cf")))
    val scored = matched
      .join(outcome.select(col("c_custkey").as("t_id"),
        col("outc").as("outc_t")), Seq("t_id"))
      .join(outcome.select(col("c_custkey").as("mt"),
        col("outc").as("outc_c")), Seq("mt"), "left")
    scored.groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_treated"),
        count(col("mt")).as("n_matched"),
        sum(when(col("mt").isNotNull, col("outc_t"))).as("st"),
        sum(when(col("mt").isNotNull, col("outc_c"))).as("sc"))
      .select(col("c_nationkey"), col("n_treated"), col("n_matched"),
        when(col("n_matched") > 0,
          round(col("st").cast("double") / col("n_matched"), 6))
          .as("mean_treated"),
        when(col("n_matched") > 0,
          round(col("sc").cast("double") / col("n_matched"), 6))
          .as("mean_control"),
        when(col("n_matched") > 0,
          round((col("st") - col("sc")).cast("double") / col("n_matched"), 6))
          .as("att"))
      .orderBy(col("c_nationkey"))
  }

  def caliperMatchingSql(segment: String = "BUILDING",
                         caliperCents: Long = 5000L): String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_nationkey,
       |    CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS s,
       |    c_mktsegment = '$segment' AS treated
       |  FROM customer
       |), outcome AS (
       |  SELECT c.c_custkey,
       |    COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))),
       |      CAST(0 AS DECIMAL(18,6))) AS outc
       |  FROM cust c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       |  GROUP BY 1
       |), t AS (
       |  SELECT c_custkey AS t_id, c_nationkey, s FROM cust WHERE treated
       |), c0 AS (
       |  SELECT c_nationkey, s AS cs, MIN(c_custkey) AS ctl
       |  FROM cust WHERE NOT treated GROUP BY 1, 2
       |), back AS (
       |  SELECT t.t_id, t.c_nationkey, t.s, c.ctl AS cb, c.cs AS csb
       |  FROM t ASOF LEFT JOIN c0 c
       |    ON t.c_nationkey = c.c_nationkey AND t.s >= c.cs
       |), fwd AS (
       |  SELECT t.t_id, c.ctl AS cf, c.cs AS csf
       |  FROM t ASOF LEFT JOIN c0 c
       |    ON t.c_nationkey = c.c_nationkey AND t.s <= c.cs
       |), matched AS (
       |  SELECT b.t_id, b.c_nationkey,
       |    CASE
       |      WHEN b.csb IS NOT NULL AND b.s - b.csb <= $caliperCents
       |        AND (f.csf IS NULL OR b.s - b.csb <= f.csf - b.s) THEN b.cb
       |      WHEN f.csf IS NOT NULL AND f.csf - b.s <= $caliperCents
       |        THEN f.cf
       |    END AS mt
       |  FROM back b JOIN fwd f USING (t_id)
       |), scored AS (
       |  SELECT m.c_nationkey, m.mt, ot.outc AS outc_t, oc.outc AS outc_c
       |  FROM matched m
       |  JOIN outcome ot ON ot.c_custkey = m.t_id
       |  LEFT JOIN outcome oc ON oc.c_custkey = m.mt
       |)
       |SELECT c_nationkey,
       |  CAST(COUNT(*) AS BIGINT) AS n_treated,
       |  CAST(COUNT(mt) AS BIGINT) AS n_matched,
       |  CASE WHEN COUNT(mt) > 0 THEN ROUND(
       |    CAST(SUM(CASE WHEN mt IS NOT NULL THEN outc_t END) AS DOUBLE)
       |      / COUNT(mt), 6) END AS mean_treated,
       |  CASE WHEN COUNT(mt) > 0 THEN ROUND(
       |    CAST(SUM(CASE WHEN mt IS NOT NULL THEN outc_c END) AS DOUBLE)
       |      / COUNT(mt), 6) END AS mean_control,
       |  CASE WHEN COUNT(mt) > 0 THEN ROUND(
       |    CAST(SUM(CASE WHEN mt IS NOT NULL THEN outc_t END)
       |      - SUM(CASE WHEN mt IS NOT NULL THEN outc_c END) AS DOUBLE)
       |      / COUNT(mt), 6) END AS att
       |FROM scored
       |GROUP BY c_nationkey
       |ORDER BY c_nationkey""".stripMargin

  /** q392 — time-travel snapshot diff over the SCD2 dimension: the
    * per-user state at T₁ (40% of the time range) against the state
    * at T₂ (80%), rolled into the (state_t1 → state_t2) transition
    * matrix with user counts — "what changed between these two
    * snapshots", the question every lakehouse time-travel feature
    * exists to answer, computed here from q85's interval table
    * without storing either snapshot. Users whose history starts
    * after a probe time surface as `(none)` — the added-since-T₁
    * diagonal a reconciliation report needs.
    *
    * Exactness: probe times are integer ms arithmetic off the corpus
    * bounds (both engines floor); state-at-T is interval containment
    * on the deduplicated intervals (q298's empty-interval drop, so a
    * same-millisecond double change cannot yield two states); counts
    * are integers.
    *
    * Scale: intervals are change-count-sized; each probe is one
    * filter over them (no per-user window), the diff one full-outer
    * user join + a |states|²-bounded aggregate.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val wFrom = Window.partitionBy(col("user_id"), col("valid_from_ms"))
      .orderBy(col("version").desc)
    val iv = scd2Intervals(spark, dir)
      .select(col("user_id"), col("state"), col("valid_from_ms"),
        col("valid_to_ms"), col("version"))
      .withColumn("rn", row_number().over(wFrom))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint() // probed twice (T1 and T2)
    val bounds = Tables.load(spark, dir, "events")
      .agg(min(Relational.tsMs("ts")).as("a"),
        max(Relational.tsMs("ts")).as("b"))
      .select(expr("a + ((b - a) * 2) div 5").as("t1"),
        expr("a + ((b - a) * 4) div 5").as("t2"))
    def stateAt(t: String, out: String): DataFrame =
      iv.crossJoin(broadcast(bounds))
        .filter(col("valid_from_ms") <= col(t) &&
          (col("valid_to_ms").isNull || col(t) < col("valid_to_ms")))
        .select(col("user_id"), col("state").as(out))
    stateAt("t1", "s1").join(stateAt("t2", "s2"), Seq("user_id"),
        "full_outer")
      .select(coalesce(col("s1"), lit("(none)")).as("state_t1"),
        coalesce(col("s2"), lit("(none)")).as("state_t2"))
      .groupBy(col("state_t1"), col("state_t2"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("is_changed",
        (col("state_t1") =!= col("state_t2")).cast("int"))
      .orderBy(col("state_t1"), col("state_t2"))
  }

  val snapshotDiffSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_state
      |  FROM events
      |), changes AS (
      |  SELECT user_id, event_type, ts_ms, event_id FROM ordered
      |  WHERE prev_state IS NULL OR prev_state <> event_type
      |), iv0 AS (
      |  SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
      |    lead(ts_ms) OVER w AS valid_to_ms,
      |    CAST(row_number() OVER w AS INT) AS version
      |  FROM changes
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |), iv AS (
      |  SELECT user_id, state, valid_from_ms, valid_to_ms FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, valid_from_ms
      |      ORDER BY version DESC) AS rn
      |    FROM iv0
      |  ) WHERE rn = 1
      |), bounds AS (
      |  SELECT MIN(epoch_ms(ts)) + ((MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)))
      |      * 2) // 5 AS t1,
      |    MIN(epoch_ms(ts)) + ((MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)))
      |      * 4) // 5 AS t2
      |  FROM events
      |), s1 AS (
      |  SELECT i.user_id, i.state FROM iv i CROSS JOIN bounds b
      |  WHERE i.valid_from_ms <= b.t1
      |    AND (i.valid_to_ms IS NULL OR b.t1 < i.valid_to_ms)
      |), s2 AS (
      |  SELECT i.user_id, i.state FROM iv i CROSS JOIN bounds b
      |  WHERE i.valid_from_ms <= b.t2
      |    AND (i.valid_to_ms IS NULL OR b.t2 < i.valid_to_ms)
      |)
      |SELECT COALESCE(s1.state, '(none)') AS state_t1,
      |  COALESCE(s2.state, '(none)') AS state_t2,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(COALESCE(s1.state, '(none)') <> COALESCE(s2.state, '(none)')
      |    AS INT) AS is_changed
      |FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
      |GROUP BY 1, 2
      |ORDER BY state_t1, state_t2""".stripMargin

  /** q395 — Little's-law throughput readout per order priority: the
    * three quantities L = λW relates — average work-in-system L
    * (order-days of open backlog per calendar day), arrival rate λ
    * (orders/day over the shared global span), and mean sojourn W
    * (order day → last ship day, inclusive) — the queue-theory
    * identity every capacity dashboard is secretly built on. Reading
    * the three side by side per priority is the point: a priority
    * whose W grows while λ is flat is a service-rate problem, not a
    * demand problem, and the identity guarantees the L column prices
    * that backlog in inventory terms.
    *
    * Exactness: sojourns are integer day differences; Σ sojourn and
    * the global span are integers; λ, W, L are three single rounded
    * divisions (L uses the identity form Σ sojourn/span — exactly the
    * calendar integral of the daily open count, by Fubini, without
    * materializing the spine).
    *
    * Scale: one lineitem aggregate (order completion = max ship day),
    * one orders join (co-keyed), one |priorities|-row aggregate + a
    * 1-row span broadcast.
    */
  def littlesLaw(spark: SparkSession, dir: String): DataFrame = {
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - " +
        s"pmod(unix_micros(cast($c as timestamp)), 86400000000)) " +
        "div 86400000000"
    val comp = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(expr(dayOf("l_shipdate"))).as("c"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"),
        expr(dayOf("o_orderdate")).as("a"))
      .join(comp, "l_orderkey")
    val span = o.agg(
      (max(col("c")) - min(col("a")) + 1).as("span_days"))
    o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("c") - col("a") + 1).as("sum_sojourn"))
      .crossJoin(broadcast(span))
      .select(col("o_orderpriority"), col("n_orders"), col("span_days"),
        round(col("n_orders").cast("double") /
          col("span_days").cast("double"), 6).as("lambda_per_day"),
        round(col("sum_sojourn").cast("double") /
          col("n_orders").cast("double"), 6).as("w_days"),
        round(col("sum_sojourn").cast("double") /
          col("span_days").cast("double"), 6).as("l_avg_open"))
      .orderBy(col("o_orderpriority"))
  }

  val littlesLawSql: String =
    """WITH comp AS (
      |  SELECT l_orderkey,
      |    MAX(epoch_ms(l_shipdate) // 86400000) AS c
      |  FROM lineitem GROUP BY 1
      |), o AS (
      |  SELECT ord.o_orderpriority,
      |    epoch_ms(ord.o_orderdate) // 86400000 AS a, comp.c
      |  FROM orders ord JOIN comp ON comp.l_orderkey = ord.o_orderkey
      |), span AS (
      |  SELECT MAX(c) - MIN(a) + 1 AS span_days FROM o
      |)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(MAX(s.span_days) AS BIGINT) AS span_days,
      |  ROUND(CAST(COUNT(*) AS DOUBLE)
      |    / CAST(MAX(s.span_days) AS DOUBLE), 6) AS lambda_per_day,
      |  ROUND(CAST(SUM(c - a + 1) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS w_days,
      |  ROUND(CAST(SUM(c - a + 1) AS DOUBLE)
      |    / CAST(MAX(s.span_days) AS DOUBLE), 6) AS l_avg_open
      |FROM o CROSS JOIN span s
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q496 — Croston's method for intermittent demand, per part over
    * weekly ship quantities: the forecasting model spare-parts /
    * long-tail demand actually needs (SES on a mostly-zero series
    * converges to ~0 between demands and spikes after each one;
    * Croston smooths the nonzero demand SIZES and the INTERVALS
    * between them separately and forecasts size/interval). Emits the
    * classic estimate, the Syntetos–Boylan bias-corrected variant
    * (× (1 − α/2) = × 3/4 at α = 1/2), and the SBC demand-pattern
    * quadrant (smooth / intermittent / erratic / lumpy via the
    * ADI = 1.32 and CV² = 0.49 literature cuts) — the routing table
    * that says which parts Croston should own at all.
    *
    * Exactness: both smoothers are the q120 dyadic fold — α = 1/2
    * means s ← (x + s)/2 does only IEEE-exact halvings, and both
    * engines fold the same week-ordered array head-seeded (Spark
    * `aggregate`, DuckDB `list_reduce`), so ẑ and p̂ are
    * bit-identical doubles BEFORE the single final rounding; weekly
    * sizes are decimal sums, intervals are exact integer week gaps.
    * ADI is an exact integer ratio; CV² runs on 6dp-rounded decimal
    * power sums (q102 convention). Parts need ≥ `minWeeks` demand
    * weeks (stated in the oracle) so every fold has a seed and a gap.
    *
    * Scale: one (part, week) aggregate with map-side combine, one
    * part-keyed window for gaps, then per-part folds over arrays
    * bounded by the part's demand-week count (weeks-in-corpus at
    * worst) — never event-sized state; output is part-cardinality.
    */
  /** The (part, week, z) weekly ship-quantity relation q496 folds and
    * q533's streaming replay re-feeds — factored so the two graded
    * paths cannot drift on input grain.
    */
  private[graft] def weeklyDemand(spark: SparkSession, dir: String): DataFrame = {
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - " +
        s"pmod(unix_micros(cast($c as timestamp)), 86400000000)) " +
        "div 86400000000"
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey").as("part"),
        expr(s"(${dayOf("l_shipdate")}) div 7").as("week"),
        col("l_quantity"))
      .groupBy(col("part"), col("week"))
      .agg(Relational.decSum(col("l_quantity")).as("z"))
  }

  def crostonDemand(spark: SparkSession, dir: String,
                    minWeeks: Int = 3): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val wk = weeklyDemand(spark, dir)
    val g = wk.withColumn("gap",
      col("week") - lag(col("week"), 1).over(
        Window.partitionBy(col("part")).orderBy(col("week"))))
    val agg = g.groupBy(col("part"))
      .agg(count(lit(1)).as("n_wk"),
        array_sort(collect_list(struct(col("week"), col("z")))).as("wz"),
        array_sort(collect_list(when(col("gap").isNotNull,
          struct(col("week"), col("gap"))))).as("wg"),
        min(col("week")).as("w0"), max(col("week")).as("w1"),
        sum(col("z").cast(dec)).cast("double").as("sz"),
        sum(round(col("z") * col("z"), 6).cast(dec)).cast("double").as("szz"))
      .filter(col("n_wk") >= minWeeks)
    agg
      .withColumn("z_hat", expr(
        """aggregate(
          |  slice(transform(wz, x -> x.z), 2, size(wz) - 1),
          |  CAST(wz[0].z AS DOUBLE),
          |  (s, x) -> (x + s) / 2D)""".stripMargin))
      .withColumn("p_hat", expr(
        """aggregate(
          |  slice(transform(wg, x -> CAST(x.gap AS DOUBLE)), 2, size(wg) - 1),
          |  CAST(wg[0].gap AS DOUBLE),
          |  (s, x) -> (x + s) / 2D)""".stripMargin))
      .withColumn("mean_z", col("sz") / col("n_wk").cast("double"))
      .withColumn("var_z",
        (col("szz") - col("sz") * col("sz") / col("n_wk").cast("double"))
          / col("n_wk").cast("double"))
      .withColumn("adi",
        (col("w1") - col("w0")).cast("double") /
          (col("n_wk") - lit(1)).cast("double"))
      .withColumn("cv2",
        col("var_z") / nullif(col("mean_z") * col("mean_z"), lit(0.0)))
      .select(col("part"), col("n_wk"),
        round(col("z_hat"), 6).as("z_hat"),
        round(col("p_hat"), 6).as("p_hat"),
        round(col("z_hat") / col("p_hat"), 6).as("croston"),
        round(lit(0.75) * (col("z_hat") / col("p_hat")), 6).as("croston_sba"),
        round(col("adi"), 6).as("adi"),
        round(col("cv2"), 6).as("cv2"),
        when(col("adi") < 1.32 && col("cv2") < 0.49, lit("smooth"))
          .when(col("adi") >= 1.32 && col("cv2") < 0.49, lit("intermittent"))
          .when(col("adi") < 1.32, lit("erratic"))
          .otherwise(lit("lumpy")).as("demand_class"))
      .orderBy(col("part"))
  }

  def crostonDemandSql(minWeeks: Int = 3): String =
    s"""WITH wk AS (
      |  SELECT l_partkey AS part,
      |    (epoch_ms(l_shipdate) // 86400000) // 7 AS week,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS z
      |  FROM lineitem GROUP BY 1, 2
      |), g AS (
      |  SELECT part, week, z,
      |    week - lag(week) OVER (PARTITION BY part ORDER BY week) AS gap
      |  FROM wk
      |), agg AS (
      |  SELECT part, COUNT(*) AS n_wk,
      |    list(z ORDER BY week) AS zs,
      |    list(CAST(gap AS DOUBLE) ORDER BY week)
      |      FILTER (WHERE gap IS NOT NULL) AS gaps,
      |    MIN(week) AS w0, MAX(week) AS w1,
      |    CAST(SUM(CAST(z AS DECIMAL(28,6))) AS DOUBLE) AS sz,
      |    CAST(SUM(CAST(ROUND(z * z, 6) AS DECIMAL(28,6))) AS DOUBLE) AS szz
      |  FROM g GROUP BY part
      |  HAVING COUNT(*) >= $minWeeks
      |), folds AS (
      |  SELECT part, n_wk, w0, w1, sz, szz,
      |    list_reduce(zs, (s, x) -> (x + s) / 2) AS z_hat,
      |    list_reduce(gaps, (s, x) -> (x + s) / 2) AS p_hat,
      |    sz / CAST(n_wk AS DOUBLE) AS mean_z,
      |    (szz - sz * sz / CAST(n_wk AS DOUBLE)) / CAST(n_wk AS DOUBLE) AS var_z,
      |    CAST(w1 - w0 AS DOUBLE) / CAST(n_wk - 1 AS DOUBLE) AS adi
      |  FROM agg
      |)
      |SELECT part, n_wk,
      |  ROUND(z_hat, 6) AS z_hat,
      |  ROUND(p_hat, 6) AS p_hat,
      |  ROUND(z_hat / p_hat, 6) AS croston,
      |  ROUND(0.75 * (z_hat / p_hat), 6) AS croston_sba,
      |  ROUND(adi, 6) AS adi,
      |  ROUND(var_z / NULLIF(mean_z * mean_z, 0.0), 6) AS cv2,
      |  CASE
      |    WHEN adi < 1.32 AND var_z / NULLIF(mean_z * mean_z, 0.0) < 0.49
      |      THEN 'smooth'
      |    WHEN adi >= 1.32 AND var_z / NULLIF(mean_z * mean_z, 0.0) < 0.49
      |      THEN 'intermittent'
      |    WHEN adi < 1.32 THEN 'erratic'
      |    ELSE 'lumpy' END AS demand_class
      |FROM folds ORDER BY part""".stripMargin

  /** q499 — restricted mean survival time (RMST) ladder off the q151
    * Kaplan–Meier curve: the area under S(t) truncated at each
    * horizon τ ∈ {30, 90, 180, 365} days — "expected active days in
    * the next τ" — the survival summary that stays defined under
    * censoring where the plain mean lifetime does not, and the number
    * a retention budget actually multiplies. Built ON
    * [[kaplanMeier]]'s relation, so the curve and its integral cannot
    * drift apart.
    *
    * Exactness: KM survival values are already 6dp-rounded doubles
    * identical across engines; each interval contribution
    * S(t_i)·(min(t_{i+1}, τ) − t_i) rounds to 6dp and sums as DECIMAL
    * (order-independent), plus the S = 1 segment [0, t_first). Widths
    * are exact integer day clamps.
    *
    * Scale: rides q151 (one customer aggregate); the integration is a
    * lead window + conditional sums over the distinct-duration step
    * table — catalog-sized. The τ grid is a 4-row literal explode.
    */
  def rmstLadder(spark: SparkSession, dir: String,
                 censorDays: Int = 90): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val km = kaplanMeier(spark, dir, censorDays)
      .select(col("t_day"), col("survival"))
    val stepped = km
      .withColumn("next_t", lead(col("t_day"), 1).over(Window.orderBy(col("t_day"))))
      .withColumn("t_first", min(col("t_day")).over(Window.partitionBy()))
    val taus = spark.range(1).select(
      explode(array(lit(30), lit(90), lit(180), lit(365))).as("tau"))
    stepped.crossJoin(broadcast(taus))
      .withColumn("width",
        greatest(least(coalesce(col("next_t"), col("tau").cast("long")),
          col("tau").cast("long")) - col("t_day"), lit(0L)))
      .groupBy(col("tau"))
      .agg(
        max(least(col("t_first"), col("tau").cast("long"))).as("head_days"),
        sum(round(col("survival") * col("width").cast("double"), 6)
          .cast(dec)).cast("double").as("area"))
      .select(col("tau"),
        round(col("head_days").cast("double") + col("area"), 6)
          .as("rmst_days"),
        round((col("head_days").cast("double") + col("area"))
          / col("tau").cast("double"), 6).as("rmst_share"))
      .orderBy(col("tau"))
  }

  /** q520 — safety-stock / reorder-point table per part: the textbook
    * inventory formula SS = z·σ_w·√L assembled from two graded
    * relations' machinery — weekly demand moments over the CORPUS
    * week span (zero-demand weeks included analytically: q496's
    * weekly frame, variance over W global weeks) and the q149 ship
    * lead time — at z = 1.645 (95% cycle service). Reorder point =
    * μ_w·L_weeks + SS. The operations deliverable the q496 forecast
    * and q149 scorecard exist to feed; parts under `minWeeks` demand
    * weeks are excluded (Croston territory, stated both sides).
    *
    * Exactness: weekly sums are decimal; z² terms round at 6dp into
    * decimal sums; the span W is an exact integer broadcast; variance
    * / √ / products are one fixed-operand-order IEEE chain rounded
    * once (√ correctly rounded — q123). Lead times are exact integer
    * day sums.
    *
    * Scale: one (part, week) aggregate, one part-keyed lead-time
    * aggregate (co-keyed join), a 1-row span broadcast — no dense
    * part × week explode: zero weeks enter through W, not rows.
    */
  def safetyStock(spark: SparkSession, dir: String,
                  minWeeks: Int = 3, z: Double = 1.645): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val dayOf = (c: String) =>
      s"(unix_micros(cast($c as timestamp)) - " +
        s"pmod(unix_micros(cast($c as timestamp)), 86400000000)) " +
        "div 86400000000"
    val li = Tables.load(spark, dir, "lineitem")
    val wk = li.select(col("l_partkey").as("part"),
        expr(s"(${dayOf("l_shipdate")}) div 7").as("week"), col("l_quantity"))
      .groupBy(col("part"), col("week"))
      .agg(Relational.decSum(col("l_quantity")).as("z"))
    val span = wk.agg((max(col("week")) - min(col("week")) + 1).as("w_span"))
    val demand = wk.groupBy(col("part"))
      .agg(count(lit(1)).as("n_wk"),
        sum(col("z").cast(dec)).cast("double").as("sz"),
        sum(round(col("z") * col("z"), 6).cast(dec)).cast("double").as("szz"))
      .filter(col("n_wk") >= minWeeks)
    val lead = li.join(
        Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey").as("part"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr(s"(${dayOf("l_shipdate")}) - (${dayOf("o_orderdate")})"))
          .as("slead"))
    demand.join(lead, "part").crossJoin(broadcast(span))
      .withColumn("mean_w", col("sz") / col("w_span").cast("double"))
      .withColumn("var_w",
        (col("szz") - col("sz") * col("sz") / col("w_span").cast("double")) /
          (col("w_span") - lit(1)).cast("double"))
      .withColumn("sd_w", sqrt(greatest(col("var_w"), lit(0.0))))
      .withColumn("lead_w",
        (col("slead").cast("double") / col("n_lines").cast("double")) / lit(7.0))
      .withColumn("ss", lit(z) * col("sd_w") * sqrt(greatest(col("lead_w"), lit(0.0))))
      .select(col("part"), col("n_wk"),
        round(col("mean_w"), 6).as("mean_weekly"),
        round(col("sd_w"), 6).as("sd_weekly"),
        round(col("slead").cast("double") / col("n_lines").cast("double"), 6)
          .as("mean_lead_days"),
        round(col("ss"), 6).as("safety_stock"),
        round(col("mean_w") * col("lead_w") + col("ss"), 6)
          .as("reorder_point"))
      .orderBy(col("part"))
  }

  def safetyStockSql(minWeeks: Int = 3, z: Double = 1.645): String =
    s"""WITH wk AS (
      |  SELECT l_partkey AS part,
      |    (epoch_ms(l_shipdate) // 86400000) // 7 AS week,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS z
      |  FROM lineitem GROUP BY 1, 2
      |), span AS (
      |  SELECT MAX(week) - MIN(week) + 1 AS w_span FROM wk
      |), demand AS (
      |  SELECT part, COUNT(*) AS n_wk,
      |    CAST(SUM(CAST(z AS DECIMAL(28,6))) AS DOUBLE) AS sz,
      |    CAST(SUM(CAST(ROUND(z * z, 6) AS DECIMAL(28,6))) AS DOUBLE) AS szz
      |  FROM wk GROUP BY part
      |  HAVING COUNT(*) >= $minWeeks
      |), lead_t AS (
      |  SELECT l.l_partkey AS part, COUNT(*) AS n_lines,
      |    CAST(SUM((epoch_ms(l.l_shipdate) // 86400000)
      |      - (epoch_ms(o.o_orderdate) // 86400000)) AS BIGINT) AS slead
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1
      |), fitted AS (
      |  SELECT d.part, d.n_wk,
      |    d.sz / CAST(s.w_span AS DOUBLE) AS mean_w,
      |    sqrt(GREATEST(
      |      (d.szz - d.sz * d.sz / CAST(s.w_span AS DOUBLE))
      |        / CAST(s.w_span - 1 AS DOUBLE), 0.0)) AS sd_w,
      |    (CAST(t.slead AS DOUBLE) / CAST(t.n_lines AS DOUBLE)) / 7.0 AS lead_w,
      |    CAST(t.slead AS DOUBLE) / CAST(t.n_lines AS DOUBLE) AS lead_days
      |  FROM demand d
      |  JOIN lead_t t ON t.part = d.part
      |  CROSS JOIN span s
      |)
      |SELECT part, n_wk,
      |  ROUND(mean_w, 6) AS mean_weekly,
      |  ROUND(sd_w, 6) AS sd_weekly,
      |  ROUND(lead_days, 6) AS mean_lead_days,
      |  ROUND($z * sd_w * sqrt(GREATEST(lead_w, 0.0)), 6) AS safety_stock,
      |  ROUND(mean_w * lead_w + $z * sd_w * sqrt(GREATEST(lead_w, 0.0)), 6)
      |    AS reorder_point
      |FROM fitted ORDER BY part""".stripMargin

  def rmstLadderSql(censorDays: Int = 90): String =
    s"""WITH d AS (
      |  SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day FROM orders
      |), ad AS (
      |  SELECT MAX(day) AS asof_day FROM d
      |), subj AS (
      |  SELECT MAX(day) - MIN(day) AS dur,
      |    CASE WHEN MAX(day) <= (SELECT asof_day FROM ad) - $censorDays
      |      THEN 1 ELSE 0 END AS ev
      |  FROM d GROUP BY o_custkey
      |), steps AS (
      |  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d_events, COUNT(*) AS n_t
      |  FROM subj GROUP BY dur
      |), r AS (
      |  SELECT dur, d_events,
      |    SUM(n_t) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      |  FROM steps
      |), km AS (
      |  SELECT dur AS t_day,
      |    CASE WHEN MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END)
      |        OVER w = 1 THEN 0.0
      |      ELSE ROUND(POWER(10, CAST(SUM(
      |        CASE WHEN d_events = 0 OR d_events = n_risk
      |          THEN CAST(0 AS DECIMAL(18,6))
      |          ELSE CAST(ROUND(LOG10(1 - CAST(d_events AS DOUBLE) / n_risk), 6)
      |            AS DECIMAL(18,6)) END) OVER w AS DOUBLE)), 6) END AS survival
      |  FROM r
      |  WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)
      |), stepped AS (
      |  SELECT t_day, survival,
      |    lead(t_day) OVER (ORDER BY t_day) AS next_t,
      |    MIN(t_day) OVER () AS t_first
      |  FROM km
      |), taus AS (
      |  SELECT unnest([30, 90, 180, 365]) AS tau
      |)
      |SELECT tau,
      |  ROUND(CAST(MAX(LEAST(t_first, CAST(tau AS BIGINT))) AS DOUBLE)
      |    + CAST(SUM(CAST(ROUND(survival * CAST(GREATEST(
      |        LEAST(COALESCE(next_t, CAST(tau AS BIGINT)), CAST(tau AS BIGINT))
      |          - t_day, 0) AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE), 6)
      |    AS rmst_days,
      |  ROUND((CAST(MAX(LEAST(t_first, CAST(tau AS BIGINT))) AS DOUBLE)
      |    + CAST(SUM(CAST(ROUND(survival * CAST(GREATEST(
      |        LEAST(COALESCE(next_t, CAST(tau AS BIGINT)), CAST(tau AS BIGINT))
      |          - t_day, 0) AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE))
      |    / CAST(tau AS DOUBLE), 6) AS rmst_share
      |FROM stepped CROSS JOIN taus
      |GROUP BY tau ORDER BY tau""".stripMargin

  /** q544 — Greenwood confidence band over the q151 Kaplan–Meier
    * curve: Var(Ŝ(t)) = Ŝ(t)²·Σ_{tᵢ≤t} dᵢ/(nᵢ(nᵢ−dᵢ)), the standard
    * error every survival plot shades and every retention report
    * should quote before anyone reads a 2-point S(t) difference as
    * real. Built ON [[kaplanMeier]]'s returned relation (the q499
    * RMST discipline), so the curve and its band cannot drift apart.
    *
    * Exactness: each step's Greenwood term dᵢ/(nᵢ(nᵢ−dᵢ)) is one IEEE
    * division on exact integers, scaled ×10⁶ and 6dp-rounded before
    * the DECIMAL cumulative (terms are ~1e-5 — rounding at the
    * natural scale would erase them; the ×10⁶ scaling is part of the
    * statistic's stated definition, bias ≤ 1e-12 per step); se and
    * the clamped ±1.96·se band are one shared double chain, 6dp with
    * the +0.0 guard (a lower bound can round to −0.0). Steps at or
    * after S = 0 (d = n exhausts the risk set) surface NULL —
    * Greenwood divides by n−d there.
    *
    * Scale: inherits q151's envelope — one customer aggregate, then
    * windows over the distinct-duration step table (span-bounded).
    */
  def greenwoodBand(spark: SparkSession, dir: String,
                    censorDays: Int = 90): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val km = kaplanMeier(spark, dir, censorDays)
    val wAsc = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    km
      .withColumn("hit_zero",
        max((col("d_events") === col("n_risk")).cast("int")).over(wAsc))
      .withColumn("term6",
        when(col("d_events") === col("n_risk"), lit(null))
          .otherwise(round(col("d_events").cast("double") * lit(1e6)
            / (col("n_risk").cast("double")
              * (col("n_risk") - col("d_events")).cast("double")), 6)))
      .withColumn("cum6", sum(col("term6").cast(dec)).over(wAsc).cast("double"))
      .withColumn("se",
        when(col("hit_zero") === 1, lit(null))
          .otherwise(col("survival")
            * sqrt(greatest(col("cum6") / lit(1e6), lit(0.0)))))
      .select(col("t_day"), col("n_risk"), col("d_events"), col("survival"),
        (round(col("se"), 6) + lit(0.0)).as("se_greenwood"),
        (round(greatest(col("survival") - lit(1.96) * col("se"), lit(0.0)), 6)
          + lit(0.0)).as("ci_lo"),
        (round(least(col("survival") + lit(1.96) * col("se"), lit(1.0)), 6)
          + lit(0.0)).as("ci_hi"))
      .orderBy(col("t_day"))
  }

  def greenwoodBandSql(censorDays: Int = 90): String =
    s"""WITH d AS (
      |  SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day FROM orders
      |), ad AS (
      |  SELECT MAX(day) AS asof_day FROM d
      |), subj AS (
      |  SELECT MAX(day) - MIN(day) AS dur,
      |    CASE WHEN MAX(day) <= (SELECT asof_day FROM ad) - $censorDays
      |      THEN 1 ELSE 0 END AS ev
      |  FROM d GROUP BY o_custkey
      |), steps AS (
      |  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d_events, COUNT(*) AS n_t
      |  FROM subj GROUP BY dur
      |), r AS (
      |  SELECT dur, d_events,
      |    SUM(n_t) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      |  FROM steps
      |), km AS (
      |  SELECT dur AS t_day, CAST(n_risk AS BIGINT) AS n_risk, d_events,
      |    MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END) OVER w
      |      AS hit_zero,
      |    CASE WHEN MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END)
      |        OVER w = 1 THEN 0.0
      |      ELSE ROUND(POWER(10, CAST(SUM(
      |        CASE WHEN d_events = 0 OR d_events = n_risk
      |          THEN CAST(0 AS DECIMAL(18,6))
      |          ELSE CAST(ROUND(LOG10(1 - CAST(d_events AS DOUBLE) / n_risk), 6)
      |            AS DECIMAL(18,6)) END) OVER w AS DOUBLE)), 6) END AS survival,
      |    SUM(CASE WHEN d_events = n_risk THEN NULL
      |      ELSE CAST(ROUND(CAST(d_events AS DOUBLE) * 1e6
      |        / (CAST(n_risk AS DOUBLE)
      |          * CAST(n_risk - d_events AS DOUBLE)), 6)
      |        AS DECIMAL(28,6)) END) OVER w AS cum6
      |  FROM r
      |  WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)
      |), banded AS (
      |  SELECT t_day, n_risk, d_events, survival,
      |    CASE WHEN hit_zero = 1 THEN NULL
      |      ELSE survival * sqrt(GREATEST(CAST(cum6 AS DOUBLE) / 1e6, 0.0))
      |    END AS se
      |  FROM km
      |)
      |SELECT t_day, n_risk, d_events, survival,
      |  ROUND(se, 6) + 0.0 AS se_greenwood,
      |  ROUND(GREATEST(survival - 1.96 * se, 0.0), 6) + 0.0 AS ci_lo,
      |  ROUND(LEAST(survival + 1.96 * se, 1.0), 6) + 0.0 AS ci_hi
      |FROM banded
      |ORDER BY t_day""".stripMargin

  /** q545 — newsvendor order quantity per part: the critical-fractile
    * solution q* = F⁻¹(cᵤ/(cᵤ+cₒ)) of the empirical weekly-demand
    * distribution — with underage:overage = 9:1, the 0.9 quantile of
    * weekly demand INCLUDING the zero-demand weeks. The decision
    * quantity q520's normal-approximation safety stock approximates;
    * this is the distribution-free answer, and the gap between the
    * two on lumpy parts (q496's demand classes) is exactly the
    * normal-assumption error. Shares [[weeklyDemand]] with q496/q533
    * so all three price the same relation.
    *
    * Exactness: the quantile is RANK-SELECTED on the span grid —
    * rank r = (W·9+9) div 10 over W = corpus week span; the W−n zero
    * weeks enter ANALYTICALLY (r ≤ W−n ⇒ q* = 0; otherwise the
    * (r−(W−n))-th smallest demand week) — never as rows (the q520
    * discipline); demands are exact decimal sums, displayed with one
    * 6dp round.
    *
    * Scale: one (part, week) aggregate, one part-keyed rank window,
    * a broadcast 1-row span — no dense part×week explode at any SF.
    */
  def newsvendorQuantity(spark: SparkSession, dir: String,
                         minWeeks: Int = 3): DataFrame = {
    val wk = weeklyDemand(spark, dir)
    val span = wk.agg((max(col("week")) - min(col("week")) + 1).as("w_span"))
    val ranked = wk
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("part")).orderBy(col("z"), col("week"))))
      .withColumn("n_wk", count(lit(1)).over(Window.partitionBy(col("part"))))
      .crossJoin(broadcast(span))
      .withColumn("r", expr("(w_span * 9 + 9) div 10"))
    ranked
      .groupBy(col("part"), col("n_wk"), col("w_span"), col("r"))
      .agg(max(when(col("rn") === col("r") - (col("w_span") - col("n_wk")),
        col("z"))).as("picked"))
      .filter(col("n_wk") >= minWeeks)
      .select(col("part"), col("n_wk"), col("w_span"),
        round(when(col("r") <= col("w_span") - col("n_wk"), lit(0.0))
          .otherwise(col("picked").cast("double")), 6).as("q_star"))
      .orderBy(col("part"))
  }

  def newsvendorQuantitySql(minWeeks: Int = 3): String =
    s"""WITH wk AS (
      |  SELECT l_partkey AS part,
      |    (epoch_ms(l_shipdate) // 86400000) // 7 AS week,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS z
      |  FROM lineitem GROUP BY 1, 2
      |), span AS (
      |  SELECT MAX(week) - MIN(week) + 1 AS w_span FROM wk
      |), ranked AS (
      |  SELECT part, z,
      |    ROW_NUMBER() OVER (PARTITION BY part ORDER BY z, week) AS rn,
      |    COUNT(*) OVER (PARTITION BY part) AS n_wk
      |  FROM wk
      |)
      |SELECT r.part, CAST(MAX(r.n_wk) AS BIGINT) AS n_wk,
      |  CAST(MAX(s.w_span) AS BIGINT) AS w_span,
      |  ROUND(CASE
      |    WHEN (MAX(s.w_span) * 9 + 9) // 10 <= MAX(s.w_span) - MAX(r.n_wk)
      |      THEN 0.0
      |    ELSE MAX(CASE WHEN r.rn = (s.w_span * 9 + 9) // 10
      |      - (s.w_span - r.n_wk) THEN r.z END)
      |    END, 6) AS q_star
      |FROM ranked r CROSS JOIN span s
      |GROUP BY r.part
      |HAVING MAX(r.n_wk) >= $minWeeks
      |ORDER BY r.part""".stripMargin
}
