package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** q533 — the streaming layer's oracle-graded seam (round-12 verdict
  * item 5): the 26 streaming twins are spec-bound to their batch
  * relations, but none was driver-graded; this query EXECUTES the
  * Structured Streaming path inside a graded query. It replays the
  * q496 weekly-demand relation for a constant-budget part sample
  * through [[StreamingCroston.forecasts]] (flatMapGroupsWithState,
  * four week-ordered MemoryStream micro-batches so state provably
  * carries across batch boundaries) and grades the FINAL per-part
  * forecast snapshot against the batch Croston oracle restricted to
  * the same sample — snapshot = batch relation by construction
  * (Croston's fold is causal and the replay is in week order).
  *
  * Exactness: the streaming fold runs the identical α = 1/2 dyadic
  * halvings (IEEE-exact) the batch operator folds, over the identical
  * week-ordered inputs, so the final state is bit-equal to q496's
  * z_hat/p_hat before the single 6dp rounding; the sample pick is the
  * portable-md5 bottom-128 stated verbatim in the oracle.
  *
  * Scale: the MemoryStream feed is the TEST-harness half (driver
  * materialization of <= 128 parts x weeks-in-corpus rows — constant
  * budget by construction); the production half is the graded code
  * itself: StreamingCroston keeps four scalars per part, independent
  * of history length, and the final-row readout is one per-part
  * window over output bounded by |sample| x weeks.
  */
object StreamingGraded {

  private val runSeq = new AtomicInteger(0)

  /** Number of sampled parts and of replay micro-batches; both stated
    * in the oracle comment so the graded contract is explicit.
    */
  val sampleN = 128
  val microBatches = 4

  def crostonReplay(spark: SparkSession, dir: String,
                    minWeeks: Int = 3): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wk = Temporal.weeklyDemand(spark, dir)
    // constant-budget portable sample: bottom-128 parts by md5 of the
    // decimal string — TakeOrdered on the distinct-part relation, never
    // a corpus-fraction (the q366/q407/q415 fixedSample discipline)
    val parts = wk.select(col("part")).distinct()
      .orderBy(md5(col("part").cast("string")), col("part"))
      .limit(sampleN)
    val rows = wk.join(broadcast(parts), "part")
      .select(col("part"), col("week"), col("z").cast("double"))
      .as[StreamingCroston.WeeklyDemand]
      .collect() // <= sampleN x weeks-in-corpus rows: bounded feed
      .sortBy(r => (r.week, r.part))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingCroston.WeeklyDemand]
    val sink = s"croston_replay_${runSeq.incrementAndGet()}"
    // the replay holds <= 128 keys: 32 state-store partitions would pay
    // 32 checkpoint commits PER MICRO-BATCH for ~4 keys each (measured
    // 11.6 s in-suite at sf0.1); 8 partitions carry the same state with
    // a quarter of the commit I/O. Session conf is restored after the
    // stream — the batch plan around it is unaffected.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val query =
      try StreamingCroston.forecasts(mem.toDS())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try {
      // split on global week boundaries: every part's later weeks land
      // in later micro-batches, so the per-part frontier check and the
      // cross-batch state carry are both genuinely exercised
      val cuts = rows.grouped(
        math.max(1, math.ceil(rows.length.toDouble / microBatches).toInt)).toSeq
      cuts.foreach { batch =>
        mem.addData(batch.toIndexedSeq)
        query.processAllAvailable()
      }
    } finally query.stop()
    val last = Window.partitionBy(col("part")).orderBy(col("week").desc)
    spark.table(sink)
      .withColumn("rn", row_number().over(last))
      .filter(col("rn") === 1 && col("n_wk") >= minWeeks)
      .select(col("part"), col("n_wk"),
        round(col("z_hat"), 6).as("z_hat"),
        round(col("p_hat"), 6).as("p_hat"),
        round(col("croston"), 6).as("croston"),
        round(lit(0.75) * col("croston"), 6).as("croston_sba"))
      .orderBy(col("part"))
  }

  case class CdcChange(user_id: Long, last_type: String, v: Long, op: String)

  /** q543 — the CDC reconciliation path graded end-to-end: q533 grades
    * the stateful-operator seam (flatMapGroupsWithState); this grades
    * the OTHER streaming architecture — foreachBatch + copy-on-write
    * snapshot ([[StreamingCdc]], the applyCdc core q14/q15 grade in
    * batch). A deterministic I/U/D change stream (signup → I, error →
    * D-tombstone, anything else → U; version = the change's global
    * rank, unique and monotone with stream order) for a constant-
    * budget md5 sample of users replays through four version-ordered
    * micro-batches, each reconciling the parquet snapshot via the
    * stage-and-rename swap; the FINAL snapshot is graded against the
    * one-shot relation (per user: the max-version change, absent if
    * it was a tombstone) — equal by construction because batches are
    * version-contiguous, so each user's last change lands in one
    * batch and later batches never touch the key.
    *
    * Exactness: versions are unique integer ranks (no cross-engine
    * tiebreak ambiguity and no cross-batch version tie for upsert to
    * resolve); every output column is carried verbatim.
    *
    * Scale: the feed is the harness half (≤ |sample|·events-per-user
    * rows, constant-budget); the graded code is the production half —
    * applyCdc touches the snapshot once per batch through a
    * key-co-partitioned anti-join + upsert, state = the snapshot
    * itself, nothing accumulates in executor state stores.
    */
  def cdcReplay(spark: SparkSession, dir: String,
                userSample: Int = 256): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.Tables.load(spark, dir, "events")
      .withColumn("ms", graft.operators.Relational.tsMs("ts"))
    val users = ev.select(col("user_id")).distinct()
      .orderBy(md5(col("user_id").cast("string")), col("user_id"))
      .limit(userSample)
    val sampled = ev.join(broadcast(users), "user_id")
      .select(col("user_id"), col("event_type"), col("ms"), col("event_id"))
    // global rank = the change's version: unique and monotone with
    // stream order, so no upsert ever sees a version tie. Harness-side
    // single-partition window over the constant-budget sample only.
    val ch = sampled
      .withColumn("v", row_number().over(
        Window.orderBy(col("ms"), col("event_id"))).cast("long"))
      .select(col("user_id"), col("event_type").as("last_type"), col("v"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"))
      .as[CdcChange]
      .collect()
      .sortBy(_.v)
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdc-replay")
    val dest = tmp.resolve("snapshot").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CdcChange]
    // the per-batch applyCdc works on <= |sample| rows: run the whole
    // replay at 8 shuffle partitions instead of paying 32 tasks per
    // inner window/join on a few hundred rows; restored after the stop
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val query = StreamingCdc.cdcStream(mem.toDS().toDF(), dest,
        Seq("user_id"), "op", "v")
      try {
        val slices = ch.grouped(
          math.max(1, math.ceil(ch.length / 4.0).toInt)).toSeq
        slices.foreach { b =>
          mem.addData(b.toIndexedSeq)
          query.processAllAvailable()
        }
      } finally query.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.read.parquet(dest)
      .select(col("user_id"), col("last_type"), col("v").as("version"))
      .orderBy(col("user_id"))
  }

  def cdcReplaySql(userSample: Int = 256): String =
    s"""WITH sample AS (
      |  SELECT user_id FROM (SELECT DISTINCT user_id FROM events)
      |  ORDER BY md5(CAST(user_id AS VARCHAR)), user_id LIMIT $userSample
      |), ch AS (
      |  SELECT e.user_id, e.event_type AS last_type,
      |    CASE e.event_type WHEN 'signup' THEN 'I'
      |      WHEN 'error' THEN 'D' ELSE 'U' END AS op,
      |    ROW_NUMBER() OVER (ORDER BY epoch_ms(e.ts), e.event_id) AS v
      |  FROM events e JOIN sample USING (user_id)
      |), latest AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY v DESC) AS rn
      |  FROM ch
      |)
      |SELECT user_id, last_type, CAST(v AS BIGINT) AS version
      |FROM latest WHERE rn = 1 AND op <> 'D'
      |ORDER BY user_id""".stripMargin

  /** DuckDB twin: q496's fold restricted to the same md5 bottom-128
    * sample (the streaming snapshot IS this relation).
    */
  def crostonReplaySql(minWeeks: Int = 3): String =
    s"""WITH wk AS (
      |  SELECT l_partkey AS part,
      |    (epoch_ms(l_shipdate) // 86400000) // 7 AS week,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS z
      |  FROM lineitem GROUP BY 1, 2
      |), sample AS (
      |  SELECT part FROM (SELECT DISTINCT part FROM wk)
      |  ORDER BY md5(CAST(part AS VARCHAR)), part LIMIT $sampleN
      |), g AS (
      |  SELECT part, week, z,
      |    week - lag(week) OVER (PARTITION BY part ORDER BY week) AS gap
      |  FROM wk WHERE part IN (SELECT part FROM sample)
      |), agg AS (
      |  SELECT part, COUNT(*) AS n_wk,
      |    list(z ORDER BY week) AS zs,
      |    list(CAST(gap AS DOUBLE) ORDER BY week)
      |      FILTER (WHERE gap IS NOT NULL) AS gaps
      |  FROM g GROUP BY part
      |  HAVING COUNT(*) >= $minWeeks
      |), folds AS (
      |  SELECT part, n_wk,
      |    list_reduce(zs, (s, x) -> (x + s) / 2) AS z_hat,
      |    list_reduce(gaps, (s, x) -> (x + s) / 2) AS p_hat
      |  FROM agg
      |)
      |SELECT part, n_wk,
      |  ROUND(z_hat, 6) AS z_hat,
      |  ROUND(p_hat, 6) AS p_hat,
      |  ROUND(z_hat / p_hat, 6) AS croston,
      |  ROUND(0.75 * (z_hat / p_hat), 6) AS croston_sba
      |FROM folds ORDER BY part""".stripMargin
}
