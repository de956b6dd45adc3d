package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment against a STATIC keyed time-series:
  * for each stream row, the static row with the same key and the
  * largest time ≤ the row's time — q296's backward as-of, in the
  * serving shape. The static side (a signup ledger, a rate table, a
  * model-version history) collects into per-key sorted arrays and
  * BROADCASTS; each stream row then answers in O(log n) with zero
  * state and zero shuffle — the right trade when the dimension is
  * dimension-sized, while [[graft.plans.AsofJoinExec]] handles the
  * big-big batch case. Replaying the stream reproduces the batch
  * operator's rows exactly (spec-asserted).
  *
  * Ties on (key, time) in the static side resolve to the LARGEST
  * value-row id — callers wanting full determinism dedup first, the
  * q296 discipline (here the sort is (time, id) so the pick IS
  * deterministic even with ties).
  */
/** Streaming FORWARD as-of (q338's twin): each left row matched to
  * the FIRST right row with the same key at-or-after its time, within
  * a `horizonMs` wait bound — composed from native operators per the
  * custom-operator ladder: a time-bounded stream-stream LEFT OUTER
  * join (state evicted by the watermark + horizon, exactly like
  * [[StreamingIntervalJoin]]) feeding a windowed first-match
  * aggregate (chained stateful operators; Spark propagates the
  * delayed watermark through the join into the agg). The horizon is
  * what makes a FORWARD match streamable at all: "no right will ever
  * come" is undecidable without a bound, so a left with no match in
  * [t, t+H] resolves to null once the watermark passes — the same
  * negative-claim deferral as the interval join's outer rows.
  *
  * The null-padded join rows are excluded from the min (a
  * struct(null, null) would sort BELOW real matches and steal the
  * min); a left whose every joined row is null-padded aggregates to
  * a null match. Ties on (key, time): smallest right id wins — state
  * the right side unique-per-(key, time) for cross-engine parity,
  * the q338 discipline.
  */
object StreamingForwardAsof {

  /** `left` needs (l_key, l_id, l_ts: timestamp); `right` needs
    * (r_key, r_id, r_ts: timestamp). One output row per left row,
    * emitted when the watermark closes its hour bucket.
    */
  def nextMatch(left: DataFrame, right: DataFrame,
                horizonMs: Long = 3600000L,
                delay: String = "10 seconds"): DataFrame = {
    val joined = left.withWatermark("l_ts", delay)
      .join(right.withWatermark("r_ts", delay),
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonMs MILLISECONDS"),
        "left_outer")
    joined
      // group on the window + key + row id ONLY: adding raw l_ts to
      // the grouping would put two event-time columns in one stream
      // (the engine rejects it); the row's time rides as an aggregate
      // instead (one left row per l_id, so min() is the identity)
      .groupBy(window(col("l_ts"), "1 hour"), col("l_key"), col("l_id"))
      .agg(min(col("l_ts")).as("l_ts"),
        min(when(col("r_id").isNotNull,
          struct(col("r_ts"), col("r_id")))).as("m"))
      .select(col("l_key").as("key"), col("l_id").as("row_id"),
        col("l_ts"), col("m.r_ts").as("match_ts"),
        col("m.r_id").as("match_id"))
  }
}

object StreamingAsof {

  case class StreamRow(key: Long, ms: Long, row_id: Long)
  case class AsofOut(key: Long, ms: Long, row_id: Long,
                     asof_ms: Option[Long], asof_id: Option[Long])

  /** The dimension-sized trade is ENFORCED, not just documented: the
    * static side is counted before it collects, and anything above
    * this bound throws with a pointer to the big-big operator. 2M
    * rows ≈ 48 MB of longs broadcast — comfortably dimension-sized;
    * raise it deliberately per deployment, don't remove it.
    */
  val DefaultMaxStaticRows: Long = 2000000L

  /** Build the broadcastable lookup: key → (sorted times, ids),
    * ties ordered by id so the last-at-or-before pick is unique.
    * Fails fast when the static side exceeds `maxStaticRows` — a
    * fact-sized "dimension" must go through the distributed
    * [[graft.plans.AsofJoinExec]] batch operator instead of a
    * driver collect.
    */
  def buildLookup(staticDf: DataFrame,
      maxStaticRows: Long = DefaultMaxStaticRows): Map[Long, (Array[Long], Array[Long])] = {
    val n = staticDf.count()
    require(n <= maxStaticRows,
      s"StreamingAsof static side has $n rows > maxStaticRows=$maxStaticRows: " +
        "this operator broadcasts the static side and is for " +
        "dimension-sized lookups only — use graft.plans.AsofJoinOps.asofJoin " +
        "(distributed sort-merge) for the big-big case")
    staticDf.select(col("key").cast("long"), col("ms").cast("long"),
        col("id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        k -> (sorted.map(_._2), sorted.map(_._3))
      }
  }

  /** Largest index i with times(i) <= t, or -1. Binary search over
    * the sorted (ascending, possibly duplicated) time array.
    */
  def floorIndex(times: Array[Long], t: Long): Int = {
    var lo = 0
    var hi = times.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) <= t) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  /** `toleranceMs` mirrors the batch operator's max-gap semantics
    * (q339): a floor match further back than the tolerance reports as
    * no-match — the serving-side attribution window.
    */
  def enrich(stream: Dataset[StreamRow],
             lookup: Map[Long, (Array[Long], Array[Long])],
             toleranceMs: Option[Long] = None): Dataset[AsofOut] = {
    import stream.sparkSession.implicits._
    val bc = stream.sparkSession.sparkContext.broadcast(lookup)
    stream.map { r =>
      bc.value.get(r.key) match {
        case Some((times, ids)) =>
          val i = floorIndex(times, r.ms)
          if (i >= 0 && toleranceMs.forall(r.ms - times(i) <= _))
            AsofOut(r.key, r.ms, r.row_id, Some(times(i)), Some(ids(i)))
          else AsofOut(r.key, r.ms, r.row_id, None, None)
        case None => AsofOut(r.key, r.ms, r.row_id, None, None)
      }
    }
  }
}
