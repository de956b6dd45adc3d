package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of Croston's intermittent-demand method (q496,
  * operators.Temporal.crostonDemand): per part, fold each arriving
  * DEMAND WEEK into the same two α = 1/2 dyadic smoothers the batch
  * operator runs — ẑ' = (z + ẑ)/2 on the demand size, p̂' = (gap + p̂)/2
  * on the inter-demand interval — and emit the refreshed forecast the
  * moment the week closes, instead of refolding the whole history
  * nightly. State per part is four scalars (last week, week count,
  * ẑ, p̂): O(1) per key, independent of history length.
  *
  * Contract vs batch: the batch fold is causal and head-seeded, so
  * for in-order weekly input ẑ, p̂ and ẑ/p̂ equal q496's columns
  * EXACTLY once both sides round at 6dp (the halvings are IEEE-exact
  * doubles; asserted across a micro-batch boundary in
  * Round12OpsSpec4 on a shared fixture). Weeks at or below the
  * per-part frontier (duplicates/late) are dropped, matching the
  * batch input's weekly-aggregate uniqueness; the demand-class
  * quadrant needs full-series moments and stays batch-only.
  *
  * (State-schema note: CrostonState is the flatMapGroupsWithState
  * state type; changing its fields invalidates existing checkpoints.)
  */
object StreamingCroston {

  case class WeeklyDemand(part: Long, week: Long, z: Double)
  case class CrostonState(lastWeek: Long, nWk: Long, zHat: Double, pHat: Double)
  case class CrostonOut(part: Long, week: Long, n_wk: Long,
                        z_hat: Double, p_hat: Option[Double],
                        croston: Option[Double])

  def forecasts(weekly: Dataset[WeeklyDemand]): Dataset[CrostonOut] = {
    import weekly.sparkSession.implicits._
    weekly
      .groupByKey(_.part)
      .flatMapGroupsWithState[CrostonState, CrostonOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (part: Long, rows: Iterator[WeeklyDemand], state: GroupState[CrostonState]) =>
          val sorted = rows.toSeq.sortBy(_.week)
          var st = state.getOption.getOrElse(
            CrostonState(Long.MinValue, 0L, 0.0, Double.NaN))
          val out = scala.collection.mutable.ArrayBuffer.empty[CrostonOut]
          sorted.foreach { r =>
            if (r.week <= st.lastWeek) {
              // at or below the week frontier: duplicate/late, dropped
            } else if (st.lastWeek == Long.MinValue) {
              // series head: ẑ seeds at the first demand, no interval yet
              st = CrostonState(r.week, 1L, r.z, Double.NaN)
              out += CrostonOut(part, r.week, 1L, r.z, None, None)
            } else {
              val gap = (r.week - st.lastWeek).toDouble
              val zHat = (r.z + st.zHat) / 2
              val pHat = if (st.pHat.isNaN) gap else (gap + st.pHat) / 2
              st = CrostonState(r.week, st.nWk + 1, zHat, pHat)
              out += CrostonOut(part, r.week, st.nWk, zHat, Some(pHat),
                Some(zHat / pHat))
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
