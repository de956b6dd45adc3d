package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming count-min sketch: point-frequency ESTIMATES for an open
  * token vocabulary in `depth × width` bounded counters — the
  * overcounting complement to [[StreamingHeavyHitters]]' Misra–Gries
  * (MG undercounts and keeps only k survivors; CM never undercounts
  * and answers ANY token, at the price of collision overcounts
  * bounded by ≈ processed/width per row, minimized over `depth`
  * independent rows).
  *
  * Sharding: each sketch ROW is one flatMapGroupsWithState key — a
  * token fans out to `depth` (row, token) updates, each row keeps a
  * width-long counter array forever. State is depth·width longs
  * TOTAL regardless of vocabulary size; a naive
  * groupBy(token).count() would carry state per distinct token.
  * Update mode emits only the columns a batch touched; the CURRENT
  * sketch is each (row, col)'s row-max `processed` snapshot, and
  * [[estimateJvm]] answers queries as the classic min over rows at
  * the token's salted-md5 column.
  *
  * (State-schema note: RowState is the flatMapGroupsWithState state
  * class — changing it breaks checkpoint compatibility.)
  */
object StreamingCountMin {

  case class RowState(counts: Seq[Long], processed: Long)
  case class CMOut(row: Int, col: Int, count: Long, row_processed: Long)

  /** Salted deterministic column for a token in sketch row `row` —
    * md5-derived like every portable hash in this engine, so the
    * estimator and the sketch can only agree.
    */
  def colOf(row: Int, token: String, width: Int): Int =
    math.floorMod(
      graft.functions.PortableHash.md5PairJvm(s"cm$row:$token")._1,
      width.toLong).toInt

  def sketch(tokens: Dataset[String], depth: Int = 4,
             width: Int = 256): Dataset[CMOut] = {
    import tokens.sparkSession.implicits._
    tokens.flatMap(t => (0 until depth).map(r => (r, t)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[RowState, CMOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (row: Int, rows: Iterator[(Int, String)],
         state: GroupState[RowState]) =>
          val counts = state.getOption
            .map(_.counts.toArray)
            .getOrElse(Array.fill(width)(0L))
          var processed = state.getOption.map(_.processed).getOrElse(0L)
          val touched = scala.collection.mutable.SortedSet.empty[Int]
          rows.foreach { case (_, t) =>
            val c = colOf(row, t, width)
            counts(c) += 1
            touched += c
            processed += 1
          }
          state.update(RowState(counts.toSeq, processed))
          touched.iterator.map(c => CMOut(row, c, counts(c), processed))
      }
  }

  /** Point estimate from a materialized sketch snapshot
    * ((row, col) → count; absent cells are zero): the min over rows
    * at the token's column. Never below the true count; above it by
    * at most the smallest row's collision mass.
    */
  def estimateJvm(snapshot: Map[(Int, Int), Long], token: String,
                  depth: Int, width: Int): Long =
    (0 until depth).map { r =>
      snapshot.getOrElse((r, colOf(r, token, width)), 0L)
    }.min
}
