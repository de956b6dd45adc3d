package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{col, unix_micros, when}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native sort-merge AS-OF join — the whole-operator custom-plan tier
  * (SURVEY §2 preference (c): LogicalPlan + Strategy + SparkPlan via
  * SparkSessionExtensions) for the one temporal operator Spark's
  * relational algebra genuinely lacks. Semantics: for every left row,
  * the single right row with the same key and the LARGEST right time
  * ≤ the left time (backward as-of, left outer — no match ⇒ nulls),
  * i.e. DuckDB's `ASOF JOIN`/pandas `merge_asof` default.
  *
  * Why a custom operator instead of the q46 union+window composition:
  * the composition shuffles the UNION of both streams and carries the
  * window machinery per row; this node asks Catalyst for exactly a
  * co-partitioned (key-clustered) + (key, time)-sorted pair of
  * children — EnsureRequirements plans the exchanges/sorts, reusing
  * any existing layout (bucketed/pre-sorted inputs join with NO
  * shuffle) — and then streams both sorted sides through an O(1)-state
  * per-partition merge: one retained candidate row per key, no
  * buffering of either side, no window frame. The merge itself is the
  * SortMergeJoinExec pattern with the inner loop specialized to
  * "advance while right ≤ left, keep last".
  *
  * Determinism note: if several right rows tie on (key, time), the
  * LAST in child sort order wins — callers wanting cross-engine
  * determinism (the oracle does) make (key, time) unique on the right
  * first, exactly as DuckDB's ASOF JOIN documentation advises.
  * Null handling: null times must be filtered/coalesced by the caller
  * ([[AsofJoinOps.asofJoin]] rejects nullable-time plans at build).
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: 1:1 physical mapping. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of merge. Child requirements make Catalyst do
  * the heavy lifting: key-clustered distribution (co-partitioned
  * exchange pair, or none if the layout already clusters) and
  * (key, time) ascending sort on both sides. Execution is a
  * zip-partitions merge with one retained row of state.
  */
case class AsofJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    s"as-of times must be LongType, got ${leftTime.dataType}/${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output
    val nRight = rOut.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      new Iterator[InternalRow] {
        // un-consumed right row: held by REFERENCE between next()
        // calls — valid because the sorter's row memory is only
        // reused on the next rIter.next(), which we never call while
        // rHead is set
        private var rHead: InternalRow = null
        private var candidate: InternalRow = null // last right ≤ left time
        private var candidateKey: UnsafeRow = null
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l).getLong(0)
          var done = false
          while (!done) {
            if (rHead == null && rIter.hasNext) rHead = rIter.next()
            if (rHead == null) done = true
            else {
              val rk = rKeyProj(rHead)
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) rHead = null // left is sorted: never needed again
              else if (cmp == 0 && rTimeProj(rHead).getLong(0) <= lt) {
                // still at-or-before this left row: becomes (or
                // replaces) the candidate; copies detach from the
                // iterator's reused row memory
                candidate = rHead.copy()
                candidateKey = rk.copy()
                rHead = null
              } else done = true // future key or future time: stop
            }
          }
          val out =
            if (candidate != null && keyOrd.compare(candidateKey, lk) == 0)
              joined(l, candidate)
            else joined(l, nullRight)
          resultProj(out)
        }
      }
    }
  }
}

/** DataFrame-level API + session installation. */
object AsofJoinOps {

  /** Register the strategy on an existing session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** Backward as-of join `left` to `right` on equal `keys` and
    * `right.timeCol ≤ left.timeCol`, most recent right row wins; left
    * outer. Timestamp time columns compare as unix micros; integer
    * ones as longs. Right columns come back null-padded on no match.
    * Right time columns that are nullable must be pre-filtered (the
    * merge compares primitive longs).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    def asLong(df: DataFrame, c: String, out: String): DataFrame = {
      val t = df.schema(c).dataType
      val cast = if (t == TimestampType) unix_micros(col(c))
        else col(c).cast(LongType)
      df.withColumn(out, cast)
    }
    val l2 = asLong(left, leftTimeCol, "__asof_lt")
    val r2raw = asLong(right, rightTimeCol, "__asof_rt")
    // self-join safety: left and right may share a lineage (and thus
    // attribute ids); re-aliasing every right column mints fresh
    // exprIds at the subtree boundary, so the node's right keys stay
    // bound when the analyzer deduplicates the shared relations below
    val r2 = r2raw.select(r2raw.columns.map(c => col(c).as(c)): _*)
    val lPlan = l2.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val node = AsofJoin(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, "__asof_lt"), attr(rPlan, "__asof_rt"))
    // USING-join output shape: left columns + right non-key columns
    // (the right keys equal the left's by construction; keeping both
    // would make every key reference ambiguous downstream)
    val dropNames = (keys :+ "__asof_rt").toSet
    val kept = lPlan.output.filterNot(_.name == "__asof_lt") ++
      node.output.drop(lPlan.output.length)
        .filterNot(a => dropNames.contains(a.name))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      org.apache.spark.sql.catalyst.plans.logical.Project(kept, node))
  }

  /** Point-in-interval lookup over NON-OVERLAPPING keyed intervals
    * ([start, end), open end = null): an as-of join on the interval
    * start plus the end filter — the SCD2 "state at time t" probe
    * expressed through the native operator. Rows whose matched
    * interval has already closed before t come back null-padded (the
    * probe time falls in a gap), exactly like a no-match.
    */
  def pointInInterval(left: DataFrame, intervals: DataFrame,
                      keys: Seq[String], leftTimeCol: String,
                      startCol: String, endCol: String): DataFrame = {
    val joined = asofJoin(left, intervals, keys, leftTimeCol, startCol)
    // materialize the predicate FIRST: nulling endCol in the fold
    // would flip `isNull` for the columns processed after it
    val inWindow = col(endCol).isNull ||
      asLongCol(left, leftTimeCol) < asLongCol(intervals, endCol)
    val marked = joined.withColumn("__piv_in", inWindow)
    val rightCols = intervals.columns.filterNot(keys.contains)
    rightCols.foldLeft(marked) { (df, c) =>
      df.withColumn(c, when(col("__piv_in"), col(c)))
    }.drop("__piv_in")
  }

  /** The same long normalization [[asofJoin]] applies to time
    * columns, for expressions that must compare against them.
    */
  private def asLongCol(df: DataFrame, c: String): Column =
    if (df.schema(c).dataType == TimestampType) unix_micros(col(c))
    else col(c).cast(LongType)
}
