package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics beyond connected components (q38): weighted
  * PageRank over the part co-purchase graph — parts appearing in the
  * same order are edges weighted by co-occurrence count, and rank
  * finds the parts central to the purchase network (the
  * recommendation-seed ranking co-purchase graphs exist for).
  */
object Graph {

  /** Fixed-point scale: ranks are integers in units of 1e-12. */
  val Scale: Long = 1000000000000L

  /** Rounds executed by the most recent [[pagerank]] call (observable
    * convergence: the L1-delta stop is a loop-internal decision, and
    * tests need to assert it fired without re-deriving rank deltas).
    */
  @volatile private[graft] var lastRounds: Int = 0

  /** q107 — weighted PageRank, fixed `iters` power iterations with
    * damping 17/20 (= 0.85 as a RATIONAL) over the undirected
    * co-purchase graph: each undirected edge becomes two directed
    * edges; contributions split proportionally to edge weight over
    * the source's weighted degree. Isolated parts hold the teleport
    * floor; mass at dangling ends decays (the classic simplified
    * treatment, identical on both engines).
    *
    * Exactness: the whole recurrence is SCALED-INTEGER arithmetic —
    * ranks live as BIGINTs in units of 1e-12 (`rank_e12`), every
    * division is an integer floor, and damping/teleport are
    * rationals. A double formulation was tried first and failed the
    * oracle: iterating round(double, 12) exposes half-boundary
    * disagreements between Spark's shortest-repr BigDecimal rounding
    * and DuckDB's binary-double rounding (6000 roundings per run hit
    * one within two iterations). Integer floors lose ≤1e-12 of mass
    * per term instead — deterministic, engine-portable, and honest.
    *
    * Scale: the edge list (with source degrees joined) is built ONCE
    * and checkpointed; each iteration is one co-partitioned
    * edges⋈rank join + one dst-keyed partial+final aggregate — the
    * q38 iteration discipline (checkpoint per round via
    * [[graft.Iterate.cut]]: localCheckpoint locally, reliable
    * replicated checkpoint under `spark.graft.checkpoint.reliable`,
    * so a 100 TB run survives executor loss mid-fixpoint). Overflow
    * headroom: rank_e12 ≤ 1e12, times an edge weight, stays far under
    * 2^63 for weights < 9e6.
    *
    * Termination: `iters` is a MAXIMUM. After each round an L1-delta
    * probe — `sum(abs(rank − prev))` over the node-count-sized rank
    * table, one tiny co-partitioned join + agg — stops the loop once
    * total movement ≤ `tolE12` (units of 1e-12 rank mass). The default
    * `tolE12 = 0` stops only at the exact integer fixpoint, so the
    * graded 3-iteration result is bit-identical to the unrolled-CTE
    * oracle: stopping early is only possible when another round would
    * reproduce the same ranks. A real ranking run passes e.g.
    * `iters = 50, tolE12 = n` (mean drift < 1e-12/node).
    */
  def pagerank(spark: SparkSession, dir: String, iters: Int = 3,
               dampNum: Int = 17, dampDen: Int = 20,
               tolE12: Long = 0L): DataFrame = {
    val li = graft.Iterate.cut(Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct())
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs.select(col("pa").as("src"), col("pb").as("dst"), col("w"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst"), col("w")))
    val wdeg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    // pre-partitioned on src BEFORE the checkpoint: both checkpoint
    // flavors preserve partitioning, so the three per-round joins
    // reuse this layout and only the (tiny) rank side exchanges each
    // iteration
    val edgesW = graft.Iterate.cut(edges.join(wdeg, "src")
      .repartition(col("src")))
    val nodes = graft.Iterate.cut(li.select(col("l_partkey").as("p")).distinct())
    val n = nodes.count()
    val r0 = Scale / n
    val teleport = ((dampDen - dampNum) * Scale / dampDen) / n
    var rank = nodes.select(col("p"), lit(r0).as("rank_e12"))
    var round = 0
    var delta = Long.MaxValue
    while (round < iters && delta > tolE12) {
      round += 1
      val contribs = edgesW
        .join(rank.withColumnRenamed("p", "src"), "src")
        .select(col("dst"), expr("(rank_e12 * w) div wdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
      val next = graft.Iterate.cut(nodes
        .join(contribs.withColumnRenamed("dst", "p"), Seq("p"), "left")
        .select(col("p"), (lit(teleport) +
          expr(s"($dampNum * coalesce(s, 0L)) div $dampDen")).as("rank_e12")))
      // L1 convergence probe over the just-checkpointed round — a
      // node-count-sized co-partitioned join, negligible next to the
      // edge join above; skipped when the iteration cap ends the loop
      // anyway
      if (round < iters) delta = next
        .join(rank.withColumnRenamed("rank_e12", "prev_e12"), "p")
        .agg(coalesce(sum(abs(col("rank_e12") - col("prev_e12"))), lit(0L)))
        .head().getLong(0)
      rank = next
    }
    lastRounds = round
    rank
      .join(wdeg.withColumnRenamed("src", "p"), Seq("p"), "left")
      .select(col("p").as("p_partkey"), col("rank_e12"),
        coalesce(col("wdeg"), lit(0L)).as("wdeg"))
      .orderBy(col("rank_e12").desc, col("p_partkey"))
  }

  /** DuckDB twin: the same power iteration unrolled as chained CTEs,
    * same scaled-integer recurrence (`//` = Spark's `div` on
    * positive operands).
    */
  def pagerankSql(iters: Int = 3, dampNum: Int = 17,
                  dampDen: Int = 20): String = {
    val base =
      s"""WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |), edges AS (
        |  SELECT pa AS src, pb AS dst, w FROM pairs
        |  UNION ALL
        |  SELECT pb AS src, pa AS dst, w FROM pairs
        |), wdeg AS (
        |  SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg FROM edges GROUP BY src
        |), edgesw AS (
        |  SELECT e.src, e.dst, e.w, d.wdeg FROM edges e JOIN wdeg d USING (src)
        |), nodes AS (
        |  SELECT DISTINCT l_partkey AS p FROM li
        |), nn AS (
        |  SELECT COUNT(*) AS n FROM nodes
        |), it0 AS (
        |  SELECT p, $Scale // n AS rank_e12 FROM nodes CROSS JOIN nn
        |)""".stripMargin
    val steps = (1 to iters).map { t =>
      s""", c$t AS (
        |  SELECT e.dst,
        |    CAST(SUM((r.rank_e12 * e.w) // e.wdeg) AS BIGINT) AS s
        |  FROM edgesw e JOIN it${t - 1} r ON e.src = r.p
        |  GROUP BY e.dst
        |), it$t AS (
        |  SELECT nodes.p,
        |    ((${dampDen - dampNum} * $Scale // $dampDen) // n)
        |      + ($dampNum * COALESCE(c$t.s, 0)) // $dampDen AS rank_e12
        |  FROM nodes CROSS JOIN nn LEFT JOIN c$t ON nodes.p = c$t.dst
        |)""".stripMargin
    }.mkString
    base + steps +
      s"""
        |SELECT r.p AS p_partkey, CAST(r.rank_e12 AS BIGINT) AS rank_e12,
        |  CAST(COALESCE(d.wdeg, 0) AS BIGINT) AS wdeg
        |FROM it$iters r LEFT JOIN wdeg d ON r.p = d.src
        |ORDER BY r.rank_e12 DESC, p_partkey""".stripMargin
  }
}
