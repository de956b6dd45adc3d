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
    * q38 iteration discipline (checkpoint per round, no broadcast of
    * the rank table). Overflow headroom: rank_e12 ≤ 1e12, times an
    * edge weight, stays far under 2^63 for weights < 9e6.
    */
  def pagerank(spark: SparkSession, dir: String, iters: Int = 3,
               dampNum: Int = 17, dampDen: Int = 20): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint()
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs.select(col("pa").as("src"), col("pb").as("dst"), col("w"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst"), col("w")))
    val wdeg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    // pre-partitioned on src BEFORE the checkpoint: localCheckpoint
    // preserves partitioning, so the three per-round joins reuse this
    // layout and only the (tiny) rank side exchanges each iteration
    val edgesW = edges.join(wdeg, "src")
      .repartition(col("src")).localCheckpoint()
    val nodes = li.select(col("l_partkey").as("p")).distinct().localCheckpoint()
    val n = nodes.count()
    val r0 = Scale / n
    val teleport = ((dampDen - dampNum) * Scale / dampDen) / n
    var rank = nodes.select(col("p"), lit(r0).as("rank_e12"))
    for (_ <- 1 to iters) {
      val contribs = edgesW
        .join(rank.withColumnRenamed("p", "src"), "src")
        .select(col("dst"), expr("(rank_e12 * w) div wdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
      rank = nodes
        .join(contribs.withColumnRenamed("dst", "p"), Seq("p"), "left")
        .select(col("p"), (lit(teleport) +
          expr(s"($dampNum * coalesce(s, 0L)) div $dampDen")).as("rank_e12"))
        .localCheckpoint() // cut lineage per round (q38 discipline)
    }
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
