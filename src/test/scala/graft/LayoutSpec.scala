package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: key correctness against a reference bit-interleave,
  * the documented low-bits aliasing, and the writer's span narrowing —
  * per-file min/max extents (what parquet footer stats expose to a
  * file-skipping reader) must be narrow in BOTH dimensions vs an
  * unsorted layout of the same data.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Reference Morton interleave, independent of the Column impl. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, b) =>
      acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }

  test("zorderKey matches the reference interleave") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L), (12345L, 54321L),
      (65535L, 65535L), (40000L, 7L))
    val df = cases.toDF("x", "y")
      .select($"x", $"y", Layout.zorderKey($"x", $"y").as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === morton(r.getLong(0), r.getLong(1), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("keys beyond 2^bits alias (documented) and bitsFor sizes past it") {
    val df = Seq((40000L, 7L)).toDF("x", "y")
    val aliased = df.select(
      Layout.zorderKey($"x" + (1L << 16), $"y").as("a"),
      Layout.zorderKey($"x", $"y").as("b")).head()
    assert(aliased.getLong(0) === aliased.getLong(1))
    // bitsFor covers the observed domain, so the same pair separates
    val bits = Layout.bitsFor(
      Seq((40000L + 65536L, 7L), (40000L, 7L)).toDF("x", "y"), "x", "y")
    assert(bits === 17)
    val sep = df.select(
      Layout.zorderKey($"x" + (1L << 16), $"y", bits).as("a"),
      Layout.zorderKey($"x", $"y", bits).as("b")).head()
    assert(sep.getLong(0) !== sep.getLong(1))
  }

  test("property: zorderKey is a bijection on the in-domain rectangle") {
    // within 2^bits × 2^bits the Morton interleave must be invertible:
    // any collision would merge unrelated cells and silently corrupt
    // the layout's locality guarantee
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val coord = Gen.chooseNum(0L, 65535L)
    val gen = Gen.listOfN(60, Gen.zip(coord, coord))
    val p = Prop.forAll(gen) { pts =>
      val distinct = pts.distinct
      val rows = distinct.toDF("x", "y")
        .select($"x", $"y", Layout.zorderKey($"x", $"y").as("z"))
        .as[(Long, Long, Long)].collect()
      rows.length == distinct.length &&
        rows.map(_._3).distinct.length == distinct.length &&
        rows.forall { case (x, y, z) => z == morton(x, y, 16) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), p)
    assert(res.passed, res.status.toString)
  }

  test("writeZOrdered narrows per-file spans in BOTH dimensions") {
    // a shuffled 64x64 grid: every (x, y) once, in hash order
    val n = 64
    val grid = spark.range(n.toLong * n)
      .select(($"id" % n).as("x"), ($"id" / n).cast("long").as("y"))
      .orderBy(md5(concat_ws(",", $"id")))
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val zdir = s"$base/z"
    val udir = s"$base/u"
    Layout.writeZOrdered(grid, "x", "y", zdir, 16)
    grid.repartition(16).write.mode("overwrite").parquet(udir)

    // per-file min/max extents — the values a reader's footer-stats
    // pruning consults (computed from the data: identical numbers)
    def meanSpans(dir: String): (Double, Double, Long) = {
      val perFile = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy($"f")
        .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"),
          count(lit(1)).as("cnt"))
      val r = perFile.agg(avg($"xs"), avg($"ys"), sum($"cnt"), count(lit(1))).head()
      assert(r.getLong(3) >= 8, s"expected >=8 files in $dir")
      (r.getDouble(0), r.getDouble(1), r.getLong(2))
    }
    val (zx, zy, zn) = meanSpans(zdir)
    val (ux, uy, un) = meanSpans(udir)
    assert(zn === n.toLong * n && un === n.toLong * n) // round-trip
    // unsorted files cover nearly the whole domain in both dims;
    // z-ordered files must be materially narrower in BOTH
    assert(zx < ux / 2, s"x span not narrowed: z=$zx unsorted=$ux")
    assert(zy < uy / 2, s"y span not narrowed: z=$zy unsorted=$uy")
  }

  test("HilbertKey: classic order-1 walk, full-grid bijection, neighbor continuity Morton lacks") {
    import graft.functions.HilbertKey.key
    // order-1 U walk: (0,0)->0, (0,1)->1, (1,1)->2, (1,0)->3
    assert(key(0, 0, 1) === 0L)
    assert(key(0, 1, 1) === 1L)
    assert(key(1, 1, 1) === 2L)
    assert(key(1, 0, 1) === 3L)
    // bits=3: a bijection onto 0..63 ...
    val pts = for { x <- 0 until 8; y <- 0 until 8 } yield (x, y)
    val ds = pts.map { case (x, y) => key(x, y, 3) }
    assert(ds.sorted === (0L until 64L))
    // ... whose CONSECUTIVE keys are always grid neighbors (the
    // Hilbert locality guarantee)
    val byD = pts.map { case (x, y) => key(x, y, 3) -> ((x, y)) }.toMap
    (0L until 63L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // Morton, same grid: the quadrant seam jumps (e.g. z=3 is (1,1),
    // z=4 is (2,0) — manhattan distance 3), which is exactly the
    // locality difference the q282-vs-q59 audit measures
    def mkey(x: Long, y: Long): Long =
      (0 until 3).map(b => (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))).reduce(_ | _)
    val zpts = pts.map { case (x, y) => mkey(x, y) -> ((x, y)) }.toMap
    val jumps = (0L until 63L).count { z =>
      val (x1, y1) = zpts(z); val (x2, y2) = zpts(z + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0)
  }

  test("HilbertKey property: bijection and unit-step continuity at every order 1..6") {
    import graft.functions.HilbertKey.key
    (1 to 6).foreach { bits =>
      val side = 1 << bits
      val pts = for { x <- 0 until side; y <- 0 until side } yield (x, y)
      val ds = pts.map { case (x, y) => key(x, y, bits) }
      assert(ds.sorted == (0L until side.toLong * side),
        s"not a bijection at bits=$bits")
      val byD = pts.map { case (x, y) => key(x, y, bits) -> ((x, y)) }.toMap
      (0L until side.toLong * side - 1).foreach { d =>
        val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"jump at bits=$bits d=$d")
      }
    }
  }

  test("hilbertCells: pipeline matches an independent scalar-kernel recomputation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hil").toString
    val ts = new java.sql.Timestamp(0L)
    val rows = for { p <- 0L until 40L; s <- 0L until 3L } yield (p, s)
    rows.map { case (pk, sk) =>
        (1L, pk, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val viaExpr = graft.operators.Layout.hilbertCells(spark, dir, cellShift = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // independent recomputation from the shared scalar kernel (the
    // DuckDB CTE twin's parity is the q282 oracle gate's job)
    val expected = rows.groupBy { case (p, s) =>
        graft.functions.HilbertKey.key(p, s, 16) >> 4 }
      .map { case (cell, pts) =>
        val ps = pts.map(_._1); val ss = pts.map(_._2)
        (cell, pts.size.toLong, ps.min, ps.max, ss.min, ss.max,
          ps.max - ps.min, ss.max - ss.min) }
      .toSeq.sortBy(_._1)
    assert(viaExpr === expected)
  }

  test("planCompaction: FFD fills bins to target, isolates oversize, deterministic") {
    val files = Seq(
      ("a", 70L), ("b", 40L), ("c", 35L), ("d", 30L), ("e", 20L),
      ("f", 150L), // oversize: own bin
      ("g", 5L))
    val plan = Layout.planCompaction(files, targetBytes = 100L)
    val byBin = plan.groupBy(_._1)
      .map { case (b, m) => b -> m.map(_._2).toSet }
    // every non-oversize bin fits the target
    val sizes = files.toMap
    byBin.foreach { case (b, members) =>
      val tot = members.toSeq.map(sizes).sum
      assert(tot <= 100L || members.size == 1,
        s"bin $b over target with ${members.size} files")
    }
    // the oversize file sits alone
    val fBin = plan.find(_._2 == "f").get._1
    assert(byBin(fBin) === Set("f"))
    // bin count is at least the volume lower bound (excluding oversize)
    val smallTotal = files.filter(_._2 <= 100L).map(_._2).sum
    assert(byBin.size - 1 >= math.ceil(smallTotal / 100.0).toInt - 1)
    // deterministic
    assert(plan === Layout.planCompaction(files, 100L))
  }

  test("compactParquet: end-to-end merge preserves rows and respects the plan") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-cmp-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-cmp-out").toString
    // skewed file sizes: 12 files of very different row counts
    (1 to 12).foreach { i =>
      (1 to i * i * 10).map(j => (i.toLong, j.toLong))
        .toDF("f", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/part_$i")
    }
    // flatten: move each part file up into one dir
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    (1 to 12).foreach { i =>
      val src = fs.listStatus(new org.apache.hadoop.fs.Path(s"$in/part_$i"))
        .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
      fs.rename(src, new org.apache.hadoop.fs.Path(s"$in/f_$i.parquet"))
    }
    val total = spark.read.parquet(s"$in/*.parquet").count()
    val target = 64L * 1024
    val ledger = Layout.compactParquet(spark, in, out, target)
      .as[(Int, Long, Long)].collect().toSeq
    assert(ledger.map(_._2).sum === 12L)
    // rows preserved across the merge
    val after = spark.read.parquet(s"$out/bin=*").count()
    assert(after === total)
    // each bin wrote exactly one data file
    ledger.foreach { case (bin, _, _) =>
      val n = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/bin=$bin"))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(n === 1, s"bin $bin has $n files")
    }
  }
}
