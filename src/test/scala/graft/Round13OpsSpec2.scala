package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Events, Layout, Profile, Relational, TextAnalysis, Temporal}
import graft.sources.Multimodal

/** Round-13 wave part 2 — hand fixtures and adversarial bytes for the
  * q534–q543 operators. Container tests assemble bytes INDEPENDENTLY
  * of the production encoders (the q513/q516 round-trip discipline).
  */
class Round13OpsSpec2 extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  // ---------------- q534 Anderson–Darling ----------------

  test("q534 AD: hand-computed A2akN on fully separated samples") {
    val dir = tmpDir("ad2")
    Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // bins z = 1,2 for A and 3,4 for B -> by hand A2 = 3/16 * 2*(304/33)/2
    Seq((10L, 1L, 150.0), (11L, 1L, 250.0), (12L, 2L, 350.0), (13L, 2L, 450.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Profile.andersonDarling2(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("n_bins") === 4L)
    // sum_ca = sum_cb = 304/33; A2 = 3/16 * (304/33/2 + 304/33/2)
    assert(math.abs(r.getAs[Double]("a2_akn") - 304.0 / 33.0 * 3.0 / 16.0) < 1e-6)
  }

  test("q534 AD: identical samples score ~0 (complete overlap)") {
    val dir = tmpDir("ad0")
    Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = (0 until 20).flatMap(i =>
      Seq((100L + i, 1L, 100.0 * (1 + i % 5) + 50.0),
        (200L + i, 2L, 100.0 * (1 + i % 5) + 50.0)))
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Profile.andersonDarling2(spark, dir).collect()(0)
    // identical distributions: every (N*M2a - na*B2) factor is 0
    assert(r.getAs[Double]("a2_akn") === 0.0)
  }

  // ---------------- q535 cointegration ----------------

  test("q535: a 2x-plus-bounded-residual pair flags cointegrated; a trending pair does not") {
    val dir = tmpDir("coint")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    var eid = 0L
    val rows = (0L until 20L).flatMap { t =>
      val xa = 3 + (t % 3).toInt // type a: cyclic
      val xb = 2 * xa + (t % 2).toInt // type b: 2*a + alternating residual
      val xc = (t + 1).toInt // type c: linear trend
      Seq.fill(xa)("a") ++ Seq.fill(xb)("b") ++ Seq.fill(xc)("c")
    }.map { typ =>
      eid += 1
      // one event per unit of that day's count
      (eid, ts((eid % 20).toInt), eid, typ, 1.0, "{}")
    }
    // regenerate deterministically: day assignment must follow t, not eid
    var eid2 = 0L
    val rows2 = (0L until 20L).flatMap { t =>
      val xa = 3 + (t % 3).toInt
      val xb = 2 * xa + (t % 2).toInt
      val xc = (t + 1).toInt
      (Seq.fill(xa)("a") ++ Seq.fill(xb)("b") ++ Seq.fill(xc)("c")).map { typ =>
        eid2 += 1
        (eid2, ts(t), eid2, typ, 1.0, "{}")
      }
    }
    rows2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.cointegrationScreen(spark, dir).collect()
      .map(r => (r.getAs[String]("type_x"), r.getAs[String]("type_y")) -> r)
      .toMap
    assert(out.size === 6)
    val ab = out(("a", "b"))
    assert(ab.getAs[String]("verdict") === "cointegrated",
      s"df_stat=${ab.getAs[Double]("df_stat")}")
    // beta recovers roughly the 2x relation
    assert(math.abs(ab.getAs[Double]("beta") - 2.0) < 0.6)
    val ac = out(("a", "c"))
    assert(ac.getAs[String]("verdict") !== "cointegrated",
      s"df_stat=${ac.getAs[Double]("df_stat")}")
  }

  // ---------------- q536 FLAC ----------------

  /** Independent FLAC assembly: different rate/channels/bps and block
    * mix than encodeFlac ever produces; bit-packs STREAMINFO by hand.
    */
  private def independentFlac(): (Array[Byte], Int, Long, Long) = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    def be24(v: Int): Unit = {
      out.write((v >> 16) & 0xFF); out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
    }
    out.write(0x00); be24(34) // STREAMINFO, not last
    out.write(0x12); out.write(0x34); out.write(0x56); out.write(0x78)
    be24(1000); be24(2000)
    // rate 96000, channels 2, bps 24, total 123456789
    val packed = (96000L << 44) | (1L << 41) | (23L << 36) | 123456789L
    (7 to 0 by -1).foreach(i => out.write(((packed >> (8 * i)) & 0xFF).toInt))
    (0 until 16).foreach(_ => out.write(0xAB))
    out.write(0x80 | 0x06); be24(12) // PICTURE block, last flag set
    (0 until 12).foreach(out.write)
    (out.toByteArray, 2, 123456789L, 38L + 16L)
  }

  test("q536 round-trip: sniffFlac unpacks an independently-assembled STREAMINFO") {
    val (flac, nBlocks, total, metaBytes) = independentFlac()
    assert(Multimodal.sniffFlac(flac) ===
      Some((nBlocks, 96000, 2, 24, total, metaBytes)))
  }

  test("q536: non-STREAMINFO first block, overrun, and missing last flag rejected") {
    val (flac, _, _, _) = independentFlac()
    val badFirst = flac.clone()
    badFirst(4) = 0x01 // PADDING where STREAMINFO must be
    assert(Multimodal.sniffFlac(badFirst).isEmpty)
    val overrun = flac.clone()
    overrun(flac.length - 15) = 0x7F // inflate the last block's length
    assert(Multimodal.sniffFlac(overrun).isEmpty)
    val noLast = flac.clone()
    noLast(flac.length - 16) = 0x06 // clear the last-block flag -> walk overruns
    assert(Multimodal.sniffFlac(noLast).isEmpty)
  }

  // ---------------- q537 OGG ----------------

  /** Independent OGG assembly: one packet spanning lacing segments
    * (255+255+90), a shape encodeOgg never emits.
    */
  private def independentOgg(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xFF))
    def le64(v: Long): Unit =
      (0 until 8).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    out.write("OggS".getBytes("US-ASCII")); out.write(0)
    out.write(0x02 | 0x04) // single page: BOS+EOS
    le64(48000L); le32(77); le32(0); le32(0)
    out.write(3) // segments: 255, 255, 90 -> ONE 600-byte packet
    out.write(255); out.write(255); out.write(90)
    (0 until 600).foreach(j => out.write(j % 251))
    out.toByteArray
  }

  test("q537 round-trip: multi-segment packet reassembles as one packet") {
    val ogg = independentOgg()
    assert(Multimodal.sniffOgg(ogg) === Some((1, 1, 600L, 48000L, 77L)))
  }

  test("q537: sequence gap, missing EOS, and bad version rejected") {
    val ogg = independentOgg()
    val badSeq = ogg.clone()
    badSeq(18) = 5 // page_seq 5 on the first page
    assert(Multimodal.sniffOgg(badSeq).isEmpty)
    val noEos = ogg.clone()
    noEos(5) = 0x02 // BOS only, stream never ends
    assert(Multimodal.sniffOgg(noEos).isEmpty)
    val badVer = ogg.clone()
    badVer(4) = 1
    assert(Multimodal.sniffOgg(badVer).isEmpty)
  }

  // ---------------- q538 EBML ----------------

  test("q538 round-trip: 1-byte ID with a 3-byte size vint parses") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xBF) // class-A 1-byte ID (CRC-32)
    // size 300 as a 3-byte vint: 001xxxxx marker
    out.write(0x20); out.write(0x01); out.write(0x2C)
    (0 until 300).foreach(j => out.write(j % 200))
    assert(Multimodal.sniffEbml(out.toByteArray) ===
      Some((1, 300L, "BF", "BF")))
  }

  test("q538: zero first byte, overrun, and trailing garbage rejected") {
    assert(Multimodal.sniffEbml(Array[Byte](0x00, 0x01)).isEmpty)
    val overrun = new java.io.ByteArrayOutputStream()
    overrun.write(0xBF); overrun.write(0x85) // size 5, only 2 payload bytes
    overrun.write(1); overrun.write(2)
    assert(Multimodal.sniffEbml(overrun.toByteArray).isEmpty)
    val ok = new java.io.ByteArrayOutputStream()
    ok.write(0xBF); ok.write(0x82); ok.write(1); ok.write(2)
    assert(Multimodal.sniffEbml(ok.toByteArray) === Some((1, 2L, "BF", "BF")))
  }

  // ---------------- q539 rendezvous ----------------

  test("q539: only the drained node's docs move; totals conserve") {
    val out = Layout.rendezvousAudit(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 16)
    val drained = out.find(_.getAs[String]("node") == "n07").get
    assert(drained.getAs[Long]("n_after") === 0L)
    assert(drained.getAs[Long]("gained") === 0L)
    val survivors = out.filter(_.getAs[String]("node") != "n07")
    // the HRW invariant: a survivor's after-count is exactly its
    // before-count plus what it inherited from the drained node
    survivors.foreach { r =>
      assert(r.getAs[Long]("n_after") ===
        r.getAs[Long]("n_before") + r.getAs[Long]("gained"),
        s"node ${r.getAs[String]("node")}")
    }
    assert(out.map(_.getAs[Long]("n_before")).sum ===
      out.map(_.getAs[Long]("n_after")).sum)
    assert(survivors.map(_.getAs[Long]("gained")).sum ===
      drained.getAs[Long]("n_before"))
  }

  // ---------------- q540 join-size audit ----------------

  test("q540: exact join size and independence estimate on a skewed fixture") {
    val dir = tmpDir("jsz")
    Seq(1L, 1L, 2L).map(k => (k, 0L, 0L, new java.sql.Date(0L), 1.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 0L, 0.0), (2L, 0L, 0.0), (2L, 0L, 0.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((9L, "x")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((9L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val byKey = Relational.joinSizeAudit(spark, dir).collect()
      .map(r => r.getAs[String]("join_key") -> r).toMap
    val ok = byKey("l_orderkey")
    // exact: key1 2x1 + key2 1x2 = 4 ; estimate: 3*3/max(2,2) = 4.5
    assert(ok.getAs[Long]("actual_rows") === 4L)
    assert(ok.getAs[Double]("est_rows") === 4.5)
    assert(math.abs(ok.getAs[Double]("err_ratio") - 4.0 / 4.5) < 1e-6)
    // disjoint key domains: actual 0, est nonzero -> ratio 0
    assert(byKey("l_partkey").getAs[Long]("actual_rows") === 0L)
    assert(byKey("l_partkey").getAs[Double]("err_ratio") === 0.0)
  }

  // ---------------- q541 histogram selectivity ----------------

  test("q541: uniform data makes the equi-depth estimate exact") {
    val dir = tmpDir("hsel")
    // z = 1..100 each once: l_extendedprice = z*100 + 1
    (1 to 100).map(z => (z.toLong, 0L, new java.sql.Date(0L), z * 100.0 + 1.0))
      .toDF("l_orderkey", "l_partkey", "l_shipdate", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Profile.histogramSelectivityAudit(spark, dir).collect()
      .map(r => r.getAs[Long]("cut_z") -> r).toMap
    // cut 50: boundary b_10 = 50, frac 0 -> est = 5*10 = 50 = actual
    assert(out(50L).getAs[Long]("actual_rows") === 50L)
    assert(out(50L).getAs[Double]("est_rows") === 50.0)
    assert(out(50L).getAs[Double]("rel_err") === 0.0)
    // cut 100 = zmax: estimate clamps to N
    assert(out(100L).getAs[Long]("actual_rows") === 100L)
    assert(out(100L).getAs[Double]("est_rows") === 100.0)
    // cuts beyond the domain stay at N
    assert(out(1000L).getAs[Long]("actual_rows") === 100L)
    assert(out(1000L).getAs[Double]("est_rows") === 100.0)
  }

  // ---------------- q542 MATTR ----------------

  test("q542: cyclic vocabulary gives MATTR 0.2 and TTR 10/60") {
    val dir = tmpDir("mattr")
    val text = (0 until 60).map(i => s"w${i % 10}").mkString(" ")
    Seq((1L, text, "en", "s1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.mattrProfile(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 60L)
    // every 50-token window holds exactly the 10 types
    assert(r.getAs[Double]("mattr_50") === 0.2)
    assert(math.abs(r.getAs[Double]("ttr") - 10.0 / 60.0) < 1e-6)
  }

  test("q542: a doc under 50 tokens reports NULL MATTR but real TTR") {
    val dir = tmpDir("mattr2")
    Seq((1L, "a b c a b c", "en", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.mattrProfile(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.isNullAt(r.fieldIndex("mattr_50")))
    assert(r.getAs[Double]("ttr") === 0.5)
  }

  // ---------------- q543 streaming CDC ----------------

  test("q543: replayed snapshot equals the one-shot max-version relation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingGraded.cdcReplay(spark, dir)
      .collect()
    assert(streamed.nonEmpty)
    // recompute the one-shot relation with plain batch ops
    val ev = graft.Tables.load(spark, dir, "events")
      .withColumn("ms", graft.operators.Relational.tsMs("ts"))
    val users = ev.select(col("user_id")).distinct()
      .orderBy(md5(col("user_id").cast("string")), col("user_id")).limit(256)
    val ch = ev.join(broadcast(users), "user_id")
      .withColumn("v", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("ms"), col("event_id"))).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("v").desc)
    val oneShot = ch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_type"),
        col("v").as("version"))
      .orderBy(col("user_id")).collect()
    assert(streamed.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq === oneShot.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq)
  }
}
