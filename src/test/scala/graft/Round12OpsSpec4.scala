package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Events, Relational, Similarity, Temporal, TextAnalysis}

/** Round-12 wave: Croston intermittent demand (q496), Chow break
  * test (q497), greedy max-coverage selection (q498), RMST ladder
  * (q499), NB calibration/ECE (q500), Cochran's Q (q501),
  * mean-excess ladder (q502), Atkinson index (q503) — hand-computed
  * kernels on literal fixtures plus invariants on testdata.
  */
class Round12OpsSpec4 extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  val sf0001 = "/root/testdata/sf0.001"

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("q496 Croston: hand-computed dyadic folds, ADI/CV2 quadrant") {
    val dir = tmpDir("croston")
    def d(day: Long) = new java.sql.Date(day * 86400000L)
    // one part, demand weeks {0, 3, 5} with sizes {4, 2, 6}:
    // z-fold: 4 -> (2+4)/2=3 -> (6+3)/2=4.5 ; gap-fold: 3 -> (2+3)/2=2.5
    Seq((7L, d(0), 4.0), (7L, d(21), 2.0), (7L, d(35), 6.0))
      .toDF("l_partkey", "l_shipdate", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Temporal.crostonDemand(spark, dir).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_wk") === 3L)
    assert(r.getAs[Double]("z_hat") === 4.5)
    assert(r.getAs[Double]("p_hat") === 2.5)
    assert(r.getAs[Double]("croston") === 1.8)
    assert(r.getAs[Double]("croston_sba") === 1.35)
    assert(r.getAs[Double]("adi") === 2.5)
    // var = (16+4+36)/3 - 16 = 2.666667 ; cv2 = var/16 < 0.49, adi >= 1.32
    assert(math.abs(r.getAs[Double]("cv2") - 0.166667) < 1e-6)
    assert(r.getAs[String]("demand_class") === "intermittent")
  }

  test("q497 Chow: kinked trend flags 'break', perfect line is 'degenerate'") {
    val dir = tmpDir("chow")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val rows =
      // kink: slope 1 then slope 6, alternating +/-1 residual texture
      (0L to 19L).map { day =>
        val trend = if (day <= 9) day.toDouble
          else 9.0 + 6.0 * (day - 9)
        (day + 1, ts(day), 1L, "kink", trend + (day % 2), "{}")
      } ++
      // line: exactly v = 2*day — both fits are exact, SSE = 0
      (0L to 19L).map(day =>
        (100 + day, ts(day), 1L, "line", 2.0 * day, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.chowBreakTest(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("kink").getAs[String]("verdict") === "break")
    assert(out("kink").getAs[Double]("f_stat") > 3.0)
    assert(out("line").getAs[String]("verdict") === "degenerate")
    assert(out("kink").getAs[Long]("n1") === 10L)
    assert(out("kink").getAs[Long]("n2") === 10L)
  }

  test("q498 max-coverage: greedy picks by marginal gain, zero-gain subset source picked last") {
    val dir = tmpDir("maxcov")
    // S1 covers 3 shingles, S2 is a strict subset of S1 (gain 0 after
    // S1), S3 covers 2 disjoint shingles
    Seq(
      (1L, "s1", "w1 w2 w3 w4 w5"),
      (2L, "s2", "w1 w2 w3"),
      (3L, "s3", "x1 x2 x3 x4"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.maxCoverageSources(spark, dir).collect()
    assert(out.length === 3) // only 3 sources; round 4 has nothing to pick
    val picks = out.map(r => (r.getAs[Int]("pick_round"),
      r.getAs[String]("source"), r.getAs[Long]("gain"),
      r.getAs[Long]("cum_covered"), r.getAs[Long]("total_shingles")))
    assert(picks(0) === ((1, "s1", 3L, 3L, 5L)))
    assert(picks(1) === ((2, "s3", 2L, 5L, 5L)))
    assert(picks(2) === ((3, "s2", 0L, 5L, 5L)))
    assert(out(2).getAs[Double]("cum_share") === 1.0)
  }

  test("q499 RMST ladder: bounded by tau, monotone in tau, share in (0,1]") {
    val out = Temporal.rmstLadder(spark, sf0001).collect()
    assert(out.length === 4)
    val taus = out.map(_.getAs[Int]("tau"))
    assert(taus.toSeq === Seq(30, 90, 180, 365))
    val rmst = out.map(_.getAs[Double]("rmst_days"))
    rmst.zip(taus).foreach { case (v, t) =>
      assert(v > 0.0 && v <= t.toDouble)
    }
    assert(rmst.sliding(2).forall(p => p(0) <= p(1)))
    out.map(_.getAs[Double]("rmst_share"))
      .foreach(s => assert(s > 0.0 && s <= 1.0))
  }

  test("q500 NB calibration: bins partition the holdout, rates in [0,1], one ECE") {
    val out = TextAnalysis.nbCalibrationEce(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val b = r.getAs[Int]("bin")
      assert(b >= 0 && b <= 9)
      val acc = r.getAs[Double]("accuracy")
      val conf = r.getAs[Double]("avg_conf")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(conf >= 0.0 && conf <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - math.abs(acc - conf)) < 1e-5)
    }
    val eces = out.map(_.getAs[Double]("ece")).distinct
    assert(eces.length === 1)
    assert(eces.head >= 0.0 && eces.head <= 1.0)
    // bins partition the scored holdout: every scored doc in exactly
    // one bin (n_docs sums to the distinct doc count of the relation)
    val n = out.map(_.getAs[Long]("n_docs")).sum
    assert(n > 0)
  }

  test("q501 Cochran Q: column totals bounded by matched days, verdict consistent with the 5.991 cut") {
    val out = Events.cochranQDetectors(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_days")
      Seq("c_mad", "c_ewma", "c_cusum").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= n)
      }
      val q = Option(r.getAs[java.lang.Double]("q_stat")).map(_.toDouble)
      val verdict = r.getAs[String]("verdict")
      q match {
        case None => assert(verdict === "degenerate")
        case Some(v) =>
          assert(v >= 0.0)
          assert(verdict === (if (v > 5.991) "detectors_differ"
            else "consistent"))
      }
    }
  }

  test("q502 mean-excess: thresholds rise with pct, exceedances shrink, excess nonnegative") {
    val out = Events.meanExcessLadder(spark, sf0001).collect()
      .groupBy(_.getAs[String]("event_type"))
    out.foreach { case (_, rows) =>
      val byPct = rows.sortBy(_.getAs[Int]("pct"))
      assert(byPct.map(_.getAs[Int]("pct")).toSeq === Seq(50, 75, 90))
      val us = byPct.map(_.getAs[Double]("u"))
      assert(us.sliding(2).forall(p => p(0) <= p(1)))
      val ex = byPct.map(_.getAs[Long]("n_exceed"))
      assert(ex.sliding(2).forall(p => p(0) >= p(1)))
      byPct.foreach { r =>
        Option(r.getAs[java.lang.Double]("mean_excess"))
          .foreach(m => assert(m >= 0.0))
        val share = r.getAs[Double]("exceed_share")
        assert(share >= 0.0 && share <= 0.5)
      }
    }
  }

  test("q504 MP3 walk: computed frame lengths, table lookups, corruption rejected") {
    import graft.sources.Multimodal
    val payload = Array.tabulate(23)(_.toByte) // n=23: 4 frames, 48 kHz
    val mp3 = Multimodal.encodeMp3(payload)
    val (frames, bytes, rate, samples) = Multimodal.sniffMp3(mp3).get
    assert(frames === 4)
    assert(rate === 32000) // n % 3 = 2 -> rate index 2
    assert(samples === 4 * 1152L)
    assert(bytes === mp3.length.toLong)
    // a flipped sync byte anywhere breaks the walk
    val bad = mp3.clone(); bad(0) = 0x00
    assert(Multimodal.sniffMp3(bad).isEmpty)
    // truncation breaks it too (last frame extends past the stream)
    assert(Multimodal.sniffMp3(mp3.dropRight(1)).isEmpty)
  }

  test("q507 VTT walk: minute/hour carries parse back to exact ms") {
    import graft.sources.Multimodal
    val vtt = "WEBVTT\n\n00:59:59.900 --> 01:00:01.250\nhello\n\n" +
      "01:00:02.000 --> 01:00:02.500\nworld\n"
    val (n, first, last, tot) = Multimodal.sniffVtt(vtt).get
    assert(n === 2)
    assert(first === 59L * 60000 + 59000 + 900)
    assert(last === 3600000L + 2500)
    assert(tot === 1350L + 500L)
    assert(Multimodal.sniffVtt("NOTVTT\n\n00:00:00.000 --> 00:00:01.000\nx").isEmpty)
    // end-before-start is malformed
    assert(Multimodal.sniffVtt("WEBVTT\n\n00:00:02.000 --> 00:00:01.000\nx").isEmpty)
  }

  test("q505 spectral entropy: in [0,1], flat-noise series scores higher than a pure weekly cycle") {
    val dir = tmpDir("specent")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val rows =
      // pure 7-day cycle: a spike every 7th day
      (0L to 27L).flatMap(day =>
        (1L to (if (day % 7 == 0) 8L else 1L)).map(j =>
          (day * 100 + j, ts(day), 1L, "weekly", 1.0, "{}"))) ++
      // near-flat texture: period-97 pattern, no 2..14-day alignment
      (0L to 27L).flatMap(day =>
        (1L to (1 + (day * 37 % 97) % 3)).map(j =>
          (10000 + day * 100 + j, ts(day), 1L, "flat", 1.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.spectralEntropy(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val we = out("weekly").getAs[Double]("spectral_entropy")
    val fl = out("flat").getAs[Double]("spectral_entropy")
    Seq(we, fl).foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(we < fl)
    assert(out("weekly").getAs[Double]("dominant_share") >
      out("flat").getAs[Double]("dominant_share"))
  }

  test("q506 stability/lumpiness: constant series scores 0/0, level-shifted tiles score high stability") {
    val dir = tmpDir("stab")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val rows =
      // constant: exactly 2 events every day for 4 complete weeks
      (0L to 27L).flatMap(day => (1L to 2L).map(j =>
        (day * 10 + j, ts(day), 1L, "const", 1.0, "{}"))) ++
      // shift: week tiles at levels 1,1,9,9 per day — tile means move
      (0L to 27L).flatMap { day =>
        val lvl = if (day < 14) 1L else 9L
        (1L to lvl).map(j => (100000 + day * 100 + j, ts(day), 1L, "shift", 1.0, "{}"))
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.stabilityLumpiness(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("const").getAs[Long]("n_tiles") === 4L)
    assert(out("const").getAs[Double]("stability") === 0.0)
    assert(out("const").getAs[Double]("lumpiness") === 0.0)
    // tile means 1,1,9,9: population variance = 16
    assert(out("shift").getAs[Double]("stability") === 16.0)
    assert(out("shift").getAs[Double]("lumpiness") === 0.0)
  }

  test("q508 Gumbel maxima: constant blocks fit beta=0 with all return levels at the level") {
    val dir = tmpDir("gumbel")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // exactly 3 events every day for 4 complete weeks: every weekly
    // maximum is 3 -> variance 0, beta 0, mu = 3, all RLs = 3
    val rows = (0L to 27L).flatMap(day => (1L to 3L).map(j =>
      (day * 10 + j, ts(day), 1L, "const", 1.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.gumbelBlockMaxima(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_blocks") === 4L)
    assert(r.getAs[Double]("beta") === 0.0)
    assert(r.getAs[Double]("mu") === 3.0)
    Seq("rl_quarter", "rl_season", "rl_year").foreach(c =>
      assert(r.getAs[Double](c) === 3.0))
    // return levels are monotone in T on real data
    val real = Events.gumbelBlockMaxima(spark, sf0001).collect()
    real.foreach { x =>
      val q = x.getAs[Double]("rl_quarter"); val s = x.getAs[Double]("rl_season")
      val y = x.getAs[Double]("rl_year")
      assert(q <= s && s <= y)
    }
  }

  test("q509 brand assortativity: hand-computed mixing on a 3-edge graph") {
    val dir = tmpDir("assort")
    // parts 1,2 brand X; 3,4 brand Y; edges (1,2) within-X, (3,4)
    // within-Y, (1,3) cross: W=6, S=4, d_X=d_Y=3 ->
    // r = (4*6-18)/(36-18) = 1/3
    Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 1L), (3L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "X"), (2L, "X"), (3L, "Y"), (4L, "Y"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = graft.operators.Graph.brandAssortativity(spark, dir).collect()
      .map(r => r.getAs[String]("brand") -> r).toMap
    assert(out.keySet === Set("X", "Y"))
    out.values.foreach { r =>
      assert(r.getAs[Long]("endpoint_mass") === 3L)
      assert(r.getAs[Long]("w_within") === 1L)
      assert(r.getAs[Double]("self_share") === 0.666667)
      assert(r.getAs[Double]("expected_share") === 0.5)
      assert(r.getAs[Double]("assortativity") === 0.333333)
    }
  }

  test("q510 OPH: identical docs match all densified bins, empties counted") {
    val dir = tmpDir("oph")
    Seq((1L, "s1", "alpha beta gamma delta epsilon"),
        (2L, "s1", "alpha beta gamma delta epsilon"),
        (3L, "s1", "zeta eta theta iota kappa lambda"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.ophEstimateAudit(spark, dir).collect()
    // only the identical pair clears the 0.25 Jaccard gate
    assert(out.length === 1)
    val r = out(0)
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) === ((1L, 2L)))
    assert(r.getAs[Double]("jaccard") === 1.0)
    assert(r.getAs[Long]("n_match") === 16L)
    assert(r.getAs[Double]("est_oph") === 1.0)
    assert(r.getAs[Double]("abs_err") === 0.0)
    // 3 shingles fill at most 3 of 16 bins: densification did the rest
    assert(r.getAs[Long]("empty_a") >= 13L)
    assert(r.getAs[Long]("empty_a") === r.getAs[Long]("empty_b"))
  }

  test("q511 Huber: outlier day pulls the mean but barely moves the Huber location") {
    val dir = tmpDir("huber")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // 10 days at 10 (with tiny texture so MAD > 0) + one 1000 spike
    val rows = (0L to 9L).map(day =>
      (day + 1, ts(day), 1L, "t", 10.0 + (day % 2), "{}")) :+
      ((99L, ts(10L), 1L, "t", 1000.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.huberLocation(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_days") === 11L)
    val hm = r.getAs[Double]("huber_mu")
    assert(hm > 9.0 && hm < 13.0) // mean would be ~100
    assert(r.getAs[Long]("n_downweighted") >= 1L)
  }

  test("q512 raking: lang margins reproduced exactly after the final lang round") {
    val out = Curation.rakingCalibration(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Double]("weight") > 0.0))
    val resid = out.map(_.getAs[Double]("max_source_resid")).distinct
    assert(resid.length === 1 && resid.head >= 0.0)
    // weighted sample lang totals == corpus lang counts (last round
    // adjusted langs; 6dp rounding leaves sub-1e-2 slack)
    val corpus = Tables.load(spark, sf0001, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val est = rows.map(_.getAs[Double]("est_corpus_n")).sum
      assert(math.abs(est - corpus(lang)) < 0.05,
        s"$lang est=$est corpus=${corpus(lang)}")
    }
  }

  test("q513 ID3v2: syncsafe sizes above 127 decode, plain-size corruption rejected") {
    import graft.sources.Multimodal
    val payload = Array.tabulate(10)(_.toByte) // n=10 -> 2 frames
    val tag = Multimodal.encodeId3(payload)
    val (fr, body, pay, fid, lid) = Multimodal.sniffId3(tag).get
    assert(fr === 2)
    assert(fid === "TIT2" && lid === "TPE1")
    // payload sizes 121+(10)%20=131 and 121+(21)%20=122 — both > 127,
    // so the syncsafe low byte differs from the plain encoding
    assert(pay === 131L + 122L)
    assert(body === (10 + 131) + (10 + 122))
    // setting the high bit of a size byte breaks syncsafe -> reject
    val bad = tag.clone(); bad(6) = (bad(6) | 0x80).toByte
    assert(Multimodal.sniffId3(bad).isEmpty)
    // a plain 32-bit reader would misparse: offset 10+10+131 must be
    // the second frame only under syncsafe arithmetic
    assert(new String(tag, 10 + 10 + 131, 4, "US-ASCII") === "TPE1")
  }

  test("q514 JL distortion: 1128 pairs, ratios centered near 1, p95 <= max") {
    val r = Similarity.jlDistortionAudit(spark, sf0001).collect()(0)
    assert(r.getAs[Long]("n_pairs") === 48L * 47 / 2)
    val mr = r.getAs[Double]("mean_ratio")
    assert(mr > 0.6 && mr < 1.4)
    assert(r.getAs[Double]("p95_distortion") <= r.getAs[Double]("max_distortion"))
    assert(r.getAs[Double]("mean_distortion") >= 0.0)
  }

  test("q515 gap burstiness-memory: alternating 1s/3s gaps give B=-1/3, M=-1") {
    val dir = tmpDir("burst")
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // one day, events at 0,1,4,5,8,9,12 s: gaps 1,3,1,3,1,3
    val rows = Seq(0L, 1L, 4L, 5L, 8L, 9L, 12L).zipWithIndex.map {
      case (s, i) => (i.toLong + 1, ts(s), 1L, "alt", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.gapBurstMemory(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_gaps") === 6L)
    assert(r.getAs[Long]("n_pairs") === 5L)
    assert(r.getAs[Double]("burstiness") === -0.333333)
    assert(r.getAs[Double]("memory") === -1.0)
    assert(r.getAs[String]("regime") === "regular_alternating")
  }

  test("q516 PDF xref: tail-first walk verifies real byte offsets, corruption rejected") {
    import graft.sources.Multimodal
    val payload = Array.tabulate(10)(_.toByte) // n=10 -> 2 + 10%4 = 4 objects
    val pdf = Multimodal.encodePdf(payload)
    val (objs, xo, ob) = Multimodal.sniffPdf(pdf).get
    assert(objs === 4)
    val s = new String(pdf, "US-ASCII")
    assert(s.startsWith("xref", xo.toInt))
    assert(ob > 0)
    // corrupt the startxref pointer: walk must reject
    val sx = s.lastIndexOf("startxref")
    val bad = pdf.clone(); bad(sx + 10) = '9'
    assert(Multimodal.sniffPdf(bad).isEmpty)
    // shrink an xref record to 19 bytes: desynchronized -> reject
    val bad2 = (s.substring(0, xo.toInt + 5 + 4) +
      s.substring(xo.toInt + 5 + 4).replaceFirst("65535 f \n", "65535 f\n"))
      .getBytes("US-ASCII")
    assert(Multimodal.sniffPdf(bad2).isEmpty)
  }

  test("q517 Bland-Altman: identical methods agree perfectly on a constant series") {
    val dir = tmpDir("ba")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val rows = (0L to 27L).flatMap(day => (1L to 2L).map(j =>
      (day * 10 + j, ts(day), 1L, "c", 1.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.blandAltmanBaselines(spark, dir).collect()(0)
    // constant daily count: naive-1 and snaive-7 always agree
    assert(r.getAs[Double]("bias") === 0.0)
    assert(r.getAs[Double]("sd_diff") === 0.0)
    assert(r.getAs[Double]("outside_share") === 0.0)
    assert(r.getAs[Long]("n_days") === 21L) // 28 days minus 7-lag warmup
  }

  test("q518 Markov pull: probability mass conserved up to floor loss, gap consistent") {
    val out = Events.markovStationaryPull(spark, sf0001).collect()
    assert(out.nonEmpty)
    val piSum = out.map(_.getAs[Double]("pi3_share")).sum
    assert(piSum > 0.99 && piSum <= 1.0 + 1e-9) // floors only lose mass
    val l1 = out.map(_.getAs[Double]("l1_gap")).distinct
    assert(l1.length === 1 && l1.head >= 0.0)
    out.foreach { r =>
      val pull = r.getAs[Double]("pull")
      val expect = r.getAs[Double]("pi3_share") - r.getAs[Double]("emp_share")
      assert(math.abs(pull - expect) < 1e-5)
    }
  }

  test("q519 SLO burn: uniform value mix burns at exactly 1.0 and stays quiet") {
    val dir = tmpDir("slo")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // 30 days x values 1..20: p95 threshold = 19, every window's
    // error rate = 1/20 = budget -> burn exactly 1.0, no alert
    val rows = (0L until 30L).flatMap(day => (1L to 20L).map(v =>
      (day * 100 + v, ts(day), 1L, "svc", v.toDouble, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.sloBurnRate(spark, dir).collect()(0)
    assert(r.getAs[Double]("slo_threshold") === 19.0)
    assert(r.getAs[Double]("rate_7d") === 0.05)
    assert(r.getAs[Double]("burn_7d") === 1.0)
    assert(r.getAs[Double]("burn_28d") === 1.0)
    assert(r.getAs[String]("alert") === "ok")
  }

  test("q520 safety stock: constant weekly demand with fixed lead gives SS=0 and ROP=mu*L") {
    val dir = tmpDir("ss")
    def d(day: Long) = new java.sql.Date(day * 86400000L)
    // part 5: qty 7 shipped every week for 5 weeks, order 14 days earlier
    val li = (0L until 5L).map(w =>
      (5L, w + 1, d(w * 7 + 14), 7.0))
      .toDF("l_partkey", "l_orderkey", "l_shipdate", "l_quantity")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (0L until 5L).map(w => (w + 1, d(w * 7)))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Temporal.safetyStock(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_wk") === 5L)
    assert(r.getAs[Double]("mean_weekly") === 7.0)
    assert(r.getAs[Double]("sd_weekly") === 0.0)
    assert(r.getAs[Double]("mean_lead_days") === 14.0)
    assert(r.getAs[Double]("safety_stock") === 0.0)
    assert(r.getAs[Double]("reorder_point") === 14.0) // 7/wk * 2wk lead
  }

  test("q521 QTE profile: 9 deciles, both arms populated, qte = q1 - q0") {
    val out = Events.qteProfile(spark, sf0001).collect()
    assert(out.map(_.getAs[Int]("decile")).toSeq === (1 to 9))
    out.foreach { r =>
      assert(r.getAs[Long]("n0") > 0 && r.getAs[Long]("n1") > 0)
      val expect = r.getAs[Double]("q_arm1") - r.getAs[Double]("q_arm0")
      assert(math.abs(r.getAs[Double]("qte") - expect) < 1e-5)
    }
    // deciles are monotone within each arm
    val q0 = out.sortBy(_.getAs[Int]("decile")).map(_.getAs[Double]("q_arm0"))
    assert(q0.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("q522 Sn scale: hand-computed on a 5-point series, zero on a constant one") {
    val dir = tmpDir("sn")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // type 'v': daily totals 1,2,3,4,10 (one event of that value/day)
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 10.0).zipWithIndex.map {
      case (v, i) => (i.toLong + 1, ts(i.toLong), 1L, "v", v, "{}")
    } ++ (0L to 4L).map(dd => (100 + dd, ts(dd), 1L, "c", 5.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.snRobustScale(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // inner medians (m=4, rank 2): i=1:|1-2,1-3,1-4,1-10|={1,2,3,9}->2
    // i=2:{1,1,2,8}->1; i=3:{1,1,2,7}->1; i=4:{1,2,3,6}->2;
    // i=10:{6,7,8,9}->7 ; outer (n=5, rank 3) over {2,1,1,2,7}->2
    assert(out("v").getAs[Double]("sn_raw") === 2.0)
    assert(out("v").getAs[Double]("sn_scaled") === 2.3852)
    assert(out("c").getAs[Double]("sn_raw") === 0.0)
  }

  test("StreamingCroston: batch-exact across a micro-batch boundary") {
    import graft.streaming.StreamingCroston._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // part 7: weeks {0,3,5} sizes {4,2,6} — the q496 hand fixture
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[WeeklyDemand]
    val q = forecasts(in.toDS())
      .writeStream.format("memory").queryName("croston_twin")
      .outputMode("append").start()
    in.addData(WeeklyDemand(7L, 0L, 4.0), WeeklyDemand(7L, 3L, 2.0))
    q.processAllAvailable()
    in.addData(WeeklyDemand(7L, 5L, 6.0)) // second micro-batch
    q.processAllAvailable()
    val rows = spark.table("croston_twin").as[CrostonOut].collect()
      .sortBy(_.week)
    q.stop()
    assert(rows.length === 3)
    val last = rows.last
    assert(last.n_wk === 3L)
    assert(last.z_hat === 4.5)
    assert(last.p_hat.contains(2.5))
    assert(last.croston.contains(1.8))
  }

  test("q523 p-chart: in-control days stay quiet, a 4x-rate day signals") {
    val dir = tmpDir("pchart")
    def d(day: Long) = new java.sql.Date(day * 86400000L)
    // 9 days at 10/100 returns, day 9 at 40/100
    val rows = (0L to 9L).flatMap { day =>
      val nr = if (day == 9) 40 else 10
      (1 to 100).map(j =>
        (day * 1000 + j, d(day), if (j <= nr) "R" else "N"))
    }
    rows.toDF("l_orderkey", "l_shipdate", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Events.returnRatePChart(spark, dir).collect()
    assert(out.length === 10)
    val byDay = out.map(r => r.getAs[Long]("day") -> r).toMap
    assert(byDay(9L).getAs[Int]("signal") === 1)
    (0L to 8L).foreach(day => assert(byDay(day).getAs[Int]("signal") === 0))
    assert(byDay(0L).getAs[Double]("p_bar") === 0.13)
  }

  test("q524 OBF looks: 4 looks, shrinking boundaries, decisions match |z| vs boundary") {
    val out = Events.obfSequentialLooks(spark, sf0001).collect()
    assert(out.map(_.getAs[Int]("look")).toSeq === (1 to 4))
    val bs = out.map(_.getAs[Double]("boundary"))
    assert(bs.toSeq === Seq(4.333, 2.963, 2.359, 2.014))
    out.foreach { r =>
      val z = Option(r.getAs[java.lang.Double]("z_stat")).map(_.toDouble)
      val dec = r.getAs[String]("decision")
      z match {
        case None => assert(dec === "degenerate")
        case Some(v) =>
          assert(dec === (if (math.abs(v) > r.getAs[Double]("boundary"))
            "crossed" else "continue"))
      }
      // looks accumulate users: n never decreases
    }
    val ns = out.map(r => r.getAs[Long]("n0") + r.getAs[Long]("n1"))
    assert(ns.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("q525 metric agreement: rho bounded, self-query tops both rankings") {
    val out = Similarity.metricAgreementAudit(spark, sf0001).collect()
    assert(out.length === 8)
    out.foreach { r =>
      val rho = r.getAs[Double]("spearman_rho")
      assert(rho >= -1.0 && rho <= 1.0)
      val ov = r.getAs[Long]("topk_overlap")
      // the query vector itself is in the candidate sample prefix:
      // cos = 1 and l2 = 0 both rank it first, so overlap >= 1
      assert(ov >= 1L && ov <= 10L)
    }
  }

  test("q526 shift-share: the three effects sum to delta exactly, cells cover both years") {
    val out = Relational.shiftShareDecomposition(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getAs[Double]("delta_rev")
      val s = r.getAs[Double]("national_effect") +
        r.getAs[Double]("mix_effect") + r.getAs[Double]("competitive_effect")
      assert(math.abs(d - s) < 1e-6, s"identity broke: $d vs $s")
      assert(math.abs(d - (r.getAs[Double]("final_rev") -
        r.getAs[Double]("base_rev"))) < 1e-5)
    }
  }

  test("q527 seasonal MK: trend under a weekly cycle detected, constant series quiet") {
    val dir = tmpDir("smk")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val rows =
      // trend + strong weekly cycle: v = day + 100 on day%7==0
      (0L to 55L).map(day =>
        (day + 1, ts(day), 1L, "trendy",
          day.toDouble + (if (day % 7 == 0) 100.0 else 0.0), "{}")) ++
      (0L to 55L).map(day => (1000 + day, ts(day), 1L, "flat", 5.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.seasonalMannKendall(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("trendy").getAs[String]("verdict") === "increasing")
    assert(out("flat").getAs[Long]("s_stat") === 0L)
    assert(out("flat").getAs[String]("verdict") === "no_trend")
  }

  test("q528 nearest centroid: confusion shares partition each true label") {
    val out = Similarity.nearestCentroidEval(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Int]("true_label")).foreach { case (_, rows) =>
      val s = rows.map(_.getAs[Double]("share_of_true")).sum
      assert(math.abs(s - 1.0) < 1e-4)
      rows.foreach(r => assert(r.getAs[Long]("n") > 0))
    }
  }

  test("q529 quantile shape: values 1..8 give Bowley 0 and Moors 1") {
    val dir = tmpDir("shape")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val rows = (1L to 8L).map(v => (v, ts(v), 1L, "u", v.toDouble, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.quantileShapeProfile(spark, dir).collect()(0)
    assert(r.getAs[Double]("q1") === 2.0)
    assert(r.getAs[Double]("median") === 4.0)
    assert(r.getAs[Double]("q3") === 6.0)
    assert(r.getAs[Double]("bowley_skew") === 0.0)
    assert(r.getAs[Double]("moors_kurtosis") === 1.0)
  }

  test("q530 median spells: islands counted after dropping at-median days") {
    val dir = tmpDir("spell")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // values [1,1,1,9,9,1,9,9,9]: median (rank 5 of 9) = 9, so the
    // 9-days drop as ties; below-spells are days 0-2 (len 3), day 5
    val vals = Seq(1.0, 1.0, 1.0, 9.0, 9.0, 1.0, 9.0, 9.0, 9.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, ts(i.toLong), 1L, "t", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.medianSpellProfile(spark, dir).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[String]("side") === "below")
    assert(r.getAs[Long]("n_spells") === 2L)
    assert(r.getAs[Long]("longest_spell") === 3L)
    assert(r.getAs[Double]("mean_spell_days") === 2.0)
  }

  test("q531 OLS influence: the outlier day owns the slope and is named") {
    val dir = tmpDir("dfbeta")
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // perfect unit slope for 10 days, then a 1000 spike on day 10
    val rows = (0L to 9L).map(day =>
      (day + 1, ts(day), 1L, "t", day.toDouble + 1.0, "{}")) :+
      ((99L, ts(10L), 1L, "t", 1000.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.olsInfluenceScreen(spark, dir).collect()(0)
    assert(r.getAs[Long]("top_day") === 10L)
    val slope = r.getAs[Double]("slope")
    val dfb = r.getAs[Double]("top_dfbeta")
    assert(slope > 10.0) // outlier-dragged
    assert(dfb < -10.0) // removing day 10 restores ~unit slope
    assert(math.abs(slope + dfb - 1.0) < 0.5)
  }

  test("q532 triangle excess: expectation positive, ratio consistent with census") {
    val out = graft.operators.Graph.triangleExcess(spark, sf0001).collect()(0)
    val tExp = out.getAs[Double]("t_expected")
    val tAct = out.getAs[Long]("n_triangles")
    assert(tExp > 0.0)
    val ratio = out.getAs[Double]("excess_ratio")
    assert(math.abs(ratio - tAct.toDouble / tExp) < 0.01)
    assert(out.getAs[Long]("n_edges") > 0)
  }

  test("q503 Atkinson: equal spends give 0, a 100/300 split gives the AM-GM gap") {
    val dir = tmpDir("atkinson")
    Seq((1L, 10L, 100.0), (2L, 11L, 100.0), (3L, 20L, 100.0), (4L, 21L, 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 0L), (11L, 0L), (20L, 1L), (21L, 1L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0L, "EQUALLAND"), (1L, "SKEWLAND")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = Relational.atkinsonIndex(spark, dir).collect()
      .map(r => r.getAs[String]("nation") -> r).toMap
    assert(out("EQUALLAND").getAs[Double]("atkinson") === 0.0)
    // geometric mean sqrt(100*300) = 173.2051, arithmetic 200:
    // A = 1 - 173.2051/200 = 0.133975 (6dp-rounded ln terms)
    assert(math.abs(out("SKEWLAND").getAs[Double]("atkinson") - 0.133975)
      < 1e-5)
    assert(out("SKEWLAND").getAs[Double]("mean_spend") === 200.0)
  }
}
