package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Events, Relational}

/** Round-6 analytics operators: GROUPING SETS strata invariants,
  * the decorrelated above-brand-average predicate, time-RANGE window
  * frames (ties-as-peers, inclusive trailing boundary), per-source
  * decile ranks, and the leakage-safe cluster-level split invariant.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  val sf0001 = "/root/testdata/sf0.001"

  test("groupingSetsPricing: strata reconcile to the global total") {
    val out = Relational.groupingSetsPricing(spark, sf0001).localCheckpoint()
    val total = graft.Tables.load(spark, sf0001, "lineitem").count()
    // the () stratum is the single all-null row carrying the global count
    val grand = out.filter($"g_flag" === 1 && $"g_status" === 1)
      .select($"n_items", $"l_returnflag", $"l_linestatus")
      .as[(Long, Option[String], Option[String])].collect().toSeq
    assert(grand === Seq((total, None, None)))
    // the finest stratum partitions the table: counts sum to the total,
    // and so does the (l_linestatus) stratum
    val fine = out.filter($"g_flag" === 0 && $"g_status" === 0)
      .agg(sum($"n_items")).as[Long].head()
    val mid = out.filter($"g_flag" === 1 && $"g_status" === 0)
      .agg(sum($"n_items")).as[Long].head()
    assert(fine === total && mid === total)
    // placeholder columns are null exactly where the grouping flag says
    assert(out.filter($"g_flag" === 1 && $"l_returnflag".isNotNull).count() === 0)
    assert(out.filter($"g_flag" === 0 && $"l_returnflag".isNull).count() === 0)
  }

  test("aboveBrandAvg: returned rows beat their brand mean, others don't") {
    val part = graft.Tables.load(spark, sf0001, "part")
    val out = Relational.aboveBrandAvg(spark, sf0001).localCheckpoint()
    // recompute the strict-above set independently with the SAME exact
    // predicate the operator uses (decimal cross-multiplication, no
    // division): a double avg() checker can flake when a price sits
    // within double-epsilon of its brand mean — exact-vs-exact cannot
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val expect = part.groupBy($"p_brand").agg(
        sum($"p_retailprice".cast(dec)).as("s"), count(lit(1)).as("n"))
      .join(part, "p_brand")
      .filter($"p_retailprice".cast(dec) * $"n" > $"s")
      .select($"p_partkey").as[Long].collect().sorted.toSeq
    val got = out.select($"p_partkey").as[Long].collect().sorted.toSeq
    assert(got === expect)
    // every brand keeps strictly fewer than all its parts (a mean is
    // never below the minimum) and at least one part overall survives
    assert(out.count() > 0 && out.count() < part.count())
  }

  test("timeRangeWindows: ties are peers, trailing boundary is inclusive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-revents").toString
    def t(ms: Long) = new java.sql.Timestamp(ms)
    Seq(
      (1L, t(0L), 1L, "a", 10.0, "{}"),
      (2L, t(3600000L), 1L, "b", 2.0, "{}"),  // exactly 1h later: in frame
      (3L, t(3600000L), 1L, "c", 5.0, "{}"),  // ts tie: peer of event 2
      (4L, t(7201000L), 1L, "d", 7.0, "{}"),  // 3601s after the ties: alone
      (5L, t(1000L), 2L, "e", 4.0, "{}"))     // other user: own partition
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.timeRangeWindows(spark, dir)
      .select($"user_id", $"event_id", $"n_1h", $"sum_1h", $"min_1h")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 1L, 10.0, 10.0),
      // RANGE peers: both tie rows see event 1 (inclusive -1h bound)
      // AND each other — identical frames, identical aggregates
      (1L, 2L, 3L, 17.0, 2.0),
      (1L, 3L, 3L, 17.0, 2.0),
      (1L, 4L, 1L, 7.0, 7.0),
      (2L, 5L, 1L, 4.0, 4.0)))
  }

  test("qualityDeciles: balanced tiles, keep drops exactly the bottom tile") {
    val out = Curation.qualityDeciles(spark, sf0001).localCheckpoint()
    val bySource = out.groupBy($"source").agg(
      count(lit(1)).as("n"),
      sum(when($"keep" === 0, 1).otherwise(0)).as("dropped"),
      max($"cume").as("max_cume"),
      min($"pct_rank").as("min_pr"),
      countDistinct($"decile").as("n_tiles"))
      .as[(String, Long, Long, Double, Double, Long)].collect()
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, n, dropped, maxCume, minPr, tiles) =>
      // NTILE(10): bottom tile holds ceil(n/10) or floor(n/10) rows
      assert(dropped === n / 10 + (if (n % 10 > 0) 1 else 0),
        s"$src dropped=$dropped of n=$n")
      assert(maxCume === 1.0 && minPr === 0.0 && tiles === 10L, s"$src")
    }
    // ranks are per-source: within a source, pct_rank is monotone in
    // (n_chars, doc_id) — spot-check by re-sorting
    val one = out.filter($"source" === bySource.head._1)
      .orderBy($"n_chars", $"doc_id").select($"pct_rank")
      .as[Double].collect().toSeq
    assert(one === one.sorted)
  }

  test("clusterSplit: no near-dup cluster straddles train/val") {
    val out = Dedup.clusterSplit(spark, sf0001).localCheckpoint()
    // the leakage guarantee, by construction: one split per rep_id
    val straddlers = out.groupBy($"rep_id")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count()
    assert(straddlers === 0)
    // both sides are non-empty and the doc-level fractions are sane
    // (8/2 bucket split; tolerance for cluster-size variance)
    val n = out.count().toDouble
    val train = out.filter($"split" === "train").count().toDouble
    assert(train / n > 0.6 && train / n < 0.95, s"train frac ${train / n}")
    // split agrees with the documented bucket function of rep_id
    val mismatch = out.withColumn("b",
        graft.functions.PortableHash.md5Long32($"rep_id") % 10)
      .filter(($"b" < 8 && $"split" =!= "train") ||
              ($"b" >= 8 && $"split" =!= "val")).count()
    assert(mismatch === 0)
  }

  /** Stage a crafted events table (full schema) in a temp dir. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-aevents").toString
    rows.map { case (id, ms, user, typ) =>
      (id, new java.sql.Timestamp(ms), user, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("cohortRetention: hand-built two-cohort triangle") {
    // 2024-01-01 is a Monday; week cohorts truncate to Mondays
    val jan = (d: Int) => (86400000L * (d - 1)) + 1704067200000L // 2024-01-<d> UTC
    val dir = eventsDir(Seq(
      (1L, jan(2), 1L, "view"),   // u1 first: week of 1/1
      (2L, jan(9), 1L, "view"),   // u1 active again: week of 1/8
      (3L, jan(3), 2L, "view"),   // u2 first: week of 1/1, never again
      (4L, jan(10), 3L, "view"))) // u3 first: week of 1/8
    val out = Events.cohortRetention(spark, dir)
      .select($"cohort".cast("string"), $"week_offset", $"n_active",
        $"cohort_size", $"retention")
      .as[(String, Int, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),   // both w1 users active in week 0
      ("2024-01-01", 1, 1L, 2L, 0.5),   // only u1 returns
      ("2024-01-08", 0, 1L, 1L, 1.0)))  // u3's own cohort
  }

  test("cohortLtv: running per-user revenue, zero-purchase weeks stay on the curve") {
    val jan = (d: Int) => (86400000L * (d - 1)) + 1704067200000L // 2024-01-<d> UTC
    val dir = eventsDirV(Seq(
      (1L, jan(2), 1L, "purchase", 10.0),  // u1 cohort 1/1, week0 rev 10
      (2L, jan(9), 1L, "click", 0.0),      // active week1, NO revenue
      (3L, jan(16), 1L, "purchase", 5.0),  // week2 rev 5
      (4L, jan(3), 2L, "purchase", 2.0),   // u2 cohort 1/1, week0 only
      (5L, jan(10), 3L, "click", 0.0)))    // u3 cohort 1/8, never buys
    val out = Events.cohortLtv(spark, dir)
      .select($"cohort".cast("string"), $"age_week", $"cohort_size",
        $"week_rev", $"cum_rev", $"ltv_per_user")
      .as[(String, Int, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 0, 2L, 12.0, 12.0, 6.0),
      ("2024-01-01", 1, 2L, 0.0, 12.0, 6.0),   // alive, bought nothing
      ("2024-01-01", 2, 2L, 5.0, 17.0, 8.5),
      ("2024-01-08", 0, 1L, 0.0, 0.0, 0.0)))   // zero-revenue cohort
  }

  test("markovAttribution: hand chain — load-bearing channels score 1, absent score 0") {
    // u1: view->click->purchase (converts); u2: view->click (drops).
    // tm: START->view 2, view->click 2, click->CONV 1, click->DROP 1.
    // Fixpoint: p(click)=5e11, propagates to view and START. Removing
    // view or click severs the ONLY path -> removal effect 1.0;
    // error/signup never occur -> removal changes nothing, effect 0.
    val dir = eventsDir(Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"),
      (3L, 3000L, 1L, "purchase"),
      (4L, 1000L, 2L, "view"), (5L, 2000L, 2L, "click")))
    val out = Events.markovAttribution(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("click", 2L, 500000000000L, 0L, 1.0),
      ("error", 0L, 500000000000L, 500000000000L, 0.0),
      ("signup", 0L, 500000000000L, 500000000000L, 0.0),
      ("view", 2L, 500000000000L, 0L, 1.0)))
  }

  test("markovAttribution: post-conversion events are dropped from the chain") {
    // u1's second purchase and trailing click sit AFTER the first
    // conversion in the same session — they must contribute NO
    // transitions (no CONV->x edges, no double-counted conversion)
    val dir = eventsDir(Seq(
      (1L, 1000L, 1L, "click"), (2L, 2000L, 1L, "purchase"),
      (3L, 3000L, 1L, "purchase"), (4L, 4000L, 1L, "click")))
    val out = Events.markovAttribution(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // single journey START->click->CONV: base p = 1e12; click carries it
    val click = out.find(_._1 == "click").get
    assert(click === (("click", 1L, 1000000000000L, 0L, 1.0)))
    assert(out.filter(_._1 != "click").forall(r =>
      r._3 === 1000000000000L && r._4 === 1000000000000L && r._5 === 0.0))
  }

  test("funnel: order matters, strict inequality, left-join stages") {
    val dir = eventsDir(Seq(
      // u1: full ordered funnel
      (1L, 1000L, 1L, "signup"), (2L, 2000L, 1L, "click"), (3L, 3000L, 1L, "purchase"),
      // u2: purchase but no click -> stage 1
      (4L, 1000L, 2L, "signup"), (5L, 2000L, 2L, "purchase"),
      // u3: click BEFORE signup doesn't count -> stage 1
      (6L, 5000L, 3L, "signup"), (7L, 3000L, 3L, "click"),
      // u4: no signup -> not in the funnel at all
      (8L, 1000L, 4L, "click"),
      // u5: purchase at the same ms as click (not strictly after) -> stage 2
      (9L, 1000L, 5L, "signup"), (10L, 2000L, 5L, "click"), (11L, 2000L, 5L, "purchase")))
    val out = Events.funnel(spark, dir)
      .select($"user_id", $"stage").as[(Long, Int)].collect().toSeq
    assert(out === Seq((1L, 3), (2L, 1), (3L, 1), (5L, 2)))
  }

  test("scd2Intervals: change compression, validity chain, one current row") {
    val dir = eventsDir(Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "view"),  // repeat: compressed
      (3L, 3000L, 1L, "click"), (4L, 4000L, 1L, "view")))
    val out = graft.operators.Temporal.scd2Intervals(spark, dir)
      .select($"state", $"valid_from_ms", $"valid_to_ms", $"version", $"is_current")
      .as[(String, Long, Option[Long], Int, Int)].collect().toSeq
    assert(out === Seq(
      ("view", 1000L, Some(3000L), 1, 0),
      ("click", 3000L, Some(4000L), 2, 0),
      ("view", 4000L, None, 3, 1)))
    // intervals chain: each valid_to equals the next valid_from
    out.sliding(2).foreach { case Seq(a, b) => assert(a._3.contains(b._2)); case _ => }
  }

  test("weightedPrioritySample: deterministic, formula-exact, k-bounded") {
    val out = Curation.weightedPrioritySample(spark, sf0001, k = 5).localCheckpoint()
    val again = Curation.weightedPrioritySample(spark, sf0001, k = 5)
    assert(out.collect().toSeq === again.collect().toSeq)
    val perSrc = out.groupBy($"source").count().as[(String, Long)].collect()
    assert(perSrc.nonEmpty && perSrc.forall(_._2 <= 5))
    // recompute one row's priority independently (md5 word, exact IEEE ops)
    val r = out.orderBy($"doc_id").head()
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        r.getAs[Long]("doc_id").toString).substring(0, 8), 16)
    val expect = math.floor(
      (r.getAs[Long]("n_chars").toDouble / ((h + 1).toDouble / 4294967296.0))
        * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getAs[Double]("priority") - expect) < 1e-9)
  }

  /** Events fixture with explicit values (eventsDir fixes value=1.0). */
  private def eventsDirV(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-vevents").toString
    rows.map { case (id, ms, user, typ, v) =>
      (id, new java.sql.Timestamp(ms), user, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("rfm: five users, one per quintile on every axis") {
    // user k: k purchases, each value k, last purchase at k*1000 ms —
    // so recency, frequency and monetary all rank u1 worst, u5 best
    val rows = (1L to 5L).flatMap { k =>
      (1L to k).map(i => (k * 100 + i, k * 1000 - (k - i) * 10, k, "purchase", k.toDouble))
    }
    val out = Events.rfm(spark, eventsDirV(rows))
      .select($"user_id", $"recency_ms", $"frequency", $"monetary",
        $"r_score", $"f_score", $"m_score", $"rfm")
      .as[(Long, Long, Long, Double, Int, Int, Int, Int)].collect().toSeq
    assert(out === (1 to 5).map { k =>
      (k.toLong, (5000 - k * 1000).toLong, k.toLong, (k * k).toDouble, k, k, k, k * 111)
    })
  }

  test("lastTouchAttribution: prior-touch channel, direct fallback") {
    val out = Events.lastTouchAttribution(spark, eventsDirV(Seq(
      (1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "purchase", 10.0),
      (3L, 3000L, 1L, "click", 0.0), (4L, 4000L, 1L, "purchase", 20.0),
      (5L, 1000L, 2L, "purchase", 5.0),          // no prior touch
      (6L, 5000L, 2L, "error", 0.0),             // non-touch types are excluded
      (7L, 6000L, 2L, "purchase", 7.0))))        // still direct (error filtered)
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("click", 1L, 20.0), ("direct", 2L, 12.0), ("view", 1L, 10.0)))
  }

  test("eventTransitions: hand-counted matrix, rows normalize to 1") {
    val out = Events.eventTransitions(spark, eventsDirV(Seq(
      (1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "view", 0.0), (4L, 4000L, 1L, "click", 0.0),
      (5L, 5000L, 1L, "purchase", 0.0),
      (6L, 1000L, 2L, "view", 0.0), (7L, 2000L, 2L, "view", 0.0))))
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // u1: view->click, click->view, view->click, click->purchase
    // u2: view->view  — no cross-user transition between u1 and u2
    assert(out === Seq(
      ("click", "purchase", 1L, 2L, 0.5),
      ("click", "view", 1L, 2L, 0.5),
      ("view", "click", 2L, 3L, 0.666667),
      ("view", "view", 1L, 3L, 0.333333)))
  }

  test("sessionPaths: trigrams never cross the session gap, shares sum over slots") {
    // u1 session A: view click view click -> trigrams (v,c,v), (c,v,c)
    // u1 session B (gap > 30 min): view click purchase -> (v,c,p)
    // u2: two events only -> no trigram
    val out = Events.sessionPaths(spark, eventsDirV(Seq(
      (1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "view", 0.0), (4L, 4000L, 1L, "click", 0.0),
      (5L, 4000000L, 1L, "view", 0.0), (6L, 4001000L, 1L, "click", 0.0),
      (7L, 4002000L, 1L, "purchase", 0.0),
      (8L, 1000L, 2L, "view", 0.0), (9L, 2000L, 2L, "click", 0.0))))
      .as[(Int, String, String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1, "click", "view", "click", 1L, 0.333333),
      (2, "view", "click", "purchase", 1L, 0.333333),
      (3, "view", "click", "view", 1L, 0.333333)))
  }

  test("timeToConvert: hand-computed latency ladder over three converting users") {
    // users 1..3 convert with signup->click 10/20/30ms, click->purchase
    // 5/5/100ms; user 4 stalls after signup (appears in no step)
    val rows = (1 to 3).flatMap { u =>
      val base = u * 100000L
      Seq((u * 10L + 1, base, u.toLong, "signup", 0.0),
        (u * 10L + 2, base + u * 10L, u.toLong, "click", 0.0),
        (u * 10L + 3, base + u * 10L + (if (u == 3) 100L else 5L),
          u.toLong, "purchase", 0.0))
    } :+ ((99L, 999000L, 4L, "signup", 0.0))
    val out = Events.timeToConvert(spark, eventsDirV(rows))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // dt1: 10,20,30 -> median rn=(3+1) div 2=2 -> 20; p90 rn=(27+9) div 10=3 -> 30
    // dt2: 5,5,100 -> median 5, p90 100; total: 15,25,130 -> median 25, p90 130
    assert(out === Seq(
      ("1_signup_to_click", 3L, 10L, 20L, 30L, 30L),
      ("2_click_to_purchase", 3L, 5L, 5L, 100L, 100L),
      ("3_signup_to_purchase", 3L, 15L, 25L, 130L, 130L)))
  }

  test("dowSeasonality: 1970-01-01 is Thursday=3, shares sum to 1 per type") {
    // day 0 (Thu) -> dow 3; day 4 (Mon) -> dow 0
    val out = Events.dowSeasonality(spark, eventsDirV(Seq(
      (1L, 1000L, 1L, "view", 2.0),
      (2L, 2000L, 2L, "view", 4.0),
      (3L, 4L * 86400000L + 1000L, 1L, "view", 9.0))))
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("view", 0L, 1L, 0.333333, 9.0),
      ("view", 3L, 2L, 0.666667, 3.0)))
  }

  test("markovBacktest: temporal halves, argmax predictor, unseen context scores null") {
    // lo=1000, hi=11000 -> split at 6000. Train (u1): (v,c,v), (c,v,c).
    // Test: u2 (v,c,v) hit + (c,v,e) miss; u3 (err,err,err) unseen ctx.
    val out = Events.markovBacktest(spark, eventsDirV(Seq(
      (1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "view", 0.0), (4L, 4000L, 1L, "click", 0.0),
      (5L, 7000L, 2L, "view", 0.0), (6L, 8000L, 2L, "click", 0.0),
      (7L, 9000L, 2L, "view", 0.0), (8L, 11000L, 2L, "error", 0.0),
      (9L, 7000L, 3L, "error", 0.0), (10L, 8000L, 3L, "error", 0.0),
      (11L, 9000L, 3L, "error", 0.0))))
      .as[(String, String, Option[String], Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("click", "view", Some("click"), 1L, 0L, 0.0),
      ("error", "error", None, 1L, 0L, 0.0),
      ("view", "click", Some("view"), 1L, 1L, 1.0)))
  }

  test("interarrivalSpectrum: power-of-two boundaries land in the right buckets") {
    // u1 view gaps: 1ms (bucket 0), 4ms (bucket 2: 4 <= g < 8),
    // 0ms same-ts tiebreak (bucket -1), 7ms (bucket 2)
    val out = Events.interarrivalSpectrum(spark, eventsDirV(Seq(
      (1L, 1000L, 1L, "view", 0.0), (2L, 1001L, 1L, "view", 0.0),
      (3L, 1005L, 1L, "view", 0.0), (4L, 1005L, 1L, "view", 0.0),
      (5L, 1012L, 1L, "view", 0.0),
      (6L, 2000L, 2L, "click", 0.0))))  // single event: no gap row
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("view", -1, 1L, 0L, 0L),
      ("view", 0, 1L, 1L, 1L),
      ("view", 2, 2L, 4L, 7L)))
  }

  test("sessionCooccurrence: hand-built sessions, lift against independence") {
    // u1 session A {view,click,purchase}; u1 session B {view,click}
    // (second session: 2_997_000 ms gap > 30 min); u2 session C {view}
    val out = Events.sessionCooccurrence(spark, eventsDirV(Seq(
      (1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "purchase", 0.0),
      (4L, 3000000L, 1L, "view", 0.0), (5L, 3001000L, 1L, "click", 0.0),
      (6L, 1000L, 2L, "view", 0.0))))
      .as[(String, String, Long, Long, Long, Long, Double)].collect().toSeq
    // singles: view 3, click 2, purchase 1; n_sessions 3
    // lift(click,purchase) = 1*3/(2*1); lift(click,view) = 2*3/(2*3)
    assert(out === Seq(
      ("click", "purchase", 1L, 2L, 1L, 3L, 1.5),
      ("click", "view", 2L, 2L, 3L, 3L, 1.0),
      ("purchase", "view", 1L, 1L, 3L, 3L, 1.0)))
  }

  test("clusterSplit: non-convergence is a hard failure, not a warning") {
    // maxIters=0 cannot converge on any corpus with at least one
    // near-dup edge — the guarantee-bearing path must throw, because a
    // half-propagated labeling can put two docs of one true cluster in
    // different splits while only a stderr line fires
    val e = intercept[IllegalStateException] {
      Dedup.dedupClusters(spark, sf0001, maxIters = 0,
        requireConverged = true).collect()
    }
    assert(e.getMessage.contains("not converged"))
    // the analytics path keeps the tolerant behavior: same call without
    // the flag returns a (partial) labeling instead of throwing
    assert(Dedup.dedupClusters(spark, sf0001, maxIters = 0).count() > 0)
  }

  test("joinCardinality: exact product-sum without materializing, rate=1 estimate is exact") {
    import org.apache.spark.sql.Row
    val dir = java.nio.file.Files.createTempDirectory("graft-jcard").toString
    val t0 = new java.sql.Timestamp(0L)
    def write(name: String, rows: Seq[Row]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), graft.Tables.schemas(name))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("customer", Seq(Row(1L, "a", 1, 0.0, "S"), Row(2L, "b", 1, 0.0, "S")))
    write("orders", Seq(
      Row(1L, 1L, "O", 1.0, t0, "p"), Row(2L, 1L, "O", 1.0, t0, "p"),
      Row(3L, 2L, "O", 1.0, t0, "p"), Row(4L, 9L, "O", 1.0, t0, "p")))
    write("lineitem", (1 to 3).map(i =>
      Row(1L, 5L, 1L, i, 1.0, 1.0, 0.0, 0.0, "N", "O", t0)))
    write("part", Seq(Row(5L, "p", "b", "t", 1, 1.0)))
    val out = graft.operators.Profile.joinCardinality(spark, dir, rate = 1)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // customer⋈orders: matched keys {1: 1·2, 2: 1·1} -> exact 3 (order
    // with orphan custkey 9 contributes nothing); orders⋈lineitem:
    // {1: 1·3}; part⋈lineitem: {5: 1·3}. rate=1 samples every key, so
    // the estimate IS the exact sum and rel_err is identically 0.
    assert(out === Seq(
      ("customer_orders", 2L, 3L, 3L, 3L, 0.0),
      ("orders_lineitem", 1L, 3L, 3L, 3L, 0.0),
      ("part_lineitem", 1L, 3L, 3L, 3L, 0.0)))
    // default rate: estimate is always a multiple of the rate and
    // rel_err restates |est - exact| / exact
    val sampled = graft.operators.Profile.joinCardinality(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    sampled.foreach { case (_, _, _, exact, est, relErr) =>
      assert(est % 16 === 0)
      assert(relErr === BigDecimal(math.abs(est - exact).toDouble / exact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("validation suite: every rule type counts its staged violations") {
    import org.apache.spark.sql.Row
    val dir = java.nio.file.Files.createTempDirectory("graft-vsuite").toString
    val t0 = new java.sql.Timestamp(0L)
    def write(name: String, rows: Seq[Row]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), graft.Tables.schemas(name))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("customer", Seq(Row(10L, "a", 1, 0.0, "SEG")))
    write("orders", Seq(
      Row(1L, 10L, "O", 100.0, t0, "1-URGENT"),       // clean
      Row(1L, 10L, "F", 200.0, t0, "1-URGENT"),       // dup key
      Row(null, 11L, "X", -5.0, t0, "1-URGENT"),      // null key, bad
                                                      // status, neg total,
                                                      // orphan custkey
      Row(3L, 99L, "P", 2e6, t0, "1-URGENT")))        // over-cap total,
                                                      // orphan custkey
    write("lineitem", Seq(
      Row(1L, 1L, 1L, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", t0),   // clean
      Row(7L, 1L, 1L, 1, 0.0, 1.0, 0.0, 0.0, "N", "O", t0),   // orphan
                                                              // order, qty<1
      Row(null, 1L, 1L, 1, 60.0, 1.0, 0.0, 0.0, "N", "O", t0))) // null key,
                                                                // qty>50
    val out = graft.operators.Validate.orderFlowReport(spark, dir)
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(out === Seq(
      ("lineitem_key_not_null", "lineitem", 3L, 1L, 0),
      ("lineitem_order_fk", "lineitem", 3L, 1L, 0),
      ("lineitem_qty_in_range", "lineitem", 3L, 2L, 0),
      ("orders_customer_fk", "orders", 4L, 2L, 0),
      ("orders_key_not_null", "orders", 4L, 1L, 0),
      ("orders_key_unique", "orders", 4L, 1L, 0),
      ("orders_status_domain", "orders", 4L, 1L, 0),
      ("orders_total_in_range", "orders", 4L, 2L, 0)))
  }

  test("quantileNormalize: bucket-decomposed rank equals the naive global rank") {
    // mixed-source docs with distinct quality scores; the operator's
    // distributed (bucket offset + within-bucket) global rank must
    // reproduce exactly what a naive single-partition mapping gives
    val dir = java.nio.file.Files.createTempDirectory("graft-qnorm").toString
    val texts = Seq(
      "good clean sentence with the usual words and the right length",
      "a", "!!! ??? $$$ @@@", "the quick brown fox jumps over a lazy dog",
      "words words words words words", "x y z !", "short", "and the of to in",
      "mixed bag of punctuation, length and stopwords overall decent text",
      "zzzz qqqq jjjj wwww")
    texts.zipWithIndex.map { case (t, i) =>
      (i + 1L, t, "en", if (i % 3 == 0) "web" else if (i % 3 == 1) "books"
        else "code", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.quantileNormalize(spark, dir)
      .as[(Long, String, Double, Double)].collect().toSeq
    // naive reference: same mapping with plain unpartitioned windows
    val scored = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source",
        graft.functions.TextFunctions.qualityScore($"text").as("quality"))
    scored.createOrReplaceTempView("qn_scored")
    val expected = spark.sql(
      """WITH src AS (
        |  SELECT doc_id, source, quality,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY quality, doc_id) AS rn_s,
        |    COUNT(*) OVER (PARTITION BY source) AS n_s,
        |    COUNT(*) OVER () AS n_g
        |  FROM qn_scored
        |), glob AS (
        |  SELECT quality AS norm_quality,
        |    row_number() OVER (ORDER BY quality, doc_id) AS rn_g
        |  FROM qn_scored
        |)
        |SELECT s.doc_id, s.source, s.quality, g.norm_quality
        |FROM src s JOIN glob g ON g.rn_g =
        |  CASE WHEN s.n_s > 1
        |    THEN ((s.rn_s - 1) * (s.n_g - 1)) div (s.n_s - 1) + 1
        |    ELSE (s.n_g + 1) div 2 END
        |ORDER BY s.doc_id""".stripMargin)
      .as[(Long, String, Double, Double)].collect().toSeq
    assert(out === expected)
    // the normalized scores are drawn from the global score multiset,
    // and the per-source min/max map to the global min/max
    val globalScores = scored.as[(Long, String, Double)].collect()
      .map(_._3).sorted
    assert(out.forall(r => globalScores.contains(r._4)))
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.minBy(r => (r._3, r._1))._4 === globalScores.head)
      assert(rows.maxBy(r => (r._3, r._1))._4 === globalScores.last)
    }
  }

  test("changePoints: locates the regime shift, flat series degenerates to day 0") {
    val day = 86400000L
    // type a: three days at 10, then three days at 100 — the centered
    // CUSUM |cum - idx/n*total| peaks at idx=3 (|30-165|=135), so the
    // change day is day 2 with means 10 -> 100. type b: constant 5 for
    // three days — stat is identically 0, day-asc tiebreak picks day 0.
    val rows =
      (0 to 5).map(d => (d + 1L, d * day, 1L, "a",
        if (d < 3) 10.0 else 100.0)) ++
      (0 to 2).map(d => (d + 10L, d * day, 1L, "b", 5.0))
    val out = Events.changePoints(spark, eventsDirV(rows))
      .as[(String, Long, Int, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("a", 2L, 6, 135.0, 10.0, 100.0),
      ("b", 0L, 3, 0.0, 5.0, 5.0)))
  }

  test("skylineParts: matches brute-force dominance on sf0.001") {
    // brute force: a part survives iff no other part is <= on price,
    // >= on size, and strictly better on at least one axis
    val part = graft.Tables.load(spark, sf0001, "part")
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .as[(Long, Double, Int)].collect().toSeq
    val expect = part.filter { case (k, pr, sz) =>
      !part.exists { case (k2, pr2, sz2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz) && k2 != k
      }
    }.map(_._1).toSet
    val got = Relational.skylineParts(spark, sf0001)
      .select($"p_partkey").as[Long].collect().toSet
    assert(got === expect)
    // frontier is a staircase: sorted by price asc, sizes strictly
    // increase whenever price strictly increases (a later point that
    // paid more but got no more size would be dominated)
    val ladder = Relational.skylineParts(spark, sf0001)
      .select($"p_retailprice", $"p_size").as[(Double, Int)]
      .collect().toSeq
    ladder.sliding(2).foreach {
      case Seq((pr1, sz1), (pr2, sz2)) =>
        assert(pr1 <= pr2)
        if (pr1 < pr2) assert(sz1 < sz2) else assert(sz1 == sz2)
      case _ =>
    }
  }

  test("srmAudit: perfect split is chi2 0; missing variants count") {
    // users 1,2,3,5 hash (md5 first-8-hex mod 4) to variants 0,1,2,3 —
    // one per variant: chi2 = 0, no flag. Type "skew" sees users
    // 1,6,10 (ALL variant 0): obs (3,0,0,0) vs exp 0.75 → chi2 =
    // (3-.75)²/.75 + 3·(.75)²/.75 = 6.75 + 2.25 = 9.0 > 7.814728,
    // which only comes out right if zero-user variants contribute.
    val rows =
      Seq(1L, 2L, 3L, 5L).zipWithIndex.map { case (u, i) =>
        (i + 1L, 1000L * i, u, "even", 1.0) } ++
      Seq(1L, 6L, 10L).zipWithIndex.map { case (u, i) =>
        (i + 10L, 1000L * i, u, "skew", 1.0) }
    val out = graft.operators.Profile.srmAudit(spark, eventsDirV(rows))
      .select($"event_type", $"n_users", $"min_variant", $"max_variant",
        $"chi2", $"srm_flag")
      .as[(String, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      ("even", 4L, 1L, 1L, 0.0, false),
      ("skew", 3L, 0L, 3L, 9.0, true)))
  }

  test("looTargetEncode: excludes own row; singleton category is null") {
    val dir = java.nio.file.Files.createTempDirectory("graft-loo").toString
    // category A: prices 10, 20, 30 → LOO enc of the 10-row is
    // (20+30)/2 = 25; category B: one row → null
    Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
        (4L, "B", 99.0))
      .map { case (k, p, tp) =>
        (k, 1L, "O", tp, new java.sql.Timestamp(0L), p) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Curation.looTargetEncode(spark, dir)
      .select($"o_orderkey", $"loo_enc")
      .as[(Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, Some(25.0)), (2L, Some(20.0)), (3L, Some(15.0)), (4L, None)))
  }

  test("conformalForecast: exact line gives qhat 0; test outlier halves coverage") {
    val day = 86400000L
    // "lin": 20 days exactly on v = 2d + 5 → OLS recovers the line,
    // residuals 0 everywhere, qhat 0, coverage 1. "half": 10 days on
    // v = d except the LAST test day (day 9, rank 10) at +100 → train
    // (r ≤ 6) and cal (r 7-8) are exact, qhat 0, and of the two test
    // days only day 8 is covered → coverage 0.5
    val rows =
      (0 to 19).map(d => (d + 1L, d * day, 1L, "lin", 2.0 * d + 5.0)) ++
      (0 to 9).map(d => (d + 100L, d * day, 1L, "half",
        if (d == 9) 109.0 else d.toDouble))
    val out = Events.conformalForecast(spark, eventsDirV(rows))
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("half", 10L, 6L, 2L, 2L, 0.0, 0.5),
      ("lin", 20L, 12L, 4L, 4L, 0.0, 1.0)))
  }

  test("stlDecompose: constant series is all-trend; pure weekly pattern is all-seasonal") {
    val day = 86400000L
    // "c": 14 days at v = 10 → trend 10, seasonal 0, resid 0 on the 8
    // full-window days. "w": v = 70 + (dow − 3) with dow = (d+3)%7 —
    // every 7-day window covers each weekday once, so trend = 70
    // exactly, the seasonal component recovers dow − 3 (sums to zero
    // over the week), and the residual vanishes
    val rows =
      (0 to 13).map(d => (d + 1L, d * day, 1L, "c", 10.0)) ++
      (0 to 13).map(d => (d + 50L, d * day, 1L, "w", 70.0 + (d + 3) % 7 - 3))
    val out = Events.stlDecompose(spark, eventsDirV(rows))
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    val expected =
      (3L to 10L).map(d => ("c", d, 10.0, 10.0, 0.0, 0.0)) ++
      (3L to 10L).map { d =>
        val b = ((d + 3) % 7 - 3).toDouble
        ("w", d, 70.0 + b, 70.0, b, 0.0)
      }
    assert(out === expected)
  }

  test("ewmaControl: hand-traced λ=1/5 recurrence with one 3σ-style alert") {
    val day = 86400000L
    // E: 5 → (10+4·5)/5 = 6 → (5+4·6)/5 = 5.8 → 5.64 → (30+4·5.64)/5
    // = 10.512 (all exact in micro-units); |dev| = 5, 1, 0.8, 24.36 →
    // mean 7.79, so only day 4 (24.36 > 3·7.79 = 23.37) alerts
    val vals = Seq(5.0, 10.0, 5.0, 5.0, 30.0)
    val rows = vals.zipWithIndex.map { case (v, d) =>
      (d + 1L, d * day, 1L, "e", v) }
    val out = Events.ewmaControl(spark, eventsDirV(rows))
      .as[(String, Long, Double, Double, Option[Double], Option[Int])]
      .collect().toSeq
    assert(out === Seq(
      ("e", 0L, 5.0, 5.0, None, None),
      ("e", 1L, 10.0, 6.0, Some(5.0), Some(0)),
      ("e", 2L, 5.0, 5.8, Some(-1.0), Some(0)),
      ("e", 3L, 5.0, 5.64, Some(-0.8), Some(0)),
      ("e", 4L, 30.0, 10.512, Some(24.36), Some(1))))
  }

  test("ipsOffPolicy: exact-binary weights — greedy pick from day 0, diagnostics by hand") {
    val day = 86400000L
    // day 0: A mean 1 (r=1,1), B mean 4 (r=4) → day 1 plays B.
    // day 1: A r=2 (n_a=1), B r=4 (n_a=1); n=2, K=2 →
    // w_A = (0.25/2)·2 = 0.25, w_B = (0.75+0.125)·2 = 1.75 (both
    // exact binary). IPS = (0.25·2 + 1.75·4)/2 = 3.75 = SNIPS
    // (den = 2); ESS = 2²/(0.0625+3.0625) = 1.28; behavior = 6/2 = 3
    val rows = Seq(
      (1L, 0L, 1L, "A", 1.0), (2L, 1L, 1L, "A", 1.0), (3L, 2L, 1L, "B", 4.0),
      (4L, day, 1L, "A", 2.0), (5L, day + 1, 1L, "B", 4.0))
    val out = Events.ipsOffPolicy(spark, eventsDirV(rows))
      .as[(Long, String, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(out === Seq((1L, "B", 2L, 2L, 3.0, 3.75, 3.75, 1.28, 1.75)))
  }

  test("powerAnalysis: unit-variance fixture sizes 16 per arm, 22 days") {
    val day = 86400000L
    // values 1,2,3 over days {0,0,1}: mean 2, var 1, sd 1; lift 0.5 →
    // mde 1, n_per_arm = ceil(2·(2.801585)²) = 16; rate 3 events per
    // 2 days → days = ceil(32·2/3) = 22
    val rows = Seq((1L, 0L, 1L, "e", 1.0), (2L, 1L, 1L, "e", 2.0),
      (3L, day, 1L, "e", 3.0))
    val out = Events.powerAnalysis(spark, eventsDirV(rows), lifts = Seq(0.5))
      .as[(String, Double, Long, Long, Double, Double, Double, Long, Long)]
      .collect().toSeq
    assert(out === Seq(("e", 0.5, 3L, 2L, 2.0, 1.0, 1.0, 16L, 22L)))
  }

  test("skylineParts: exact under adversarial bucketing (1 bucket == global)") {
    val one = Relational.skylineParts(spark, sf0001, buckets = 1)
      .select($"p_partkey").as[Long].collect().toSet
    val many = Relational.skylineParts(spark, sf0001, buckets = 64)
      .select($"p_partkey").as[Long].collect().toSet
    assert(one === many)
  }

  test("didReadout: hand 2x2 — estimate, pooled SE, t-stat") {
    // users 1 (hash→control) and 2 (hash→treatment); days 0..3, mid=2.
    // ctrl means 1.5→2.5, treat 2.0→5.0: DiD = 3.0 − 1.0 = 2.0.
    // cell variances 0.5/0.5/2/2 (n=2 each) → SE = sqrt(2.5).
    val day = 86400000L
    val dir = eventsDirV(Seq(
      (1L, 0 * day, 1L, "m", 1.0), (2L, 1 * day, 1L, "m", 2.0),
      (3L, 2 * day, 1L, "m", 2.0), (4L, 3 * day, 1L, "m", 3.0),
      (5L, 0 * day, 2L, "m", 1.0), (6L, 1 * day, 2L, "m", 3.0),
      (7L, 2 * day, 2L, "m", 4.0), (8L, 3 * day, 2L, "m", 6.0)))
    val out = Events.didReadout(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double, Double, Double,
        Double, Double, Double)].collect().toSeq
    assert(out === Seq(("m", 2L, 2L, 2L, 2L, 2.0, 5.0, 1.5, 2.5,
      2.0, 1.581139, 1.264911)))
  }

  test("chi2Independence: 2x2 hand table, empty cell contributes e") {
    // (q,p) rows (0,0)x2, (10,10)x2, (0,10): marginals r=(3,2),
    // c=(2,3), n=5. The (1,0) cell is EMPTY and must still add
    // e=0.8 to chi2: 0.533333+0.355556+0.8+0.533333 = 2.222222;
    // V = sqrt(2.222222/5) = 0.666667.
    val dir = java.nio.file.Files.createTempDirectory("graft-chi2").toString
    Seq((0.0, 0.0), (0.0, 0.0), (10.0, 10.0), (10.0, 10.0), (0.0, 10.0))
      .zipWithIndex
      .map { case ((q, p), i) => (i.toLong, i.toLong, 1L, 1, q, p, 0.0, 0.0,
        "N", "O", new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Profile.chi2Independence(spark, dir, bins = 2)
      .as[(Long, Int, Double, Double)].collect().toSeq
    assert(out === Seq((5L, 1, 2.222222, 0.666667)))
  }

  test("nationRevenueShares: two-level shares sum to 1 per level, hand math") {
    val dir = java.nio.file.Files.createTempDirectory("graft-natrev").toString
    Seq((1, "R1"), (2, "R2")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1, "A", 1), (2, "B", 1), (3, "C", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "c1", 1, 0.0, "X"), (2L, "c2", 2, 0.0, "X"), (3L, "c3", 3, 0.0, "X"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // nation A: 10+20, B: 30, C: 40 → region R1=60, R2=40, global 100
    Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 2L, 30.0), (4L, 3L, 40.0))
      .map { case (ok, ck, v) => (ok, ck, "O", v,
        new java.sql.Timestamp(0L), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Relational.nationRevenueShares(spark, dir)
      .as[(String, String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(out === Seq(
      ("R1", "A", 2L, 30.0, 60.0, 100.0, 0.5, 0.3),
      ("R1", "B", 1L, 30.0, 60.0, 100.0, 0.5, 0.3),
      ("R2", "C", 1L, 40.0, 40.0, 100.0, 1.0, 0.4)))
  }

  test("adamicAdar: triangle yields no candidates, open wedge scores 1/log10(deg)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-aa").toString
    // orders: {1,2} {1,3} {2,3} close a triangle (every wedge pair is
    // already an edge -> anti-join removes it); {4,5} {4,6} leave the
    // open wedge 5-4-6: one candidate (5,6) through z=4, deg(4)=2.
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 3L),
        (4L, 4L), (4L, 5L), (5L, 4L), (5L, 6L))
      .map { case (ok, pk) => (ok, pk, 1L, 1, 1.0, 1.0, 0.0, 0.0,
        "N", "O", new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Graph.adamicAdar(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // round(1/log10(2), 6) = 3.321928
    assert(out === Seq((5L, 6L, 1L, 3.321928)))
  }

  test("acfDaily: linear series gives r=1, gap day counts as zero, 1-pair lag is NULL") {
    val day = 86400000L
    // type a: days 0..3 counts 1,2,3,4 (linear -> lag1 and lag2 acf = 1;
    // lag3 has a single pair -> zero variance -> NULL; lag7 no pairs).
    // type b: counts on days 0 and 2 only -> dense series [2,0,2] ->
    // lag1 acf = -1 (the gap zero is real data, not a dropped row).
    val rows =
      (0 until 4).flatMap(d => (0 to d).map(i =>
        (10L * d + i, d * day, 1L, "a"))) ++
      Seq((100L, 0L, 1L, "b"), (101L, 0L, 2L, "b"),
          (102L, 2 * day, 1L, "b"), (103L, 2 * day, 2L, "b"))
    val dir = eventsDir(rows.map { case (id, ms, u, t) => (id, ms, u, t) })
    val out = graft.operators.Events.acfDaily(spark, dir)
      .as[(String, Int, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      ("a", 1, 3L, Some(1.0)),
      ("a", 2, 2L, Some(1.0)),
      ("a", 3, 1L, None),
      ("b", 1, 2L, Some(-1.0)),
      ("b", 2, 1L, None)))
  }

  test("uShapedAttribution: 40/20/40 split, journey reset at purchase, direct fallback") {
    // u1: click view click purchase(10) -> 4,2,4 by position; then a
    //     second journey: view purchase(5) -> single touch takes all 5
    // u2: purchase(7) with no touches -> direct
    val rows = Seq(
      (1L, 1000L, 1L, "click", 0.0), (2L, 2000L, 1L, "view", 0.0),
      (3L, 3000L, 1L, "click", 0.0), (4L, 4000L, 1L, "purchase", 10.0),
      (5L, 5000L, 1L, "view", 0.0), (6L, 6000L, 1L, "purchase", 5.0),
      (7L, 1000L, 2L, "purchase", 7.0))
    val dir = eventsDirV(rows)
    val out = graft.operators.Events.uShapedAttribution(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    // click: first 4.0 + last 4.0 = 8.0 over 2 credits;
    // view: middle 2.0 + solo 5.0 = 7.0 over 2 credits; direct: 7.0
    assert(out === Seq(
      ("click", 2L, 8.0), ("direct", 1L, 7.0), ("view", 2L, 7.0)))
  }

  test("theilSenTrend: outlier day cannot drag the median slope") {
    val day = 86400000L
    // daily values 1,2,3,4 except day 2 spikes to 100: OLS would tilt
    // hard; the median pairwise slope stays 1. Pairs (n=4 days): slopes
    // d01=1 d02=? with v2=100 ... median of 6 slopes
    val rows = Seq(
      (1L, 0L * day, 1L, "a", 1.0), (2L, 1L * day, 1L, "a", 2.0),
      (3L, 2L * day, 1L, "a", 100.0), (4L, 3L * day, 1L, "a", 4.0))
    val dir = eventsDirV(rows)
    val out = graft.operators.Events.theilSenTrend(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    // slopes: (0,1)=1, (0,2)=49.5, (0,3)=1, (1,2)=98, (1,3)=1, (2,3)=-96
    // sorted: -96, 1, 1, 1, 49.5, 98 -> lower-middle (rank 3) = 1
    assert(out === Seq(("a", 6L, 1.0)))
  }

  test("mannKendall: monotone series maxes S, ties shrink the variance, flat series is no_trend") {
    val day = 86400000L
    // 'a': strictly rising 5-day series — every pair concordant:
    // S = 10; var_num = 5*4*15 - 0 = 300; z = 9/sqrt(300/18)
    // 'b': constant — S = 0, tie term = 5*4*15 = 300 -> var_num 0
    val rows = (0 until 5).flatMap { d =>
      Seq((10L + d, d * day, 1L, "a", (d + 1).toDouble),
          (20L + d, d * day, 1L, "b", 7.0))
    }
    val dir = eventsDirV(rows)
    val out = graft.operators.Events.mannKendall(spark, dir)
      .as[(String, Long, Long, Long, Double, String)].collect().toSeq
    val zA = math.rint(9.0 / math.sqrt(300.0 / 18.0) * 1e6) / 1e6
    assert(out === Seq(
      ("a", 5L, 10L, 300L, zA, "increasing"),
      ("b", 5L, 0L, 0L, 0.0, "no_trend")))
  }

  test("watermarkTuning: drop curve is monotone and zero beyond the jitter bound") {
    val out = graft.operators.Events.watermarkTuning(spark, sf0001)
      .as[(String, Int, Long, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byDelay = rows.sortBy(_._2)
      // n_events constant across the grid; drops monotone non-rising
      assert(byDelay.map(_._3).distinct.size === 1)
      assert(byDelay.map(_._4) === byDelay.map(_._4).sorted.reverse)
      // lateness is bounded by the modeled 10-min jitter: a 15-min
      // (or wider) watermark never drops anything
      byDelay.filter(_._2 >= 15).foreach(r => assert(r._4 === 0L))
      byDelay.foreach(r => assert(r._5 < 600000L))
    }
  }

  test("burstiness: constant series fano 0, clumped series fano > 1") {
    val day = 86400000L
    // a: 2 events each of days 0..2 -> var 0 -> fano 0
    // b: 4 events day 0, 1 event day 2 -> dense [4,0,1]: sx=5, sxx=17,
    //    mean 5/3, var = (3*17-25)/6 = 26/6, fano = 26/(2*5) = 2.6
    val rows =
      (0 until 3).flatMap(d => Seq((10L + 2 * d, d * day, 1L, "a"),
                                   (11L + 2 * d, d * day, 2L, "a"))) ++
      Seq((30L, 0L, 1L, "b"), (31L, 0L, 2L, "b"), (32L, 0L, 3L, "b"),
          (33L, 0L, 4L, "b"), (34L, 2 * day, 5L, "b"))
    val dir = eventsDir(rows)
    val out = graft.operators.Events.burstiness(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("a", 3L, 2.0, 0.0, 0.0),
      ("b", 3L, 1.666667, 4.333333, 2.6)))
  }

  test("timeDecayAttribution: per-day halving weights, same-day ties split evenly") {
    val day = 86400000L
    // u1 journey: click 2 days out (w=1), view 1 day out (w=2),
    // click same day (w=4) -> purchase(70): credits 10/20/40
    // u2: touchless purchase(5) -> direct
    val rows = Seq(
      (1L, 0L, 1L, "click", 0.0), (2L, day, 1L, "view", 0.0),
      (3L, 2 * day, 1L, "click", 0.0), (4L, 2 * day + 1, 1L, "purchase", 70.0),
      (9L, 0L, 2L, "purchase", 5.0))
    val dir = eventsDirV(rows)
    val out = graft.operators.Events.timeDecayAttribution(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("click", 2L, 50.0), ("direct", 1L, 5.0), ("view", 1L, 20.0)))
  }

  test("idleRichCustomers: above-average balance and orderless only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q22").toString
    // positive-balance avg = (100+300+200+300)/4 = 225; qualifiers must
    // be > 225 AND have no order in the last 90 days of the timeline:
    // asof = day 100; c2 (300) ordered on day 95 -> recent -> excluded;
    // c5 (300) last ordered day 5 -> dormant -> kept; c4's negative
    // balance is excluded from the average
    val day = 86400000L
    Seq((1L, "c1", 1, 100.0, "B"), (2L, "c2", 1, 300.0, "B"),
        (3L, "c3", 1, 200.0, "B"), (4L, "c4", 2, -50.0, "B"),
        (5L, "c5", 2, 300.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 2L, 95L), (11L, 5L, 5L), (12L, 1L, 100L))
      .map { case (ok, ck, d) => (ok, ck, "O", 1.0,
        new java.sql.Timestamp(d * day), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Relational.idleRichCustomers(spark, dir)
      .as[(Int, Long, Double)].collect().toSeq
    assert(out === Seq((2, 1L, 300.0)))
  }

  test("forecastBacktest: hand series, naive and seasonal MAEs with MASE scaling") {
    val day = 86400000L
    // one type, 8 days of values 1..8 (linear): mid = (0+7)//2 = 3 ->
    // train days 0..3, test days 4..7. p1 errors are all 1:
    //   train scored days 1,2,3 -> aeTr = 3, n_train = 3 -> denom 1
    //   test days 4..7 -> mae_naive = 1
    // p7 exists only on day 7: |8 - 1| = 7 -> mae_snaive = 7, mase = 7
    val rows = (0 until 8).map(d =>
      (d.toLong + 1, d * day, 1L, "a", (d + 1).toDouble))
    val dir = eventsDirV(rows)
    val out = graft.operators.Events.forecastBacktest(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(("a", 4L, 1.0, 7.0, 7.0)))
  }

  test("communityConductance: two cliques with one bridge edge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cond").toString
    // orders build two triangles {1,2,3} and {4,5,6} plus one bridge
    // order {3,4}. After 2 LP rounds both triangles collapse to one
    // label each; the bridge is the only cut edge (w=1).
    // Per community: internal_w = 3, cut_w = 1, vol = 7, total = 14
    // -> conductance = 1/7 = 0.142857 for both.
    val baskets = Seq(
      Seq(1L, 2L, 3L), Seq(1L, 2L, 3L),
      Seq(4L, 5L, 6L), Seq(4L, 5L, 6L),
      Seq(3L, 4L))
    val rows = baskets.zipWithIndex.flatMap { case (ps, ok) =>
      ps.map(pk => (ok.toLong, pk)) }
    rows.zipWithIndex
      .map { case ((ok, pk), i) => (ok, pk, 1L, i, 1.0, 1.0, 0.0, 0.0,
        "N", "O", new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Graph.communityConductance(spark, dir)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().toSeq
    // weights: triangle edges w=2 (two identical baskets)! recompute:
    // internal_w = 3 edges x2 = 6, cut 1, vol = 13, total = 26,
    // conductance = 1/13 = 0.076923
    assert(out.map(_._2) === Seq(3L, 3L))
    assert(out.map(_._3) === Seq(6L, 6L))
    assert(out.map(_._4) === Seq(1L, 1L))
    assert(out.map(_._5) === Seq(13L, 13L))
    assert(out.map(_._6) === Seq(Some(0.076923), Some(0.076923)))
  }

  test("olsResidualDw: perfect line gives dw NULL (zero residuals); alternating gives 4-ish") {
    val day = 86400000L
    // type a: y = 2x + 1 exactly -> residuals all 0 -> sse 0 -> NULL dw
    // type b: y alternates +1/-1 around a flat line -> strong negative
    //   autocorrelation -> dw near 4 (residuals e: .75,-1.25,.75,-1.25 after
    //   fit -- just assert the bracket, the exact fit is shared-engine)
    val rows =
      (0 until 4).map(d => (10L + d, d * day, 1L, "a", 2.0 * d + 1.0)) ++
      (0 until 4).map(d => (20L + d, d * day, 1L, "b",
        if (d % 2 == 0) 2.0 else 0.0))
    val dir = eventsDirV(rows)
    val out = graft.operators.Events.olsResidualDw(spark, dir)
      .as[(String, Long, Double, Double, Option[Double])].collect().toSeq
    val a = out.find(_._1 == "a").get
    assert(a._3 === 2.0 && a._4 === 1.0 && a._5 === None)
    val b = out.find(_._1 == "b").get
    assert(b._5.isDefined && b._5.get > 3.0 && b._5.get <= 4.0)
  }

  test("crossCorrelation: shifted copy of a series correlates perfectly at its lag") {
    val day = 86400000L
    // type a: counts 1,2,3,1 on days 0..3; type b = a shifted +1 day
    // (counts 1,2,3 on days 1..3 -- day 4 would carry 1 but the global
    // spine ends at day 3). ccf(a,b,lag=1): pairs over days 0..2:
    // x=(1,2,3) vs y=b(1..3)=(1,2,3) -> r = 1.
    val rows =
      (0 until 4).flatMap { d =>
        val n = Seq(1, 2, 3, 1)(d)
        (0 until n).map(i => (100L + 10 * d + i, d * day, 1L, "a"))
      } ++
      (1 until 4).flatMap { d =>
        val n = Seq(1, 2, 3)(d - 1)
        (0 until n).map(i => (200L + 10 * d + i, d * day, 2L, "b"))
      }
    val dir = eventsDir(rows)
    val out = graft.operators.Events.crossCorrelation(spark, dir)
      .as[(String, String, Int, Long, Option[Double])].collect().toSeq
    val ab1 = out.find(r => r._1 == "a" && r._2 == "b" && r._3 == 1).get
    assert(ab1._4 === 3L && ab1._5 === Some(1.0))
    // the reverse direction at lag 1 is NOT 1: b does not lead a
    val ba1 = out.find(r => r._1 == "b" && r._2 == "a" && r._3 == 1).get
    assert(ba1._5 !== Some(1.0))
  }

  test("mannWhitney: tie-corrected U and z on a hand case") {
    // a: {1,1}, b: {1,2}. value 1 has cnt 3 (midrank 2), value 2 has
    // midrank 4. R(a) = 4, U_a = 4 - 3 = 1; U_b = 3 (U_a + U_b = n1·n2).
    // tie term Σ(t³-t) = 24, so σ² = (4/12)·(5 - 24/12) = 1 exactly:
    // z_a = (1-2)/1 = -1, z_b = +1; rank-biserial = ±0.5.
    val rows = Seq(
      (1L, 0L, 1L, "a", 1.0), (2L, 1L, 1L, "a", 1.0),
      (3L, 2L, 1L, "b", 1.0), (4L, 3L, 1L, "b", 2.0))
    val dir = eventsDirV(rows)
    val out = graft.operators.Profile.mannWhitney(spark, dir)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("a", 2L, 2L, 1.0, -1.0, -0.5),
      ("b", 2L, 2L, 3.0, 1.0, 0.5)))
  }

  test("holtForecast: exact halving fold on a hand series; 1-day guard") {
    val day = 86400000L
    val series = Seq(10.0, 14.0, 13.0, 20.0, 22.0)
    val rows = series.zipWithIndex.map { case (v, d) =>
      (d.toLong + 1, d * day, 1L, "a", v)
    } :+ (99L, 0L, 2L, "single", 7.5)
    val dir = eventsDirV(rows)
    val out = graft.operators.Events.holtForecast(spark, dir)
      .as[(String, Int, Double, Double, Double)].collect().toSeq
    // hand fold: s=10, b=4; then 13, 20, 22 through the α=β=½ recurrence
    var s = 10.0; var b = 4.0
    Seq(13.0, 20.0, 22.0).foreach { x =>
      val s2 = (x + s + b) / 2; b = ((s2 - s) + b) / 2; s = s2
    }
    assert(out === Seq(
      ("a", 5, s, b, s + b), // 22.53125, 4.171875, 26.703125
      ("single", 1, 7.5, 0.0, 7.5)))
  }

  test("anovaShipLag: two-group hand case (F = 8, eta^2 = 0.8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-anova").toString
    val day = 86400000L
    def ts(d: Long) = new java.sql.Timestamp(d * day)
    // group nation 1: lags {1, 2}; nation 2: lags {3, 4}
    Seq((10L, "s1", 1, 0.0), (20L, "s2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L, "O", 1.0, ts(0), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (10L, 2L), (20L, 3L), (20L, 4L)).map { case (sk, lag) =>
      (1L, 1L, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(lag))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Profile.anovaShipLag(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    // sx=10 N=4 sxx=30; sb = (9/2 + 49/2) = 29 (exact at the e6 scale);
    // SSB = 29 - 25 = 4, SSW = 1, F = (4/1)/(1/2) = 8, eta² = 4/5
    assert(out === Seq((2L, 4L, 4.0, 1.0, 8.0, 0.8)))
  }

  test("mannWhitney invariants on random two-type data (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // values drawn from a tiny domain to force heavy ties — the tie
    // correction's stress case
    val vals = Gen.listOfN(12, Gen.chooseNum(0, 3)).map(_.map(_.toDouble))
    val p = Prop.forAll(vals, vals) { (as: List[Double], bs: List[Double]) =>
      (as.nonEmpty && bs.nonEmpty) ==> {
        val rows = (as.map(("a", _)) ++ bs.map(("b", _))).zipWithIndex
          .map { case ((t, v), i) => (i.toLong + 1, i.toLong, 1L, t, v) }
        val dir = eventsDirV(rows)
        val out = graft.operators.Profile.mannWhitney(spark, dir)
          .as[(String, Long, Long, Double, Double, Double)]
          .collect().map(r => r._1 -> r).toMap
        val (ua, ub) = (out("a")._4, out("b")._4)
        val (za, zb) = (out("a")._5, out("b")._5)
        // U_a + U_b = n1·n2 (exact, the rank-sum identity), one-vs-rest
        // z-scores are antisymmetric for two groups, and U ∈ [0, n1·n2]
        ua + ub == as.size.toDouble * bs.size &&
          math.abs(za + zb) <= 2e-6 && // each rounded 6dp before summing
          ua >= 0 && ua <= as.size.toDouble * bs.size
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("tClosenessAudit stays in [0, 1] on random customer tables (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val rows = Gen.listOfN(20, Gen.zip(Gen.chooseNum(1, 3),
      Gen.oneOf("A", "B"), Gen.chooseNum(-2, 5)))
    val p = Prop.forAll(rows) { rs: List[(Int, String, Int)] =>
      rs.nonEmpty ==> {
        val dir = java.nio.file.Files.createTempDirectory("graft-tcp").toString
        rs.zipWithIndex.map { case ((n, seg, bal), i) =>
          (i.toLong + 1, s"c$i", n, bal * 1000.0 + 500.0, seg) }
          .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
          .write.mode("overwrite").parquet(s"$dir/customer.parquet")
        val ts = graft.operators.Pii.tClosenessAudit(spark, dir)
          .select($"t_emd").as[Double].collect()
        ts.nonEmpty && ts.forall(t => t >= 0.0 && t <= 1.0)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("holtWinters: hand fold over a 14-day weekly-seasonal series") {
    val day = 86400000L
    val series = Seq(10.0, 12, 11, 13, 12, 14, 13, 20, 22, 21, 23, 22, 24, 23)
    val rows = series.zipWithIndex.map { case (v, d) =>
      (d.toLong + 1, d * day, 1L, "a", v)
    }
    val dir = eventsDirV(rows)
    val out = graft.operators.Events.holtWinters(spark, dir)
      .as[(String, Int, Double, Double, Int, Double, Double)].collect().toSeq
    // replicate the fold: seeds s=v1, b=v2-v1, c=0; process from v3
    var s = series.head; var b = series(1) - series.head
    val c = Array.fill(7)(0.0)
    series.zipWithIndex.drop(2).foreach { case (x, i) =>
      val idx = i % 7
      val s2 = (x - c(idx) + s + b) / 2
      b = ((s2 - s) + b) / 2
      c(idx) = (x - s2 + c(idx)) / 2
      s = s2
    }
    val f = s + b + c(series.length % 7)
    val amp = c.max - c.min
    assert(out === Seq(("a", 14,
      math.round(s * 1e6) / 1e6, math.round(b * 1e6) / 1e6,
      0, math.round(f * 1e6) / 1e6, math.round(amp * 1e6) / 1e6)))
  }

  test("tClosenessAudit: fully-separated class hits the max EMD 0.5 for m=2") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tclose").toString
    // class (1,B): both customers in bucket 0; class (2,B): both in
    // bucket 1. Global CDF at bucket 0 is 1/2, each class's is 1 or 0:
    // t = |F_c - F_g| / (m-1) = 0.5 for both, at_risk at tMax 0.25
    Seq((1L, "c1", 1, 100.0, "B"), (2L, "c2", 1, 200.0, "B"),
        (3L, "c3", 2, 1100.0, "B"), (4L, "c4", 2, 1200.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = graft.operators.Pii.tClosenessAudit(spark, dir)
      .as[(Int, String, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      (1, "B", 2L, 0.5, true),
      (2, "B", 2L, 0.5, true)))
  }

  test("gainsTable: late-capture lift by value decile on four hand orders") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gains").toString
    val day = 86400000L
    def ts(d: Long) = new java.sql.Timestamp(d * day)
    Seq((1L, 1L, "O", 40.0, ts(0), "1-URGENT"),
        (2L, 1L, "O", 30.0, ts(0), "5-LOW"),
        (3L, 1L, "O", 20.0, ts(0), "5-LOW"),
        (4L, 1L, "O", 10.0, ts(0), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // o1 and o3 ship a line 61 days late; o2/o4 ship on time
    Seq((1L, 61L), (2L, 1L), (3L, 61L), (4L, 1L)).map { case (ok, d) =>
      (ok, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(d))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Curation.gainsTable(spark, dir)
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    // value order o1..o4 -> 4 singleton deciles; lates at ranks 1 and 3
    assert(out === Seq(
      (1, 1L, 1L, 0.5, 0.25, 2.0),
      (2, 1L, 0L, 0.5, 0.5, 1.0),
      (3, 1L, 1L, 1.0, 0.75, 1.333333),
      (4, 1L, 0L, 1.0, 1.0, 1.0)))
  }

  test("contaminationSweep: lifted phrase flags at small n, not at n=5") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csweep").toString
    // doc_ids chosen so md5Bucket puts SOME docs in the eval slice
    // (bucket < 2): probe the bucket assignment first, then craft the
    // corpus so one corpus doc lifts a 4-token phrase from an eval doc
    import graft.functions.PortableHash
    val probe = spark.range(1, 401)
      .select($"id", (PortableHash.md5Long32($"id") % 100).as("b"))
      .as[(Long, Long)].collect().toSeq
    val evalIds = probe.filter(_._2 < 2).map(_._1).take(1)
    val corpusIds = probe.filter(_._2 >= 2).map(_._1).take(2)
    assert(evalIds.nonEmpty && corpusIds.size == 2)
    val lifted = "alpha beta gamma delta"
    val rows = Seq(
      (evalIds.head, s"eval doc contains $lifted inside it", "en", "s"),
      (corpusIds(0), s"training doc copied $lifted verbatim here", "en", "s"),
      (corpusIds(1), "wholly unrelated text with different words", "en", "s"))
    rows.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Dedup.contaminationSweep(spark, dir)
      .as[(Int, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> (r._3, r._5)).toMap
    // 4 shared tokens -> 3 shared bigrams / 2 trigrams: n=2 flags (>=3),
    // n=3 does not (2 < minShared), n=5 shares nothing
    assert(out(2) === ((1L, 3L)))
    assert(out(3) === ((0L, 0L)))
    assert(out(5) === ((0L, 0L)))
  }

  test("localSupplierRevenue counts only same-nation customer/supplier lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q5").toString
    val ts = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-03-01 00:00:00").getTime)
    Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1, "N1", 0), (2, "N2", 0), (3, "N3", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "c1", 1, 0.0, "B"), (2L, "c2", 2, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, "s1", 1, 0.0), (20L, "s2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((100L, 1L, "O", 1.0, ts, "1-URGENT"), (200L, 2L, "O", 1.0, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 100 (cust nation 1): one local line (s1), one cross (s2);
    // order 200 (cust nation 2): one local line (s2)
    Seq((100L, 10L, 100.0), (100L, 20L, 999.0), (200L, 20L, 50.0))
      .map { case (ok, sk, price) =>
        (ok, 1L, sk, 1, 1.0, price, 0.0, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Relational.localSupplierRevenue(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("N1", 1L, 100.0), ("N2", 1L, 50.0)))
  }

  test("nationFlows keeps directions separate and drops self-flows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q7").toString
    val ts = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-03-01 00:00:00").getTime)
    Seq((1, "N1", 0), (2, "N2", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "c1", 1, 0.0, "B"), (2L, "c2", 2, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, "s1", 1, 0.0), (20L, "s2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((100L, 1L, "O", 1.0, ts, "1-URGENT"), (200L, 2L, "O", 1.0, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // N2 -> N1: 100; N1 -> N2: 40; self-flow N1 -> N1 dropped
    Seq((100L, 20L, 100.0), (200L, 10L, 40.0), (100L, 10L, 999.0))
      .map { case (ok, sk, price) =>
        (ok, 1L, sk, 1, 1.0, price, 0.0, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Relational.nationFlows(spark, dir)
      .as[(String, String, Int, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("N1", "N2", 1996, 1L, 40.0),
      ("N2", "N1", 1996, 1L, 100.0)))
  }

  test("productProfit: filtered part drops its line; profit = rev - 0.6*retail*qty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q9").toString
    val ts = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-03-01 00:00:00").getTime)
    Seq((1, "N1", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((10L, "s1", 1, 0.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "red bolt", "B1", "STANDARD", 1, 10.0),
        (2L, "blue widget", "B1", "STANDARD", 1, 5.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((100L, 1L, "O", 1.0, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // bolt line: rev 100, cost 0.6*10*2 = 12 -> profit 88; widget line filtered
    Seq((100L, 1L, 2.0, 100.0), (100L, 2L, 1.0, 999.0))
      .map { case (ok, pk, qty, price) =>
        (ok, pk, 10L, 1, qty, price, 0.0, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Relational.productProfit(spark, dir)
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(out === Seq(("N1", 1996, 1L, 88.0)))
  }

  test("importantPositions: exact rational mean-relative threshold excludes the boundary pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q11").toString
    val ts = new java.sql.Timestamp(0L)
    // pairs: 4, 1, 1, 2; total=8, np=4, mult=1 keeps value*4 > 8 —
    // the exactly-at-the-mean pair (2*4 = 8) is OUT, proving the
    // boundary is decided in exact arithmetic
    Seq((10L, 1L, 4.0), (20L, 2L, 1.0), (30L, 3L, 1.0), (40L, 4L, 2.0))
      .map { case (sk, pk, price) =>
        (1L, pk, sk, 1, 1.0, price, 0.0, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Relational.importantPositions(spark, dir, mult = 1L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((10L, 1L, 4.0)))
  }

  test("shipModePriority: CASE-fold buckets split critical vs other in one pass") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q12").toString
    val d0 = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime)
    def plus(days: Int) = new java.sql.Timestamp(d0.getTime + days * 86400000L)
    Seq((1L, 1L, "O", 1.0, d0, "1-URGENT"), (2L, 1L, "O", 1.0, d0, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10), (1L, 40), (2L, 5))
      .map { case (ok, lag) =>
        (ok, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", plus(lag)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Relational.shipModePriority(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("FAST", 1L, 1L, 0.5), ("SLOW", 1L, 0L, 1.0)))
  }

  test("custOrderDistribution: zero-order customers survive; join-condition filter stays outer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q13").toString
    val ts = new java.sql.Timestamp(0L)
    Seq((1L, "c1", 1, 0.0, "B"), (2L, "c2", 1, 0.0, "B"), (3L, "c3", 1, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // c1: 2 qualifying + 1 unspecified (filtered IN the join condition);
    // c2: 1 qualifying; c3: none -> the zero bucket must exist
    Seq((11L, 1L, "1-URGENT"), (12L, 1L, "5-LOW"), (13L, 1L, "4-NOT SPECIFIED"),
        (21L, 2L, "2-HIGH"))
      .map { case (ok, ck, pr) => (ok, ck, "O", 1.0, ts, pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Relational.custOrderDistribution(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((2L, 1L), (1L, 1L), (0L, 1L)))
  }

  test("kruskalWallis: hand ranks — two clean groups give H = 2.4, eps^2 = 0.7") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kw").toString
    val d0 = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime)
    def plus(days: Int) = new java.sql.Timestamp(d0.getTime + days * 86400000L)
    // URGENT lags {1,2} -> ranks {1,2}, R=3; LOW lags {3,4} -> ranks {3,4}, R=7
    // H = 12/(4*5) * (3^2/2 + 7^2/2) - 3*5 = 2.4 (tie-free), eps^2 = 1.4/2
    Seq((1L, "1-URGENT"), (2L, "1-URGENT"), (3L, "5-LOW"), (4L, "5-LOW"))
      .map { case (ok, pr) => (ok, 1L, "O", 1.0, d0, pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4))
      .map { case (ok, lag) =>
        (ok, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", plus(lag)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Profile.kruskalWallis(spark, dir)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(out === Seq((2, 4L, 2.4, 0.7)))
  }

  test("logRank: hand curve — early-churn segment vs censored segment") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lr").toString
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    Seq((1L, "a1", 1, 0.0, "AUTOMOBILE"), (2L, "a2", 1, 0.0, "AUTOMOBILE"),
        (3L, "b1", 1, 0.0, "BUILDING"), (4L, "b2", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // asof = day 200. A1 dur 10 (event), A2 dur 0 (event);
    // B1 dur 200 (censored: last = asof), B2 dur 150 (censored: 150 > 110)
    Seq((1L, 0), (2L, 10), (3L, 0), (4L, 0),
        (5L, 0), (6L, 200), (7L, 0), (8L, 150))
      .zip(Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
      .map { case ((ok, day), ck) => (ok, ck, "O", 1.0, ts(day), "5-LOW") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Temporal.logRank(spark, dir)
      .as[(Long, Double, Double, Double)].collect().toSeq
    // t=0: d1=1, e=2*1/4=0.5, v=0.25; t=10: d1=1, e=1/3, v=4/18
    assert(out === Seq((2L, 0.833333, 0.472222, 2.882356)))
  }

  test("friedmanTest: perfect day-over-day concordance gives W = 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fr").toString
    def t(day: Int, i: Int) = new java.sql.Timestamp(day * 86400000L + i * 1000L)
    // 3 days; type X has 2 events/day, type Y has 1 -> X always outranks Y
    val rows = for {
      day <- 0 to 2
      (tp, n) <- Seq(("view", 2), ("click", 1))
      i <- 1 to n
    } yield ((day * 10 + i).toLong * (if (tp == "view") 1 else 100),
      t(day, i), 1L, tp, 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.friedmanTest(spark, dir)
      .as[(Int, Long, Double, Double)].collect().toSeq
    // R'_click=6, R'_view=12, n=3, k=2: chi2 = 1*18/(60-54) = 3, W = 1
    assert(out === Seq((2, 3L, 3.0, 1.0)))
  }

  test("jonckheereTerpstra: clean ordered shift — JT = n1*n2, z from the hand variance") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jt").toString
    val d0 = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime)
    def plus(days: Int) = new java.sql.Timestamp(d0.getTime + days * 86400000L)
    // URGENT lags {1,2} all below LOW lags {3,4}: every cross pair is
    // concordant -> JT = 4; E = 2, Var = 120/72 -> z = 2/sqrt(5/3)
    Seq((1L, "1-URGENT"), (2L, "1-URGENT"), (3L, "5-LOW"), (4L, "5-LOW"))
      .map { case (ok, pr) => (ok, 1L, "O", 1.0, d0, pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4))
      .map { case (ok, lag) =>
        (ok, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", plus(lag)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Profile.jonckheereTerpstra(spark, dir)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(out === Seq((2, 4L, 4.0, 1.549193)))
  }

  test("wilcoxonSignedRank: hand pairs — zero diffs drop, signed midranks by hand") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wsr").toString
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // half split at day*2 <= mn+mx = 10: days 0..5 early, 6..10 late.
    // diffs (late-early cents): c1 +100, c2 -200, c3 +300, c4 0 (drops)
    // ranks of |d|: 100->1, 200->2, 300->3; W+ = 1+3 = 4; n=3
    // z = (4 - 3)/sqrt(3*4*7/24) = 1/sqrt(3.5)
    val rows = Seq(
      (1L, 1L, 0, 1.0), (2L, 1L, 10, 2.0),
      (3L, 2L, 0, 3.0), (4L, 2L, 10, 1.0),
      (5L, 3L, 0, 1.0), (6L, 3L, 10, 4.0),
      (7L, 4L, 0, 1.0), (8L, 4L, 10, 1.0))
    rows.map { case (ok, ck, day, price) =>
        (ok, ck, "O", price, ts(day), "5-LOW") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Profile.wilcoxonSignedRank(spark, dir)
      .as[(Long, Double, Double)].collect().toSeq
    assert(out === Seq((3L, 4.0, 0.534522)))
  }

  test("tukeyPairs: two clean groups — MSW and studentized gap by hand") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tk").toString
    val d0 = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime)
    def plus(days: Int) = new java.sql.Timestamp(d0.getTime + days * 86400000L)
    Seq((10L, "s1", 1, 0.0), (20L, "s2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L, "O", 1.0, d0, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // nation 1 lags {1,2}, nation 2 lags {3,4}: MSW = (30-29)/2 = .5,
    // gap 2.0, q = 2/sqrt(.5*.5*(.5+.5)) = 4
    Seq((10L, 1), (10L, 2), (20L, 3), (20L, 4))
      .map { case (sk, lag) =>
        (1L, 1L, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", plus(lag)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Profile.tukeyPairs(spark, dir)
      .as[(Int, Int, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq((1, 2, 2L, 2L, 2.0, 4.0)))
  }

  test("rayleighTimeOfDay: aligned phase scores R=1 at its hour; antipodal cancels to 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ray").toString
    def at(h: Int, id: Long) =
      (id, new java.sql.Timestamp(h * 3600000L), 1L, if (id < 3) "aligned" else "split", 1.0, "{}")
    Seq(at(6, 1L), at(6, 2L), at(0, 3L), at(12, 4L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.rayleighTimeOfDay(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("aligned", 2L, 1.0, 2.0, 6.0),
      ("split", 2L, 0.0, 0.0, 0.0)))
  }

  test("brownForsythe: hand medians — tight vs spread group gives F = 2.117647") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bf").toString
    val d0 = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime)
    def plus(days: Int) = new java.sql.Timestamp(d0.getTime + days * 86400000L)
    Seq((10L, "s1", 1, 0.0), (20L, "s2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L, "O", 1.0, d0, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // nation 1 lags {1,2,3} (med 2, |2v-4| = 2,0,2);
    // nation 2 lags {1,5,9} (med 5, |2v-10| = 8,0,8): same mean lag
    // family, different spread -> BF fires on the VARIANCE only
    Seq((10L, 1), (10L, 2), (10L, 3), (20L, 1), (20L, 5), (20L, 9))
      .map { case (sk, lag) =>
        (1L, 1L, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", plus(lag)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Profile.brownForsythe(spark, dir)
      .as[(Int, Long, Double)].collect().toSeq
    assert(out === Seq((2, 6L, 2.117647)))
  }

  test("welchAnova: hand weights — unequal variances, k=2 denominator collapses to 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wa").toString
    val d0 = new java.sql.Timestamp(java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime)
    def plus(days: Int) = new java.sql.Timestamp(d0.getTime + days * 86400000L)
    Seq((10L, "s1", 1, 0.0), (20L, "s2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L, "O", 1.0, d0, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // g1 {1,2,3}: var 1, w 3, m 2; g2 {4,6,8}: var 4, w .75, m 6
    // m_bar 2.8, A = 1.92+7.68 = 9.6, B = .02+.32 = .34
    // k=2 -> F = 9.6, df2 = 3/1.02
    Seq((10L, 1), (10L, 2), (10L, 3), (20L, 4), (20L, 6), (20L, 8))
      .map { case (sk, lag) =>
        (1L, 1L, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", plus(lag)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Profile.welchAnova(spark, dir)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(out === Seq((2, 6L, 9.6, 2.941176)))
  }

  test("growthAccounting: hand ledger — new/retained/resurrected/churned add up") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ga").toString
    def at(day: Int, uid: Long, id: Long) =
      (id, new java.sql.Timestamp(day * 86400000L + 1000L), uid, "view", 1.0, "{}")
    // u1: days 0,1,2 (retained twice); u2: days 0,2 (resurrects day 2,
    // churn attributed to day 1); u3: joins day 1, churns day 2
    Seq(at(0, 1L, 1), at(1, 1L, 2), at(2, 1L, 3),
        at(0, 2L, 4), at(2, 2L, 5),
        at(1, 3L, 6))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.growthAccounting(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 2L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 0L, 1L),   // u3 new, u1 retained; u2 churned
      (2L, 2L, 0L, 1L, 1L, 1L))) // u1 retained, u2 resurrected; u3 churned
    // ledger identity: delta active = new + resurrected - churned
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 - a._2 === b._3 + b._5 - b._6)
    }
  }

  test("woeIv: zero-class buckets yield NULL WOE; balanced bucket scores 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-woe").toString
    val ts0 = new java.sql.Timestamp(0L)
    // segment X: 2 urgent / 0 low (n_neg = 0 -> WOE NULL);
    // segment Y: 0 urgent / 2 low (n_pos = 0 -> WOE NULL);
    // segment Z: 1 / 1 with tot_pos = tot_neg = 3 -> WOE exactly 0
    Seq((1L, "c1", 1, 0.0, "X"), (2L, "c2", 1, 0.0, "Y"),
        (3L, "c3", 1, 0.0, "Z"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, "1-URGENT"), (2L, 1L, "1-URGENT"),
        (3L, 2L, "5-LOW"), (4L, 2L, "5-LOW"),
        (5L, 3L, "1-URGENT"), (6L, 3L, "5-LOW"))
      .map { case (ok, ck, pri) => (ok, ck, "O", 1.0, ts0, pri) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val seg = graft.operators.Profile.woeIv(spark, dir)
      .filter($"feature" === "mktsegment")
      .as[(String, String, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(seg === Seq(
      ("mktsegment", "X", 2L, 0L, None, Some(0.0)),
      ("mktsegment", "Y", 0L, 2L, None, Some(0.0)),
      ("mktsegment", "Z", 1L, 1L, Some(0.0), Some(0.0))))
  }

  test("sessionConcurrency: hand sessions — overlap counted per hour, start/end conserve") {
    // u1: one session inside hour 0 (30-min gap boundary is INCLUSIVE)
    // u2: one session entirely in hour 2
    // u3: one session spanning hours 0 and 1
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "view"), (2L, 1800000L, 1L, "click"),
      (3L, 7210000L, 2L, "view"),
      (4L, 3500000L, 3L, "view"), (5L, 5000000L, 3L, "click")))
    val out = graft.operators.Events.sessionConcurrency(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 2L, 1L),          // u1 + u3 active; u1 ends here
      (3600000L, 1L, 0L, 1L),    // u3 carries over and ends
      (7200000L, 1L, 1L, 1L)))   // u2 alone
    // conservation: every session starts once and ends once
    assert(out.map(_._3).sum === out.map(_._4).sum)
    assert(out.map(_._3).sum === 3L)
  }

  test("burstCompaction: island chaining absorbs beyond the head gap; boundary is inclusive; types separate") {
    // user 1 / view: 0s, 30s, 90s — 90s is 60s from its PREDECESSOR
    // (inclusive boundary: NOT a new burst) though 90s from the kept
    // head; 151s is 61s out -> new burst. user 1 / click: its own
    // stream.
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "view"), (2L, 30000L, 1L, "view"),
      (3L, 90000L, 1L, "view"), (4L, 151000L, 1L, "view"),
      (5L, 10000L, 1L, "click")))
    val out = graft.operators.Events.burstCompaction(spark, dir)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "click", 5L, 10000L, 10000L, 1L, 0L),
      (1L, "view", 1L, 0L, 90000L, 3L, 2L),
      (1L, "view", 4L, 151000L, 151000L, 1L, 0L)))
  }

  test("syntheticControl: one best donor, constant treated series, gap identity") {
    val out = graft.operators.Events
      .syntheticControl(spark, "/root/testdata/sf0.001")
      .as[(String, String, Double, Int, Boolean, Long, Long, Long)]
      .collect().toSeq
    assert(out.nonEmpty)
    // ranks are 1..n with exactly one best = the smallest pre-SSE
    assert(out.map(_._4) === (1 to out.size))
    assert(out.count(_._5) === 1)
    assert(out.find(_._5).get._3 === out.map(_._3).min)
    // the treated side is one series: constant across donor rows
    assert(out.map(_._1).distinct.size === 1)
    assert(out.map(_._6).distinct.size === 1)
    // the treated unit is never its own donor; gap identity holds
    assert(!out.exists(r => r._2 == r._1))
    assert(out.forall(r => r._8 === r._6 - r._7))
  }

  test("qqTable: single-source corpus matches the global curve; a shifted source shifts every quantile") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qq").toString
    val rows = (1 to 19).map(i => (i.toLong, "t", "en", "A", i.toLong)) ++
      (1 to 19).map(i => (100L + i, "t", "en", "B", 100L + i))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Profile.qqTable(spark, dir)
      .as[(String, Double, Long, Long, Long, Long)].collect().toSeq
    val a = out.filter(_._1 == "A").sortBy(_._2)
    val b = out.filter(_._1 == "B").sortBy(_._2)
    assert(a.size === 19 && b.size === 19)
    // n=19 per source: rank p*(20)/20 = p, so q_source(A) = pnum
    assert(a.map(_._4) === (1L to 19L))
    // B is A + 100 at every percentile
    assert(b.map(_._4) === a.map(_._4 + 100L))
    // quantiles are monotone in p on both sides
    assert(a.map(_._5) === a.map(_._5).sorted)
    // the global curve is shared: same q_global at each pct
    assert(a.map(_._5) === b.map(_._5))
    // gap = q_source - q_global by definition
    assert(out.forall(r => r._6 === r._4 - r._5))
  }

  test("residualHeatmap: an independent grid has all-zero residuals; margins reconcile") {
    // 2 weekdays x 2 priorities in exact proportion: obs == expected
    // everywhere, so every standardized residual is 0 and nothing is
    // notable. 1970-01-01 = Thursday, +1 day = Friday.
    val dir = java.nio.file.Files.createTempDirectory("graft-rh").toString
    def day(d: Int) = new java.sql.Timestamp(d * 86400000L)
    val rows =
      (Seq.fill(2)((0, "1-URGENT")) ++ Seq.fill(4)((0, "5-LOW")) ++
        Seq.fill(1)((1, "1-URGENT")) ++ Seq.fill(2)((1, "5-LOW")))
    rows.zipWithIndex.map { case ((d, pri), i) =>
      (i.toLong, 1L, "O", 1.0, day(d), pri) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Profile.residualHeatmap(spark, dir)
      .as[(Int, String, Long, Double, Double, Boolean)].collect().toSeq
    assert(out.map(_._3).sum === 9L)            // cells reconcile to N
    assert(out.forall(_._5 === 0.0))            // independent ⇒ zero residuals
    assert(out.forall(!_._6))                   // nothing notable
    assert(out.map(r => (r._1, r._2)) === out.map(r => (r._1, r._2)).sorted)
  }
}
