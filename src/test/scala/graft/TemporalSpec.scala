package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Temporal

/** Property tests for the temporal joins: random event sets (clustered
  * around bin boundaries to stress the ±1-bin probe and exact-tie
  * edges) against brute-force in-Scala references. The oracle queries
  * (q45/q46) pin one dataset; these pin the algebra.
  */
class TemporalSpec extends AnyFunSuite {

  test("supplierLeadTime: day-floor-then-subtract keeps negative lags exact") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lead").toString
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    Seq((1L, 1L, day(10)))
      .map { case (ok, ck, d) => (ok, ck, "O", 1.0, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // lags: +2, +5, -3 days (one early ship)
    Seq((1L, 100L, 7L, 1, day(12)), (1L, 101L, 7L, 2, day(15)),
        (1L, 102L, 7L, 3, day(7)))
      .map { case (ok, pk, sk, ln, sd) => (ok, pk, sk, ln, 1.0, 1.0, 0.0,
        0.0, "N", "O", sd) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Temporal.supplierLeadTime(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // sorted lags -3, 2, 5: median rn=(3+1) div 2=2 -> 2; p90 rn=3 -> 5
    assert(got === Seq((7L, 3L, -3L, 2L, 5L, 5L, 1L)))
  }

  test("orderAging: buckets count back from the corpus max date, not now()") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-aging").toString
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    // as-of = day 100; ages 0, 29 (bucket 0), 30 (bucket 1), 95 (bucket 3)
    Seq((1L, 1L, "O", 10.0, day(100)), (2L, 1L, "O", 20.0, day(71)),
        (3L, 2L, "F", 40.0, day(70)), (4L, 2L, "F", 80.0, day(5)))
      .map { case (ok, ck, st, tp, d) => (ok, ck, st, tp, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Temporal.orderAging(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("F", 1L, 1L, 40.0), ("F", 3L, 1L, 80.0),
      ("O", 0L, 2L, 30.0)))
  }
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val W = 1800000L

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  /** rows: (event_id, ts_ms, user_id, event_type) → events dir. */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-temporal").toString
    rows.map { case (id, ms, u, t) =>
      (id, new java.sql.Timestamp(ms), u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // timestamps piled onto bin-boundary multiples of W (±2ms) plus
  // uniform filler — the boundary cases are where binning bugs live
  private val rowsGen: Gen[Seq[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(5, 40)
    raw <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.oneOf("click", "purchase", "signup")
      base <- Gen.choose(1L, 4L)
      ms <- Gen.oneOf(
        Gen.choose(base * W - 2, base * W + 2),
        Gen.choose(0L, 5L * W))
    } yield (u, t, ms))
  } yield raw.zipWithIndex.map { case ((u, t, ms), i) => (i.toLong, ms, u, t) }

  test("property: binned range join equals the brute-force θ-count") {
    checkProp(Prop.forAll(rowsGen) { rows =>
      val dir = writeEvents(rows)
      val gotRows = Temporal.clicksBeforePurchase(spark, dir, W)
        .select($"purchase_id", $"n_clicks_before").as[(Long, Long)]
        .collect()
      val got = gotRows.toMap
      val clicks = rows.filter(_._4 == "click")
      val expected = rows.filter(_._4 == "purchase").map { case (id, ms, u, _) =>
        id -> clicks.count(c => c._3 == u && c._2 >= ms - W && c._2 < ms).toLong
      }.toMap
      // row-count check too: toMap would mask a duplicate-row
      // regression (e.g. one row per probed bin)
      gotRows.length == expected.size && got == expected
    })
  }

  test("property: as-of join equals the brute-force most-recent-prior scan") {
    checkProp(Prop.forAll(rowsGen) { rows =>
      val dir = writeEvents(rows)
      val gotRows = Temporal.lastSignupBeforePurchase(spark, dir)
        .select($"purchase_id", $"last_signup_ms").as[(Long, Option[Long])]
        .collect()
      val got = gotRows.toMap
      val signups = rows.filter(_._4 == "signup")
      val expected = rows.filter(_._4 == "purchase").map { case (id, ms, u, _) =>
        // round-11 contract: STRICTLY earlier in time (the native
        // as-of probes at p_ms - 1; same-ms signups never qualify)
        val prior = signups.filter(s => s._3 == u && s._2 < ms)
        id -> prior.sortBy(s => (s._2, s._1)).lastOption.map(_._2)
      }.toMap
      gotRows.length == expected.size && got == expected
    })
  }

  private def ordersDir(rows: Seq[(Long, Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-km").toString
    rows.map { case (ok, ck, d) =>
      (ok, ck, "O", 1.0, new java.sql.Timestamp(d * 86400000L), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("kaplanMeier: censoring reduces risk set without a survival step") {
    // A: days 0,10 (dur 10, last 10 -> event); B: 0,200 (dur 200,
    // last 200 = as-of -> censored); C: 50 (dur 0, event);
    // D: 0,100 (dur 100, last 100 <= 110 -> event)
    val dir = ordersDir(Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 2L, 0L),
      (4L, 2L, 200L), (5L, 3L, 50L), (6L, 4L, 0L), (7L, 4L, 100L)))
    val got = Temporal.kaplanMeier(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ===
      Seq((0L, 4L, 1L, 0L), (10L, 3L, 1L, 0L),
        (100L, 2L, 1L, 0L), (200L, 1L, 0L, 1L)))
    val surv = got.map(_._5)
    // KM: 3/4, then x2/3, then x1/2; the censored tail holds flat
    assert(math.abs(surv(0) - 0.75) < 1e-5)
    assert(math.abs(surv(1) - 0.5) < 1e-5)
    assert(math.abs(surv(2) - 0.25) < 1e-5)
    assert(surv(3) === surv(2))
  }

  test("kaplanMeier: terminal everyone-dies step drives survival to exact zero") {
    // c1: 150..300 (dur 150, last 300 = as-of -> censored);
    // c2: 0..190 (dur 190, last 190 <= 210 -> event, and it is the
    // last subject at risk -> d = n -> S = 0 via the zero flag, not
    // log10(0)
    val dir = ordersDir(Seq((1L, 1L, 150L), (2L, 1L, 300L),
      (3L, 2L, 0L), (4L, 2L, 190L)))
    val got = Temporal.kaplanMeier(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((150L, 2L, 0L, 1L, 1.0), (190L, 1L, 1L, 0L, 0.0)))
  }

  test("weeklyDemandFeatures: dense spine keeps zero-sale weeks in the lags") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wk").toString
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    Seq((10L, "X"), (20L, "Y"))
      .map { case (pk, b) => (pk, "part", b, "t", 1, 1.0) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // X: week 0 qty 5, week 2 qty 3 (week 1 is a zero-sale gap);
    // Y: week 1 qty 2
    Seq((1L, 10L, 5.0, day(0)), (2L, 10L, 3.0, day(14)),
        (3L, 20L, 2.0, day(7)))
      .map { case (ok, pk, q, sd) => (ok, pk, 1L, 1, q, 1.0, 0.0, 0.0,
        "N", "O", sd) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Temporal.weeklyDemandFeatures(spark, dir)
      .as[(String, Long, Double, Option[Double], Option[Double], Double)]
      .collect().toSeq
    assert(got === Seq(
      ("X", 0L, 5.0, None, None, 5.0),
      ("X", 1L, 0.0, Some(5.0), None, 2.5),
      ("X", 2L, 3.0, Some(0.0), None, 2.666667),
      ("Y", 0L, 0.0, None, None, 0.0),
      ("Y", 1L, 2.0, Some(0.0), None, 1.0),
      ("Y", 2L, 0.0, Some(2.0), None, 0.666667)))
  }

  test("pitEnrichment: purchase resolves to the state being LEFT; first event NULL") {
    // user 1: signup@1000 → click@2000 → purchase@3000. The purchase
    // instant closes the click interval [2000, 3000], so the prior
    // state is click (version 2). user 2's purchase is their first
    // event: no prior interval → NULL enrichment survives the left join.
    val dir = writeEvents(Seq(
      (1L, 1000L, 1L, "signup"), (2L, 2000L, 1L, "click"),
      (3L, 3000L, 1L, "purchase"),
      (4L, 5000L, 2L, "purchase")))
    val out = graft.operators.Temporal.pitEnrichment(spark, dir)
      .as[(Long, Long, Long, Option[String], Option[Int], Option[Long])]
      .collect().toSeq
    assert(out === Seq(
      (3L, 1L, 3000L, Some("click"), Some(2), Some(2000L)),
      (4L, 2L, 5000L, None, None, None)))
  }

  test("gapFillLocf: gaps densified, value carried, gap_age counts staleness") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-locf").toString
    def ts(d: Long) = new java.sql.Timestamp(d * 86400000L)
    // user 1: days 10 (two events summing 2.5) and 13 — days 11/12 are
    // gaps carrying 2.5 with rising staleness; user 2: single day 5
    // (span of one, no fill). User spans must NOT cross-pollinate:
    // user 2 gets no rows for 10..13.
    Seq((1L, ts(10), 1L, "click", 1.0, "{}"),
        (2L, ts(10), 1L, "click", 1.5, "{}"),
        (3L, ts(13), 1L, "purchase", 4.0, "{}"),
        (4L, ts(5), 2L, "click", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.Temporal.gapFillLocf(spark, dir)
      .as[(Long, Long, Double, Boolean, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 10L, 2.5, true, 0L), (1L, 11L, 2.5, false, 1L),
      (1L, 12L, 2.5, false, 2L), (1L, 13L, 4.0, true, 0L),
      (2L, 5L, 7.0, true, 0L)))
  }

  test("orderDayStreaks: islands split on gaps, same-day orders dedup, ties pick latest start") {
    // c1: days 0,1,2 then 5,6 (two same-day orders on day 1);
    // c2: a single day; c3: two length-2 streaks (tie -> latest start)
    val dir = ordersDir(Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 2L),
      (5L, 1L, 5L), (6L, 1L, 6L),
      (7L, 2L, 10L),
      (8L, 3L, 20L), (9L, 3L, 21L), (10L, 3L, 30L), (11L, 3L, 31L)))
    val out = graft.operators.Temporal.orderDayStreaks(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 2L, 5L, 0L),   // longest 3 (days 0-2), 2 streaks
      (3L, 2L, 2L, 4L, 30L),  // tie of two 2-day streaks: latest start
      (2L, 1L, 1L, 1L, 10L)))
  }

  test("backlogCurve: conservation — backlog = cum opens - cum completions, ends at never-shipped") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val out = graft.operators.Temporal.backlogCurve(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // running identity holds row by row
    var opens = 0L; var dones = 0L
    out.foreach { r =>
      opens += r._2; dones += r._3
      assert(r._4 === opens - dones, s"day ${r._1}")
    }
    // the curve's terminal value = orders that never fully ship
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey").distinct()
    val shipped = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_orderkey").distinct()
    val neverShipped = orders.join(shipped,
      orders("o_orderkey") === shipped("l_orderkey"), "left_anti").count()
    assert(out.last._4 === neverShipped)
    // dense spine: consecutive days, no gaps
    assert(out.map(_._1) === (out.head._1 to out.last._1))
  }

  test("nelsonAalen: shares q151's risk table; FH dominates KM; hazard monotone") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val na = graft.operators.Temporal.nelsonAalen(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    val km = graft.operators.Temporal.kaplanMeier(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // identical step/risk tables — the two curves can't drift on inputs
    assert(na.map(r => (r._1, r._2, r._3, r._4)) ===
      km.map(r => (r._1, r._2, r._3, r._4)))
    // cumulative hazard is non-decreasing; survivals in [0,1]
    val ch = na.map(_._5)
    assert(ch === ch.sorted)
    na.foreach(r => assert(r._6 >= 0.0 && r._6 <= 1.0))
    // Fleming-Harrington dominates Kaplan-Meier pointwise (standard
    // inequality: e^(-d/n) >= 1 - d/n), up to the shared 6dp rounding
    na.zip(km).foreach { case (n, k) =>
      assert(n._6 >= k._5 - 2e-6, s"t=${n._1}: FH ${n._6} < KM ${k._5}")
    }
  }

  test("caliperMatching: nearest control wins, ties go backward, caliper drops") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-psm").toString
    // nation 0 (all balances in dollars -> cents are x100):
    //   treated t1 s=100_00: controls at 90_00 (c11) and 105_00 (c12)
    //     -> forward wins (500 < 1000)
    //   treated t2 s=200_00: controls equidistant 195_00/205_00
    //     -> tie goes BACKWARD (c13 at 195_00)
    //   treated t3 s=900_00: nearest control 105_00, outside caliper
    //     -> unmatched
    // nation 1: one treated, no controls -> unmatched
    val cust = Seq(
      (1L, 0, 100.0, "BUILDING"), (2L, 0, 200.0, "BUILDING"),
      (3L, 0, 900.0, "BUILDING"),
      (11L, 0, 90.0, "AUTOMOBILE"), (12L, 0, 105.0, "AUTOMOBILE"),
      (13L, 0, 195.0, "AUTOMOBILE"), (14L, 0, 205.0, "AUTOMOBILE"),
      (21L, 1, 500.0, "BUILDING"))
    cust.map { case (k, n, bal, seg) => (k, s"c$k", n, bal, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // outcomes: each matched customer gets one order of a known price
    Seq((1L, 1L, 70.0), (2L, 2L, 50.0), (3L, 3L, 10.0),
      (4L, 12L, 40.0), (5L, 13L, 30.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Temporal.caliperMatching(spark, dir)
      .as[(Int, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    // nation 0: t1->c12 (outcome 40), t2->c13 (outcome 30), t3 unmatched
    //   mean_t = (70+50)/2 = 60, mean_c = (40+30)/2 = 35, att = 25
    assert(out === Seq(
      (0, 3L, 2L, Some(60.0), Some(35.0), Some(25.0)),
      (1, 1L, 0L, None, None, None)))
  }
}
