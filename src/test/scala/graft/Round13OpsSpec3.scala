package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Events, Layout, Profile, Temporal}
import graft.sources.Multimodal

/** Round-13 wave part 3 — semantic recoveries and plan pins:
  * parameter RECOVERY on synthetic truths (Bass), closed-form
  * identities (Erlang C at n = 1 is M/M/1's ρ), hand-computed
  * capability indices and newsvendor picks, Greenwood band
  * invariants, and physical-plan shape pins for the explode-free
  * rendezvous audit and the shuffle-free container walkers.
  */
class Round13OpsSpec3 extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("q546 Bass: recovers m/p/q from a synthetic diffusion with known truth") {
    val dir = tmpDir("bass")
    // integer-floored Bass recurrence, m=1000 p=0.03 q=0.38
    var c = 0.0
    val ns = (0 until 60).map { _ =>
      val n = math.floor((0.03 + 0.38 * c / 1000.0) * (1000.0 - c))
      c += n
      n.toInt
    }
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    var uid = 0L
    val rows = ns.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map { _ =>
        uid += 1
        (uid, ts(day), uid, "purchase", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.bassDiffusion(spark, dir).collect()(0)
    assert(r.getAs[Long]("total_adopters") === 998L)
    // fitted on the floored sequence: m 998.84, p 0.02989, q 0.37794
    assert(math.abs(r.getAs[Double]("m_hat") - 1000.0) < 20.0)
    assert(math.abs(r.getAs[Double]("p_hat") - 0.03) < 0.005)
    assert(math.abs(r.getAs[Double]("q_hat") - 0.38) < 0.02)
    val peak = r.getAs[Double]("peak_t")
    assert(peak > 5.0 && peak < 8.0)
  }

  test("q545 newsvendor: zero weeks enter analytically, picks by hand") {
    val dir = tmpDir("nv")
    def d(week: Long) = new java.sql.Date(week * 7 * 86400000L)
    val rows =
      // part 1: demand every week 0..9, sizes 1..10 -> W=10, r=9, pick 9.0
      (0L until 10L).map(w => (1L, d(w), (w + 1).toDouble)) ++
      // part 2: weeks {0,5,9} sizes {4,2,6} -> 7 zero weeks, pick
      // rank 9-7=2 of sorted {2,4,6} -> 4.0
      Seq((2L, d(0), 4.0), (2L, d(5), 2.0), (2L, d(9), 6.0))
    rows.toDF("l_partkey", "l_shipdate", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Temporal.newsvendorQuantity(spark, dir).collect()
      .map(r => r.getAs[Long]("part") -> r).toMap
    assert(out(1L).getAs[Long]("w_span") === 10L)
    assert(out(1L).getAs[Double]("q_star") === 9.0)
    assert(out(2L).getAs[Long]("n_wk") === 3L)
    assert(out(2L).getAs[Double]("q_star") === 4.0)
  }

  test("q545: a part whose fractile falls inside the zero mass orders 0") {
    val dir = tmpDir("nv0")
    def d(week: Long) = new java.sql.Date(week * 7 * 86400000L)
    // span W=40 via part 1; part 2 has 3 demand weeks, 37 zeros:
    // r = (40*9+9) div 10 = 36 <= 37 -> q* = 0
    val rows =
      (0L until 40L).map(w => (1L, d(w), 1.0)) ++
      Seq((2L, d(0), 4.0), (2L, d(5), 2.0), (2L, d(9), 6.0))
    rows.toDF("l_partkey", "l_shipdate", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Temporal.newsvendorQuantity(spark, dir).collect()
      .map(r => r.getAs[Long]("part") -> r).toMap
    assert(out(2L).getAs[Double]("q_star") === 0.0)
  }

  test("q547 Cpk: hand-computed indices on a single nation") {
    val dir = tmpDir("cpk")
    def day(n: Int) = new java.sql.Date(n * 86400000L)
    Seq((1L, 0L, day(10)), (2L, 0L, day(20)), (3L, 0L, day(30)))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, day(0)), (2L, day(0)), (3L, day(0)))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((0L, 7L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val r = Profile.processCapability(spark, dir).collect()(0)
    // lags {10,20,30}: mu=20, sd=10, Cp=60/60=1, Cpk=min(40,20)/30
    assert(r.getAs[Double]("mean_lag") === 20.0)
    assert(r.getAs[Double]("sd_lag") === 10.0)
    assert(r.getAs[Double]("cp") === 1.0)
    assert(math.abs(r.getAs[Double]("cpk") - 20.0 / 30.0) < 1e-6)
    assert(r.getAs[Double]("in_spec_share") === 1.0)
  }

  test("q548 Erlang C: n=1 equals M/M/1's rho; P(wait) decreases in agents") {
    val out = Events.erlangStaffing(spark, "/root/testdata/sf0.001").collect()
    val byN = out.map(r => r.getAs[Int]("n_agents") -> r).toMap
    val rho = byN(1).getAs[Double]("offered_load")
    assert(rho > 0 && rho < 1, s"fixture assumes stable M/M/1, got $rho")
    // Erlang C with a single agent reduces to P(wait) = rho exactly
    assert(math.abs(byN(1).getAs[Double]("p_wait") - rho) < 1e-6)
    val waits = out.sortBy(_.getAs[Int]("n_agents"))
      .map(_.getAs[Double]("p_wait"))
    waits.toSeq.sliding(2).foreach { w => assert(w(1) <= w(0)) }
  }

  test("q544 Greenwood: band brackets the curve and se grows with attrition") {
    val out = Temporal.greenwoodBand(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val s = r.getAs[Double]("survival")
      if (!r.isNullAt(r.fieldIndex("se_greenwood"))) {
        assert(r.getAs[Double]("ci_lo") <= s + 1e-9)
        assert(r.getAs[Double]("ci_hi") >= s - 1e-9)
        assert(r.getAs[Double]("ci_lo") >= 0.0)
        assert(r.getAs[Double]("ci_hi") <= 1.0)
      }
    }
    // survival is non-increasing along the step table
    val surv = out.map(_.getAs[Double]("survival"))
    surv.toSeq.sliding(2).foreach { w => assert(w(1) <= w(0) + 1e-9) }
  }

  // ---------------- plan pins ----------------

  test("q539 plan: the per-doc argmax is explode-free (no Generate node)") {
    val plan = Layout.rendezvousAudit(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "rendezvous audit must not explode")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q536/q537/q538 plans: container walks shuffle only for the final sort") {
    Seq(
      Multimodal.flacMeta(spark, "/root/testdata/sf0.001"),
      Multimodal.oggMeta(spark, "/root/testdata/sf0.001"),
      Multimodal.ebmlMeta(spark, "/root/testdata/sf0.001")).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      // one range exchange for the ORDER BY; no aggregate/join shuffles
      assert(exchanges <= 1, s"container walk over-shuffles:\n$plan")
    }
  }
}
