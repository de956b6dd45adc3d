package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Events, Profile, Relational}

/** Round-11 third-wave operators: the degenerate corners the sf0.01
  * oracle grade doesn't exercise — zero-variance EB priors, the CUSUM
  * persistent-shift contract vs single-day series, IVM
  * retract-to-empty, Hamilton quota conservation, W₁'s zero at
  * identity, and τ-b at perfect concordance.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  val sf0001 = "/root/testdata/sf0.001"

  private def liRow(okey: Long, flag: String, status: String,
                    qty: Double, price: Double) =
    (okey, 1L, 1L, 1, qty, price, 0.0, 0.0, flag, status,
      new java.sql.Timestamp(0L))

  private def writeLi(dir: String,
                      rows: Seq[(Long, Long, Long, Int, Double, Double,
                        Double, Double, String, String,
                        java.sql.Timestamp)]): Unit =
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  private def writeEvents(dir: String,
                          rows: Seq[(Long, java.sql.Timestamp, Long,
                            String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def ts(d: Long) = new java.sql.Timestamp(d * 86400000L)

  test("ebShrinkage: zero cross-supplier variance -> NULL shrunk rates, raw rates intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-eb0").toString
    // two suppliers, identical 50% return rates: m(1-m)/v is undefined
    val rows = Seq(
      (1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "R", "O", ts(0)),
      (2L, 1L, 1L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(0)),
      (3L, 1L, 2L, 1, 1.0, 1.0, 0.0, 0.0, "R", "O", ts(0)),
      (4L, 1L, 2L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(0)))
    writeLi(dir, rows)
    val out = Profile.ebShrinkage(spark, dir)
      .select($"s_suppkey", $"raw_rate", $"shrunk_rate")
      .as[(Long, Double, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(out === Seq((1L, 0.5, None), (2L, 0.5, None)))
  }

  test("ebShrinkage: every shrunk rate lies between the raw rate and the prior mean") {
    val out = Profile.ebShrinkage(spark, sf0001).localCheckpoint()
    val rows = out.select($"raw_rate", $"shrunk_rate")
      .as[(Double, Option[Double])].collect().toSeq
      .collect { case (r, Some(s)) => (r, s) }
    assume(rows.nonEmpty)
    // prior mean = mean of the raw rates (the MoM m, up to 6dp rounds)
    val m = rows.map(_._1).sum / rows.length
    val eps = 1e-5
    rows.foreach { case (raw, shrunk) =>
      assert(shrunk >= math.min(raw, m) - eps &&
        shrunk <= math.max(raw, m) + eps,
        s"shrunk $shrunk escapes [raw $raw, prior $m]")
    }
  }

  test("cusumChart: single-day series has zero accumulators; a persistent shift alerts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cus1").toString
    // type "one": a single day (mu = v, everything 0).
    // type "shift": 10 for 15 days then 20 for 5 days — no day is a
    // spike, but the CUSUM accumulates the level change and crosses h
    // (mu = 12.5e6, d = 3.75e6 -> post-shift increment 5.625e6/day
    //  vs h = 18.75e6: crosses on day 4 of the shift)
    val one = Seq((1L, ts(0), 1L, "one", 5.0, "{}"))
    val shift = (0 until 20).map { d =>
      (100L + d, ts(d), 1L, "shift", if (d < 15) 10.0 else 20.0, "{}")
    }
    writeEvents(dir, one ++ shift)
    val out = Events.cusumChart(spark, dir).localCheckpoint()
    val oneRow = out.filter($"event_type" === "one")
      .select($"s_hi", $"s_lo", $"is_alert")
      .as[(Double, Double, Int)].collect().toSeq
    assert(oneRow === Seq((0.0, 0.0, 0)))
    val alerts = out.filter($"event_type" === "shift" && $"is_alert" === 1)
      .count()
    assert(alerts > 0, "persistent +40% shift must trip the CUSUM")
    // and s_hi is nondecreasing across the post-shift days
    val shiftHi = out.filter($"event_type" === "shift")
      .orderBy($"day").select($"s_hi").as[Double].collect().toSeq
    assert(shiftHi.drop(15).sliding(2).forall(p => p(1) >= p(0)))
  }

  test("ivmPricingSummary: merge == rebuild, and a retracted-to-empty group drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivm").toString
    // ("A","A"): okeys 1,2,3 base-and-kept, 10 inserted.
    // ("X","Y"): okey 7 only — base, then deleted (7 % 7 = 0) -> gone.
    val rows = Seq(
      liRow(1L, "A", "A", 1.0, 10.0), liRow(2L, "A", "A", 2.0, 20.0),
      liRow(3L, "A", "A", 3.0, 30.0), liRow(10L, "A", "A", 4.0, 40.0),
      liRow(7L, "X", "Y", 9.0, 99.0))
    writeLi(dir, rows)
    val out = Relational.ivmPricingSummary(spark, dir)
      .select($"l_returnflag", $"l_linestatus", $"sum_qty", $"count_order")
      .as[(String, String, Double, Long)].collect().toSeq
    assert(out === Seq(("A", "A", 10.0, 4L)))
  }

  test("hamiltonSample: quotas sum exactly to the budget and picks respect them") {
    val budget = 10
    val out = Curation.hamiltonSample(spark, sf0001, budget)
      .localCheckpoint()
    val quotas = out.select($"source", $"quota").distinct()
      .as[(String, Int)].collect().toMap
    assert(quotas.values.sum === budget)
    val picks = out.groupBy($"source").agg(count(lit(1)).as("n"),
        max($"pick").as("mx"))
      .as[(String, Long, Int)].collect().toSeq
    picks.foreach { case (src, n, mx) =>
      assert(n <= quotas(src) && mx <= quotas(src),
        s"$src picked $n (max rank $mx) over quota ${quotas(src)}")
    }
    // rerun-identical (deterministic hash order)
    val again = Curation.hamiltonSample(spark, sf0001, budget)
      .select($"source", $"pick", $"doc_id")
      .as[(String, Int, Long)].collect().toSeq
    val first = out.select($"source", $"pick", $"doc_id")
      .as[(String, Int, Long)].collect().toSeq
    assert(again === first)
  }

  test("wassersteinDrift: a single-source corpus is at zero distance from itself") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w1").toString
    Seq((1L, "aaa", "en", "only", 3L), (2L, "bbbb", "en", "only", 4L),
        (3L, "ccccc", "en", "only", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Profile.wassersteinDrift(spark, dir)
      .select($"source", $"w1").as[(String, Double)].collect().toSeq
    assert(out === Seq(("only", 0.0)))
  }

  test("kendallTauMatrix: perfectly concordant daily series score tau_b = 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tau").toString
    val rows = (0 until 8).flatMap { d =>
      Seq((d * 2L, ts(d), 1L, "a", 1.0 + d, "{}"),
        (d * 2L + 1, ts(d), 1L, "b", 10.0 + 2 * d, "{}"))
    }
    writeEvents(dir, rows)
    val out = Events.kendallTauMatrix(spark, dir)
      .select($"type_a", $"type_b", $"n_days", $"tau_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(("a", "b", 8L, 1.0)))
  }

  test("medianCiOrderStat: ranks bracket the median and values are ordered") {
    val out = Events.medianCiOrderStat(spark, sf0001)
      .as[(String, Long, Double, Long, Long, Double, Double)]
      .collect().toSeq
    assume(out.nonEmpty)
    out.foreach { case (t, n, med, lo, hi, cLo, cHi) =>
      assert(lo >= 1 && hi <= n && lo <= hi, s"$t ranks out of range")
      assert(cLo <= med && med <= cHi, s"$t CI fails to bracket median")
    }
  }
}
