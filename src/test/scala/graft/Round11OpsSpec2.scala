package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, CurationPipeline, Events, Pii,
  Relational}

/** Round-11 fourth-wave operators: invariants the sf0.01 oracle grade
  * implies but does not state — tail-estimator degeneracy, reservoir
  * optimality, bootstrap CI ordering, DP top-k exhaustiveness, the
  * ES ≤ VaR sandwich, ledger/pipeline reconciliation, and the
  * disparity/calibration identity.
  */
class Round11OpsSpec2 extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  val sf0001 = "/root/testdata/sf0.001"

  private def ts(d: Long) = new java.sql.Timestamp(d * 86400000L)

  test("hillTailIndex: a constant series has zero log-excess and NULL alpha") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hill").toString
    (0 until 30).map(d => (d.toLong, ts(d), 1L, "flat", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.hillTailIndex(spark, dir)
      .select($"event_type", $"xi_hat", $"alpha_hat")
      .as[(String, Option[Double], Option[Double])].collect().toSeq
    assert(out === Seq(("flat", Some(0.0), None)))
  }

  test("weightedReservoir: picks are exactly the k smallest race keys, rerun-identical") {
    val k = 5
    val out = Curation.weightedReservoir(spark, sf0001, k).localCheckpoint()
    val rows = out.select($"source", $"pick", $"doc_id", $"ekey")
      .as[(String, Int, Long, Double)].collect().toSeq
    // per source: picks are 1..min(k, n) and keys are nondecreasing
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) === (1 to sorted.length))
      assert(sorted.map(_._4).sliding(2).forall(p =>
        p.length < 2 || p(1) >= p(0)), s"$src keys not sorted")
    }
    val again = Curation.weightedReservoir(spark, sf0001, k)
      .select($"source", $"pick", $"doc_id", $"ekey")
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(again.toSet === rows.toSet)
  }

  test("poissonBootstrap: CI brackets are ordered and reps complete") {
    val out = Events.poissonBootstrap(spark, sf0001)
      .as[(String, Long, Double, Long, Double, Double, Double)]
      .collect().toSeq
    assume(out.nonEmpty)
    out.foreach { case (t, _, _, nReps, sd, lo, hi) =>
      assert(nReps === 50L, s"$t reps")
      assert(sd >= 0.0 && lo <= hi, s"$t CI disordered ($lo, $hi)")
    }
  }

  test("dpTopK: k distinct types released in round order, all from the true inventory") {
    val out = Pii.dpTopK(spark, sf0001)
      .as[(Int, String, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(1, 2, 3))
    assert(out.map(_._2).distinct.length === 3)
    val types = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type").distinct().as[String].collect().toSet
    out.foreach { case (_, t, n) =>
      assert(types.contains(t) && n > 0)
    }
  }

  test("expectedShortfall: the ES/VaR sandwich holds on both tails") {
    val out = Events.expectedShortfall(spark, sf0001)
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assume(out.nonEmpty)
    out.foreach { case (t, _, _, varLo, esLo, varHi, esHi) =>
      // lower tail: mean of the k worst days <= its max (the VaR);
      // upper tail: mean of the k best days >= its min (the VaR)
      assert(esLo <= varLo + 1e-6, s"$t lower sandwich")
      assert(esHi >= varHi - 1e-6, s"$t upper sandwich")
      assert(varLo <= varHi + 1e-6, s"$t tails crossed")
    }
  }

  test("pipelineLedger: reconciles with q63's output; count-preserving stages drop zero") {
    val ledger = CurationPipeline.pipelineLedger(spark, sf0001)
      .select($"stage", $"rows_out", $"dropped")
      .as[(String, Long, Option[Long])].collect().toSeq.toMap2
    val finalRows = CurationPipeline.curateCorpus(spark, sf0001).count()
    assert(ledger("7_packed")._1 === finalRows)
    // redaction and packing never drop rows
    assert(ledger("5_redacted")._2 === Some(0L))
    assert(ledger("7_packed")._2 === Some(0L))
    // monotone non-increasing through the gates
    val order = Seq("0_input", "1_dedup", "2_repetition", "3_quality",
      "4_decontaminated", "5_redacted", "6_capped", "7_packed")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(ledger(b)._1 <= ledger(a)._1, s"$b grew over $a")
    }
  }

  test("gateDisparity: disparity is exactly retention minus target") {
    val out = Curation.gateDisparity(spark, sf0001)
      .select($"lang", $"global_doc_retention", $"disparity_vs_target")
      .as[(String, Double, Double)].collect().toSeq
    assume(out.nonEmpty)
    out.foreach { case (lang, ret, disp) =>
      assert(math.abs(disp - (ret - 0.8)) < 2e-6, s"$lang identity")
      assert(ret >= 0.0 && ret <= 1.0)
    }
  }

  private implicit class SeqToMap2(
      s: Seq[(String, Long, Option[Long])]) {
    def toMap2: Map[String, (Long, Option[Long])] =
      s.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }
}
