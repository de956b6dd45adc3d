package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pii

/** PII redaction: regex edge-string behavior (the patterns live in the
  * Java-regex ∩ RE2 subset — bounded/unbounded repetition over
  * character classes; these rows pin the Java side, the oracle run
  * pins the DuckDB side), plus the streaming redact-on-ingest twin
  * through the merge sink, replay-idempotent.
  */
class PiiSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("redactionAudit edge strings: run lengths, boundaries, empties") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (1L, "Customer#000012345", 0, 0.0, "BUILDING"),
      (2L, "123", 0, 0.0, "BUILDING"),          // below the {4,} floor
      (3L, "a1b22c333d4444", 0, 0.0, "AUTO"),   // only the 4-run matches
      (4L, "9999 and 88888", 0, 0.0, "AUTO"),   // two separate runs
      (5L, "", 0, 0.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0, """{"k": 69}"""),
      (11L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0, "7x8"),
      (12L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Pii.redactionAudit(spark, dir)
      .select($"src_table", $"rec_id", $"redacted", $"n_matches")
      .as[(String, Long, String, Long)].collect().toSeq
    assert(out === Seq(
      ("customer", 1L, "Customer#[ID]", 1L),
      ("customer", 2L, "123", 0L),
      ("customer", 3L, "a1b22c333d[ID]", 1L),
      ("customer", 4L, "[ID] and [ID]", 2L),
      ("customer", 5L, "", 0L),
      ("events", 10L, """{"k": [NUM]}""", 1L),
      ("events", 11L, "[NUM]x[NUM]", 2L),
      ("events", 12L, "{}", 0L)))
  }

  test("streaming redact-on-ingest merges clean copies, replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String, Int)]
    val df = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props", "__v")
    val dest = java.nio.file.Files.createTempDirectory("graft-spii").toString + "/events"
    val q = graft.streaming.StreamingPii.redactedMergeStream(
      df, dest, Seq("event_id"), "ts", "__v")
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, """{"k": 69}""", 1),
        (2L, ts("2024-01-02 10:00:00"), 2L, "buy", 2.0, "no digits", 1))
      q.processAllAvailable()
      val boot = spark.read.parquet(dest)
      assert(boot.count() === 2)
      // the stored props IS the scrubbed payload (the raw PII never
      // reaches the sink), plus the audit count
      assert(boot.filter($"event_id" === 1L)
        .select($"props", $"n_matches")
        .as[(String, Long)].head() === ("""{"k": [NUM]}""", 1L))
      assert(!boot.columns.contains("props_redacted"))
      // update event 1's payload: redaction re-applies on the new image
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "id 12345", 1))
      q.processAllAvailable()
      val upd = spark.read.parquet(dest)
      assert(upd.count() === 2)
      assert(upd.filter($"event_id" === 1L)
        .select($"props").as[String].head() === "id [NUM]")
      val image = upd.orderBy($"event_id").collect().map(_.toString).toSeq
      // replayed micro-batch (foreachBatch recovery): same post-image
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "id 12345", 1))
      q.processAllAvailable()
      val replayed = spark.read.parquet(dest)
        .orderBy($"event_id").collect().map(_.toString).toSeq
      assert(replayed === image)
    } finally q.stop()
  }

  test("kAnonymityAudit: small classes flagged, generalization sums the segment") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kanon").toString
    // nation 1 / segment A: 6 in bucket 0 (safe), 1 in bucket 1 (at
    // risk, but generalizing to the segment gives k=7); nation 1 /
    // segment B: 2 in bucket -1 (negative balance floors DOWN) — at
    // risk even after generalization.
    val rows =
      (1 to 6).map(i => (i.toLong, s"c$i", 1, i * 100.0, "A")) ++
        Seq((7L, "c7", 1, 1500.0, "A"), (8L, "c8", 1, -500.0, "B"),
          (9L, "c9", 1, -500.0, "B"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = Pii.kAnonymityAudit(spark, dir)
      .as[(Int, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1, "A", 0L, 6L, 7L, false),
      (1, "A", 1L, 1L, 7L, true),
      (1, "B", -1L, 2L, 2L, true)))
  }

  test("lDiversityAudit: homogeneous class flags at_risk with zero entropy") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ldiv").toString
    // nation 1: 4 customers all in bal bucket 0 -> l=1, H=0, at risk
    // nation 2: buckets 0,0,1,2 -> l=3, H = 2 - (2*log10 2)/(4*log10 2)... in
    //   bits: k=4, counts {2,1,1}: H = (log10(4) - (2*log10 2)/4)/log10(2) = 1.5
    val rows = Seq(
      (1L, 1, 100.0), (2L, 1, 200.0), (3L, 1, 300.0), (4L, 1, 400.0),
      (5L, 2, 100.0), (6L, 2, 200.0), (7L, 2, 1100.0), (8L, 2, 2100.0))
    rows.map { case (ck, n, bal) => (ck, s"c$ck", n, bal, "SEG") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = graft.operators.Pii.lDiversityAudit(spark, dir)
      .as[(Int, String, Long, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      (1, "SEG", 4L, 1L, 0.0, true),
      (2, "SEG", 4L, 3L, 1.5, false)))
  }

  test("generalizationSweep: the w=1000 rung reconciles with the q199 audit") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val sweep = graft.operators.Pii.generalizationSweep(SharedSpark.spark, sf)
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(sweep.map(_._1) === Seq(250, 500, 1000, 2000, 4000))
    val rung = sweep.find(_._1 == 1000).get
    val q199 = graft.operators.Pii.kAnonymityAudit(SharedSpark.spark, sf)
      .as[(Int, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(rung._2 === q199.size.toLong)
    assert(rung._3 === q199.count(_._6).toLong)
    assert(rung._4 === q199.filter(_._6).map(_._4).sum)
    // wider buckets can only merge classes: class count is non-increasing
    assert(sweep.map(_._2) === sweep.map(_._2).sorted.reverse)
  }

  test("dpHistogram: bounded contribution, clamp/round identity, Laplace scale") {
    val out = graft.operators.Pii.dpHistogram(SharedSpark.spark, "/root/testdata/sf0.001")
      .as[(String, java.sql.Date, Long, Double, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (_, _, n, noise, released, err) =>
      assert(released >= 0L)
      // post-processing identity: released = max(0, half-up(n + noise))
      val exp = math.max(0L,
        BigDecimal(n + noise).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(released === exp)
      assert(err === released - n)
    }
    // contribution bounding: the true count is DISTINCT users per cell
    val ev = graft.Tables.load(SharedSpark.spark, "/root/testdata/sf0.001", "events")
    val cell = out.head
    val n0 = ev.filter(col("event_type") === cell._1 &&
        to_date(col("ts")) === lit(cell._2.toString))
      .select("user_id").distinct().count()
    assert(n0 === cell._3)
    // Laplace(b=1/ε=1): median |noise| = b·ln2 ≈ 0.693 — the seeded
    // uniforms should land the empirical median in a generous band
    val med = out.map(r => math.abs(r._4)).sorted.apply(out.size / 2)
    assert(med > 0.15 && med < 2.5, s"median |noise| = $med")
  }

  test("dpMeanRelease: contribution bounded to one clamped value per user; rerun-identical") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.operators.Pii.dpMeanRelease(spark, sf)
      .as[(String, Long, Double, Double, Double, Long, Double)]
      .collect().toSeq
    assert(out.nonEmpty)
    // true mean is the mean of CLAMPED per-user means: in [0, clampHi]
    assert(out.forall(r => r._3 >= 0.0 && r._3 <= 10.0))
    // released_n floored at 1; released mean finite
    assert(out.forall(r => r._6 >= 1L && !r._7.isNaN && !r._7.isInfinite))
    // the noise is SEEDED: a second run is bit-identical
    val again = graft.operators.Pii.dpMeanRelease(spark, sf)
      .as[(String, Long, Double, Double, Double, Long, Double)]
      .collect().toSeq
    assert(again === out)
    // hand fixture: one user, values 4 and 6 -> clamped user mean 5.0
    val dir = java.nio.file.Files.createTempDirectory("graft-dpm").toString
    Seq((1L, 1L, "view", 4.0), (2L, 1L, "view", 6.0))
      .map { case (id, u, t, v) =>
        (id, new java.sql.Timestamp(1000L * id), u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val one = graft.operators.Pii.dpMeanRelease(spark, dir)
      .as[(String, Long, Double, Double, Double, Long, Double)]
      .collect().toSeq
    assert(one.size === 1)
    assert(one.head._2 === 1L && one.head._3 === 5.0)
  }
}
