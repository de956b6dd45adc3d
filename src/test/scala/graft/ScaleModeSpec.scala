package graft

import org.scalatest.funsuite.AnyFunSuite

/** The exact↔sketch dial (round-8 verdict item 8): each operator with
  * a scale twin exposes ONE entry point taking a [[ScaleMode]], and
  * the legacy *Approx names are thin delegations — flipping a
  * pipeline to sketch mode is a parameter change, not a rewiring.
  */
class ScaleModeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  val sf0001 = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("one entry point per operator: Sketch mode == the *Approx twin") {
    // deterministic sketches (same input, same plan) make these exact
    // equalities — the wrapper and the mode flag are one code path
    assert(rows(operators.Curation.lengthQuantiles(spark, sf0001, ScaleMode.Sketch))
      === rows(operators.Curation.lengthQuantilesApprox(spark, sf0001)))
    assert(rows(operators.Events.rfm(spark, sf0001, ScaleMode.Sketch))
      === rows(operators.Events.rfmApprox(spark, sf0001)))
    assert(rows(operators.Events.rollingActiveUsers(spark, sf0001,
        mode = ScaleMode.Sketch))
      === rows(operators.Events.rollingActiveUsersApprox(spark, sf0001)))
    assert(rows(operators.TextAnalysis.vocabulary(spark, sf0001, ScaleMode.Sketch))
      === rows(operators.TextAnalysis.vocabularyApprox(spark, sf0001)))
    assert(rows(operators.Dedup.crossSourceOverlap(spark, sf0001,
        mode = ScaleMode.Sketch))
      === rows(operators.Dedup.crossSourceOverlapApprox(spark, sf0001)))
  }

  test("overlap sketch tracks exact pair counts within the rsd envelope") {
    import spark.implicits._
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r).toMap
    val exact = keyed(operators.Dedup.crossSourceOverlap(spark, sf0001))
    val sk = keyed(operators.Dedup.crossSourceOverlap(spark, sf0001,
      mode = ScaleMode.Sketch))
    // every EXACT pair with overlap appears in the sketch (the sketch
    // emits all pairs; exact omits zero-shared pairs, so compare on
    // the exact key set)
    assert(exact.keySet.subsetOf(sk.keySet))
    exact.foreach { case (k, e) =>
      val s = sk(k)
      // per-source sizes: HLL rsd 5%, allow 4 sigma
      assert(math.abs(s._4 - e._4) <= math.max(2L, (e._4 * 0.2).toLong), s"$k n_a")
      assert(math.abs(s._5 - e._5) <= math.max(2L, (e._5 * 0.2).toLong), s"$k n_b")
      // intersection via inclusion-exclusion compounds three sketches:
      // bound it loosely relative to the UNION size (the stable scale)
      val union = e._4 + e._5 - e._3
      assert(math.abs(s._3 - e._3) <= math.max(4L, (union * 0.3).toLong),
        s"$k n_shared sketch ${s._3} vs exact ${e._3}")
    }
  }

  test("vocabulary sketch df stays within the HLL rsd envelope of exact") {
    import spark.implicits._
    val exact = operators.TextAnalysis.vocabulary(spark, sf0001)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val sk = operators.TextAnalysis
      .vocabulary(spark, sf0001, ScaleMode.Sketch)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(sk.keySet === exact.keySet)
    // rsd 5%: allow 4 sigma (sketches are deterministic, this pins
    // the configured accuracy rather than luck)
    sk.foreach { case (tok, d) =>
      assert(math.abs(d - exact(tok)) <= math.max(1L, (exact(tok) * 0.2).toLong),
        s"token $tok: sketch $d vs exact ${exact(tok)}")
    }
    // tf is exact in both modes
    val tfE = operators.TextAnalysis.vocabulary(spark, sf0001)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val tfS = operators.TextAnalysis
      .vocabulary(spark, sf0001, ScaleMode.Sketch)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(tfE === tfS)
  }

  test("mode flip preserves the output contract (schema and keys)") {
    // a pipeline consuming the exact form can consume the sketch form
    // unchanged: same column names, same key set
    def contract(name: String,
                 f: ScaleMode => org.apache.spark.sql.DataFrame,
                 keyCol: String): Unit = {
      val e = f(ScaleMode.Exact)
      val s = f(ScaleMode.Sketch)
      assert(e.columns.toSeq === s.columns.toSeq, name)
      val ek = e.select(keyCol).collect().map(_.get(0)).toSet
      val sk = s.select(keyCol).collect().map(_.get(0)).toSet
      assert(ek === sk, name)
      assert(ek.nonEmpty, name)
    }
    contract("lengthQuantiles",
      m => operators.Curation.lengthQuantiles(spark, sf0001, m), "lang")
    contract("rfm", m => operators.Events.rfm(spark, sf0001, m), "user_id")
    contract("rollingActiveUsers",
      m => operators.Events.rollingActiveUsers(spark, sf0001, mode = m),
      "epoch_day")
    contract("vocabulary",
      m => operators.TextAnalysis.vocabulary(spark, sf0001, m), "token")
  }
}
