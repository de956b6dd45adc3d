package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationPipeline, Dedup}

/** The composed curation run: stage invariants, rerun determinism, and
  * the operator-checkpoint lifecycle concern from round-1 review (a
  * composed pipeline must not leak CacheManager entries).
  */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("composed curation: invariants, determinism, no cache leak") {
    val dir = "/root/testdata/sf0.001"
    val out = CurationPipeline.curateCorpus(spark, dir).collect()

    val docs = Tables.load(spark, dir, "documents")
    val nDocs = docs.count()
    val nDups = Dedup.dedupClusters(spark, dir)
      .filter($"is_canonical" === 0).count()
    // stage invariants: output is a subset of canonical docs, all
    // above the quality floor, per-source cap respected
    assert(out.length > 0 && out.length <= nDocs - nDups)
    assert(out.forall(_.getAs[Double]("quality") >= 0.5))
    // decontamination: neither eval-split docs nor flagged-overlap
    // docs ship, and every shipped row carries the redaction audit
    val outIds = out.map(_.getAs[Long]("doc_id")).toSet
    val evalIds = docs
      .filter(graft.functions.PortableHash.md5Long32($"doc_id") % 100 < 2)
      .select($"doc_id").as[Long].collect().toSet
    assert(outIds.intersect(evalIds).isEmpty, "eval docs leaked into training")
    val flagged = Dedup.decontamination(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(outIds.intersect(flagged).isEmpty, "contaminated docs shipped")
    assert(out.forall(_.getAs[Long]("n_redactions") >= 0L))
    val bySource = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    assert(bySource.values.forall(_ <= 50))
    // seq ids are dense-ish per bucket: max seq bounded by token mass
    val tokenMass = out.map(_.getAs[Int]("n_tokens").toLong).sum
    val maxSeq = out.map(_.getAs[Long]("seq_id")).max
    assert(maxSeq <= tokenMass / 2048 + 32) // per-bucket remainders

    // rerun determinism: identical output row-for-row
    val again = CurationPipeline.curateCorpus(spark, dir).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)

    // lifecycle: the composed run registered nothing in the
    // CacheManager (operator intermediates are GC-scoped
    // localCheckpoints, not persists)
    assert(spark.sharedState.cacheManager.isEmpty,
      "composed pipeline leaked CacheManager entries")
  }
}
