package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** The operators composed into one end-to-end curation run — the
  * full pretraining-data flow a user of this engine would build from
  * the pieces (each individually oracle-checked):
  *
  *   documents
  *     → near-dup clustering (q38's fixpoint): keep cluster canonicals
  *     → quality gate (q23's score): drop the low-quality tail
  *     → per-source cap (q52's top-k): bound any one source's share
  *     → sequence packing (q53): token-budget placement
  *
  * One DataFrame chain, one action at the end. Operator-internal
  * checkpoints (dedup's shingle/pair tables) stay scoped to their
  * operator — CurationPipelineSpec asserts the composed run leaves no
  * CacheManager entries and is rerun-deterministic, the "composed into
  * longer pipelines" lifecycle concern from round-1 review.
  *
  * Scale shape: every stage is shuffle-by-key or a narrow map; the
  * only driver scalars are dedup's convergence probes.
  */
object CurationPipeline {

  def curateCorpus(spark: SparkSession, dir: String,
                   minQuality: Double = 0.5, perSource: Int = 50,
                   budget: Int = 2048, nBuckets: Int = 32): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")

    // 1. near-dup clustering: canonical representatives only
    val canon = Dedup.dedupClusters(spark, dir)
      .filter(col("is_canonical") === 1)
      .select(col("doc_id"))
    val deduped = docs.join(canon, Seq("doc_id"), "left_semi")

    // 2. quality gate
    val scored = deduped.select(col("doc_id"), col("source"), col("lang"),
        col("text"), TextFunctions.qualityScore(col("text")).as("quality"))
      .filter(col("quality") >= minQuality)

    // 3. per-source cap — q52's core over the composed frame
    val capped = Curation.topKPerSourceCore(scored, perSource, rankCol = "src_rank")

    // 4. token-budget sequence placement — q53's core
    val withTokens = capped.select(col("doc_id"), col("source"), col("lang"),
      col("quality"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
    Curation.sequencePackCore(withTokens, budget, nBuckets)
      .select(col("doc_id"), col("source"), col("lang"), col("quality"),
        col("n_tokens"), col("bucket"), col("seq_id"), col("seq_offset"))
      .orderBy(col("doc_id"))
  }
}
