package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-curation operators over `documents` (north-star: the
  * selection/inspection passes of a training-data pipeline): exact
  * group quantiles, deterministic hash sampling, stratified sampling.
  *
  * Sampling uses a cross-engine deterministic hash (first 8 md5 hex
  * digits as a long) — never rand(): reruns and retried tasks must
  * select identical rows (same reason the reference's pipelines are
  * idempotent via ON CONFLICT, lib.ts:90-92).
  */
object Curation {

  /** Deterministic per-row hash in [0, 2^32): portable across engines
    * (DuckDB: CAST('0x'||substr(md5(x),1,8) AS BIGINT)). One
    * definition for the whole engine — delegates to [[PortableHash]].
    */
  def md5Bucket(c: Column): Column = graft.functions.PortableHash.md5Long32(c)

  /** q42 — exact per-group quantiles by rank selection (no
    * percentile interpolation: interpolation semantics differ across
    * engines, rank selection is bit-exact). Integer rank arithmetic:
    * median = rank (n+1) div 2, p90 = rank ceil(9n/10).
    * Scale: one shuffle on the group key; the per-group sort is the
    * window — for heavy groups this is the sort-based variant of
    * approx_percentile, chosen here for oracle exactness.
    */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val ranked = docs
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
    ranked.groupBy(col("lang"))
      .agg(
        max(col("n")).as("n_docs"),
        // integer div (Column./ is double division — a fractional rank
        // would match nothing and null the quantile)
        max(when(col("rn") === expr("(n + 1) div 2"), col("n_chars"))).as("median_chars"),
        max(when(col("rn") === expr("(n * 9 + 9) div 10"), col("n_chars"))).as("p90_chars"))
      .orderBy(col("lang"))
  }

  val lengthQuantilesSql: String =
    """WITH ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents
      |)
      |SELECT lang, MAX(n) AS n_docs,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS median_chars,
      |  MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN n_chars END) AS p90_chars
      |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin

  /** The 100 TB form of [[lengthQuantiles]]: one-pass mergeable
    * quantile sketch (`approx_percentile`) instead of the exact
    * per-group rank selection — no per-group sort, partial+final
    * aggregation only. Not oracle-registered (sketch interpolation
    * differs across engines); QuantilesSpec bounds its error against
    * the exact form.
    */
  def lengthQuantilesApprox(spark: SparkSession, dir: String,
                            accuracy: Int = 10000): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile_approx(col("n_chars"), lit(0.5), lit(accuracy)).as("median_chars"),
        percentile_approx(col("n_chars"), lit(0.9), lit(accuracy)).as("p90_chars"))
      .orderBy(col("lang"))
  }

  /** q43 — deterministic Bernoulli-style sampling: keep rows whose
    * content-independent hash bucket falls under the rate. Rerun-stable
    * and join-free (a pure map over the scan).
    */
  def hashSample(spark: SparkSession, dir: String, pct: Int = 10): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.filter(md5Bucket(col("doc_id")) % 100 < pct)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val hashSampleSql: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
      |ORDER BY doc_id""".stripMargin

  /** q44 — stratified sampling: a fixed quota per stratum (lang),
    * selected in deterministic hash order. The standard
    * balanced-subset pass for training mixes.
    */
  def stratifiedSample(spark: SparkSession, dir: String, perStratum: Int = 20): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5Bucket(col("doc_id")), col("doc_id"))
    docs.withColumn("pick", row_number().over(w))
      .filter(col("pick") <= perStratum)
      .select(col("lang"), col("pick"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("pick"))
  }

  val stratifiedSampleSql: String =
    """SELECT lang, pick, doc_id, n_chars FROM (
      |  SELECT lang, doc_id, n_chars,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
      |               doc_id) AS INT) AS pick
      |  FROM documents
      |) WHERE pick <= 20
      |ORDER BY lang, pick""".stripMargin
}
