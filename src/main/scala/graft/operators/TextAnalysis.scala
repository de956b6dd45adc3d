package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis queries over `documents` (north-star extension:
  * language ID, quality scoring, token counting, fingerprinting).
  * All single-pass narrow transforms + one final sort — at 100 TB
  * these are embarrassingly parallel map stages over the scan.
  */
object TextAnalysis {

  /** q21 — token statistics: whitespace tokens, BPE-ish tokens,
    * punctuation, character count.
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        punctCount(col("text")).as("n_punct"),
        length(col("text")).as("n_chars_computed"),
        col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val tokenStatsSql: String =
    s"""SELECT doc_id,
       |  len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS n_tokens,
       |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
       |  len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,
       |  length(text) AS n_chars_computed, n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** q22 — heuristic language ID (stopword-hit argmax) compared with
    * the labeled lang.
    *
    * Shape: explode tokens once + conditional-sum aggregation, then
    * the argmax CASE over the score columns. The column-level
    * [[graft.functions.TextFunctions.langId]] is equivalent but its
    * `filter` HOFs are CodegenFallback and re-evaluate per reference
    * in the argmax chain — the exploded form is the 100 TB shape (one
    * pass over tokens, codegen'd conditional sums).
    */
  def langIdQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val scoreCols = langStopwords.map { case (lang, words) =>
      sum(when(col("tok").isin(words: _*), 1).otherwise(0)).as(s"s_$lang")
    }
    val scores = tok.groupBy(col("doc_id")).agg(scoreCols.head, scoreCols.tail: _*)
    val s = langStopwords.map { case (lang, _) =>
      lang -> coalesce(col(s"s_$lang"), lit(0L))
    }.toMap
    val pred = when(s.values.reduce(_ + _) > 0,
      when(s("de") > s("en") && s("de") > s("es") && s("de") > s("fr"), "de")
        .when(s("fr") > s("en") && s("fr") > s("es"), "fr")
        .when(s("es") > s("en"), "es")
        .otherwise("en"))
      .otherwise(lit("und"))
    docs.join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), pred.as("lang_pred"))
      .withColumn("agrees", (col("lang") === col("lang_pred")).cast("int"))
      .orderBy(col("doc_id"))
  }

  private def hitsSql(words: Seq[String]): String =
    s"len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  val langIdSql: String = {
    val en = hitsSql(langStopwords(0)._2)
    val es = hitsSql(langStopwords(1)._2)
    val fr = hitsSql(langStopwords(2)._2)
    val de = hitsSql(langStopwords(3)._2)
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $en AS s_en, $es AS s_es, $fr AS s_fr, $de AS s_de
       |  FROM documents
       |)
       |SELECT doc_id, lang,
       |  CASE WHEN s_en + s_es + s_fr + s_de > 0 THEN
       |    CASE WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
       |         WHEN s_fr > s_en AND s_fr > s_es THEN 'fr'
       |         WHEN s_es > s_en THEN 'es'
       |         ELSE 'en' END
       |  ELSE 'und' END AS lang_pred,
       |  CASE WHEN lang = (CASE WHEN s_en + s_es + s_fr + s_de > 0 THEN
       |    CASE WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
       |         WHEN s_fr > s_en AND s_fr > s_es THEN 'fr'
       |         WHEN s_es > s_en THEN 'es'
       |         ELSE 'en' END
       |  ELSE 'und' END) THEN 1 ELSE 0 END AS agrees
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** q23 — composite quality score + decile bucketing. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .withColumn("quality_bucket", floor(col("quality") * 10).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Whitespace token count as a DuckDB expression — the oracle twin
    * of TextFunctions.tokenCount, shared by the quality and
    * sequence-packing oracles so the tokenizer can only change in one
    * place per engine.
    */
  private[operators] val tokenCountExprSql: String =
    "len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))"

  /** The quality formula as one DuckDB scalar expression — shared by
    * the q23 oracle and Curation's q52 top-k-per-source oracle.
    */
  private[operators] val qualityExprSql: String = {
    val n = tokenCountExprSql
    val p = "len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))"
    val s = hitsSql(langStopwords.head._2)
    s"""ROUND(0.4 * least(1.0, $n / 50.0) +
       |        0.3 * (1.0 - least(1.0, $p / greatest($n, 1.0))) +
       |        0.3 * least(1.0, 5.0 * $s / greatest($n, 1.0)), 6)""".stripMargin
  }

  val qualitySql: String =
    s"""SELECT doc_id,
       |  $qualityExprSql AS quality,
       |  CAST(FLOOR(($qualityExprSql) * 10) AS INT) AS quality_bucket
       |FROM documents ORDER BY doc_id""".stripMargin

  /** q36 — corpus vocabulary: term frequency + document frequency per
    * token (the vocab-building pass of a training-data pipeline).
    * One explode + one aggregation; at 100 TB the (token) shuffle key
    * is Zipf-skewed, which is exactly what Skew.twoLevelAgg handles —
    * here plain partial+final aggregation suffices since count/df are
    * algebraic.
    */
  def vocabulary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"))
      .orderBy(col("token"))
  }

  val vocabularySql: String =
    """SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      |FROM (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(text), '\s+'), t -> t <> '')) AS token
      |  FROM documents
      |)
      |GROUP BY token ORDER BY token""".stripMargin

  /** q39 — TF-IDF top terms per document: token tf joined with the
    * corpus df (q36), weight = tf * log10(N / df), top-3 terms per doc
    * by weight. The scoring pass of a relevance/quality pipeline; two
    * aggregations + one broadcast-ish join on token + per-doc top-k.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.count() // tiny catalog-level scalar (corpus size)
    val tokenized = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = tokenized.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tokenized.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val weighted = tf.join(df, "token")
      .withColumn("tfidf", round(col("tf") * log10(lit(n.toDouble) / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    weighted.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val tfidfTopTermsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(text), '\s+'), t -> t <> '')) AS token
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      |), df AS (
      |  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
      |), weighted AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |    ROUND(tf.tf * log10((SELECT COUNT(*) FROM documents) * 1.0 / df.df), 6) AS tfidf
      |  FROM tf JOIN df ON tf.token = df.token
      |)
      |SELECT doc_id,
      |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rank,
      |  token, tf, df, tfidf
      |FROM weighted
      |QUALIFY rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** q24 — document fingerprints: byte-level (whitespace-normalized)
    * and order-insensitive bag-of-words md5.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(
        col("doc_id"),
        contentFingerprint(col("text")).as("content_fp"),
        bagFingerprint(col("text")).as("bag_fp"),
        rollingFingerprint(spark, col("text")).as("rolling_fp"))
      .orderBy(col("doc_id"))
  }

  val fingerprintsSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_fp,
      |  md5(array_to_string(list_sort(list_distinct(
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''))), ' ')) AS bag_fp,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''),
      |      t -> CAST(length(t) * 31 + COALESCE(ascii(substr(t, 1, 1)), 0) AS BIGINT))),
      |    (h, c) -> (h * 131 + c) % 1000000007) AS BIGINT) AS rolling_fp
      |FROM documents ORDER BY doc_id""".stripMargin
}
