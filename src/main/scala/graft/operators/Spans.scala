package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Token-span operators over `documents`: fixed-window span splitting
  * shared by corpus-wide span-level (paragraph-style) deduplication
  * (q65) and overlapping RAG chunking (q68).
  *
  * The synthetic corpus has no newline/sentence structure, so the
  * "paragraph" unit is a fixed W-token window — the same operator
  * shape as C4/CCNet paragraph dedup (explode unit → hash → keep
  * first occurrence corpus-wide → reassemble), with the unit splitter
  * swapped; a newline splitter is a one-line change to [[spanize]].
  *
  * Scale posture (100 TB): both operators are explode → narrow map
  * chains. Span dedup needs no per-span join at all: the kept set IS
  * the per-fingerprint MIN aggregate (text carried inside the min
  * struct), which partial-aggregates map-side — a boilerplate span
  * repeated 10^6 times combines to one row per map task, so no hot
  * reduce key (a row_number window over the fingerprint, or a
  * winners-back-to-spans join, would funnel the hot key's whole group
  * through one reducer — deliberately avoided). The only remaining
  * join is per-doc aggregate ⋈ per-doc aggregate on doc_id. Chunking
  * shuffles nothing at all: one scan, rows out proportional to token
  * count, ready to repartition by chunk_fp for a downstream index.
  */
object Spans {

  /** (doc_id, toks, n) for non-empty docs. */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)

  /** One row per W-token non-overlapping span: (doc_id, span_idx,
    * span_text). The last span of a doc may be shorter than W.
    */
  def spanize(docs: DataFrame, w: Int): DataFrame =
    tokenized(docs)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L),
          expr(s"(n + ${w - 1}) div $w") - 1L)).as("span_idx"))
      .select(col("doc_id"), col("span_idx"),
        concat_ws(" ",
          slice(col("toks"), (col("span_idx") * w + 1).cast("int"), lit(w)))
          .as("span_text"))

  /** q65 — span-level (paragraph-style) exact dedup, corpus-wide:
    * split docs into W-token spans, keep only the globally-first
    * occurrence of each distinct span (order: doc_id, span_idx), and
    * reassemble each document from its surviving spans. Returns one
    * row per doc: span counts and the deduplicated text (empty string
    * when every span of a doc already appeared earlier in the corpus).
    */
  def spanDedup(spark: SparkSession, dir: String, w: Int = 20): DataFrame =
    spanDedupCore(Tables.load(spark, dir, "documents"), w)

  /** Frame-parameterized core: rows need (doc_id, text). */
  def spanDedupCore(docs: DataFrame, w: Int): DataFrame = {
    // two consumers (per-doc totals + per-fingerprint winners):
    // materialize the span explode once
    val spans = spanize(docs, w)
      .withColumn("span_fp", md5(col("span_text")))
      .localCheckpoint()
    val totals = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"))
    // the globally-first occurrence per fingerprint, text carried in
    // the min struct ((doc_id, span_idx) is unique, so span_text never
    // participates in the ordering) — the kept set needs no join back
    // to the span table
    val kept = spans.groupBy(col("span_fp"))
      .agg(min(struct(col("doc_id"), col("span_idx"), col("span_text"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.span_idx").as("span_idx"),
        col("w.span_text").as("span_text"))
    val perDocKept = kept.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("span_idx"), col("span_text")))),
            x => x.getField("span_text")),
          " ").as("dedup_text"))
    totals.join(perDocKept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"))
      .orderBy(col("doc_id"))
  }

  def spanDedupSql(w: Int = 20): String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      |  FROM documents
      |), spans AS (
      |  SELECT doc_id, u.span_idx, u.span_text FROM (
      |    SELECT doc_id, unnest([{'span_idx': i,
      |        'span_text': array_to_string(toks[i*$w+1 : i*$w+$w], ' ')}
      |      for i in range(0, (len(toks) + ${w - 1}) // $w)]) AS u
      |    FROM t WHERE len(toks) > 0)
      |), marked AS (
      |  SELECT doc_id, span_idx, span_text,
      |    ROW_NUMBER() OVER (PARTITION BY md5(span_text)
      |      ORDER BY doc_id, span_idx) = 1 AS keep
      |  FROM spans
      |)
      |SELECT doc_id, COUNT(*) AS n_spans,
      |  COUNT(*) FILTER (keep) AS n_kept,
      |  COALESCE(array_to_string(list(span_text ORDER BY span_idx)
      |    FILTER (WHERE keep), ' '), '') AS dedup_text
      |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q68 — RAG chunking: overlapping token windows of size `c` with
    * stride `s` (overlap c-s), one output row per chunk with its token
    * offset, length, text, and an md5 fingerprint (the natural join /
    * partition key for a downstream embedding or retrieval index).
    * Every doc yields at least one chunk; the final chunk may be
    * shorter than `c`.
    */
  def chunk(spark: SparkSession, dir: String, c: Int = 32, s: Int = 24): DataFrame =
    chunkCore(Tables.load(spark, dir, "documents"), c, s)

  /** Frame-parameterized core: rows need (doc_id, text). */
  def chunkCore(docs: DataFrame, c: Int, s: Int): DataFrame = {
    val nChunks: Column = when(col("n") <= c, lit(1L))
      .otherwise(expr(s"(n - $c + ${s - 1}) div $s") + 1L)
    tokenized(docs)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * s)
      .withColumn("arr",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(c)))
      .select(
        col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("arr")).cast("long").as("chunk_len"),
        md5(concat_ws(" ", col("arr"))).as("chunk_fp"),
        concat_ws(" ", col("arr")).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def chunkSql(c: Int = 32, s: Int = 24): String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      |  FROM documents
      |), chunks AS (
      |  SELECT doc_id, u.chunk_idx, u.start_tok, u.chunk_len, u.chunk_text FROM (
      |    SELECT doc_id, unnest([{'chunk_idx': i, 'start_tok': i*$s,
      |        'chunk_len': len(toks[i*$s+1 : i*$s+$c]),
      |        'chunk_text': array_to_string(toks[i*$s+1 : i*$s+$c], ' ')}
      |      for i in range(0, CASE WHEN len(toks) <= $c THEN 1
      |                           ELSE (len(toks) - $c + ${s - 1}) // $s + 1 END)]) AS u
      |    FROM t WHERE len(toks) > 0)
      |)
      |SELECT doc_id, chunk_idx, start_tok, chunk_len,
      |  md5(chunk_text) AS chunk_fp, chunk_text
      |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin
}
