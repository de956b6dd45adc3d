package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling (ANALYZE-style column statistics): one output row
  * per column with row/null/distinct counts and min/max rendered as
  * strings — the inspection pass a curation pipeline runs before and
  * after every transformation batch.
  *
  * Shape: ONE aggregate over ONE scan computes every column's stats
  * (Catalyst plans the multi-count-distinct via a single Expand —
  * the table is read once, expanded x#cols for the distinct counts),
  * then a `stack` unpivots the 1-row aggregate into per-column rows.
  * Exact COUNT(DISTINCT) keeps the result oracle-checkable (the q42
  * precedent); the 100 TB path swaps it for approx_count_distinct's
  * HLL sketch — same single-pass shape without the Expand multiplier
  * — at which point the profile is a pure map-side aggregate.
  *
  * min/max are computed in the column's native type (string casts
  * compare lexicographically — wrong for numbers) and only rendered
  * as varchar afterward. Columns here are BIGINT/VARCHAR; rendering
  * doubles would need an explicit format for cross-engine parity.
  */
object Profile {

  val documentColumns: Seq[String] = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** q70 — column statistics for `documents`, one row per column. */
  def profileDocuments(spark: SparkSession, dir: String): DataFrame =
    profileCore(Tables.load(spark, dir, "documents"), documentColumns)

  /** Frame-parameterized core: stats for the named columns. */
  def profileCore(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', n_rows, `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
      .orderBy(col("col_name"))
  }

  val profileDocumentsSql: String =
    documentColumns.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT($c) AS n_nulls,
        |  COUNT(DISTINCT $c) AS n_distinct,
        |  CAST(MIN($c) AS VARCHAR) AS min_val,
        |  CAST(MAX($c) AS VARCHAR) AS max_val
        |FROM documents""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
}
