package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's report-export pipelines composed end-to-end
  * (SURVEY §3.3; reference `lib.ts:498-554`: getAppsStats /
  * getCategoriesStats → spreadsheet-shaped CSV).
  *
  * Everything stays in the engine until the single-file CSV write:
  * flagship scoring (Relational.popularity), HYPERLINK cell formatting
  * with quote escaping (F9), dynamic `Category 1..N` widening (R1 —
  * N discovered from the data like `lib.ts:505`'s client-side
  * Math.max), report-label renames (R2).
  */
object Report {

  /** getAppsStats (lib.ts:498-536): popularity ranking widened into a
    * spreadsheet frame. Returns the report DataFrame; [[writeAppsStats]]
    * adds the CSV sink.
    */
  def appsStats(spark: SparkSession, dir: String): DataFrame = {
    val pop = Relational.popularity(spark, dir)
      .withColumn("cats", split(col("categories"), "\\|"))
    // O3 (lib.ts:505): widest category fan-out — a 1-row aggregate,
    // the only driver-side scalar in the pipeline
    val maxN = math.max(1, pop.agg(max(size(col("cats")))).head.getInt(0))
    val catCols = (0 until maxN).map(i =>
      coalesce(col("cats").getItem(i), lit("")).as(s"Category ${i + 1}"))
    pop.select(
      Seq(
        concat(lit("=HYPERLINK(\"https://example.com/app/"),
          col("app_key").cast("string"), lit("\",\""),
          regexp_replace(col("app_name"), "\"", "\"\""), lit("\")")).as("App"),
        col("developer_name").as("Developer"),
        col("rec_count").as("Recommendations"),
        col("popularity").as("Popularity Score"),
        col("last_snapshot_date").as("Last Snapshot")
      ) ++ catCols: _*)
  }

  /** The full §3.3 pipeline: report frame → single quoted CSV file. */
  def writeAppsStats(spark: SparkSession, dir: String, outPath: String): Unit =
    WritePath.writeCsvReport(appsStats(spark, dir), outPath)

  /** q50 / getCategoriesStats (lib.ts:539-554): the difficulty rollup
    * (q48, itself popularity-composed) relabeled into the spreadsheet
    * frame — Category Name as a HYPERLINK cell (same `/all` URL shape
    * as lib.ts:543, quote-escaped), report-label renames (R2).
    */
  def categoriesStats(spark: SparkSession, dir: String): DataFrame =
    Relational.categoryDifficulty(spark, dir).select(
      concat(lit("=HYPERLINK(\"https://example.com/categories/"),
        col("category_handle"), lit("/all\",\""),
        regexp_replace(col("category_handle"), "\"", "\"\""), lit("\")"))
        .as("Category Name"),
      col("total_apps").as("Total Apps"),
      col("average_popularity_score").as("Average Popularity Score"),
      col("total_reviews").as("Total reviews"),
      col("difficulty_score").as("Difficulty Score"))

  /** DuckDB twin of [[categoriesStats]]'s formatting layer over the
    * q48 statement.
    */
  def categoriesStatsSql(difficultySql: String): String =
    s"""WITH difficulty AS (
      |${difficultySql.linesIterator.map("  " + _).mkString("\n")}
      |)
      |SELECT
      |  '=HYPERLINK("https://example.com/categories/' || category_handle || '/all","' ||
      |    replace(category_handle, '"', '""') || '")' AS "Category Name",
      |  total_apps AS "Total Apps",
      |  average_popularity_score AS "Average Popularity Score",
      |  total_reviews AS "Total reviews",
      |  difficulty_score AS "Difficulty Score"
      |FROM difficulty
      |ORDER BY difficulty_score DESC NULLS FIRST, category_handle""".stripMargin

  /** The full categories pipeline: report frame → single quoted CSV
    * (lib.ts:549-553).
    */
  def writeCategoriesStats(spark: SparkSession, dir: String, outPath: String): Unit =
    WritePath.writeCsvReport(categoriesStats(spark, dir), outPath)
}
