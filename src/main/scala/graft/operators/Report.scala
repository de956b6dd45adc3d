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
}
