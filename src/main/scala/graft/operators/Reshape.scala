package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Reshaping + report-formatting operators (SURVEY §2.9 R1/R2, §2.8 F9,
  * §2.1 S9): the reference's client-side spreadsheet assembly
  * (`src/utils/lib.ts:504-554`) done inside the engine.
  */
object Reshape {

  /** Dynamic pivot (R1; reference `lib.ts:504-530`: per-row category
    * list widened to `Category 1..N` where N is the global max): a
    * two-pass plan — pass 1 discovers the pivot domain, pass 2 pivots
    * against the explicit value list. Passing explicit values keeps
    * pass 2 a single job; at 100 TB the domain scan is a cheap
    * column-pruned aggregate.
    *
    * q16: events pivoted to one column per event_type with counts.
    */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    // pass 1: discover the (small) pivot domain, deterministically sorted.
    val types = ev.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    // pass 2: pivot with the explicit domain. Spark yields NULL for
    // absent (group, value) combos where SQL COUNT(CASE) yields 0 —
    // coalesce to match the conventional relational reading.
    val pivoted = ev.groupBy(col("user_id")).pivot("event_type", types).count()
    types.foldLeft(pivoted)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("user_id"))
  }

  val pivotEventCountsSql: String =
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Report-cell formatting (R2/F9; reference `lib.ts:509-528`:
    * `=HYPERLINK("url","label")` cells with CSV quote-escaping
    * `replace(/"/g,'""')`).
    *
    * q17: parts as spreadsheet rows.
    */
  def reportFormat(spark: SparkSession, dir: String): DataFrame = {
    val prt = Tables.load(spark, dir, "part")
    prt.select(
        col("p_partkey"),
        concat(
          lit("=HYPERLINK(\"https://example.com/part/"),
          col("p_partkey").cast(StringType),
          lit("\",\""),
          regexp_replace(col("p_name"), "\"", "\"\""),
          lit("\")")).as("part_link"),
        concat_ws(" / ", col("p_brand"), col("p_type")).as("brand_type"),
        col("p_retailprice").as("retail_price"))
      .orderBy(col("p_partkey"))
  }

  val reportFormatSql: String =
    """SELECT p_partkey,
      |  '=HYPERLINK("https://example.com/part/' || p_partkey || '","' ||
      |    replace(p_name, '"', '""') || '")' AS part_link,
      |  p_brand || ' / ' || p_type AS brand_type,
      |  p_retailprice AS retail_price
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Array widening (R1's other shape; reference `lib.ts:504-530`
    * widens each row's category list into `Category 1..N` columns).
    * q34: per-supplier sorted distinct brands widened to ranked
    * columns, NULL-padded like the reference's sparse rows. The
    * two-pass dynamic-N form is q16; here N is a fixed report width.
    */
  def widenTopBrands(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val prt = Tables.load(spark, dir, "part")
    val agg = li.join(broadcast(prt), li("l_partkey") === prt("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(array_sort(collect_set(col("p_brand"))).as("brands"))
    agg.select(
        col("l_suppkey") +: (0 until n).map(i =>
          col("brands").getItem(i).as(s"brand_${i + 1}")): _*)
      .orderBy(col("l_suppkey"))
  }

  val widenTopBrandsSql: String =
    """SELECT l_suppkey, brands[1] AS brand_1, brands[2] AS brand_2,
      |  brands[3] AS brand_3
      |FROM (
      |  SELECT l.l_suppkey, list_sort(list(DISTINCT p.p_brand)) AS brands
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY l.l_suppkey
      |) ORDER BY l_suppkey""".stripMargin

  /** JSON column round-trip (S9/F12 + extraction; reference stores
    * nested fields as JSON strings `lib.ts:191-196` via JSON.stringify;
    * queries pass them through opaquely — here we also extract, the
    * natural Spark reading).
    *
    * q18: extract props.k from events, re-encode a struct to JSON.
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("prop_k"),
        to_json(struct(col("user_id"), col("event_type"))).as("payload"))
      .orderBy(col("event_id"))
  }

  val jsonRoundtripSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
      |  CAST(to_json(struct_pack(user_id := user_id, event_type := event_type)) AS VARCHAR) AS payload
      |FROM events ORDER BY event_id""".stripMargin
}
