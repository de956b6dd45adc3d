package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-validation suite (q163): constraint rules stated
  * as data (not-null, domain range, regex domain, key uniqueness,
  * referential integrity), compiled into the minimum number of passes
  * — every row-local rule AND every uniqueness rule on one table fold
  * into a SINGLE aggregate over a single scan (conditional sums +
  * count-distinct), and each foreign-key rule is one join. The report
  * is one row per rule: row count, violation count, pass flag — the
  * contract gate a pipeline runs before promoting a snapshot, and the
  * engine-level sibling of q70's column profile (which describes data;
  * this one judges it against declared expectations).
  *
  * The reference validates schema shape at migration time
  * (/root/reference/src/migrate.ts:19-30 derives the table list from
  * the schema; bad rows surface only as per-batch insert failures at
  * :67-69); this operator states row-level expectations up front and
  * counts violations without aborting — the 100 TB posture, where one
  * bad row must not kill a load and "how many, where" is the question.
  *
  * Both the Spark plan and the DuckDB oracle are GENERATED from the
  * same rule list, so an added rule cannot drift between engines.
  *
  * Scale: per table = one scan with map-side partial aggregation
  * (the count-distinct for uniqueness expands, still one scan); per
  * FK rule = one join against the distinct parent key set (broadcast
  * when the parent is dimension-sized, shuffle semi-join otherwise).
  * Nothing is row-returned: output is rules-many rows.
  */
object Validate {

  sealed trait VRule { def name: String; def table: String }
  /** column must be non-null */
  final case class NotNullRule(name: String, table: String,
                               column: String) extends VRule
  /** non-null values must fall in [lo, hi] (nulls are NotNull's job) */
  final case class RangeRule(name: String, table: String, column: String,
                             lo: Double, hi: Double) extends VRule
  /** non-null values must match the (RE2-simple) pattern */
  final case class RegexRule(name: String, table: String, column: String,
                             pattern: String) extends VRule
  /** fully-non-null key tuples must be distinct; violations = extra
    * copies beyond the first per duplicated key */
  final case class UniqueRule(name: String, table: String,
                              columns: Seq[String]) extends VRule
  /** non-null child keys must exist in parentTable.parentColumn */
  final case class FkRule(name: String, table: String, column: String,
                          parentTable: String,
                          parentColumn: String) extends VRule

  /** The graded suite: key integrity + domain checks on the TPC-H-ish
    * order flow. All pass on the generated testdata; the spec stages
    * dirty fixtures to prove each rule type actually counts.
    */
  val orderFlowSuite: Seq[VRule] = Seq(
    NotNullRule("lineitem_key_not_null", "lineitem", "l_orderkey"),
    FkRule("lineitem_order_fk", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    RangeRule("lineitem_qty_in_range", "lineitem", "l_quantity", 1, 50),
    FkRule("orders_customer_fk", "orders", "o_custkey",
      "customer", "c_custkey"),
    NotNullRule("orders_key_not_null", "orders", "o_orderkey"),
    UniqueRule("orders_key_unique", "orders", Seq("o_orderkey")),
    RegexRule("orders_status_domain", "orders", "o_orderstatus", "^[OFP]$"),
    RangeRule("orders_total_in_range", "orders", "o_totalprice", 0, 1e6))

  /** q163 — run [[orderFlowSuite]] against the dir's tables. */
  def orderFlowReport(spark: SparkSession, dir: String): DataFrame =
    suiteReport(spark, dir, orderFlowSuite)

  val orderFlowReportSql: String = suiteSql(orderFlowSuite)

  // non-null guard for a unique rule's key tuple
  private def allNotNull(cols: Seq[String]): Column =
    cols.map(col(_).isNotNull).reduce(_ && _)

  // a unique rule's countable key: the non-null tuple as one string
  // (concat_ws over casts — the same expression both engines own)
  private def uniqueKey(r: UniqueRule): Column =
    when(allNotNull(r.columns),
      concat_ws("\u0001", r.columns.map(col(_).cast("string")): _*))

  private def violationCol(r: VRule): Column = r match {
    case NotNullRule(_, _, c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case RangeRule(_, _, c, lo, hi) =>
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
        .otherwise(0L))
    case RegexRule(_, _, c, p) =>
      sum(when(col(c).isNotNull && !col(c).rlike(p), 1L).otherwise(0L))
    case r @ UniqueRule(_, _, _) =>
      count(uniqueKey(r)) - countDistinct(uniqueKey(r))
    case _: FkRule =>
      throw new IllegalArgumentException("FK rules compile to joins")
  }

  /** Compile a rule list: one aggregate per table for scan-local rules,
    * one join per FK rule, unioned into the (rule, counts) report.
    */
  def suiteReport(spark: SparkSession, dir: String,
                  rules: Seq[VRule]): DataFrame = {
    val (fkRules, localRules) = rules.partition(_.isInstanceOf[FkRule])
    val perTable = localRules.groupBy(_.table).toSeq.map {
      case (table, tableRules) =>
        val aggs = count(lit(1)).as("__n") +:
          tableRules.map(r => violationCol(r).as(r.name))
        val one = Tables.load(spark, dir, table)
          .agg(aggs.head, aggs.tail: _*)
        val stackArgs = tableRules.map(r =>
          s"'${r.name}', __n, cast(`${r.name}` as bigint)").mkString(", ")
        one.select(expr(
          s"stack(${tableRules.size}, $stackArgs)" +
            " as (rule_name, n_rows, n_violations)"))
          .withColumn("table_name", lit(table))
    }
    val perFk = fkRules.collect { case r: FkRule =>
      val parentKeys = Tables.load(spark, dir, r.parentTable)
        .select(col(r.parentColumn).as("__parent_key")).distinct()
      Tables.load(spark, dir, r.table)
        .join(parentKeys, col(r.column) === col("__parent_key"), "left")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(r.column).isNotNull && col("__parent_key").isNull,
            1L).otherwise(0L)).as("n_violations"))
        .select(lit(r.name).as("rule_name"), col("n_rows"),
          col("n_violations"), lit(r.table).as("table_name"))
    }
    (perTable ++ perFk).reduce(_ unionByName _)
      .select(col("rule_name"), col("table_name"), col("n_rows"),
        col("n_violations"),
        (col("n_violations") === 0).cast("int").as("pass"))
      .orderBy(col("rule_name"))
  }

  /** The same rule list as its DuckDB oracle (clarity over speed:
    * one SELECT per rule, UNION ALL — the driver's side of the gate).
    */
  def suiteSql(rules: Seq[VRule]): String = {
    def key(r: UniqueRule): String = {
      val guard = r.columns.map(c => s"$c IS NOT NULL").mkString(" AND ")
      val casts = r.columns.map(c => s"CAST($c AS VARCHAR)").mkString(", ")
      s"CASE WHEN $guard THEN concat_ws(chr(1), $casts) END"
    }
    val selects = rules.map {
      case NotNullRule(n, t, c) =>
        s"""SELECT '$n' AS rule_name, '$t' AS table_name,
           |  COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violations
           |FROM $t""".stripMargin
      case RangeRule(n, t, c, lo, hi) =>
        s"""SELECT '$n' AS rule_name, '$t' AS table_name,
           |  COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NOT NULL AND ($c < $lo OR $c > $hi)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
           |FROM $t""".stripMargin
      case RegexRule(n, t, c, p) =>
        s"""SELECT '$n' AS rule_name, '$t' AS table_name,
           |  COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NOT NULL
           |    AND NOT regexp_matches($c, '$p')
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
           |FROM $t""".stripMargin
      case r @ UniqueRule(n, t, _) =>
        s"""SELECT '$n' AS rule_name, '$t' AS table_name,
           |  COUNT(*) AS n_rows,
           |  CAST(COUNT(${key(r)}) - COUNT(DISTINCT ${key(r)}) AS BIGINT)
           |    AS n_violations
           |FROM $t""".stripMargin
      case FkRule(n, t, c, pt, pc) =>
        s"""SELECT '$n' AS rule_name, '$t' AS table_name,
           |  COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN c.$c IS NOT NULL AND p.$pc IS NULL
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
           |FROM $t c LEFT JOIN (SELECT DISTINCT $pc FROM $pt) p
           |  ON c.$c = p.$pc""".stripMargin
    }
    selects.mkString("SELECT rule_name, table_name, n_rows, n_violations,\n" +
      "  CAST(n_violations = 0 AS INT) AS pass\nFROM (\n",
      "\nUNION ALL\n", "\n)\nORDER BY rule_name")
  }

  /** q385 — categorical-domain drift audit: for every categorical
    * column, the category inventory of the FIRST half of the time
    * range against the SECOND (q124's integer-midpoint split on
    * order date), flagging values that APPEARED (`is_new`) or
    * VANISHED (`is_gone`). This is the ingestion guard q163's static
    * domain rules cannot express — a rule lists the values you knew
    * about; this catches the enum value the upstream added last week,
    * BEFORE a downstream CASE silently routes it to `otherwise`. The
    * per-half counts make the severity call (a 3-row novel category
    * is a probe; a 30k-row one is a schema change).
    *
    * Exactness: integer day split ((min+max) div 2 — non-negative,
    * both engines floor), integer half counts, integer flags.
    * Scale: one scan per audited table, a long-form union at
    * (column × category) grain — catalog-sized after the aggregate.
    */
  def categoryDriftAudit(spark: SparkSession, dir: String): DataFrame = {
    val dayOf = "(unix_micros(cast(o_orderdate as timestamp)) - " +
      "pmod(unix_micros(cast(o_orderdate as timestamp)), 86400000000)) " +
      "div 86400000000"
    val o = Tables.load(spark, dir, "orders")
      .withColumn("day", expr(dayOf))
    val split = o.agg(expr("(min(day) + max(day)) div 2").as("mid"))
    val tagged = o.crossJoin(broadcast(split))
      .withColumn("half", when(col("day") <= col("mid"), 1).otherwise(2))
    val cols = Seq("o_orderstatus", "o_orderpriority")
    val long = cols.map { c =>
      tagged.select(lit(c).as("col_name"), col(c).as("value"), col("half"))
    }.reduce(_ unionByName _)
    long.groupBy(col("col_name"), col("value"))
      .agg(sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("half") === 2, 1L).otherwise(0L)).as("n_second"))
      .select(col("col_name"), col("value"), col("n_first"),
        col("n_second"),
        (col("n_first") === 0).cast("int").as("is_new"),
        (col("n_second") === 0).cast("int").as("is_gone"))
      .orderBy(col("col_name"), col("value"))
  }

  val categoryDriftAuditSql: String = {
    def one(c: String): String =
      s"SELECT '$c' AS col_name, $c AS value, half FROM tagged"
    s"""WITH o AS (
       |  SELECT o_orderstatus, o_orderpriority,
       |    epoch_ms(o_orderdate) // 86400000 AS day
       |  FROM orders
       |), split AS (
       |  SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM o
       |), tagged AS (
       |  SELECT o.*, CASE WHEN o.day <= s.mid THEN 1 ELSE 2 END AS half
       |  FROM o CROSS JOIN split s
       |), long_form AS (
       |  ${Seq("o_orderstatus", "o_orderpriority").map(one)
           .mkString("\n  UNION ALL\n  ")}
       |)
       |SELECT col_name, value,
       |  CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_first,
       |  CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_second,
       |  CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) = 0 AS INT)
       |    AS is_new,
       |  CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) = 0 AS INT)
       |    AS is_gone
       |FROM long_form
       |GROUP BY 1, 2
       |ORDER BY col_name, value""".stripMargin
  }
}
