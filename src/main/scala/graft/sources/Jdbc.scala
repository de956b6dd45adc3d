package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink wrappers (SURVEY S1/S3/S5): the reference's
  * connection factory (`src/migrate.ts:32-36`: PrismaClient per
  * datasource url) and full-table scans (`migrate.ts:48` findMany)
  * re-expressed as Spark JDBC reads/writes.
  *
  * Zero-egress environment: these compile against the public JDBC
  * source API but are exercised only via the parquet-backed paths in
  * tests. At scale, `partitionColumn/numPartitions` shard the scan
  * across executors — the reference's whole-table-in-driver-RAM
  * bottleneck (`migrate.ts:48`) disappears.
  */
object Jdbc {

  case class JdbcConfig(url: String, user: String = "", password: String = "",
                        fetchSize: Int = 10000, batchSize: Int = 10000)

  /** Env-driven config with fail-fast validation (reference E5:
    * `migrate.ts:76-81` requires SOURCE_DB_URL/DEST_DB_URL).
    */
  def configFromEnv(prefix: String, env: Map[String, String] = sys.env): JdbcConfig = {
    val url = env.getOrElse(s"${prefix}_DB_URL",
      throw new IllegalArgumentException(s"missing ${prefix}_DB_URL"))
    JdbcConfig(url,
      env.getOrElse(s"${prefix}_DB_USER", ""),
      env.getOrElse(s"${prefix}_DB_PASSWORD", ""))
  }

  /** Full-table scan (S1). `partitionColumn` bounds-shards the read:
    * executors each pull a key range instead of one driver cursor.
    */
  def readTable(spark: SparkSession, cfg: JdbcConfig, table: String,
                partitionColumn: Option[String] = None,
                numPartitions: Int = 32): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("fetchsize", cfg.fetchSize)
    partitionColumn match {
      case Some(pc) =>
        // two-phase: probe bounds, then shard (the Spark-idiomatic
        // replacement for the reference's single findMany cursor).
        // Positional access — unquoted aliases case-fold differently
        // across databases; NULL bounds (empty table) fall back to an
        // unpartitioned read instead of NPEing. The column is
        // ANSI-quoted: Spark's JDBC writer creates quoted (exact-case)
        // columns, which an unquoted reference case-folds PAST in
        // case-folding databases (found live against embedded Derby).
        val bounds = spark.read.format("jdbc")
          .option("url", cfg.url)
          .option("dbtable", s"""(SELECT MIN("$pc") lo, MAX("$pc") hi FROM $table) b""")
          .option("user", cfg.user).option("password", cfg.password)
          .load().head()
        if (bounds.isNullAt(0) || bounds.isNullAt(1)) base.load()
        else base.option("partitionColumn", pc)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          .option("numPartitions", numPartitions)
          .load()
      case None => base.load()
    }
  }

  /** Batched append sink (S5; reference `createMany` in chunks of 100,
    * `migrate.ts:58-70`): JDBC batching replaces hand chunking.
    * Duplicate skipping must happen before the write (left_anti against
    * destination keys — see WritePath.skipDuplicatesAppend).
    */
  def writeTable(df: DataFrame, cfg: JdbcConfig, table: String,
                 mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize)
      .mode(mode)
      .save()
}
