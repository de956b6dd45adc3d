package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (100 TB posture; SURVEY §4 "salting for
  * skew"). AQE's skew-join handles sort-merge skew automatically at
  * runtime; explicit salting remains the tool for (a) aggregations on
  * power-law keys and (b) joins where one hot key dominates a task.
  */
object Skew {

  /** Salted inner equi-join: the fact side gets a deterministic salt
    * in [0, saltFactor) derived from its other key material (never
    * rand() — reruns must produce identical partitioning); the dim
    * side is replicated saltFactor times. Result equals the plain
    * join, but the hot key's rows spread over saltFactor reduce tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int, saltSource: Column): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val salts = dim.sparkSession.range(saltFactor.toLong)
      .select(col("id").cast("int").as("__salt"))
    val replicated = dim.crossJoin(broadcast(salts))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-level aggregation for power-law group keys: partial aggregate
    * on (key, salt), then final on key. Works for any commutative
    * re-aggregable pair (partialAgg over rows, finalAgg over partials).
    */
  def twoLevelAgg(df: DataFrame, key: String, saltSource: Column,
                  saltFactor: Int,
                  partialAgg: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(partialAgg.head, partialAgg.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
}
