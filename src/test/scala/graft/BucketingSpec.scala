package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WritePath

/** Plan-level proof of the 100 TB storage layouts: bucketed joins run
  * shuffle-free; date-partitioned reads prune partitions.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("bucketed-by-key tables sort-merge join without a shuffle") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    WritePath.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    WritePath.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === lineitem.count()) // FK: every line has an order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("date-partitioned history reads prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    WritePath.writeDatePartitioned(ev, dir, "ts")
    val read = spark.read.parquet(dir)
      .filter($"p_date" === "2024-01-01")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("p_date"),
      s"no partition filter:\n$scan")
    // pruned read returns exactly that day's events
    val expect = ev.filter(to_date($"ts") === "2024-01-01").count()
    assert(read.count() === expect && expect > 0)
  }
}
