package graft.physical

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** `Write.bucketedTable` is the pre-partitioning story for repeatedly
  * joined fact tables — this spec actually EXECUTES it (write through the
  * catalog, read back, join) and asserts the whole point: two tables
  * bucketed the same way join with NO shuffle on either side. */
class BucketedTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("co-located join of same-bucketed tables runs shuffle-free") {
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    Write.bucketedTable(left, "graft_bkt_left", Seq("k"), numBuckets = 8,
      sortBy = Seq("k"), overwrite = true).get
    Write.bucketedTable(right, "graft_bkt_right", Seq("k"), numBuckets = 8,
      sortBy = Seq("k"), overwrite = true).get
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucket metadata is what saves
      // the shuffle, not a BroadcastExchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 500)
      assert(joined.filter($"k" === 42L).select($"lv", $"rv")
        .as[(String, Double)].head() == ("l42", 84.0))
      // bucket pruning metadata survived the catalog round-trip
      val buckets = spark.catalog.listColumns("graft_bkt_left")
        .filter(col("isBucket")).count()
      assert(buckets == 1)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }
}
