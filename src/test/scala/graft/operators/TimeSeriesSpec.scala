package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // key "a": events in buckets 0, 30, 40 (bucketSec 10) — buckets 10 and
  // 20 are gaps; key "b": a single bucket (no grid beyond itself)
  private lazy val ev = Seq(
    ("a", 1L, 5.0), ("a", 7L, 2.0), ("a", 32L, 4.0), ("a", 45L, 1.0),
    ("b", 100L, 9.0)
  ).toDF("k", "epoch", "v").withColumn("ts", timestamp_seconds(col("epoch")))

  private def cells(fill: String) =
    TimeSeries.gapFill(ev, "ts", Seq("k"), bucketSec = 10L, valueCol = "v",
        how = "sum", fill = fill).get
      .select(col("k"), col("bucket_ts").cast("long").as("b"), col("n"), col("value"))
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("gaps materialize with n=0; zero fill writes 0.0") {
    val got = cells("zero")
    assert(got.size == 5 + 1, s"a spans 5 buckets + b 1: ${got.keys}")
    assert(got(("a", 0L)) == ((2L, Some(7.0))))
    assert(got(("a", 10L)) == ((0L, Some(0.0))))
    assert(got(("a", 20L)) == ((0L, Some(0.0))))
    assert(got(("a", 30L)) == ((1L, Some(4.0))))
    assert(got(("a", 40L)) == ((1L, Some(1.0))))
    assert(got(("b", 100L)) == ((1L, Some(9.0))))
  }

  test("null fill leaves gap values NULL; ffill carries the last sum forward") {
    val nulls = cells("null")
    assert(nulls(("a", 10L)) == ((0L, None)))
    val ff = cells("ffill")
    assert(ff(("a", 10L)) == ((0L, Some(7.0))))
    assert(ff(("a", 20L)) == ((0L, Some(7.0))))
    assert(ff(("a", 30L)) == ((1L, Some(4.0))))
  }

  test("count aggregation and knob validation") {
    val got = TimeSeries.gapFill(ev, "ts", Seq("k"), 10L, "v", how = "count").get
      .filter(col("k") === "a").orderBy("bucket_ts")
      .select("value").as[Double].collect().toSeq
    assert(got == Seq(2.0, 0.0, 0.0, 1.0, 1.0))
    assert(TimeSeries.gapFill(ev, "ts", Seq("k"), 0L, "v").isFailing)
    assert(TimeSeries.gapFill(ev, "ts", Seq(), 10L, "v").isFailing)
    assert(TimeSeries.gapFill(ev, "ts", Seq("k"), 10L, "v", how = "median").isFailing)
    assert(TimeSeries.gapFill(ev, "ts", Seq("k"), 10L, "v", fill = "bfill").isFailing)
  }
}
