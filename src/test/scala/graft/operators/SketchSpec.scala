package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // skewed key distribution: key i appears (101 - i) times, i = 1..100
  private lazy val skewed = (1 to 100).flatMap(i => Seq.fill(101 - i)(i.toLong))
    .zipWithIndex.map { case (k, r) => (k, r.toLong) }
    .toDF("key", "rowid")
    .repartition(8)

  test("bloomSemiJoin equals the exact semi join (long keys)") {
    val small = Seq(3L, 7L, 42L, 99L, 12345L).toDF("sk")
    val got = Sketch.bloomSemiJoin(skewed, small, "key", "sk").get
      .select("key", "rowid").as[(Long, Long)].collect().sorted.toSeq
    val want = skewed.join(small, $"key" === $"sk", "left_semi")
      .select("key", "rowid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("bloomSemiJoin equals the exact semi join (string keys)") {
    val big = Seq.tabulate(500)(i => (s"k${i % 37}", i)).toDF("name", "i")
    val small = Seq("k1", "k5", "k36", "nope").toDF("n2")
    val got = Sketch.bloomSemiJoin(big, small, "name", "n2").get
      .as[(String, Int)].collect().sorted.toSeq
    val want = big.join(small, $"name" === $"n2", "left_semi")
      .as[(String, Int)].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("bloomSemiJoin never drops a true match even at high fpp") {
    val small = (1L to 50L).toDF("sk")
    val got = Sketch.bloomSemiJoin(skewed, small, "key", "sk", fpp = 0.5).get
    val want = skewed.join(small, $"key" === $"sk", "left_semi")
    assert(got.count() == want.count())
  }

  test("bloomSemiJoin rejects unsupported key types") {
    val bad = Seq((1.5, 1)).toDF("d", "i")
    assert(Sketch.bloomSemiJoin(bad, bad, "d", "d").isFailing)
  }

  test("countMinTopK equals the exact top-k on a skewed distribution") {
    val got = Sketch.countMinTopK(skewed, "key", k = 10).get
      .as[(Long, Long)].collect().toSeq
    val want = skewed.groupBy("key").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"key").limit(10)
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.head == ((1L, 100L)))
  }

  test("countMinTopK breaks count ties deterministically by key") {
    val tied = (1 to 20).flatMap(i => Seq.fill(5)(i)).toDF("key").repartition(4)
    val got = Sketch.countMinTopK(tied, "key", k = 7).get
      .as[(Int, Long)].collect().toSeq
    assert(got == (1 to 7).map(i => (i, 5L)))
  }

  test("countMinTopK is exact on near-uniform data across many partitions") {
    // counts differ by at most 1 and every partition sees ~2 rows per
    // key — the shape that defeats per-partition nomination heuristics
    val uniform = (1 to 200).flatMap(i => Seq.fill(30 + i % 2)(i.toLong))
      .toDF("key").repartition(16)
    val got = Sketch.countMinTopK(uniform, "key", k = 10).get
      .as[(Long, Long)].collect().toSeq
    val want = uniform.groupBy("key").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"key").limit(10)
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
    // numeric ordering, not string ordering, breaks count ties
    assert(got.map(_._1) == (1 to 19 by 2).map(_.toLong))
  }

  test("countMinTopK returns empty on empty input") {
    val empty = spark.emptyDataFrame.withColumn("key", lit(1L)).filter(lit(false))
    assert(Sketch.countMinTopK(empty, "key", k = 3).get.count() == 0)
  }

  test("bloomSemiJoin rejects mismatched key hash domains") {
    val big = Seq((1L, "r")).toDF("k", "v")
    val small = Seq("1").toDF("s")
    assert(Sketch.bloomSemiJoin(big, small, "k", "s").isFailing)
  }

  test("bloomSemiJoin with an empty small side returns the (empty) exact result") {
    val empty = Seq.empty[Long].toDF("sk")
    assert(Sketch.bloomSemiJoin(skewed, empty, "key", "sk").get.count() == 0)
    // all-null keys hit the same null-aggregate-buffer path in Spark
    val allNull = Seq[Option[Long]](None, None).toDF("sk")
    assert(Sketch.bloomSemiJoin(skewed, allNull, "key", "sk").get.count() == 0)
  }

  test("hll sketch-merge estimate equals sketching the raw union directly") {
    // per-day sketches of user ids, merged across days, must give the
    // SAME estimate as one sketch over all rows (lossless union)
    val events = (1 to 1000).map(i => (i % 7, (i * 37) % 211)).toDF("day", "user")
    val daily = Sketch.hllSketches(events, Seq("day"), "user").get
    assert(daily.count() == 7)
    val merged = Sketch.hllMergeEstimate(daily, Nil).get
      .as[Long].head()
    val direct = events
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user, 12))")).as[Long].head()
    assert(merged == direct)
    // the estimate is in the right neighborhood of the true 211
    assert(merged > 190 && merged < 232)
  }

  test("countMinTopK works on string keys") {
    val df = Seq.tabulate(300)(i => s"w${i % 13}").toDF("w").repartition(4)
    val got = Sketch.countMinTopK(df, "w", k = 3).get
      .as[(String, Long)].collect().toSeq
    val want = df.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"w").limit(3)
      .as[(String, Long)].collect().toSeq
    assert(got == want)
  }
}
