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

  test("ddHistogram: three-store bucket map on hand-computed values; " +
      "nulls and NaN drop") {
    val alpha = 0.5 // γ = 3: buckets are (3^(b-1), 3^b]
    val df = Seq[java.lang.Double](1.0, 3.0, 3.1, 9.0, -3.0, -10.0, 0.0,
        null, Double.NaN)
      .toDF("v")
    val h = Sketch.ddHistogram(df, "v", alpha).get
      .as[(Int, Long, Long)].collect()
      .map { case (s, b, n) => (s, b) -> n }.toMap
    // ln1/ln3=0 → b=0; ln3/ln3=1 → b=1; 3.1 → b=2; 9 → b=2 (ceil(2)=2);
    // -3 → (-1,1); -10 → (-1,3); 0 → (0,0); null/NaN dropped
    assert(h == Map((1, 0L) -> 1L, (1, 1L) -> 1L, (1, 2L) -> 2L,
      (-1, 1L) -> 1L, (-1, 3L) -> 1L, (0, 0L) -> 1L), s"$h")
  }

  test("ddQuantiles: estimates within alpha relative error of exact " +
      "quantiles; negatives and zero ordered correctly") {
    val rnd = new scala.util.Random(7L)
    val vals = Seq.tabulate(5000)(i =>
      if (i % 50 == 0) 0.0
      else if (i % 3 == 0) -(rnd.nextDouble() * 900 + 1)
      else rnd.nextDouble() * 12000 + 0.5)
    val df = vals.toDF("v")
    val alpha = 0.02
    val qs = Seq(0.01, 0.1, 0.5, 0.9, 0.99)
    val est = Sketch.ddQuantiles(df, "v", qs, alpha).get
      .as[(Double, Double)].collect().toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val exact = sorted(math.floor(q * (vals.size - 1)).toInt)
      val e = est(q)
      assert(math.abs(e - exact) <= alpha * math.abs(exact) + 1e-9,
        s"q=$q est=$e exact=$exact exceeds alpha=$alpha")
    }
  }

  test("ddHistogram merge: sharded histograms re-aggregate to the " +
      "one-shot quantiles exactly (associativity), keys respected") {
    val rnd = new scala.util.Random(11L)
    val rows = Seq.tabulate(3000)(i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextDouble() * 1000 - 200))
    val df = rows.toDF("k", "v")
    val qs = Seq(0.1, 0.5, 0.9)
    val oneShot = Sketch.ddQuantiles(df, "v", qs, keys = Seq("k")).get
      .as[(String, Double, Double)].collect().toSet
    // three arbitrary shards, histogram each, UNION the histogram rows —
    // ddQuantilesFromHistogram's groupBy-sum is the merge
    val shards = Seq(
      df.filter($"v" < -50), df.filter($"v" >= -50 && $"v" < 400),
      df.filter($"v" >= 400))
    val merged = shards.map(s =>
        Sketch.ddHistogram(s, "v", keys = Seq("k")).get)
      .reduce(_ unionByName _)
    val viaMerge = Sketch.ddQuantilesFromHistogram(merged, qs,
        keys = Seq("k")).get
      .as[(String, Double, Double)].collect().toSet
    assert(viaMerge == oneShot,
      s"merged-shard quantiles diverged: $viaMerge vs $oneShot")
  }

  test("ddHistogram collapse: maxBuckets bounds the rows and preserves " +
      "high quantiles") {
    val rnd = new scala.util.Random(13L)
    val df = Seq.tabulate(4000)(_ => rnd.nextDouble() * 50000 + 1).toDF("v")
    val full = Sketch.ddHistogram(df, "v", alpha = 0.005).get
    val nFull = full.count()
    val capped = Sketch.ddHistogram(df, "v", alpha = 0.005,
      maxBuckets = 40).get
    assert(nFull > 40 && capped.count() == 40,
      s"collapse must cap rows: full=$nFull capped=${capped.count()}")
    // counts are conserved by the collapse
    assert(capped.agg(sum("n")).head().getLong(0) ==
      full.agg(sum("n")).head().getLong(0))
    // the top of the order is untouched → p99 identical to uncollapsed
    val q99Full = Sketch.ddQuantilesFromHistogram(full, Seq(0.99),
      alpha = 0.005).get.as[(Double, Double)].collect().head._2
    val q99Capped = Sketch.ddQuantilesFromHistogram(capped, Seq(0.99),
      alpha = 0.005).get.as[(Double, Double)].collect().head._2
    assert(q99Full == q99Capped,
      s"collapse disturbed the high quantile: $q99Capped vs $q99Full")
  }

  test("ddQuantiles validates knobs") {
    val df = Seq(1.0, 2.0).toDF("v")
    assert(Sketch.ddQuantiles(df, "v", Seq(0.5), alpha = 0.0).isFailing)
    assert(Sketch.ddQuantiles(df, "v", Seq(0.5), alpha = 1.0).isFailing)
    assert(Sketch.ddQuantiles(df, "v", Seq(1.5)).isFailing)
    assert(Sketch.ddQuantiles(df, "v", Nil).isFailing)
    assert(Sketch.ddHistogram(df, "v", maxBuckets = -1).isFailing)
  }

  // --- KMV -------------------------------------------------------------

  // two coarse groups ("a", "b") split over a finer sub-key, with a
  // planted overlap: group a holds 1..6000, group b holds 3001..9000
  private lazy val kmvData = (
    (1 to 6000).map(v => ("a", (v % 3).toString, v.toLong)) ++
      (3001 to 9000).map(v => ("b", (v % 3).toString, v.toLong))
  ).toDF("g", "sub", "v").repartition(8)

  test("kmv merge of finer sketches equals the direct coarse build") {
    val fine = Sketch.kmvSketches(kmvData, Seq("g", "sub"), "v", k = 256).get
    val direct = Sketch.kmvSketches(kmvData, Seq("g"), "v", k = 256).get
    val merged = Sketch.kmvMergeEstimate(fine, Seq("g"), k = 256).get
      .as[(String, Int, Double)].collect().sorted.toSeq
    val identity = Sketch.kmvMergeEstimate(direct, Seq("g"), k = 256).get
      .as[(String, Int, Double)].collect().sorted.toSeq
    assert(merged == identity && merged.size == 2)
  }

  test("kmv estimate is exact below k and within 4 sigma above it") {
    val est = Sketch.kmvMergeEstimate(
      Sketch.kmvSketches(kmvData, Seq("g"), "v", k = 256).get,
      Seq("g"), k = 256).get
      .as[(String, Int, Double)].collect()
      .map { case (g, n, e) => (g, (n, e)) }.toMap
    val small = Seq.tabulate(100)(i => ("s", i.toLong)).toDF("g", "v")
    val exactSmall = Sketch.kmvMergeEstimate(
      Sketch.kmvSketches(small, Seq("g"), "v", k = 256).get,
      Seq("g"), k = 256).get.as[(String, Int, Double)].collect().head
    assert(exactSmall._2 == 100 && exactSmall._3 == 100.0)
    // 6000 distinct per group, k=256: rel. std err ~ 1/sqrt(254) = 6.3%
    val eA = est("a")._2
    assert(math.abs(eA - 6000.0) / 6000.0 < 0.25, s"estimate drifted: $eA")
  }

  test("kmvOverlap estimates the planted Jaccard and is exact below k") {
    val sk = Sketch.kmvSketches(kmvData, Seq("g"), "v", k = 256).get
    val ov = Sketch.kmvOverlap(sk, "g", k = 256).get
      .select("key_a", "key_b", "jaccard_approx", "intersect_approx")
      .as[(String, String, Double, Double)].collect().head
    // truth: |A ∩ B| = 3000, |A ∪ B| = 9000, J = 1/3
    assert(ov._1 == "a" && ov._2 == "b")
    assert(math.abs(ov._3 - 1.0 / 3.0) < 0.15, s"jaccard drifted: ${ov._3}")
    assert(math.abs(ov._4 - 3000.0) / 3000.0 < 0.45,
      s"intersection drifted: ${ov._4}")
    // below k everything is exact: 40 shared of 60/60-element sets
    val tiny = ((1 to 60).map(v => ("x", v.toLong)) ++
      (21 to 80).map(v => ("y", v.toLong))).toDF("g", "v")
    val tsk = Sketch.kmvSketches(tiny, Seq("g"), "v", k = 256).get
    val tov = Sketch.kmvOverlap(tsk, "g", k = 256).get
      .select("n_union_kmv", "matches", "union_approx", "jaccard_approx",
        "intersect_approx")
      .as[(Int, Long, Double, Double, Double)].collect().head
    assert(tov == ((80, 40L, 80.0, 0.5, 40.0)))
  }

  test("kmv sketches are partitioning-invariant") {
    val one = Sketch.kmvSketches(kmvData.repartition(1), Seq("g"), "v",
      k = 64).get.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    val many = Sketch.kmvSketches(kmvData.repartition(13), Seq("g"), "v",
      k = 64).get.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(one == many && one.forall(_._2.size == 64))
  }

  test("kmv validates knobs") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    assert(Sketch.kmvSketches(df, Nil, "v").isFailing)
    assert(Sketch.kmvSketches(df, Seq("g"), "v", k = 1).isFailing)
    assert(Sketch.kmvMergeEstimate(df.withColumn("kmv", array(lit(1L))),
      Seq("g"), k = 1).isFailing)
  }

  // --- persistence round trips (VERDICT r11 ask #6) -----------------------
  // the 100 TB profile algebra stores sketches per shard/snapshot and
  // re-merges across sessions: write to parquet, read back in a FRESH
  // session, merge — must equal the never-persisted path exactly.

  private def roundTrip(df: org.apache.spark.sql.DataFrame, tag: String) = {
    val path = java.nio.file.Files
      .createTempDirectory(s"graft_rt_$tag").toString
    df.write.mode("overwrite").parquet(path)
    spark.newSession().read.parquet(path)
  }

  test("kmv sketches survive a parquet round trip in a fresh session " +
      "bit-for-bit") {
    val rows = Seq.tabulate(3000)(i => (s"g${i % 3}", s"sub${i % 7}",
      (i % 531).toLong)).toDF("g", "sub", "v")
    val sk = Sketch.kmvSketches(rows, Seq("g", "sub"), "v", k = 32).get
    val direct = Sketch.kmvMergeEstimate(sk, Seq("g"), k = 32).get
      .as[(String, Int, Double)].collect().toSet
    val loaded = Sketch.kmvMergeEstimate(roundTrip(sk, "kmv"),
        Seq("g"), k = 32).get
      .as[(String, Int, Double)].collect().toSet
    assert(loaded == direct, s"persisted KMV diverged: $loaded vs $direct")
  }

  test("ddHistogram bucket counts survive a parquet round trip in a " +
      "fresh session bit-for-bit") {
    val rnd = new scala.util.Random(43L)
    val rows = Seq.tabulate(2000)(i =>
      (s"k${i % 4}", i % 5, rnd.nextDouble() * 800 - 80))
      .toDF("k", "shard", "v")
    val hist = Sketch.ddHistogram(rows, "v", alpha = 0.05,
      keys = Seq("k", "shard")).get
    val direct = Sketch.ddQuantilesFromHistogram(hist.drop("shard"),
        Seq(0.1, 0.5, 0.99), alpha = 0.05, keys = Seq("k")).get
      .as[(String, Double, Double)].collect().toSet
    val loaded = Sketch.ddQuantilesFromHistogram(
        roundTrip(hist, "dd").drop("shard"),
        Seq(0.1, 0.5, 0.99), alpha = 0.05, keys = Seq("k")).get
      .as[(String, Double, Double)].collect().toSet
    assert(loaded == direct, s"persisted DD diverged: $loaded vs $direct")
  }

  test("hll binary sketches survive a parquet round trip in a fresh " +
      "session with identical estimates") {
    val rows = Seq.tabulate(5000)(i => (s"t${i % 3}", i % 11,
      s"user${i % 997}")).toDF("t", "day", "u")
    val sk = Sketch.hllSketches(rows, Seq("t", "day"), "u").get
    val direct = Sketch.hllMergeEstimate(sk, Seq("t")).get
      .as[(String, Double)].collect().toSet
    val loaded = Sketch.hllMergeEstimate(roundTrip(sk, "hll"),
        Seq("t")).get
      .as[(String, Double)].collect().toSet
    assert(loaded == direct, s"persisted HLL diverged: $loaded vs $direct")
  }
}
