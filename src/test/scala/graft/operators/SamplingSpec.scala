package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = (
    Seq.tabulate(100)(i => ("en", i.toLong, 10L + i % 7)) ++
      Seq.tabulate(30)(i => ("de", 1000L + i, 20L)) ++
      Seq.tabulate(3)(i => ("fr", 2000L + i, 5L))
    ).toDF("lang", "id", "n_tokens")

  test("fixedPerGroup takes exactly min(n, group size) per group, deterministically") {
    val s1 = Sampling.fixedPerGroup(docs, Seq("lang"), n = 10).get
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 10L, "de" -> 10L, "fr" -> 3L))
    // same seed ⇒ same rows
    val s2 = Sampling.fixedPerGroup(docs, Seq("lang"), n = 10).get
    assert(s1.select("id").as[Long].collect().sorted.toSeq ==
      s2.select("id").as[Long].collect().sorted.toSeq)
    // different seed ⇒ (almost surely) different rows
    val s3 = Sampling.fixedPerGroup(docs, Seq("lang"), n = 10, seed = 7L).get
    assert(s1.select("id").as[Long].collect().sorted.toSeq !=
      s3.select("id").as[Long].collect().sorted.toSeq)
  }

  test("byFractions approximates the requested fractions") {
    val got = Sampling.byFractions(docs, "lang",
      Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.0)).get
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got.getOrElse("de", 0L) == 30L)
    assert(!got.contains("fr"))
    assert(got("en") > 20L && got("en") < 80L)
  }

  test("byTokenBudget stops once the running count crosses the budget") {
    val got = Sampling.byTokenBudget(docs, Seq("lang"), "n_tokens", budget = 100L,
      idCols = Seq("id")).get
    val sums = got.groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum($"n_tokens").as("t"),
        org.apache.spark.sql.functions.count($"id").as("c"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // every group: total - last row < budget ⇒ total < budget + max token count
    assert(sums("en")._1 < 100L + 16L && sums("en")._1 >= 100L)
    assert(sums("de")._1 < 100L + 20L && sums("de")._1 >= 100L)
    assert(sums("fr")._1 == 15L) // whole group under budget
    // at least one row per non-empty group even if a single row exceeds budget
    val fat = Seq(("x", 1L, 1000L)).toDF("lang", "id", "n_tokens")
    assert(Sampling.byTokenBudget(fat, Seq("lang"), "n_tokens", 10L,
      idCols = Seq("id")).get.count() == 1)
  }

  test("byFractionsByHash: deterministic stratified draw, default fraction drops") {
    val a = Sampling.byFractionsByHash(docs, "lang",
      Map("en" -> 0.5, "de" -> 1.0), idCols = Seq("id")).get
    val counts = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("de", 0L) == 30L)      // fraction 1 keeps all
    assert(!counts.contains("fr"))                 // default 0 drops unlisted keys
    assert(counts("en") > 20L && counts("en") < 80L)
    // pure function of the data: layout-invariant, same rows every run
    val ids = a.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.byFractionsByHash(docs.repartition(7), "lang",
      Map("en" -> 0.5, "de" -> 1.0), idCols = Seq("id")).get
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == b)
    assert(Sampling.byFractionsByHash(docs, "lang", Map("en" -> 1.5),
      idCols = Seq("id")).isFailing)
  }

  test("byFractionsByHash: composite (source, lang) strata") {
    val df = docs.withColumn("src",
      concat(lit("s"), pmod(col("id"), lit(2))))
    val got = Sampling.byFractionsByHash(df, Seq("src", "lang"),
      Map(Seq("s0", "en") -> 1.0, Seq("s1", "en") -> 0.0),
      idCols = Seq("id"), salt = "0", defaultFraction = 0.5).get
    val counts = got.groupBy("src", "lang").count()
      .as[(String, String, Long)].collect().map { case (s, l, n) => (s, l) -> n }.toMap
    val all = df.groupBy("src", "lang").count()
      .as[(String, String, Long)].collect().map { case (s, l, n) => (s, l) -> n }.toMap
    assert(counts(("s0", "en")) == all(("s0", "en")))       // fraction 1 keeps the stratum
    assert(!counts.contains(("s1", "en")))                  // fraction 0 drops it
    // unlisted strata draw at the default fraction, same rows every layout
    val ids = got.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.byFractionsByHash(df.repartition(7), Seq("src", "lang"),
      Map(Seq("s0", "en") -> 1.0, Seq("s1", "en") -> 0.0),
      idCols = Seq("id"), salt = "0", defaultFraction = 0.5).get
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == b)
    // the single-key overload IS the one-column composite
    val single = Sampling.byFractionsByHash(df, "lang", Map("en" -> 0.5),
      idCols = Seq("id")).get.select("id").as[Long].collect().sorted.toSeq
    val multi = Sampling.byFractionsByHash(df, Seq("lang"), Map(Seq("en") -> 0.5),
      idCols = Seq("id"), salt = "0", defaultFraction = 0.0).get
      .select("id").as[Long].collect().sorted.toSeq
    assert(single == multi)
    // arity mismatch fails loudly
    assert(Sampling.byFractionsByHash(df, Seq("src", "lang"),
      Map(Seq("en") -> 0.5), idCols = Seq("id"), salt = "0",
      defaultFraction = 0.0).isFailing)
  }

  test("fixedPerGroupByHash: exact quota, partitioning-invariant, salt = fresh draw") {
    val a = Sampling.fixedPerGroupByHash(docs, Seq("lang"), n = 10,
      idCols = Seq("id")).get
    assert(a.groupBy("lang").count().as[(String, Long)].collect().toMap
      .values.forall(_ <= 10L))
    val ids = a.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.fixedPerGroupByHash(docs.repartition(7), Seq("lang"), n = 10,
      idCols = Seq("id")).get.select("id").as[Long].collect().sorted.toSeq
    assert(ids == b, "selection must not depend on physical layout")
    val c = Sampling.fixedPerGroupByHash(docs, Seq("lang"), n = 10,
      idCols = Seq("id"), salt = "fresh").get
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids != c)
  }

  test("temperatureWeights: alpha sweeps from proportional to equalized") {
    // docs: en=100, de=30, fr=3 (133 total)
    val w1 = Sampling.temperatureWeights(docs, Seq("lang"), alpha = 1.0,
      targetRows = 50L).get
      .select("lang", "n", "keep_fraction").as[(String, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // alpha=1 is a plain proportional downsample: same fraction everywhere
    val f = 50.0 / 133.0
    Seq("en", "de", "fr").foreach { l =>
      assert(math.abs(w1(l)._2 - f) < 1e-6, s"$l: ${w1(l)}")
    }
    // alpha=0 aims for equal rows per stratum: fr (3 docs < 50/3 target)
    // caps at 1 and is fully kept; en gets ~16.7/100
    val w0 = Sampling.temperatureWeights(docs, Seq("lang"), alpha = 0.0,
      targetRows = 50L).get
      .select("lang", "keep_fraction").as[(String, Double)].collect().toMap
    assert(w0("fr") == 1.0)
    assert(math.abs(w0("en") - 50.0 / 3 / 100) < 1e-6)
    // shares sum to 1
    val shareSum = Sampling.temperatureWeights(docs, Seq("lang"), alpha = 0.5,
      targetRows = 50L).get.agg(sum("share")).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-5)
  }

  test("byTemperature: deterministic mixture sample near the target size") {
    val got = Sampling.byTemperature(docs, Seq("lang"), alpha = 0.5,
      targetRows = 60L, idCols = Seq("id")).get
    val n = got.count()
    assert(n > 30 && n < 90, s"realized $n for target 60") // Bernoulli noise band
    // capped stratum (fr at alpha 0) is fully kept
    val eq = Sampling.byTemperature(docs, Seq("lang"), alpha = 0.0,
      targetRows = 60L, idCols = Seq("id")).get
    assert(eq.filter($"lang" === "fr").count() == 3)
    // pure function of the data: layout-invariant
    val a = got.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.byTemperature(docs.repartition(7), Seq("lang"), alpha = 0.5,
      targetRows = 60L, idCols = Seq("id")).get
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // the schema passes through unchanged (no helper columns leak)
    assert(got.columns.toSeq == docs.columns.toSeq)
  }

  test("byTokenBudget selection is a pure function of the data (partitioning-invariant)") {
    val a = Sampling.byTokenBudget(docs, Seq("lang"), "n_tokens", 100L,
      idCols = Seq("id")).get.select("id").as[Long].collect().sorted.toSeq
    // same data, different physical layout ⇒ SAME rows (rand(seed) fails this)
    val b = Sampling.byTokenBudget(docs.repartition(7), Seq("lang"), "n_tokens", 100L,
      idCols = Seq("id")).get.select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // a different salt is an independent draw
    val c = Sampling.byTokenBudget(docs, Seq("lang"), "n_tokens", 100L,
      idCols = Seq("id"), salt = "fresh").get
      .select("id").as[Long].collect().sorted.toSeq
    assert(a != c)
  }

  test("shardByTokenBudget assigns contiguous shards by exclusive running sum") {
    val rows = Seq((1L, 40L), (2L, 40L), (3L, 40L), (4L, 40L), (5L, 200L), (6L, 1L))
      .toDF("id", "n_tokens")
    val got = Sampling.shardByTokenBudget(rows, "id", "n_tokens", budget = 100L).get
      .select("id", "shard_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // exclusive cumsum: 0,40,80,120,160,360 -> /100 -> 0,0,0,1,1,3
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 3L)))
    // within groups, sharding restarts per key
    val grouped = Seq(("a", 1L, 60L), ("a", 2L, 60L), ("b", 1L, 60L))
      .toDF("k", "id", "n_tokens")
    val g = Sampling.shardByTokenBudget(grouped, "id", "n_tokens", 100L, keys = Seq("k")).get
      .select("k", "id", "shard_id").as[(String, Long, Long)].collect().toSet
    assert(g == Set(("a", 1L, 0L), ("a", 2L, 0L), ("b", 1L, 0L)))
  }

  test("shardByTokenBudget treats null token counts as zero") {
    val rows = Seq((1L, Some(60L)), (2L, None), (3L, Some(60L)))
      .toDF("id", "n_tokens")
    val got = Sampling.shardByTokenBudget(rows, "id", "n_tokens", budget = 100L).get
      .select("id", "shard_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // exclusive cumsum 0, 60, 60 -> shards 0, 0, 0 (null consumed nothing)
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("splitByHash is content-stable, complete, and roughly proportioned") {
    val ids = (1 to 2000).map(_.toLong).toDF("id")
    val s1 = Sampling.splitByHash(ids, Seq("id"), Seq(0.8, 0.1, 0.1)).get
      .as[(Long, String)].collect().toMap
    // same keys -> same labels, independent of partitioning or extra rows
    val s2 = Sampling.splitByHash(ids.repartition(7).limit(2000), Seq("id"),
      Seq(0.8, 0.1, 0.1)).get.as[(Long, String)].collect().toMap
    assert(s1 == s2)
    // growth: adding rows never moves an existing key's split
    val grown = (1 to 3000).map(_.toLong).toDF("id")
    val s3 = Sampling.splitByHash(grown, Seq("id"), Seq(0.8, 0.1, 0.1)).get
      .as[(Long, String)].collect().toMap
    assert(s1.forall { case (k, v) => s3(k) == v })
    // complete labeling with roughly the requested proportions
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("val") > 120 && counts("test") > 120)
    // different seed reshuffles
    val s4 = Sampling.splitByHash(ids, Seq("id"), Seq(0.8, 0.1, 0.1), seed = 7L).get
      .as[(Long, String)].collect().toMap
    assert(s1 != s4)
  }

  test("mixBySource replicates whole epochs exactly and drops zero-weight sources") {
    val df = (
      (1 to 100).map(i => (i.toLong, "wiki")) ++
        (101 to 200).map(i => (i.toLong, "web")) ++
        (201 to 300).map(i => (i.toLong, "spam"))
      ).toDF("id", "source")
    val out = Sampling.mixBySource(df, "source", "id",
      weights = Map("wiki" -> 2.0, "spam" -> 0.0)).get
    val bySource = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource == Map("wiki" -> 200L, "web" -> 100L)) // 2 epochs, 1 epoch, dropped
    // epoch indices are exactly 0..w-1 per kept source
    assert(out.filter($"source" === "wiki").select("epoch").distinct()
      .as[Int].collect().sorted.toSeq == Seq(0, 1))
  }

  test("mixBySource fractional epochs are deterministic and near the expected rate") {
    val df = (1 to 2000).map(i => (i.toLong, "web")).toDF("id", "source")
    val out1 = Sampling.mixBySource(df, "source", "id", weights = Map("web" -> 1.5)).get
      .select("id", "epoch").as[(Long, Int)].collect().toSet
    val out2 = Sampling.mixBySource(df, "source", "id", weights = Map("web" -> 1.5)).get
      .select("id", "epoch").as[(Long, Int)].collect().toSet
    assert(out1 == out2, "fractional keep must be a pure function, not RNG")
    val extra = out1.count(_._2 == 1)
    assert(extra > 850 && extra < 1150, s"~50% of 2000 expected in the fractional epoch, got $extra")
    assert(out1.count(_._2 == 0) == 2000, "epoch 0 must keep every row")
  }

  test("mixBySource rejects weights outside [0, 100]") {
    val df = Seq((1L, "a")).toDF("id", "source")
    assert(Sampling.mixBySource(df, "source", "id", Map("a" -> -0.1)) match {
      case graft.functional.Fail(e) => e.getMessage.contains("weights")
      case _                        => false
    })
  }

  test("shuffleKey is deterministic per seed, collision-free here, and partition-stable") {
    val df = (1 to 1000).map(_.toLong).toDF("id")
    val k1 = Sampling.shuffleKey(df, Seq("id"), seed = "a").get
      .select("id", "shuffle_key").as[(Long, Long)].collect().toMap
    val k2 = Sampling.shuffleKey(df.repartition(13), Seq("id"), seed = "a").get
      .select("id", "shuffle_key").as[(Long, Long)].collect().toMap
    assert(k1 == k2)
    assert(k1.values.toSet.size == 1000, "60-bit keys should not collide at n=1000")
    assert(k1.values.forall(_ >= 0L), "keys must stay positive (15 hex chars = 60 bits)")
    val k3 = Sampling.shuffleKey(df, Seq("id"), seed = "b").get
      .select("id", "shuffle_key").as[(Long, Long)].collect().toMap
    assert(k1 != k3, "different seed must give an independent order")
  }

  test("null key values hash as a sentinel instead of null-poisoning") {
    val df = Seq((Some(1L), "web"), (None, "web"), (Some(3L), "web"))
      .toDF("id", "source")
    val keys = Sampling.shuffleKey(df, Seq("id")).get
      .select("shuffle_key").as[Long].collect()
    assert(keys.length == 3 && keys.distinct.length == 3,
      "null key must produce a real (distinct) shuffle key, not null")
    // the fractional-epoch decision must also be non-null for null ids:
    // with w=0.5 every row either keeps or drops deterministically,
    // and reruns agree
    val m1 = Sampling.mixBySource(df, "source", "id", Map("web" -> 0.5)).get.count()
    val m2 = Sampling.mixBySource(df, "source", "id", Map("web" -> 0.5)).get.count()
    assert(m1 == m2)
  }

  test("packByTokenBudget next-fits in order, never splitting a document") {
    val df = Seq(
      ("en", 1L, 40L), ("en", 2L, 50L), ("en", 3L, 20L), // 40+50 fits; +20 overflows
      ("en", 4L, 90L),                                   // 20+90 overflows -> bin 2
      ("de", 5L, 10L), ("de", 6L, 10L)                   // separate group restarts at 0
    ).toDF("lang", "doc_id", "n")
    val got = Sampling.packByTokenBudget(df, "doc_id", "n", capacity = 100L,
        groupCols = Seq("lang")).get
      .orderBy("lang", "doc_id")
      .select("lang", "doc_id", "n_tokens", "bin_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("de", 5L, 10L, 0L), ("de", 6L, 10L, 0L),
      ("en", 1L, 40L, 0L), ("en", 2L, 50L, 0L), ("en", 3L, 20L, 1L), ("en", 4L, 90L, 2L)))
  }

  test("packByTokenBudget: oversize and null counts get their own well-defined bins") {
    val df = Seq(
      ("s", 1L, Some(250L)), // > capacity: bin of its own
      ("s", 2L, Some(30L)),  // 250+30 overflows -> bin 1
      ("s", 3L, None),       // null packs as 0, stays in bin 1
      ("s", 4L, Some(80L))   // 30+0+80 overflows -> bin 2
    ).toDF("g", "id", "n")
    val got = Sampling.packByTokenBudget(df, "id", "n", capacity = 100L,
        groupCols = Seq("g")).get
      .orderBy("id").select("id", "n_tokens", "bin_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 250L, 0L), (2L, 30L, 1L), (3L, 0L, 1L), (4L, 80L, 2L)))
  }

  test("packByTokenBudget never exceeds capacity except for single oversize documents") {
    val df = (1 to 500).map(i => ("g" + (i % 5), i.toLong, (i % 97).toLong))
      .toDF("g", "id", "n")
    val bins = Sampling.packByTokenBudget(df, "id", "n", capacity = 150L,
        groupCols = Seq("g")).get
      .groupBy("g", "bin_id")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("tot"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .as[(String, Long, Long, Long)].collect()
    assert(bins.forall { case (_, _, tot, cnt) => tot <= 150L || cnt == 1L })
  }

  test("packByTokenBudget rejects an empty group list and bad capacity") {
    val df = Seq(("a", 1L, 1L)).toDF("g", "id", "n")
    assert(Sampling.packByTokenBudget(df, "id", "n", 0L, Seq("g")) match {
      case graft.functional.Fail(e) => e.getMessage.contains("capacity")
      case _                        => false
    })
    assert(Sampling.packByTokenBudget(df, "id", "n", 10L, Nil) match {
      case graft.functional.Fail(e) => e.getMessage.contains("group")
      case _                        => false
    })
  }

  test("weightedByHash: deterministic, k respected, bad weights excluded") {
    val df = (1L to 100L).map(i => (i, "s" + (i % 4), i.toDouble))
      .toDF("id", "src", "w")
    val a = Sampling.weightedByHash(df, Seq("id"), "w", k = 10).get
      .select("id", "sample_rank").as[(Long, Int)].collect().toSet
    val b = Sampling.weightedByHash(df, Seq("id"), "w", k = 10).get
      .select("id", "sample_rank").as[(Long, Int)].collect().toSet
    assert(a == b && a.size == 10)
    assert(a.map(_._2) == (1 to 10).toSet)
    // a row with overwhelming weight is drawn first: key = -ln(u)/w -> 0
    val heavy = df.union(Seq((999L, "sX", 1e12)).toDF("id", "src", "w"))
    val top = Sampling.weightedByHash(heavy, Seq("id"), "w", k = 1).get
      .select("id").as[Long].head()
    assert(top == 999L)
    // null / non-positive weights never selected
    val mixed = Seq((1L, Some(5.0)), (2L, None), (3L, Some(0.0)),
      (4L, Some(-1.0)), (5L, Some(2.0))).toDF("id", "w")
    val got = Sampling.weightedByHash(mixed, Seq("id"), "w", k = 10).get
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 5L))
    // stratified path: k per stratum, ranks restart
    val strat = Sampling.weightedByHash(df, Seq("id"), "w", k = 3,
        strataCols = Seq("src")).get
      .select("src", "sample_rank").as[(String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(strat.keySet == Set("s0", "s1", "s2", "s3"))
    assert(strat.values.forall(_ == Seq(1, 2, 3)))
  }

  test("weightedByHash favors heavier rows across seeds (A-ES law)") {
    // 50/50 split of weights 9:1 -> heavy half should dominate the
    // sample across many independent seeds
    val df = (1L to 200L).map(i =>
      (i, if (i <= 100) 9.0 else 1.0)).toDF("id", "w")
    val heavyShare = (1 to 20).map { s =>
      Sampling.weightedByHash(df, Seq("id"), "w", k = 20,
          seed = s"seed$s").get
        .select("id").as[Long].collect().count(_ <= 100)
    }.sum / (20.0 * 20.0)
    assert(heavyShare > 0.75 && heavyShare < 1.0,
      s"heavy-weight share $heavyShare should be near 0.9")
  }

  test("kfoldByHash: stable folds in range; groupCols keep groups together") {
    val df = (1L to 200L).map(i => (i, i % 7)).toDF("id", "grp")
    val folds = Sampling.kfoldByHash(df, k = 5, idCols = Seq("id")).get
      .select("id", "fold").as[(Long, Int)].collect().toMap
    assert(folds.values.forall(f => f >= 0 && f < 5))
    assert(folds.values.toSet.size == 5) // all folds populated at n=200
    // rerun identical
    val again = Sampling.kfoldByHash(df, k = 5, idCols = Seq("id")).get
      .select("id", "fold").as[(Long, Int)].collect().toMap
    assert(folds == again)
    // grouped form: one fold per group
    val grouped = Sampling.kfoldByHash(df, k = 3, idCols = Seq("id"),
        groupCols = Seq("grp")).get
      .select("grp", "fold").distinct().as[(Long, Int)].collect()
    assert(grouped.length == 7) // each group maps to exactly one fold
    assert(Sampling.kfoldByHash(df, k = 1, idCols = Seq("id")).isFailing)
  }

  test("negativeSample: ratio-coupled budget, deterministic, all positives kept") {
    val df = (1L to 100L).map(i => (i, i <= 10)).toDF("id", "label")
    val got = Sampling.negativeSample(df, "label", ratio = 2.0,
      idCols = Seq("id")).get.as[(Long, Boolean)].collect()
    assert(got.count(_._2) == 10)          // every positive kept
    assert(got.count(!_._2) == 20)         // ceil(2.0 * 10) negatives
    // rerun draws the SAME negatives
    val again = Sampling.negativeSample(df, "label", ratio = 2.0,
      idCols = Seq("id")).get.as[(Long, Boolean)].collect()
    assert(got.map(_._1).sorted.toSeq == again.map(_._1).sorted.toSeq)
    // fractional budgets round up; NULL labels are negatives
    val withNull = df.union(Seq((200L, null.asInstanceOf[java.lang.Boolean]))
      .toDF("id", "label"))
    val g2 = Sampling.negativeSample(withNull, "label", ratio = 0.15,
      idCols = Seq("id")).get.count()
    assert(g2 == 10 + 2)                   // ceil(1.5) = 2
  }

  test("weightDiagnostics: hand-computed ESS; equal weights give " +
      "ESS = n; non-positive weights excluded; empty input NULLs") {
    def r6(v: Double) = math.rint((v + 1e-9) * 1e6) / 1e6
    // w = [1, 1, 2]: sw=4 sw2=6 → ess=16/6, frac=16/18, share=.5,
    // cv = sqrt(3·6/16 − 1) = sqrt(0.125)
    val df = Seq(1.0, 1.0, 2.0, -5.0, 0.0).map(Tuple1(_)).toDF("w")
    val r = Sampling.weightDiagnostics(df, "w").get
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r == ((3L, r6(16.0 / 6), r6(16.0 / 6 / 3), r6(0.5),
      r6(math.sqrt(0.125)))))
    val eq = Sampling.weightDiagnostics(
      Seq.fill(8)(Tuple1(3.0)).toDF("w"), "w").get
      .as[(Long, Double, Double, Double, Double)].head()
    assert(eq._1 == 8L && eq._2 == 8.0 && eq._3 == 1.0 && eq._5 == 0.0)
    val empty = Sampling.weightDiagnostics(
      Seq(Tuple1(-1.0)).toDF("w"), "w").get.collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }

  private def rowsFor(counts: Map[String, Int]) =
    counts.toSeq.flatMap { case (k, n) =>
      (1 to n).map(i => (k, s"$k-$i"))
    }.toDF("dom", "id")

  test("waterfillCaps: hand-computed level, remainder to largest keys, " +
      "exact-budget law") {
    // {a:1, b:3, c:6}, B=7: level search keeps a, b whole; λ=3 caps c
    val caps1 = Sampling.waterfillCaps(
      rowsFor(Map("a" -> 1, "b" -> 3, "c" -> 6)), "dom", 7L).get
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(caps1 == Map("a" -> 1L, "b" -> 3L, "c" -> 3L))
    // {a:5, b:5, c:5}, B=7: λ=2, remainder 1 goes to the LARGEST
    // (n, key) — c
    val caps2 = Sampling.waterfillCaps(
      rowsFor(Map("a" -> 5, "b" -> 5, "c" -> 5)), "dom", 7L).get
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(caps2 == Map("a" -> 2L, "b" -> 2L, "c" -> 3L))
    // budget >= total keeps everything; budget 0 keeps nothing
    val all = Sampling.waterfillCaps(
      rowsFor(Map("a" -> 2, "b" -> 4)), "dom", 100L).get
      .as[(String, Long, Long)].collect()
    assert(all.forall(r => r._3 == r._2))
    val none = Sampling.waterfillCaps(
      rowsFor(Map("a" -> 2, "b" -> 4)), "dom", 0L).get
      .as[(String, Long, Long)].collect()
    assert(none.forall(_._3 == 0L))
    assert(Sampling.waterfillCaps(docs, "lang", -1L).isFailing)
  }

  test("waterfillCaps laws on random grids: Σcap == min(B, Σn), " +
      "cap ≤ n, monotone in n") {
    val rnd = new scala.util.Random(3L)
    for (trial <- 1 to 5) {
      val counts = (1 to 12).map(i => s"d$i" -> (1 + rnd.nextInt(30))).toMap
      val total = counts.values.sum.toLong
      val b = rnd.nextInt(2 * total.toInt).toLong
      val caps = Sampling.waterfillCaps(rowsFor(counts), "dom", b).get
        .as[(String, Long, Long)].collect()
      assert(caps.map(_._3).sum == math.min(b, total), s"trial $trial b=$b")
      assert(caps.forall(r => r._3 <= r._2 && r._3 >= 0))
      val byN = caps.sortBy(r => (r._2, r._1)).map(_._3)
      assert(byN.zip(byN.tail).forall { case (x, y) => x <= y },
        s"caps must be monotone in (n, key): ${caps.toSeq}")
    }
  }

  test("waterfillSample: per-key kept == cap, hash-order prefix, " +
      "repartition-invariant") {
    val df = rowsFor(Map("a" -> 8, "b" -> 3, "c" -> 5))
    val caps = Sampling.waterfillCaps(df, "dom", 10L).get
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val kept = Sampling.waterfillSample(df, "dom", 10L,
      idCols = Seq("id"), salt = "s1").get
    val byKey = kept.groupBy("dom").count()
      .as[(String, Long)].collect().toMap
    assert(byKey.filter(_._2 > 0) == caps.filter(_._2 > 0))
    assert(kept.count() == 10L)
    // the kept set per key is the cap-prefix of the SAME hash order
    // fixedPerGroupByHash uses
    val viaQuota = Sampling.fixedPerGroupByHash(
        df.filter($"dom" === "a"), Seq("dom"), caps("a").toInt,
        idCols = Seq("id"), salt = "s1").get
      .select("id").as[String].collect().toSet
    assert(kept.filter($"dom" === "a").select("id").as[String]
      .collect().toSet == viaQuota)
    val repart = Sampling.waterfillSample(df.repartition(7), "dom", 10L,
      idCols = Seq("id"), salt = "s1").get
      .select("id").as[String].collect().toSet
    assert(repart == kept.select("id").as[String].collect().toSet)
    assert(Sampling.waterfillSample(df, "dom", 10L, Seq.empty).isFailing)
  }

  // --- temperatureAllocate -----------------------------------------------

  test("temperatureAllocate: sqrt weights, exact budget, tail upsampled") {
    // counts 100 / 25 / 4 -> weights 10000 / 5000 / 2000
    val df = (Seq.fill(100)("big") ++ Seq.fill(25)("mid") ++
      Seq.fill(4)("tiny")).toDF("src")
    val got = Sampling.temperatureAllocate(df, "src", budget = 100L).get
      .select("key", "n", "weight", "alloc")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("big")._3 == 10000L && got("mid")._3 == 5000L &&
      got("tiny")._3 == 2000L)
    // exact largest-remainder: base = (100*w) div 17000 -> 58/29/11,
    // sum 98, remainders 14000/7000/13000 -> big, tiny get +1
    assert(got("big")._4 == 59L && got("mid")._4 == 29L &&
      got("tiny")._4 == 12L)
    assert(got.values.map(_._4).sum == 100L)
    // the tail is up-sampled relative to its share: 12/4 = 3 epochs
    // vs 59/100 for the head
    assert(got("tiny")._4 * got("big")._2 > got("big")._4 * got("tiny")._2)
  }

  test("temperatureAllocate: alpha = 1 is proportional, budget law holds") {
    val rnd = new scala.util.Random(17L)
    val df = Seq.tabulate(5000)(_ => s"s${rnd.nextInt(13)}").toDF("src")
    for (b <- Seq(0L, 1L, 777L, 5000L, 12345L)) {
      val a = Sampling.temperatureAllocate(df, "src", b, alpha = 1.0).get
        .agg(org.apache.spark.sql.functions.sum("alloc")).head().getLong(0)
      assert(a == b, s"sum(alloc)=$a != budget=$b")
    }
    assert(Sampling.temperatureAllocate(df, "src", -1L).isFailing)
    assert(Sampling.temperatureAllocate(df, "src", 1L, alpha = 0.0).isFailing)
    assert(Sampling.temperatureAllocate(df, "src", 1L, alpha = 1.5).isFailing)
  }
}
