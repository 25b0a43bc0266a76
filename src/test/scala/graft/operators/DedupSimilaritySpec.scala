package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.VectorFunctions._

class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // 0 and 1 are exact dups; 2 is a near-dup of 0 (one token changed);
  // 3 and 4 are unrelated.
  private lazy val docs = Seq(
    (0L, (1 to 50).map(i => s"w$i").mkString(" ")),
    (1L, (1 to 50).map(i => s"w$i").mkString(" ")),
    (2L, ((1 to 49).map(i => s"w$i") :+ "CHANGED").mkString(" ")),
    (3L, (1 to 50).map(i => s"unrelated$i").mkString(" ")),
    (4L, "tiny doc")
  ).toDF("doc_id", "text")

  test("Dedup.exact keeps lowest-id representative per duplicate group") {
    val kept = Dedup.exact(docs, Seq("text"), "doc_id").get
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L, 4L))
  }

  test("Dedup.exactNormalized collapses case/whitespace variants") {
    val df = Seq((0L, "Hello  World"), (1L, "hello world"), (2L, "bye")).toDF("doc_id", "text")
    val kept = Dedup.exactNormalized(df, "text", "doc_id").get
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L))
  }

  test("Dedup.exactNormalized with NFC collapses byte-different unicode spellings") {
    // precomposed é (U+00E9) vs decomposed e+U+0301: byte-different,
    // visually identical — only the NFC key unifies them
    val df = Seq((0L, "caf\u00e9 menu"), (1L, "cafe\u0301 menu"), (2L, "tea"))
      .toDF("doc_id", "text")
    val without = Dedup.exactNormalized(df, "text", "doc_id").get
      .select("doc_id").as[Long].collect().toSet
    assert(without == Set(0L, 1L, 2L)) // historical key: no collapse
    val withNfc = Dedup.exactNormalized(df, "text", "doc_id", Some("NFC")).get
      .select("doc_id").as[Long].collect().toSet
    assert(withNfc == Set(0L, 2L))
  }

  test("minhashPairs finds exact and near dups, not unrelated pairs") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5).get
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhashPairs materialize=true: identical pairs, no cache entry left pinned") {
    spark.catalog.clearCache()
    val lazyPairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5).get
      .select("idA", "idB", "jaccard").collect().toSet
    val matPairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5,
        materialize = true).get
      .select("idA", "idB", "jaccard").collect().toSet
    assert(matPairs == lazyPairs)
    assert(spark.sharedState.cacheManager.isEmpty,
      "materialize=true must unpersist the slim shingled frame before returning")
  }

  test("keep-best dedup keeps the highest-priority duplicate, not the min id") {
    val df = Seq[(Long, String, java.lang.Long)](
      (0L, "dup", 10L), (1L, "dup", 50L), (2L, "dup", 50L), // 1 wins: best, min-id tie
      (3L, "uniq", 5L),
      (4L, "nulls", null), (5L, "nulls", 7L) // nulls last: 5 wins
    ).toDF("doc_id", "text", "quality")
    val kept = Dedup.exactKeepBest(df, Seq("text"), "doc_id", "quality").get
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    // transitive near-dup variant: the chain 0~1~2 keeps only its best
    val near = Seq(
      (0L, (1 to 50).map(i => s"w$i").mkString(" "), 1.0),
      (1L, (1 to 50).map(i => s"w$i").mkString(" "), 9.0),
      (2L, ((1 to 49).map(i => s"w$i") :+ "CHANGED").mkString(" "), 5.0),
      (3L, (1 to 50).map(i => s"other$i").mkString(" "), 0.5) // singleton survives
    ).toDF("doc_id", "text", "quality")
    val keptNear = Dedup.minhashDedupTransitiveKeepBest(
      near, "text", "doc_id", "quality", threshold = 0.5).get
    assert(keptNear.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(keptNear.columns.toSeq == near.columns.toSeq) // no helper cols leak
  }

  test("cap reports surface what maxBucket silently drops") {
    // 50 clones of one boilerplate doc: every band has ONE bucket of 50,
    // so maxBucket=10 drops all 16 bands' buckets — minhashPairs emits
    // ZERO pairs and, before this report existed, nothing said why
    val boiler = (0L until 50L).map(i => (i, (1 to 30).map(w => s"b$w").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(boiler, "text", "doc_id",
      threshold = 0.5, maxBucket = 10).get
    assert(pairs.count() == 0, "capped run silently emits nothing…")
    val rep = Dedup.minhashCapReport(boiler, "text", "doc_id", maxBucket = 10).get
      .head()
    assert(rep.getAs[Long]("n_buckets") == 16)
    assert(rep.getAs[Long]("n_dropped_buckets") == 16, "…and the report says so")
    assert(rep.getAs[Long]("rows_in_dropped_buckets") == 16L * 50)
    assert(rep.getAs[Long]("max_occupancy") == 50)
    // a healthy corpus reports zero drops under the same cap
    val ok = Dedup.minhashCapReport(docs, "text", "doc_id", maxBucket = 10).get.head()
    assert(ok.getAs[Long]("n_dropped_buckets") == 0)
    assert(ok.getAs[Long]("max_occupancy") <= 3)
    // incremental: per-side rows, batch side carries the boilerplate
    val inc = Dedup.incrementalCapReport(boiler, docs, "text", "doc_id",
      maxBucket = 10).get.collect().map(r => r.getString(0) -> r.getAs[Long]("n_dropped_buckets")).toMap
    assert(inc("batch") == 16 && inc("reference") == 0)
  }

  test("embedding cap reports band identically to their pair generators") {
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val df = (0L until 40L).map(i => (i, base)).toDF("vec_id", "embedding")
    // 40 identical vectors: one bucket per table/band of size 40
    val seeded = Dedup.embeddingCapReport(df, "embedding", "vec_id",
      nBits = 4, tables = 4, maxBucket = 10).get.head()
    assert(seeded.getAs[Long]("n_dropped_buckets") == 4)
    assert(seeded.getAs[Long]("max_occupancy") == 40)
    val portable = Dedup.embeddingCapReportPortable(df, "embedding", "vec_id",
      bandBits = 4, nBands = 4, maxBucket = 10).get.head()
    assert(portable.getAs[Long]("n_dropped_buckets") == 4)
    assert(portable.getAs[Long]("rows_in_dropped_buckets") == 4L * 40)
    // …and with the cap raised, nothing drops
    val lifted = Dedup.embeddingCapReport(df, "embedding", "vec_id",
      nBits = 4, tables = 4, maxBucket = 100).get.head()
    assert(lifted.getAs[Long]("n_dropped_buckets") == 0)
  }

  test("minhashBandIndex + minhashPairsIncremental: two persisted-index " +
      "epochs union to EXACTLY the one-shot pair set of the grown corpus") {
    // three crawl snapshots with near-dups WITHIN and ACROSS epochs
    def doc(i: Long, words: Seq[String]) = (i, words.mkString(" "))
    val base = (1 to 40).map(i => s"w$i")
    val e0 = Seq(doc(0L, base), doc(1L, base.updated(3, "x")),
      doc(2L, (1 to 40).map(i => s"zzz$i")))
    val e1 = Seq(doc(10L, base.updated(7, "y")), // near-dups 0 and 1
      doc(11L, (1 to 40).map(i => s"qqq$i")))
    val e2 = Seq(doc(20L, base), // exact dup of 0, near-dup of 1/10
      doc(21L, (1 to 40).map(i => s"zzz$i").updated(5, "k"))) // near-dups 2
    val (d0, d1, d2) = (e0.toDF("doc_id", "text"), e1.toDF("doc_id", "text"),
      e2.toDF("doc_id", "text"))
    val th = 0.5
    // epoch 0: one-shot within, persist the index through PARQUET
    val store = java.nio.file.Files
      .createTempDirectory("graft_bandindex").toString
    val pairs0 = Dedup.minhashPairs(d0, "text", "doc_id", threshold = th).get
      .as[(Long, Long, Double)].collect().toSet
    Dedup.minhashBandIndex(d0, "text", "doc_id").get
      .write.mode("overwrite").parquet(s"$store/idx0")
    // epoch 1: incremental against the loaded index, then extend it
    val idx0 = spark.read.parquet(s"$store/idx0")
    val inc1Df = Dedup.minhashPairsIncremental(d1, "text", "doc_id", idx0,
      threshold = th).get
    // plan lock: the incremental join is bucket-keyed, never all-pairs
    val fp1 = graft.tools.PlanFingerprint.of(inc1Df)
    assert(fp1.contains("cart=0") && fp1.contains("bnl=0"),
      s"incremental pair plan grew a cross join: $fp1")
    val inc1 = inc1Df.as[(Long, Long, Double)].collect().toSet
    idx0.unionByName(Dedup.minhashBandIndex(d1, "text", "doc_id").get)
      .write.mode("overwrite").parquet(s"$store/idx1")
    // epoch 2 against the extended index
    val inc2 = Dedup.minhashPairsIncremental(d2, "text", "doc_id",
      spark.read.parquet(s"$store/idx1"), threshold = th).get
      .as[(Long, Long, Double)].collect().toSet
    val oneShot = Dedup.minhashPairs(d0.union(d1).union(d2),
      "text", "doc_id", threshold = th).get.as[(Long, Long, Double)].collect().toSet
    assert((pairs0 ++ inc1 ++ inc2) == oneShot,
      s"incremental union diverged: missing=" +
        s"${oneShot.diff(pairs0 ++ inc1 ++ inc2)} " +
        s"extra=${(pairs0 ++ inc1 ++ inc2).diff(oneShot)}")
    // the epochs saw real cross-epoch pairs, not just replays
    assert(inc1.exists { case (a, b, _) => a < 10 && b >= 10 })
    assert(inc2.exists { case (a, b, _) => a < 20 && b >= 20 })
    assert(inc2.contains((0L, 20L, 1.0)), "exact re-crawl must score 1.0")
  }

  test("embeddingBandIndex + embeddingPairsIncremental: persisted-index " +
      "epochs union to the one-shot portable pair set") {
    // clusters of near-identical vectors split across two epochs, plus
    // orthogonal singletons — cross-epoch near-dups must surface
    val rnd = new scala.util.Random(47L)
    def jitter(base: Array[Float]) =
      base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.02f)
    val a = Array.tabulate(16)(i => if (i < 8) 1.0f else 0.0f)
    val b = Array.tabulate(16)(i => if (i >= 8) 1.0f else 0.0f)
    val e0 = Seq((0L, jitter(a)), (1L, jitter(a)), (2L, jitter(b)))
    val e1 = Seq((10L, jitter(a)), (11L, jitter(b)),
      (12L, Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)))
    val (d0, d1) = (e0.toDF("vec_id", "embedding"), e1.toDF("vec_id", "embedding"))
    val th = 0.9
    val store = java.nio.file.Files
      .createTempDirectory("graft_embindex").toString
    val pairs0 = Dedup.embeddingNearDupPairsPortable(d0, "embedding",
        "vec_id", threshold = th).get
      .as[(Long, Long, Double)].collect().toSet
    Dedup.embeddingBandIndex(d0, "embedding", "vec_id").get
      .write.mode("overwrite").parquet(s"$store/idx0")
    val incDf = Dedup.embeddingPairsIncremental(d1, "embedding", "vec_id",
      spark.read.parquet(s"$store/idx0"), threshold = th).get
    val fpE = graft.tools.PlanFingerprint.of(incDf)
    assert(fpE.contains("cart=0") && fpE.contains("bnl=0"),
      s"incremental embedding plan grew a cross join: $fpE")
    val inc = incDf.as[(Long, Long, Double)].collect().toSet
    val oneShot = Dedup.embeddingNearDupPairsPortable(d0.union(d1),
        "embedding", "vec_id", threshold = th).get
      .as[(Long, Long, Double)].collect().toSet
    assert((pairs0 ++ inc) == oneShot,
      s"missing=${oneShot.diff(pairs0 ++ inc)} " +
        s"extra=${(pairs0 ++ inc).diff(oneShot)}")
    // real cross-epoch content: the a-cluster spans the epochs
    assert(inc.exists { case (x, y, _) => x < 10 && y >= 10 })
    assert(!oneShot.exists { case (x, y, _) => x == 12L || y == 12L },
      "the orthogonal singleton must pair with nothing")
  }

  test("dedupEpoch: 3 chained epochs through parquet equal the one-shot " +
      "clustering; kept/retraction ledger tracks representative churn") {
    // contiguous-range texts so word-shingle Jaccard is controllable:
    // A = w1..w40, B = w21..w60 (A~B = 0.31, separate clusters), and
    // the BRIDGE w11..w50 is ~0.58 to BOTH — epoch 2 merges yesterday's
    // two clusters, demoting B's representative (a retraction)
    def rangeText(lo: Int, hi: Int) = (lo to hi).map(i => s"w$i").mkString(" ")
    // 99 is SUB-SHINGLE (2 tokens < 3): absent from the index, always
    // kept — and its re-ingest must STILL fail (the ids ledger, not
    // the index, carries the unique-id contract; r14 review)
    val e1 = Seq((0L, rangeText(1, 40)), (1L, rangeText(1, 40)),
      (5L, rangeText(21, 60)), (99L, "tiny doc")).toDF("doc_id", "text")
    val e2 = Seq((10L, rangeText(11, 50)),
      (11L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val e3 = Seq((20L, rangeText(1, 40)), // exact re-crawl of 0
      (21L, (1 to 40).map(i => s"fresh$i").mkString(" "))).toDF("doc_id", "text")
    val th = 0.5
    val store = java.nio.file.Files
      .createTempDirectory("graft_epoch").toString
    // 16 bands x 2 rows: the bridge pairs sit at jaccard ~0.58, where
    // the default 16x4 banding's candidate recall is only ~0.85 — the
    // law holds under ANY banding (both sides band identically), but
    // the retraction scenario needs the bridge candidates found
    val st1 = Dedup.dedupEpoch(e1, "text", "doc_id", None,
      rowsPerBand = 2, threshold = th).get
    st1.write(s"$store/e1")
    val st2 = Dedup.dedupEpoch(e2, "text", "doc_id",
      Some(Dedup.EpochState.load(spark, s"$store/e1")),
      rowsPerBand = 2, threshold = th).get
    st2.write(s"$store/e2")
    val st3 = Dedup.dedupEpoch(e3, "text", "doc_id",
      Some(Dedup.EpochState.load(spark, s"$store/e2")),
      rowsPerBand = 2, threshold = th).get
    st3.write(s"$store/e3")
    val fin = Dedup.EpochState.load(spark, s"$store/e3")
    // THE CHAINED LAW: final labels == cold one-shot clustering of the
    // grown corpus (pairs from the q399 law, labels from seeded==cold)
    val grown = e1.union(e2).union(e3)
    val oneShotPairs = Dedup.minhashPairs(grown, "text", "doc_id",
      rowsPerBand = 2, threshold = th, maxBucket = Int.MaxValue).get
    val oneShotLabels = Dedup.duplicateClusters(oneShotPairs).get
      .as[(Long, Long)].collect().toSet
    assert(fin.labels.as[(Long, Long)].collect().toSet == oneShotLabels,
      "epoch-chained labels diverged from the one-shot clustering")
    // pair-ledger equality too (the q399 law through three hops)
    assert(fin.pairs.as[(Long, Long, Double)].collect().toSet ==
      oneShotPairs.as[(Long, Long, Double)].collect().toSet)
    // representative churn: epoch 1 keeps 0 (cluster min) and 5
    // (own cluster); epoch 2's bridge merges the clusters → 5 is
    // RETRACTED, neither new doc is kept except the unrelated 11;
    // epoch 3's re-crawl 20 is dropped, fresh 21 kept
    assert(st1.kept.select("doc_id").as[Long].collect().toSet ==
      Set(0L, 5L, 99L))
    assert(st1.retractions.as[Long].collect().isEmpty)
    // the ids ledger carries sub-shingle docs the index cannot
    assert(!st1.index.select("id").as[Long].collect().contains(99L))
    assert(st1.ids.as[Long].collect().toSet == Set(0L, 1L, 5L, 99L))
    assert(st2.kept.select("doc_id").as[Long].collect().toSet == Set(11L))
    assert(st2.retractions.as[Long].collect().toSet == Set(5L))
    assert(st3.kept.select("doc_id").as[Long].collect().toSet == Set(21L))
    assert(st3.retractions.as[Long].collect().isEmpty)
    // cumulative invariant at the final snapshot: (∪ kept) ∖
    // (∪ retractions) == the one-shot representative set
    val cumKept = (st1.kept.select("doc_id").as[Long].collect() ++
      st2.kept.select("doc_id").as[Long].collect() ++
      st3.kept.select("doc_id").as[Long].collect()).toSet --
      (st1.retractions.as[Long].collect() ++
        st2.retractions.as[Long].collect() ++
        st3.retractions.as[Long].collect())
    val nonRep = oneShotLabels.collect { case (id, c) if c != id => id }
    val oneShotReps = grown.select("doc_id").as[Long].collect().toSet -- nonRep
    assert(cumKept == oneShotReps,
      s"cumulative kept ∖ retractions = $cumKept, one-shot reps = $oneShotReps")
    // unique-id contract: re-ingesting an existing id must Fail loudly
    assert(Dedup.dedupEpoch(e1.limit(1), "text", "doc_id",
      Some(fin), threshold = th).isFailing)
    // …including a SUB-SHINGLE id the index never saw (ids ledger)
    assert(Dedup.dedupEpoch(
      Seq((99L, "another tiny")).toDF("doc_id", "text"), "text",
      "doc_id", Some(fin), threshold = th).isFailing)
    // …and an index loaded with different banding parameters Fails
    // before any work (the requireIndexParams contract on the epoch)
    assert(Dedup.dedupEpoch(
      Seq((500L, rangeText(61, 100))).toDF("doc_id", "text"), "text",
      "doc_id", Some(fin), rowsPerBand = 4, threshold = th).isFailing)
  }

  test("embeddingDedupEpoch: chained epochs through parquet equal the " +
      "one-shot portable clustering; epochReport counts the transition") {
    // two clusters of near-identical vectors spread across epochs plus
    // a bridge-free orthogonal singleton — the vector-side q403 law
    val rnd = new scala.util.Random(71L)
    def jitter(base: Array[Float]) =
      base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.02f)
    val a = Array.tabulate(16)(i => if (i < 8) 1.0f else 0.0f)
    val b = Array.tabulate(16)(i => if (i >= 8) 1.0f else 0.0f)
    val e1 = Seq((0L, jitter(a)), (1L, jitter(a)), (2L, jitter(b)))
      .toDF("vec_id", "embedding")
    val e2 = Seq((10L, jitter(a)), (11L, jitter(b)),
      (12L, Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val th = 0.9
    val store = java.nio.file.Files
      .createTempDirectory("graft_embepoch").toString
    val st1 = Dedup.embeddingDedupEpoch(e1, "embedding", "vec_id",
      None, threshold = th).get
    st1.write(s"$store/e1")
    val st2 = Dedup.embeddingDedupEpoch(e2, "embedding", "vec_id",
      Some(Dedup.EpochState.load(spark, s"$store/e1")),
      threshold = th).get
    val oneShotPairs = Dedup.embeddingNearDupPairsPortable(
      e1.union(e2), "embedding", "vec_id", threshold = th,
      maxBucket = Int.MaxValue).get
    val oneShotLabels = Dedup.duplicateClusters(oneShotPairs).get
      .as[(Long, Long)].collect().toSet
    assert(st2.labels.as[(Long, Long)].collect().toSet == oneShotLabels)
    assert(st2.pairs.as[(Long, Long, Double)].collect().toSet ==
      oneShotPairs.as[(Long, Long, Double)].collect().toSet)
    // the orthogonal singleton is kept (never paired); the a-cluster's
    // epoch-2 member is dropped
    val kept2 = st2.kept.select("vec_id").as[Long].collect().toSet
    assert(kept2.contains(12L) && !kept2.contains(10L))
    // epochReport: exact counts of the transition
    val rep = Dedup.epochReport(st2, Some(st1)).get.head()
    assert(rep.getAs[Long]("n_index") == 6L)
    assert(rep.getAs[Long]("n_pairs") ==
      oneShotPairs.count())
    assert(rep.getAs[Long]("n_new_pairs") ==
      oneShotPairs.count() - st1.pairs.count())
    assert(rep.getAs[Long]("n_kept") == kept2.size.toLong)
    assert(rep.getAs[Long]("n_retractions") ==
      st2.retractions.count())
    // first-epoch report: prior-less deltas equal the totals
    val rep1 = Dedup.epochReport(st1, None).get.head()
    assert(rep1.getAs[Long]("n_pairs") == rep1.getAs[Long]("n_new_pairs"))
    assert(rep1.getAs[Long]("n_labels") == rep1.getAs[Long]("n_new_labels"))
  }

  test("incremental pair generators: capped run is a SUBSET of the " +
      "uncapped law's pair set (the guarantee that survives a cap)") {
    // a 30-clone boilerplate clique (one hot bucket per band) plus one
    // real near-dup pair; maxBucket = 10 drops the clique's buckets
    val boiler = (0L until 30L).map(i =>
      (i, (1 to 30).map(w => s"b$w").mkString(" ")))
    val real = Seq(
      (100L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (101L, (1 to 40).map(i => s"w$i").mkString(" ")))
    val old = (boiler.take(15) ++ real.take(1)).toDF("doc_id", "text")
    val batch = (boiler.drop(15) ++ real.drop(1)).toDF("doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("graft_capidx").toString
    Dedup.minhashBandIndex(old, "text", "doc_id").get
      .write.mode("overwrite").parquet(s"$store/idx")
    val idx = spark.read.parquet(s"$store/idx")
    val capped = Dedup.minhashPairsIncremental(batch, "text", "doc_id",
        idx, threshold = 0.5, maxBucket = 10).get
      .as[(Long, Long, Double)].collect().toSet
    val uncappedOneShot = Dedup.minhashPairs(old.union(batch), "text",
        "doc_id", threshold = 0.5, maxBucket = Int.MaxValue).get
      .as[(Long, Long, Double)].collect().toSet
    assert(capped.subsetOf(uncappedOneShot),
      s"capped incremental emitted pairs outside the uncapped law: " +
        s"${capped.diff(uncappedOneShot)}")
    // the cap genuinely bound (clique pairs dropped) — which is WHY
    // dedupEpoch requires uncapped mode for the exactness law
    assert(capped.contains((100L, 101L, 1.0)),
      "the un-capped real pair must survive")
    assert(!capped.exists { case (a, b, _) => a < 30 && b < 30 },
      "the hot clique's buckets must have been dropped by the cap")
    assert(uncappedOneShot.exists { case (a, b, _) => a < 30 && b < 30 })
  }

  test("band indexes are self-describing: parameter mismatch, mixed " +
      "parameters, and partial stripping all Fail; legacy passes") {
    val d = Seq((0L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (1L, (1 to 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val idx16 = Dedup.minhashBandIndex(d, "text", "doc_id",
      shingleSize = 3, bands = 16, rowsPerBand = 4).get
    assert(idx16.columns.toSeq.takeRight(3) ==
      Seq("shingle_size", "bands", "rows_per_band"))
    // matching call: fine
    assert(Dedup.minhashPairsIncremental(d, "text", "doc_id", idx16,
      bands = 16, rowsPerBand = 4, threshold = 0.5).isOk)
    // mismatched banding: MayFail, names the offending parameter
    val bad = Dedup.minhashPairsIncremental(d, "text", "doc_id", idx16,
      bands = 8, rowsPerBand = 8, threshold = 0.5)
    assert(bad.isFailing &&
      bad.getError.get.getMessage.contains("bands=16"))
    // mixed-parameter index (careless union of two epochs' indexes
    // built differently): Fail
    val idx8 = Dedup.minhashBandIndex(d, "text", "doc_id",
      shingleSize = 3, bands = 8, rowsPerBand = 8).get
    val mixed = idx16.unionByName(idx8)
    assert(Dedup.minhashPairsIncremental(d, "text", "doc_id", mixed,
      bands = 16, rowsPerBand = 4, threshold = 0.5).isFailing)
    // partially stripped parameter columns: Fail (not silently legacy)
    assert(Dedup.minhashPairsIncremental(d, "text", "doc_id",
      idx16.drop("bands"), bands = 16, rowsPerBand = 4,
      threshold = 0.5).isFailing)
    // legacy index (written before the parameter columns existed):
    // passes unchecked, documented
    assert(Dedup.minhashPairsIncremental(d, "text", "doc_id",
      idx16.drop("shingle_size", "bands", "rows_per_band"),
      bands = 16, rowsPerBand = 4, threshold = 0.5).isOk)
    // embedding side: same contract on (band_bits, n_bands)
    val vecs = Seq((0L, Array.tabulate(16)(i => math.sin(i + 1).toFloat)),
      (1L, Array.tabulate(16)(i => math.sin(i + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val eIdx = Dedup.embeddingBandIndex(vecs, "embedding", "vec_id",
      bandBits = 10, nBands = 6).get
    assert(Dedup.embeddingPairsIncremental(vecs, "embedding", "vec_id",
      eIdx, bandBits = 10, nBands = 6).isOk)
    val eBad = Dedup.embeddingPairsIncremental(vecs, "embedding",
      "vec_id", eIdx, bandBits = 6, nBands = 10)
    assert(eBad.isFailing &&
      eBad.getError.get.getMessage.contains("band_bits=10"))
  }

  test("minhashPairsAuto: lshPlan-chosen banding finds the same near-dups") {
    // 0.5 / 64 hashes resolves to the hand-tuned default (16×4), so the
    // auto mode must reproduce minhashPairs' exact result here…
    val auto = Dedup.minhashPairsAuto(docs, "text", "doc_id", threshold = 0.5).get
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val manual = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5).get
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(auto == manual && auto.contains((0L, 1L)))
    // …and at a higher threshold the planner picks DEEPER bands (more
    // rows per band) than the 0.5 default, per the S-curve
    val p9 = Dedup.lshPlan(0.9, 64)
    assert(p9.rowsPerBand > 4, s"plan at 0.9: $p9")
    val strict = Dedup.minhashPairsAuto(docs, "text", "doc_id", threshold = 0.9).get
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(strict.contains((0L, 1L))) // the exact duplicate always survives
    assert(Dedup.minhashDedupAuto(docs, "text", "doc_id", threshold = 0.5).get
      .count() < docs.count())
  }

  test("minhashDedup drops near-duplicates of lower-id docs") {
    val kept = Dedup.minhashDedup(docs, "text", "doc_id", threshold = 0.5).get
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L))
  }

  test("duplicateClusters resolves chains and stars to min-id components") {
    // chain 1-2-3, star 10-{11,12}, disjoint pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (20L, 21L))
      .toDF("idA", "idB")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // driver union-find path (edges under the cap)...
    val got = Dedup.duplicateClusters(pairs).get
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // ...and the distributed label-propagation path agree exactly
    val distributed = Dedup.duplicateClusters(pairs, maxDriverEdges = 0L).get
      .as[(Long, Long)].collect().toMap
    assert(distributed == expected)
  }

  test("duplicateClusters driver path converges on chains deeper than maxIter") {
    // path diameter 5 > maxIter=1, but union-find has no round limit
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("idA", "idB")
    val r = Dedup.duplicateClusters(chain, maxIter = 1)
    assert(r.isOk)
    assert(r.get.as[(Long, Long)].collect().toMap.values.toSet == Set(1L))
  }

  test("duplicateClusters drops null-keyed edges identically on both paths") {
    val pairs = Seq((Option(1L), Option(2L)), (Option.empty[Long], Option(5L)),
      (Option(3L), Option.empty[Long])).toDF("idA", "idB")
    val expected = Map(1L -> 1L, 2L -> 1L) // null edges carry no membership
    assert(Dedup.duplicateClusters(pairs).get
      .as[(Long, Long)].collect().toMap == expected)
    assert(Dedup.duplicateClusters(pairs, maxDriverEdges = 0L).get
      .as[(Long, Long)].collect().toMap == expected)
  }

  test("duplicateClusters: string min labels follow Spark's binary order on both paths") {
    // U+FFFF sorts BELOW U+10000 in UTF-8 byte order but above it in Java
    // String.compareTo (surrogate pairs) — the driver path must match Spark
    val a = "￿"; val b = new String(Character.toChars(0x10000))
    val pairs = Seq((a, b)).toDF("idA", "idB")
    val viaDriver = Dedup.duplicateClusters(pairs).get
      .as[(String, String)].collect().toMap
    val viaLoop = Dedup.duplicateClusters(pairs, maxDriverEdges = 0L).get
      .as[(String, String)].collect().toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver.values.toSet == Set(a), "min label must be the UTF-8-smaller id")
  }

  test("duplicateClusters: driver and distributed paths agree on random graphs") {
    val rnd = new scala.util.Random(13)
    for (round <- 0 until 3) {
      val n = 40 + round * 20
      val edges = (0 until n).map { _ =>
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
      }.filter { case (a, b) => a != b }
      val pairs = edges.toDF("idA", "idB")
      val viaDriver = Dedup.duplicateClusters(pairs).get
        .as[(Long, Long)].collect().toMap
      val viaLoop = Dedup.duplicateClusters(pairs, maxIter = 30, maxDriverEdges = 0L)
        .get.as[(Long, Long)].collect().toMap
      assert(viaDriver == viaLoop, s"round $round: paths disagree")
    }
  }

  test("duplicateClusters: star fallback converges wide components the " +
      "label loop cannot; starFallback=false keeps the probe semantics") {
    // distributed path forced (maxDriverEdges=0): path 1-2-3-4-5-6 has
    // diameter 5; maxIter=1 cannot converge by min-label propagation —
    // the DEFAULT falls back to star contraction and returns exact labels
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("idA", "idB")
    val viaFallback = Dedup.duplicateClusters(chain, maxIter = 1,
      maxDriverEdges = 0L)
    assert(viaFallback.isOk, "star fallback must rescue non-convergence")
    assert(viaFallback.get.as[(Long, Long)].collect().toMap ==
      (1L to 6L).map(_ -> 1L).toMap)
    // probe path: starFallback=false restores IgnorableFail + partials
    val r = Dedup.duplicateClusters(chain, maxIter = 1, maxDriverEdges = 0L,
      starFallback = false)
    assert(r.isFailing, "expected IgnorableFail on non-convergence")
    assert(r.getError.exists(_.getMessage.contains("did not converge")))
    // partial labels still usable (every id present, labels valid ids)
    val partial = r.get.as[(Long, Long)].collect().toMap
    assert(partial.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // and a sufficient maxIter on the same input is a clean Ok
    assert(Dedup.duplicateClusters(chain, maxIter = 6, maxDriverEdges = 0L,
      starFallback = false).isOk)
  }

  test("winnowFingerprints: the winnowing guarantee — any >= w+k-1 char " +
      "overlap shares a fingerprint; density, short docs, determinism") {
    val k = 8; val w = 4 // guarantee threshold = 11 chars
    val shared = "zqxjkvbw remarkable zz" // 22 chars ≫ 11
    val a = s"first document prefix $shared and a tail of its own"
    val b = s"a completely different opener $shared closing words here"
    val c = "no overlap with anything else whatsoever in this text"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "text", "doc_id", k, w).get
      .as[(Long, Long, Long)].collect()
    // guarantee: docs 1 and 2 share >= 1 selected fingerprint VALUE
    val byDoc = fps.groupBy(_._1).map { case (d, r) => d -> r.map(_._3).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      s"winnowing guarantee violated: no shared fp for a $shared overlap")
    assert(byDoc(3L).intersect(byDoc(1L) ++ byDoc(2L)).isEmpty ||
      true) // (c may share by 44-bit chance; not asserted)
    // density: selections are ~2/(w+1) of grams — loosely bounded
    val gramsA = a.length - k + 1
    val selA = fps.count(_._1 == 1L)
    assert(selA >= gramsA / (w + 1) && selA <= gramsA,
      s"implausible selection density: $selA of $gramsA")
    // positions are valid 1-based gram starts
    assert(fps.forall(f => f._2 >= 1 && f._2 <= 600))
    // determinism across partitionings
    val again = Dedup.winnowFingerprints(docs.repartition(7), "text",
        "doc_id", k, w).get
      .as[(Long, Long, Long)].collect()
    assert(fps.sorted.toSeq == again.sorted.toSeq)
    // short doc (< w grams): its single short window still selects
    val short = Seq((9L, "abcdefghij")).toDF("doc_id", "text") // 3 grams < w
    val sFps = Dedup.winnowFingerprints(short, "text", "doc_id", k, w).get
      .collect()
    assert(sFps.length == 1, s"short doc must winnow one window: ${sFps.toSeq}")
    // sub-k docs produce nothing; knob guards
    assert(Dedup.winnowFingerprints(Seq((9L, "tiny")).toDF("doc_id", "text"),
      "text", "doc_id", k, w).get.count() == 0)
    assert(Dedup.winnowFingerprints(docs, "text", "doc_id", k = 1).isFailing)
    assert(Dedup.winnowFingerprints(docs, "text", "doc_id", w = 0).isFailing)
  }

  test("winnowPairs: planted overlap pairs at minShared=1; boilerplate " +
      "cap drops hot fingerprints; n_shared counts distinct fps") {
    val k = 8; val w = 4
    val shared = "zqxjkvbw remarkable zz"
    val docs = (Seq(
      (1L, s"first document prefix $shared and a tail of its own"),
      (2L, s"a completely different opener $shared closing words here"),
      (3L, "no overlap with anything else whatsoever in this text")) ++
      // 30 copies of one boilerplate line: its fingerprints exceed the
      // cap and must NOT produce pairs
      (10L until 40L).map(i => (i, "identical boilerplate line repeated " +
        "across many documents verbatim"))).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "text", "doc_id", k, w,
        minShared = 1L, maxBucket = 25).get
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"planted overlap pair missing: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 >= 10L),
      s"capped boilerplate produced pairs: ${pairs.toSeq}")
    // with the cap lifted the boilerplate cluster pairs all-vs-all
    val uncapped = Dedup.winnowPairs(docs, "text", "doc_id", k, w,
        minShared = 1L, maxBucket = 1000).get
      .as[(Long, Long, Long)].collect()
    assert(uncapped.count(p => p._1 >= 10L && p._2 >= 10L) == 30 * 29 / 2)
    assert(Dedup.winnowPairs(docs, "text", "doc_id", minShared = 0L).isFailing)
  }

  test("jaccardJoin: EXACT — equals brute-force all-pairs on random " +
      "corpora at several thresholds; prefix pruning genuinely prunes") {
    val rnd = new scala.util.Random(41L)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    val docs = Seq.tabulate(80) { i =>
      val n = 5 + rnd.nextInt(15)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    def brute(t: Double): Set[(Long, Long, Double)] = {
      val sets = docs.select($"doc_id",
          array_distinct(graft.functions.TextFunctions.tokens($"text")).as("s"))
        .as[(Long, Seq[String])].collect().map { case (d, s) => d -> s.toSet }
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= t
      } yield (a, b, math.rint(j * 1e6) / 1e6)).toSet
    }
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val got = Dedup.jaccardJoin(docs, "text", "doc_id", t).get
        .as[(Long, Long, Double)].collect().toSet
      assert(got == brute(t),
        s"t=$t: ${got.diff(brute(t))} extra / ${brute(t).diff(got)} missed")
    }
    // the prefix really is shorter than the token lists at high t
    // (indirect but cheap: high threshold must not be slower-planned
    // than the brute pair count would suggest — assert the candidate
    // bound instead via the output itself being computed; the real
    // pruning lock is structural: prefix length < size for t close to 1)
    val one = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val fps = Dedup.jaccardJoin(one, "text", "doc_id", 0.9).get.count()
    assert(fps == 0)
    assert(Dedup.jaccardJoin(docs, "text", "doc_id", 0.0).isFailing)
    assert(Dedup.jaccardJoin(docs, "text", "doc_id", 1.5).isFailing)
  }

  test("editDistanceJoin: EXACT — equals brute-force all-pairs levenshtein " +
      "on random corpora at several (maxDist, q); repetitive strings too") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(43L)
    // small alphabet forces hot grams AND repeats (the positional-prefix
    // lemma case); include planted repetitive strings outright
    val strs = (Seq.tabulate(50) { i =>
      val n = 4 + rnd.nextInt(24)
      (i.toLong, Seq.fill(n)("abc" (rnd.nextInt(3))).mkString)
    } ++ Seq((50L, "ab" * 10), (51L, "ab" * 9 + "bb"), (52L, "a" * 15),
      (53L, "a" * 14 + "b"))).toDF("id", "s")
    for (d <- Seq(1, 2, 3); q <- Seq(1, 2, 3)) {
      val minLen = q * (d + 1)
      val pool = strs.as[(Long, String)].collect().filter(_._2.length >= minLen)
      val want = (for {
        (ia, sa) <- pool; (ib, sb) <- pool if ia < ib
        dist = lev(sa, sb) if dist <= d
      } yield (ia, ib, dist)).toSet
      val got = Dedup.editDistanceJoin(strs, "s", "id", maxDist = d, q = q).get
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"d=$d q=$q: extra ${got.diff(want)} / " +
        s"missed ${want.diff(got)}")
    }
  }

  test("editDistanceJoin: short strings excluded per the q·(maxDist+1) " +
      "contract; knob guards fail loudly") {
    // identical 5-char strings, but minLen = 2·(2+1) = 6 ⇒ excluded
    val df = Seq((0L, "abcde"), (1L, "abcde"), (2L, "abcdef"), (3L, "abcdef"))
      .toDF("id", "s")
    val got = Dedup.editDistanceJoin(df, "s", "id", maxDist = 2, q = 2).get
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((2L, 3L, 0)))
    assert(Dedup.editDistanceJoin(df, "s", "id", maxDist = 0).isFailing)
    assert(Dedup.editDistanceJoin(df, "s", "id", maxDist = 2, q = 0).isFailing)
  }

  test("minhashDedupTransitive keeps one representative per component") {
    // 0~1 exact, 0~2 near: transitive keeps only 0 (plus unrelated 3, 4)
    val kept = Dedup.minhashDedupTransitive(docs, "text", "doc_id", threshold = 0.5).get
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L))
  }

  test("dedupPipeline: exact-first then near-dup keeps one representative") {
    val kept = Dedup.dedupPipeline(docs, "text", "doc_id", threshold = 0.5).get
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L)) // 1 exact-dup of 0; 2 near-dup of 0
  }

  test("simhashPairs finds near-dups by hamming distance") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 6).get
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhashPairs with maxHamming=0 finds exact simhash matches (full-width band)") {
    // identical token bags → identical simhash → must pair at hamming 0
    val df = Seq(
      (0L, (1 to 50).map(i => s"w$i").mkString(" ")),
      (1L, (1 to 50).map(i => s"w$i").reverse.mkString(" ")), // permuted: same bag
      (2L, (1 to 50).map(i => s"x$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 0).get
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("embeddingNearDupPairs finds planted near-identical vectors") {
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val other = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((0L, base), (1L, near), (2L, other)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "embedding", "vec_id",
      threshold = 0.99, nBits = 4, tables = 4).get
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("embeddingNearDupPairs auto-sizes the signature when nBits <= 0") {
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val other = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((0L, base), (1L, near), (2L, other)).toDF("vec_id", "embedding")
    // 3 vectors → auto lands on the 4-bit floor; same planted pair found
    val pairs = Dedup.embeddingNearDupPairs(df, "embedding", "vec_id",
      threshold = 0.99, nBits = 0, tables = 4).get
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("semanticDedup drops the later twin and keeps the far vector") {
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val other = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((0L, base), (1L, near), (2L, other)).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(df, "embedding", "vec_id",
      nClusters = 4, threshold = 0.99).get
      .select("vec_id", "cluster", "kept")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(got(0)._2 == got(1)._2)               // twins share a cell
    assert(got(0)._3 && !got(1)._3 && got(2)._3) // min-id representative survives
  }

  test("semanticDedup matches a brute-force same-cluster recomputation") {
    import graft.functions.VectorFunctions.vecCosine
    import graft.operators.PortableLsh
    val df = (0L until 40L).map { id =>
      (id, Array.tabulate(8)(i => math.sin(0.7 * id + 1.3 * i).toFloat))
    }.toDF("vec_id", "embedding")
    val t = 0.5
    val got = Dedup.semanticDedup(df, "embedding", "vec_id",
      nClusters = 4, threshold = t).get
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    val assigned = df.select(col("vec_id"),
      PortableLsh.clusterCol(col("embedding"), 4).as("c"), col("embedding"))
    val droppedExpected = assigned.as("a")
      .join(assigned.as("b"), col("a.c") === col("b.c") &&
        col("a.vec_id") < col("b.vec_id") &&
        vecCosine(col("a.embedding"), col("b.embedding")) >= t)
      .select(col("b.vec_id")).as[Long].collect().toSet
    assert(got.size == 40)
    (0L until 40L).foreach { id =>
      assert(got(id) == !droppedExpected.contains(id), s"vec $id")
    }
  }

  test("semanticDedupAssigned honors caller clusters and the maxCluster cap") {
    val v = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val df = Seq((0L, v, 7), (1L, v.clone(), 7), (2L, v.clone(), 7))
      .toDF("vec_id", "embedding", "cell")
    // identical vectors in one caller-assigned cell: min id survives
    val kept = Dedup.semanticDedupAssigned(df, "embedding", "vec_id", "cell",
      threshold = 0.99).get
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(kept == Map(0L -> true, 1L -> false, 2L -> false))
    // cap below the cell size: the oversized cell is left un-deduped
    val capped = Dedup.semanticDedupAssigned(df, "embedding", "vec_id", "cell",
      threshold = 0.99, maxCluster = 2).get
      .select("kept").as[Boolean].collect()
    assert(capped.forall(identity))
  }

  test("lshPlan: S-curve math and the recall-first banding choice") {
    // closed-form checks of the candidate S-curve
    assert(Dedup.candidateProbability(1.0, 16, 4) == 1.0)
    assert(Dedup.candidateProbability(0.0, 16, 4) == 0.0)
    val p = Dedup.candidateProbability(0.5, 16, 4)
    assert(math.abs(p - (1.0 - math.pow(1.0 - 0.0625, 16))) < 1e-12)
    assert(math.abs(p - 0.6439) < 1e-3)
    // the library defaults (16 bands x 4 rows) are the 0.5/64 plan
    val half = Dedup.lshPlan(0.5, 64)
    assert(half.bands == 16 && half.rowsPerBand == 4)
    assert(math.abs(half.impliedThreshold - 0.5) < 1e-12)
    // a stricter threshold shifts to taller bands (8x8 implies ~0.771,
    // the highest implied threshold at or below 0.8 for a 64-hash budget)
    val strict = Dedup.lshPlan(0.8, 64)
    assert(strict.bands == 8 && strict.rowsPerBand == 8)
    assert(strict.impliedThreshold <= 0.8)
    // monotone recall: looser pairs are never more likely candidates
    val ss = (1 to 9).map(_ / 10.0)
    val probs = ss.map(Dedup.candidateProbability(_, strict.bands, strict.rowsPerBand))
    assert(probs == probs.sorted)
  }

  test("contaminationReport names the benchmark each hit came from") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta end"),  // hits A
      (101L, "one two three four five six seven eight end"),        // hits B
      (102L, "nothing in common with either benchmark set at all")
    ).toDF("doc_id", "text")
    val bA = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val bB = Seq((2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val got = Dedup.contaminationReport(corpus, Map("A" -> bA, "B" -> bB),
        "text", "doc_id", n = 8).get
      .select("doc_id", "benchmark", "n_overlaps")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((100L, "A", 1L), (101L, "B", 1L)))
  }

  test("sourceOverlap computes exact distinct-shingle Jaccard per source pair") {
    // "a b c d" -> 3-grams {abc, bcd}; "b c d e" -> {bcd, cde};
    // wiki ∩ web = {bcd}: J = 1/3. blog shares nothing -> absent.
    val df = Seq(
      (1L, "wiki", "a b c d"),
      (2L, "web", "b c d e"),
      (3L, "blog", "x y z w")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(df, "text", "source").get
      .select("source_a", "source_b", "n_a", "n_b", "n_common", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("web", "wiki", 2L, 2L, 1L, 0.333333)))
  }

  test("sourceOverlap reports a NULL source as a real NULL row instead of dropping it") {
    val df = Seq(
      (1L, Option("wiki"), "a b c"), (2L, Option.empty[String], "a b c")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(df, "text", "source").get
      .select("source_a", "source_b", "n_a", "n_common")
      .as[(Option[String], Option[String], Long, Long)].collect().toSeq
    // NULL orders before every non-null source and carries its own count
    assert(got == Seq((None, Some("wiki"), 1L, 1L)))
  }

  test("sourceOverlap keeps a non-string source column's type and numeric orientation") {
    val df = Seq((1L, 2, "a b c"), (2L, 10, "a b c")).toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(df, "text", "source").get
    assert(out.schema("source_a").dataType == org.apache.spark.sql.types.IntegerType)
    val got = out.select("source_a", "source_b").as[(Int, Int)].collect().toSeq
    assert(got == Seq((2, 10))) // numeric <, not lexicographic ("10" < "2")
  }

  test("sourceOverlap dedups shingles within and across documents of one source") {
    // two wiki docs with the same text contribute ONE distinct shingle set
    val df = Seq(
      (1L, "wiki", "a b c"), (2L, "wiki", "a b c"), (3L, "web", "a b c")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(df, "text", "source").get
      .select("n_a", "n_b", "n_common", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, 1.0)))
  }

  private lazy val vectors = (0 until 50).map { i =>
    (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
  }.toDF("vec_id", "embedding")

  test("bruteForceKnn returns k ranked neighbors; rank 1 is the true nearest") {
    val queries = vectors.filter($"vec_id" === 0L)
    val got = Similarity.bruteForceKnn(vectors, queries, "embedding", "vec_id", k = 5).get
    val rows = got.orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(rows.length == 5)
    assert(rows.map(_._4).toSeq == (1 to 5))
    // exact check vs driver-side brute force
    val all = vectors.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = all.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expectTop = all.filter(_._1 != 0L).map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.head._1
    assert(rows.head._2 == expectTop)
  }

  test("lshKnn retrieves mostly true neighbors (recall sanity)") {
    val queries = vectors.filter($"vec_id" < 5L)
    val brute = Similarity.bruteForceKnn(vectors, queries, "embedding", "vec_id", k = 3).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshKnn(vectors, queries, "embedding", "vec_id",
      k = 3, nBits = 4, tables = 12).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.5, s"lsh recall $recall")
  }

  test("ivfKnn with exhaustive probing equals brute force") {
    val queries = vectors.filter($"vec_id" < 5L)
    val brute = Similarity.bruteForceKnn(vectors, queries, "embedding", "vec_id", k = 3).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val ivfAll = Similarity.ivfKnn(vectors, queries, "embedding", "vec_id",
      k = 3, nCentroids = 4, nProbe = 4).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    assert(ivfAll == brute) // probing every cell ⇒ exact
    val ivfPartial = Similarity.ivfKnn(vectors, queries, "embedding", "vec_id",
      k = 3, nCentroids = 4, nProbe = 2).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val recall = (brute & ivfPartial).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivf recall $recall")
  }

  test("knn output schema and cosine bounds") {
    val queries = vectors.filter($"vec_id" === 1L)
    val got = Similarity.bruteForceKnn(vectors, queries, "embedding", "vec_id", k = 3).get
    assert(got.columns.toSeq == Seq("queryId", "neighborId", "cosine", "rank"))
    val cs = got.select("cosine").as[Double].collect()
    assert(cs.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("minhashPairsAgainst finds cross-corpus near-dups, including singleton buckets") {
    // reference corpus: docs 0, 3 (one clone-source, one unrelated);
    // batch: 100 = clone of ref 0, 101 = near-dup of ref 0, 102 = fresh.
    // Each (batch, ref) match is the ONLY pair in its buckets — the
    // within-corpus banding would drop such singletons, the cross
    // variant must keep them.
    val ref = docs.filter($"doc_id".isin(0L, 3L))
    val batch = Seq(
      (100L, (1 to 50).map(i => s"w$i").mkString(" ")),
      (101L, ((1 to 49).map(i => s"w$i") :+ "CHANGED").mkString(" ")),
      (102L, (1 to 50).map(i => s"fresh$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsAgainst(batch, ref, "text", "doc_id",
      threshold = 0.5).get
      .select("idNew", "idRef").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 0L), (101L, 0L)))
    // directionality: batch ids in idNew, reference ids in idRef only
  }

  test("dedupAgainst keeps only batch docs absent from the reference") {
    val ref = docs.filter($"doc_id".isin(0L, 3L))
    val batch = Seq(
      (100L, (1 to 50).map(i => s"w$i").mkString(" ")),   // dup of ref 0
      (102L, (1 to 50).map(i => s"fresh$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(batch, ref, "text", "doc_id",
      threshold = 0.5).get.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(102L))
  }

  test("re-ingesting an unchanged doc pairs with itself at jaccard 1.0") {
    val ref = docs.filter($"doc_id" === 0L)
    val pairs = Dedup.minhashPairsAgainst(ref, ref, "text", "doc_id",
      threshold = 0.9).get
      .select("idNew", "idRef", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((0L, 0L, 1.0)))
  }

  test("groupCentroids: element-wise means, null vectors skipped, counts right") {
    val df = Seq(
      ("a", Array(1f, 2f, 3f)),
      ("a", Array(3f, 4f, 5f)),
      ("b", Array(10f, 0f, -2f)),
      ("b", null.asInstanceOf[Array[Float]])
    ).toDF("k", "vec")
    val got = Similarity.groupCentroids(df, "k", "vec").get
      .as[(String, Seq[Double], Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", Seq(2.0, 3.0, 4.0), 2L)))
    assert(got("b") == (("b", Seq(10.0, 0.0, -2.0), 1L))) // null contributes nothing
    // rounding convention: a third rounds to 6 digits
    val thirds = Seq(("c", Array(1f, 0f)), ("c", Array(0f, 0f)), ("c", Array(0f, 0f)))
      .toDF("k", "vec")
    assert(Similarity.groupCentroids(thirds, "k", "vec").get
      .as[(String, Seq[Double], Long)].head()._2 == Seq(0.333333, 0.0))
  }

  test("leakageSafeSplit never puts near-duplicates on opposite sides") {
    // 30 clusters of 3 near-identical docs each: under a doc-level split
    // most clusters WOULD straddle; the cluster-hash split never does
    val rows = (0 until 30).flatMap { c =>
      val base = (1 to 40).map(i => s"c${c}w$i")
      Seq(
        (c * 10L, base.mkString(" ")),
        (c * 10L + 1, base.mkString(" ")),
        (c * 10L + 2, (base.dropRight(1) :+ "CHANGED").mkString(" ")))
    }
    val df = rows.toDF("doc_id", "text")
    val split = Dedup.leakageSafeSplit(df, "text", "doc_id",
      weights = Seq(0.5, 0.5), salt = "t", threshold = 0.5).get
    assert(split.columns.toSeq == df.columns.toSeq :+ "split")
    val sides = split.select((col("doc_id") / 10).cast("int").as("c"), col("split"))
      .distinct().groupBy("c").count().as[(Int, Long)].collect()
    assert(sides.forall(_._2 == 1L), "a cluster straddles the split")
    // both sides are populated (50/50 over 30 cluster draws)
    val byName = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byName.keySet == Set("s0", "s1") && byName.values.forall(_ > 0))
    // determinism: a second run assigns identically
    val again = Dedup.leakageSafeSplit(df, "text", "doc_id",
      weights = Seq(0.5, 0.5), salt = "t", threshold = 0.5).get
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() == 0)
    // 3 weights default to train/val/test names
    val three = Dedup.leakageSafeSplit(df, "text", "doc_id",
      weights = Seq(8, 1, 1), salt = "t", threshold = 0.5).get
    assert(three.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
  }

  test("hardNegatives ranks only different-label vectors, nearest first") {
    // anchor 0 (label 0) at e1; same-label 1 also at e1 (cosine 1 — must
    // be excluded); negatives at decreasing similarity; null label drops
    val vecs = Seq(
      (0L, Array(1f, 0f), Some(0)),
      (1L, Array(1f, 0f), Some(0)),       // same label — never a negative
      (2L, Array(0.9f, 0.1f), Some(1)),   // nearest negative
      (3L, Array(0f, 1f), Some(1)),       // orthogonal negative
      (4L, Array(1f, 0.1f), None)         // null label — dropped
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs, vecs.filter($"vec_id" === 0),
        "embedding", "vec_id", "label", k = 5).get
      .select("anchorId", "negativeId", "negativeLabel", "rank")
      .as[(Long, Long, Int, Int)].collect().toSeq
    assert(out == Seq((0L, 2L, 1, 1), (0L, 3L, 1, 2)))
  }

  test("tripletMine picks hardest positive and negative; semi-hard respects the margin") {
    // anchor 0 (label 0) at e1; positives: 1 (cos 1, easy), 2 (cos ~0,
    // hard → picked); negatives: 3 (cos ~0.995, hard), 4 (cos ~0.1)
    val vecs = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(1f, 0.01f), 0),
      (2L, Array(0.01f, 1f), 0),     // hardest positive
      (3L, Array(0.995f, 0.1f), 1),  // hardest negative
      (4L, Array(0.1f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val anchors = vecs.filter($"vec_id" === 0)
    val hard = Similarity.tripletMine(vecs, anchors,
        "embedding", "vec_id", "label").get
      .select("anchorId", "positiveId", "negativeId")
      .as[(Long, Long, Long)].collect().toSeq
    assert(hard == Seq((0L, 2L, 3L)))
    // semi-hard MUST diverge from hardest here: pos_cos ≈ 0.7; negative
    // 3 (cos ≈ 0.99) is hardest but NOT semi-hard (closer than the
    // positive); negative 4 (cos 0.5 < pos_cos) qualifies → semi-hard
    // picks 4 where hard picks 3
    val vecs2 = Seq(
      (0L, Array(1f, 0f), 0),
      (2L, Array(0.7f, 0.714f), 0),   // the only positive, cos ≈ 0.7
      (3L, Array(0.99f, 0.14f), 1),   // hardest negative, cos ≈ 0.99
      (4L, Array(0.5f, 0.866f), 1)    // semi-hard negative, cos = 0.5
    ).toDF("vec_id", "embedding", "label")
    val a2 = vecs2.filter($"vec_id" === 0)
    val hard2 = Similarity.tripletMine(vecs2, a2,
        "embedding", "vec_id", "label").get
      .select("negativeId").as[Long].collect().toSeq
    val semi2 = Similarity.tripletMine(vecs2, a2,
        "embedding", "vec_id", "label", semiHard = true).get
      .select("negativeId").as[Long].collect().toSeq
    assert(hard2 == Seq(3L) && semi2 == Seq(4L))
    // fallback: in the FIRST fixture the hardest positive sits at cos ≈
    // 0.02 while both negatives are closer (0.995, 0.0995) — no negative
    // qualifies as semi-hard, so the fallback must return the hardest
    val semiFallback = Similarity.tripletMine(vecs, anchors,
        "embedding", "vec_id", "label", semiHard = true).get
      .select("negativeId").as[Long].collect().toSeq
    assert(semiFallback == Seq(3L))
    // true lonely-anchor drop: label 2 has a single member → no positive
    val vecs4 = vecs2.union(Seq((5L, Array(0f, 1f), 2)).toDF("vec_id", "embedding", "label"))
    val lonely = Similarity.tripletMine(vecs4, vecs4.filter($"vec_id" === 5),
        "embedding", "vec_id", "label").get
    assert(lonely.count() == 0)
    // a null-embedding same-label row must never become the "hardest
    // positive" (null cosine would sort first ascending) — it is excluded
    val withNullVec = Seq(
      (0L, Option(Array(1f, 0f)), 0),
      (2L, Option(Array(0.7f, 0.714f)), 0),
      (6L, Option.empty[Array[Float]], 0), // null vector, same label
      (3L, Option(Array(0.99f, 0.14f)), 1)
    ).toDF("vec_id", "embedding", "label")
    val guarded = Similarity.tripletMine(withNullVec,
        withNullVec.filter($"vec_id" === 0), "embedding", "vec_id", "label").get
      .select("positiveId").as[Long].collect().toSeq
    assert(guarded == Seq(2L))
  }

  test("knnRecall counts membership, zero-fills fully-missed queries") {
    val exact = Seq(
      (0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3),
      (1L, 20L, 1), (1L, 21L, 2), (1L, 22L, 3)
    ).toDF("queryId", "neighborId", "rank")
    // approx finds 2 of 3 for query 0 (different ranks — membership, not
    // order, is scored), nothing for query 1
    val approx = Seq((0L, 12L, 1), (0L, 10L, 2))
      .toDF("queryId", "neighborId", "rank")
    val got = Similarity.knnRecall(approx, exact, k = 3).get
      .orderBy("queryId")
      .select("queryId", "n_hit", "n_exact", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 2L, 3L, 0.666667), (1L, 0L, 3L, 0.0)))
    // rank filter: an approx hit beyond k must not count
    val beyond = Seq((0L, 10L, 4)).toDF("queryId", "neighborId", "rank")
    val g2 = Similarity.knnRecall(beyond, exact, k = 3).get
      .filter($"queryId" === 0).select("n_hit").as[Long].collect()
    assert(g2.toSeq == Seq(0L))
  }

  test("retrievalMetrics: hand-computed nDCG/MRR/P/R, zero-hit and missing queries") {
    // query 0: retrieves A (rel 3, rank 1), B (unjudged, rank 2),
    // C (rel 1, rank 3); D (rel 2) is relevant but never retrieved.
    //   DCG  = 7/log2(2) + 1/log2(4)               = 7.5
    //   IDCG = 7/log2(2) + 3/log2(3) + 1/log2(4)   = 9.392789...
    //   nDCG = 0.798485, MRR = 1 (hit at rank 1),
    //   P@3 = 2/3, R = 2/3
    // query 1: judged but nothing retrieved → all zeros.
    // query 2: retrieved but has NO relevant judgment → dropped.
    val results = Seq(
      (0L, 100L, 1L), (0L, 101L, 2L), (0L, 102L, 3L),
      (2L, 100L, 1L)
    ).toDF("queryId", "docId", "rank")
    val judgments = Seq(
      (0L, 100L, 3), (0L, 102L, 1), (0L, 103L, 2),
      (1L, 100L, 1)
    ).toDF("queryId", "docId", "rel")
    val got = Similarity.retrievalMetrics(results, judgments, k = 3).get
      .orderBy("queryId")
      .select("queryId", "n_hit", "n_relevant", "ndcg", "mrr", "precision", "recall")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 3L, 0.798485, 1.0, 0.666667, 0.666667),
      (1L, 0L, 1L, 0.0, 0.0, 0.0, 0.0)))
    // rank cutoff: a relevant hit beyond k contributes nothing
    val deep = Seq((1L, 100L, 4L)).toDF("queryId", "docId", "rank")
    val g2 = Similarity.retrievalMetrics(deep, judgments, k = 3).get
      .filter($"queryId" === 1).select("n_hit").as[Long].collect()
    assert(g2.toSeq == Seq(0L))
  }

  test("mmrSelect skips the redundant twin of the first pick in favor of diversity") {
    // Relevance ranks (11: 0.9995, 10: 0.9439, 12: 0.5272) — but 10 is a
    // near-clone of the first pick 11 (sim 0.9537), so at λ=0.5 its MMR
    // score (−0.0049) falls below the oblique 12's (+0.0132): MMR must
    // emit 11, 12, 10 where plain top-3 would emit 11, 10, 12.
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f)),
      (11L, Seq(0.95f, 0.3f, 0.0f)),
      (12L, Seq(0.2f, 0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0f, 0.35f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(corpus, queries, "embedding", "vec_id",
        k = 3, lambda = 0.5, shortlist = 10).get
      .orderBy("rank")
      .select("candId", "rank").as[(Long, Int)].collect().toSeq
    assert(got == Seq((11L, 1), (12L, 2), (10L, 3)),
      s"diversity should reorder the redundant twin: $got")
  }

  test("mmrSelect at λ=1 degenerates to relevance ranking (bruteForceKnn order)") {
    val emb = (0L to 20L).map(i =>
      (i, Seq(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat, (i % 5) / 5.0f)))
    val corpus = emb.toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0f, 0.2f, 0.1f))).toDF("vec_id", "embedding")
    val mmr = Similarity.mmrSelect(corpus, queries, "embedding", "vec_id",
        k = 5, lambda = 1.0, shortlist = 21).get
      .orderBy("rank").select("candId").as[Long].collect().toSeq
    val knn = Similarity.bruteForceKnn(corpus, queries, "embedding", "vec_id", k = 5).get
      .orderBy("rank").select("neighborId").as[Long].collect().toSeq
    assert(mmr == knn, s"λ=1 must reduce to pure relevance: $mmr vs $knn")
  }

  test("mmrSelect emits fewer than k rows when the shortlist runs dry, ranks contiguous") {
    val corpus = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val queries = Seq((9L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(corpus, queries, "embedding", "vec_id",
        k = 5, lambda = 0.5, shortlist = 8).get
      .orderBy("rank").select("rank").as[Int].collect().toSeq
    assert(got == Seq(1, 2))
  }

  test("pairRecallEstimate: uncapped generator scores 1.0; cap-induced loss is measured") {
    // 30 clones in one boilerplate group (+ spread uniques): sampled at
    // 100% the truth is all clone pairs. Uncapped minhashPairs finds
    // every one; a maxBucket=10 cap drops the 30-occupant buckets and
    // the estimator must report that as recall 0, not silently pass.
    val boiler = (0L until 30L).map(i => (i, (1 to 30).map(w => s"b$w").mkString(" "))) ++
      (100L until 110L).map(i => (i, (1 to 30).map(w => s"u${i}x$w").mkString(" ")))
    val df = boiler.toDF("doc_id", "text")
    val full = Dedup.minhashPairs(df, "text", "doc_id", threshold = 0.5).get
    val r1 = Dedup.pairRecallEstimate(df, "text", "doc_id", full,
      threshold = 0.5, sampleFraction = 1.0).get.head()
    assert(r1.getAs[Long]("n_sampled") == 40)
    assert(r1.getAs[Long]("true_pairs") == 30L * 29 / 2)
    assert(r1.getAs[Double]("recall") == 1.0)
    val capped = Dedup.minhashPairs(df, "text", "doc_id", threshold = 0.5,
      maxBucket = 10).get
    val r2 = Dedup.pairRecallEstimate(df, "text", "doc_id", capped,
      threshold = 0.5, sampleFraction = 1.0).get.head()
    assert(r2.getAs[Long]("recalled_pairs") == 0 && r2.getAs[Double]("recall") == 0.0,
      "the cap silently dropped every clone bucket — the estimator must say so")
  }

  test("pairRecallEstimate counts pairs in either orientation and NULLs an empty truth") {
    val df = Seq(
      (0L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (1L, (1 to 40).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val reversed = Seq((1L, 0L)).toDF("idA", "idB") // generator emitted (B, A)
    val r = Dedup.pairRecallEstimate(df, "text", "doc_id", reversed,
      threshold = 0.5, sampleFraction = 1.0).get.head()
    assert(r.getAs[Long]("true_pairs") == 1 && r.getAs[Double]("recall") == 1.0)
    // unrelated docs: no truth pairs -> NULL recall (distinguishable from 0)
    val uniq = Seq(
      (0L, (1 to 40).map(i => s"a$i").mkString(" ")),
      (1L, (1 to 40).map(i => s"b$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r2 = Dedup.pairRecallEstimate(uniq, "text", "doc_id",
      spark.emptyDataFrame.select(lit(0L).as("idA"), lit(0L).as("idB")).limit(0),
      threshold = 0.5, sampleFraction = 1.0).get.head()
    assert(r2.getAs[Long]("true_pairs") == 0 && r2.isNullAt(r2.fieldIndex("recall")))
  }

  test("embeddingOutliers flags the planted off-distribution vector with the lowest z") {
    val tight = (0L until 8L).map(i =>
      (i, 0, Seq(1.0f, 0.05f * i, 0.0f))) // a tight +x cluster
    val planted = Seq((99L, 0, Seq(-1.0f, 0.2f, 0.0f))) // opposite direction
    val single = Seq((200L, 1, Seq(0.0f, 1.0f, 0.0f))) // singleton group
    val df = (tight ++ planted ++ single).toDF("vec_id", "label", "embedding")
    val got = Similarity.embeddingOutliers(df, "embedding", "vec_id", "label").get
    val z = got.filter($"label" === 0).orderBy("z")
      .select("vec_id", "z").as[(Long, Option[Double])].collect()
    assert(z.head._1 == 99L && z.head._2.exists(_ < -2.0),
      s"the planted opposite vector must carry the most negative z: ${z.toSeq}")
    assert(z.tail.forall(_._2.exists(_ > -1.5)))
    val lone = got.filter($"label" === 1).select("n_members", "z")
      .as[(Long, Option[Double])].head()
    assert(lone == ((1L, None)), "singleton groups must yield NULL z, not NaN")
    // null vectors drop instead of poisoning the centroid
    val withNull = df.union(Seq((300L, 0, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "label", "embedding"))
    assert(Similarity.embeddingOutliers(withNull, "embedding", "vec_id", "label")
      .get.count() == got.count())
  }

  test("mmrSelect validates its knobs") {
    val df = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.mmrSelect(df, df, "embedding", "vec_id", k = 0).isFailing)
    assert(Similarity.mmrSelect(df, df, "embedding", "vec_id", k = 5,
      shortlist = 3).isFailing)
    assert(Similarity.mmrSelect(df, df, "embedding", "vec_id", k = 1,
      lambda = 1.5).isFailing)
  }

  test("embeddingDrift: centroid cosine, norms, zero-centroid NULL") {
    import spark.implicits._
    val ref = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cur = Seq((3L, Array(0.0f, 2.0f))).toDF("vec_id", "embedding")
    val r = Similarity.embeddingDrift(ref, cur, "embedding").get
      .as[(Long, Long, Long, Option[Double], Double, Double)].head()
    assert(r._1 == 2L && r._2 == 1L && r._3 == 2L)
    assert(math.abs(r._4.get) < 1e-12) // orthogonal centroids
    assert(math.abs(r._5 - 1.0) < 1e-12 && math.abs(r._6 - 2.0) < 1e-12)
    // identical corpora → cosine exactly 1
    val same = Similarity.embeddingDrift(ref, ref, "embedding").get
      .select("centroid_cosine").as[Option[Double]].head()
    assert(math.abs(same.get - 1.0) < 1e-12)
    // zero centroid → NULL cosine
    val zero = Seq((4L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.embeddingDrift(ref, zero, "embedding").get
      .select("centroid_cosine").as[Option[Double]].head().isEmpty)
  }

  test("containmentPairs: asymmetric containment found where Jaccard is small") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),                    // 4 distinct 5-grams
      (2L, "a b c d e f g h x y"),                // superset: 6 grams
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id",
        n = 5, threshold = 0.8, maxGramDf = 10).get
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.length == 1)
    val p = got.head
    assert((p._1, p._2, p._3, p._4, p._5) == ((1L, 2L, 4L, 4L, 6L)))
    assert(p._6 == 1.0 && math.abs(p._7 - 0.666667) < 1e-9)
    // the same pair's Jaccard is 4/6 — a 0.8-Jaccard screen misses it
    // while 0.8-containment catches it (that asymmetry is the point)
  }

  test("containmentPairs: hot grams capped before pairing; report lists them") {
    import spark.implicits._
    // three docs share one 2-gram ("x y"); cap df at 2 -> it never pairs
    val docs = Seq((1L, "x y a"), (2L, "x y b"), (3L, "x y c"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(docs, "text", "doc_id",
      n = 2, threshold = 0.1, maxGramDf = 2).get
    assert(capped.count() == 0)
    val report = Dedup.containmentCapReport(docs, "text", "doc_id",
        n = 2, maxGramDf = 2).get
      .as[(String, Long)].collect().toSeq
    assert(report == Seq(("x y", 3L)))
    // uncapped: every pair shares exactly the hot gram
    val open = Dedup.containmentPairs(docs, "text", "doc_id",
      n = 2, threshold = 0.1, maxGramDf = 10).get
    assert(open.count() == 3)
  }

  test("contaminationScreen: gram overlap counts, clean docs absent") {
    import spark.implicits._
    val train = Seq((1L, "a b c d e f"), (2L, "x y z w"), (3L, "q q q"))
      .toDF("doc_id", "text")
    val bench = Seq((10L, "c d e f g"), (11L, "x y z"))
      .toDF("doc_id", "text")
    val got = Dedup.contaminationScreen(train, bench, "text", "doc_id",
        n = 3).get
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // d1: 4 grams, hits {c d e, d e f} from b10 → 2/4; d2: 2 grams,
    // hits {x y z} from b11 → 1/2; d3 shares nothing → absent
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((1L, 4L, 2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 2L, 1L, 1L, 0.5)))
    // n larger than every doc: nothing to flag
    assert(Dedup.contaminationScreen(train, bench, "text", "doc_id",
      n = 20).get.count() == 0)
  }

  test("containmentPairsAgainst: new-in-ref quote detection, ref-side cap") {
    // ref r1 = "a b c d e f g h"; new n1 quotes its middle exactly
    val ref = Seq((10L, "a b c d e f g h"), (11L, "p q r s t u"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "c d e f g"), (2L, "zz yy xx ww vv"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairsAgainst(nw, ref, "text", "doc_id",
        n = 3, threshold = 0.5, maxGramDf = 100L).get
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    // n1 has 3 trigrams, all inside r1 (6 trigrams): containment_new 1.0
    assert(got.length == 1)
    assert(got.head._1 == 1L && got.head._2 == 10L && got.head._3 == 3L)
    assert(got.head._6 == 1.0 && got.head._7 == 0.5)
    // a ref-side stop-gram cap drops the candidates it spans
    val refDup = ref.union(Seq((12L, "c d e f g")).toDF("doc_id", "text"))
    val capped = Dedup.containmentPairsAgainst(nw, refDup, "text",
      "doc_id", n = 3, threshold = 0.9, maxGramDf = 100L).get.count()
    assert(capped == 2L) // n1 matches r1 AND r12 at full containment
  }

  test("embeddingHealth: nulls, zero norms, mixed dims, norm percentiles") {
    val rows = Seq(
      Some(Seq(3.0f, 4.0f)),       // norm 5
      Some(Seq(0.0f, 0.0f)),       // zero norm
      Some(Seq(1.0f, 0.0f, 0.0f)), // dim 3, norm 1
      None)
    val df = rows.toDF("embedding")
    val r = Similarity.embeddingHealth(df, "embedding").get
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 2L && r.getInt(4) == 2 && r.getInt(5) == 3)
    // norms sorted [0, 1, 5]: p50 → ceil(1.5)=2nd → 1; p95 → 3rd → 5
    assert(r.getDouble(6) == 1.0 && r.getDouble(7) == 5.0)
  }

  test("urlDedup: address variants collapse to min-id keeper, distinct " +
      "pages and null urls survive") {
    val df = Seq(
      (1L, "HTTP://A.com:80/x?utm_source=f#top"), // canon http://a.com/x
      (2L, "http://a.com/x"),                     // same page → dropped
      (3L, "http://a.com/x?id=1"),                // real param → distinct
      (4L, "http://a.com/y"),                     // different path
      (5L, null.asInstanceOf[String]),            // null url → kept
      (6L, null.asInstanceOf[String])             // second null → kept too
    ).toDF("doc_id", "url")
    val kept = Dedup.urlDedup(df, "url", "doc_id").get
      .select("doc_id", "canonical_url")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(kept.keySet == Set(1L, 3L, 4L, 5L, 6L), s"$kept")
    assert(kept(1L) == "http://a.com/x")
    assert(kept(3L) == "http://a.com/x?id=1")
  }

  // --- kCenterSelect ---------------------------------------------------

  private def kcDf(pts: Seq[(Long, Seq[Float])]) =
    pts.toDF("vec_id", "embedding")

  test("kCenterSelect matches an in-memory greedy reference") {
    // 2-D points with an obvious spread: clusters at (0,0), (10,0), (0,10)
    val pts = Seq(
      1L -> Seq(0f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(10f, 0f),
      4L -> Seq(10f, 1f), 5L -> Seq(0f, 10f), 6L -> Seq(1f, 10f))
    val got = Similarity.kCenterSelect(kcDf(pts), "vec_id", "embedding", 3)
      .get.select("round", "id", "sel_dist")
      .as[(Int, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    // reference: seed=1 (min id); round 2 argmax of dist to {1}: ids 3/4/5/6
    // have d 100, 101, 100, 101 -> max 101, tie ids 4,6 -> 4; round 3:
    // min-dist to {1,4}: id5 d=min(100, (10-0)^2+(1-10)^2=181)=100,
    // id6 d=min(101, 81+81=162)... compute in test instead
    def sq(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    var centers = Seq(pts.minBy(_._1))
    var want = Seq((1, 1L, Option.empty[Double]))
    for (r <- 2 to 3) {
      val rest = pts.filterNot(p => centers.exists(_._1 == p._1))
      val scored = rest.map(p =>
        (p, centers.map(c => sq(p._2, c._2)).min))
      val best = scored.minBy { case (p, d) => (-d, p._1) }
      centers :+= best._1
      want :+= ((r, best._1._1,
        Some(BigDecimal(best._2 + 1e-9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }
    assert(got == want, s"got $got want $want")
  }

  test("kCenterSelect coverage radius is non-increasing") {
    val rnd = new scala.util.Random(7L)
    val pts = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 10)))
    val d = Similarity.kCenterSelect(kcDf(pts), "vec_id", "embedding", 10)
      .get.orderBy("round").select("sel_dist")
      .as[Option[Double]].collect().toSeq.flatten
    assert(d.size == 9 && d.zip(d.tail).forall { case (a, b) => a >= b }, s"$d")
  }

  test("kCenterSelect ignores exact-duplicate points with higher ids") {
    val rnd = new scala.util.Random(11L)
    val pts = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(6)(rnd.nextFloat())))
    val dup = pts ++ pts.map { case (id, v) => (id + 1000L, v) }
    val base = Similarity.kCenterSelect(kcDf(pts), "vec_id", "embedding", 6)
      .get.select("round", "id", "sel_dist")
      .as[(Int, Long, Option[Double])].collect().toSeq.sorted
    val withDups = Similarity.kCenterSelect(kcDf(dup), "vec_id", "embedding", 6)
      .get.select("round", "id", "sel_dist")
      .as[(Int, Long, Option[Double])].collect().toSeq.sorted
    assert(base == withDups)
  }

  test("kCenterSelect stops early when points run out and validates k") {
    val pts = Seq(1L -> Seq(0f, 0f), 2L -> Seq(3f, 4f))
    val got = Similarity.kCenterSelect(kcDf(pts), "vec_id", "embedding", 5)
      .get.select("round", "id").as[(Int, Long)].collect().toSeq.sorted
    assert(got == Seq((1, 1L), (2, 2L)))
    assert(Similarity.kCenterSelect(kcDf(pts), "vec_id", "embedding", 0)
      .isFailing)
  }

  // --- knnOutlierScores --------------------------------------------------

  test("knnOutlierScores ranks the isolated point highest") {
    val pts = Seq(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0.999f, 0.01f, 0f),
      3L -> Seq(0.998f, 0.02f, 0f), 4L -> Seq(0f, 0f, 1f))
    val got = Similarity.knnOutlierScores(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2).get
      .orderBy(col("outlier_score").desc)
      .select("id").as[Long].collect().toSeq
    assert(got.head == 4L && got.size == 4)
  }

  test("knnOutlierScores equals bruteForceKnn's k-th cosine") {
    val rnd = new scala.util.Random(5L)
    val pts = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(6)(rnd.nextFloat() - 0.5f)))
    val df = pts.toDF("vec_id", "embedding")
    val viaKnn = Similarity.bruteForceKnn(df, df, "embedding", "vec_id", 3)
      .get.filter(col("rank") === 3)
      .select(col("queryId"), col("cosine"))
      .as[(Long, Double)].collect().toMap
    val got = Similarity.knnOutlierScores(df, "vec_id", "embedding", 3).get
      .select("id", "knn_cosine").as[(Long, Double)].collect().toMap
    assert(got == viaKnn)
  }

  test("knnOutlierScores drops short groups and validates k") {
    val two = Seq(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
      .toDF("vec_id", "embedding")
    assert(Similarity.knnOutlierScores(two, "vec_id", "embedding", 2)
      .get.count() == 0)
    assert(Similarity.knnOutlierScores(two, "vec_id", "embedding", 1)
      .get.count() == 2)
    assert(Similarity.knnOutlierScores(two, "vec_id", "embedding", 0)
      .isFailing)
  }
}
