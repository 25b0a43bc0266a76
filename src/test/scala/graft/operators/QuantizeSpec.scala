package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def randomVecs(n: Int, dims: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dims)(rnd.nextFloat() * 4f - 2f)))
  }

  test("sqEncode codes are bytes and reconstruction error is within scale/2") {
    val df = randomVecs(50, 16, seed = 11L).toDF("id", "vec")
    val enc = Quantize.sqEncode(df, "vec", "id").get
    val checked = enc.join(df, "id")
      .withColumn("dec", Quantize.sqDecode(col("codes"), col("vmin"), col("vmax")))
      .select(
        array_min(col("codes")).as("cmin"),
        array_max(col("codes")).as("cmax"),
        array_max(zip_with(col("vec").cast("array<double>"), col("dec"),
          (x, d) => abs(x - d))).as("max_err"),
        ((col("vmax") - col("vmin")) / 255.0 / 2.0).as("bound"))
      .as[(Byte, Byte, Double, Double)].collect()
    checked.foreach { case (cmin, cmax, err, bound) =>
      assert(cmin >= -128 && cmax <= 127)
      assert(err <= bound * (1 + 1e-9))
    }
  }

  test("constant vectors encode to zero codes and decode exactly") {
    val df = Seq((1L, Array.fill(8)(3.5f))).toDF("id", "vec")
    val enc = Quantize.sqEncode(df, "vec", "id").get
    val (codes, dec) = enc
      .withColumn("dec", Quantize.sqDecode(col("codes"), col("vmin"), col("vmax")))
      .select("codes", "dec").as[(Seq[Byte], Seq[Double])].head()
    assert(codes.forall(_ == -128.toByte)) // unsigned code 0
    assert(dec.forall(_ == 3.5))
  }

  test("shortlistReport counts the candidates the shortlist cap cuts") {
    val df = randomVecs(120, 12, seed = 31L).toDF("id", "vec")
      // one null vector: not a scorable candidate, must not count
      .union(Seq((999L, null.asInstanceOf[Array[Float]])).toDF("id", "vec"))
    val queries = df.filter(col("id") < 3 || col("id") === 999L)
    val rep = Quantize.shortlistReport(df, queries, "vec", "id", shortlistK = 50).get
      .orderBy("queryId")
      .as[(Long, Long, Long, Long)].collect()
    assert(rep.length == 4)
    rep.foreach { case (qid, cand, shortlisted, truncated) =>
      // 120 non-null corpus rows; a query with a non-null corpus row
      // excludes itself, the null-vector query (999) excludes nothing
      val expectCand = if (qid == 999L) 120L else 119L
      assert(cand == expectCand, s"query $qid")
      assert(shortlisted == 50 && truncated == expectCand - 50)
    }
    // an exhaustive shortlist reports zero truncation — the same setting
    // under which binKnn provably equals brute force
    val none = Quantize.shortlistReport(df, queries, "vec", "id",
      shortlistK = 1 << 20).get.agg(sum("n_truncated")).head().getLong(0)
    assert(none == 0)
  }

  test("sqKnn with exhaustive shortlist reproduces exact brute-force top-k") {
    val data = randomVecs(120, 12, seed = 23L)
    val df = data.toDF("id", "vec")
    val queries = df.filter(col("id") < 5)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val viaSq = Quantize.sqKnn(df, queries, "vec", "id", k = 5, shortlistK = 1 << 20).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(viaSq == exact)
  }

  test("sqKnn with a tight shortlist keeps high recall on int8 reconstructions") {
    val data = randomVecs(200, 16, seed = 37L)
    val df = data.toDF("id", "vec")
    val queries = df.filter(col("id") < 10)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val approx = Quantize.sqKnn(df, queries, "vec", "id", k = 5, shortlistK = 15).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9 - int8 error should barely perturb ranking")
  }

  test("shortlist smaller than k is rejected") {
    val df = randomVecs(10, 4, seed = 5L).toDF("id", "vec")
    assert(Quantize.sqKnn(df, df, "vec", "id", k = 10, shortlistK = 5) match {
      case graft.functional.Fail(e) => e.getMessage.contains("shortlistK")
      case _                        => false
    })
    assert(Quantize.binKnn(df, df, "vec", "id", k = 10, shortlistK = 5).isFailing)
  }

  test("binEncode packs sign bits into 32-bit words (known vector)") {
    // 36 dims: bits 0,2 of word 0 and bit 3 (dim 35) of word 1 positive
    val v = Array.fill(36)(-1f)
    v(0) = 1f; v(2) = 0.5f; v(35) = 2f
    val got = Quantize.binEncode(Seq((0L, v)).toDF("id", "vec"), "vec", "id").get
      .select("bin_code").as[Seq[Long]].head()
    assert(got == Seq(1L + 4L, 8L), got)
    // zero is NOT positive: a zero vector encodes to all-zero words
    val z = Quantize.binEncode(Seq((0L, Array.fill(33)(0f))).toDF("id", "vec"),
      "vec", "id").get.select("bin_code").as[Seq[Long]].head()
    assert(z == Seq(0L, 0L))
    // empty → empty, null → null (no ANSI element_at blow-up)
    val edge = Quantize.binEncode(
      Seq((0L, Some(Array.empty[Float])), (1L, Option.empty[Array[Float]]))
        .toDF("id", "vec"), "vec", "id").get
      .orderBy("id").select("bin_code").as[Option[Seq[Long]]].collect().toSeq
    assert(edge == Seq(Some(Seq.empty), None))
  }

  test("binKnn ignores null-embedding corpus rows instead of shortlisting them first") {
    val good = randomVecs(30, 8, seed = 3L)
    val df = (good.map { case (i, v) => (i, Option(v)) } ++
      (100 until 140).map(i => (i.toLong, Option.empty[Array[Float]])))
      .toDF("id", "vec")
    val queries = good.take(2).toDF("id", "vec")
    val got = Quantize.binKnn(df, queries, "vec", "id", k = 3, shortlistK = 5).get
      .select("neighborId").as[Long].collect()
    // 40 null rows > shortlistK: results must still be real neighbors
    assert(got.nonEmpty && got.forall(_ < 100L), got.toSeq)
  }

  test("hammingDistance counts differing sign bits across words") {
    val a = Array.fill(40)(1f)
    val b = Array.fill(40)(1f)
    b(1) = -1f; b(38) = -1f // two flipped signs, one per word
    val enc = Seq((0L, a), (1L, b)).toDF("id", "vec")
    val codes = Quantize.binEncode(enc, "vec", "id").get
      .orderBy("id").select("bin_code").as[Seq[Long]].collect()
    val viaCodes = Seq((codes(0), codes(1))).toDF("ca", "cb")
      .select(Quantize.hammingDistance(col("ca"), col("cb"))).as[Long].head()
    assert(viaCodes == 2L)
  }

  test("binKnn with exhaustive shortlist reproduces exact brute-force top-k") {
    val data = randomVecs(120, 12, seed = 23L)
    val df = data.toDF("id", "vec")
    val queries = df.filter(col("id") < 5)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val viaBin = Quantize.binKnn(df, queries, "vec", "id", k = 5, shortlistK = 1 << 20).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(viaBin == exact)
  }

  test("binKnn keeps useful recall at a production shortlist (coarser than SQ8)") {
    val data = randomVecs(200, 64, seed = 37L)
    val df = data.toDF("id", "vec")
    val queries = df.filter(col("id") < 10)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val approx = Quantize.binKnn(df, queries, "vec", "id", k = 5, shortlistK = 50).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall below 0.7 for 64-dim sign codes at shortlist 50")
  }

  test("pqEncode emits m codes in [0, cells); ADC score is the table lookup sum") {
    val df = randomVecs(60, 16, seed = 41L).toDF("id", "vec")
    val enc = Quantize.pqEncode(df, "vec", "id", m = 4, cells = 8).get
    val codes = enc.select("codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    // ADC against a vector's OWN table must equal the sum of its argmax
    // projections — recompute both sides through the public columns
    import graft.functions.VectorFunctions._
    val self = df.select(col("id"),
        portablePqCodes(col("vec"), 4, 8).as("c"),
        portablePqTable(col("vec"), 4, 8).as("t"))
      .withColumn("adc", pqAdcScore(col("c"), col("t")))
      .withColumn("manual",
        expr("aggregate(transform(c, (x, s) -> t[s * 8 + x]), 0D, (a, b) -> a + b)"))
      .select(abs(col("adc") - col("manual")).as("d")).as[Double].collect()
    assert(self.forall(_ == 0.0), "kernel ADC must equal the HOF-replayed lookup sum")
  }

  test("pqKnn with exhaustive shortlist reproduces exact brute-force top-k") {
    val data = randomVecs(120, 16, seed = 23L)
    val df = data.toDF("id", "vec")
    val queries = df.filter(col("id") < 5)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val viaPq = Quantize.pqKnn(df, queries, "vec", "id", k = 5,
        m = 4, cells = 8, shortlistK = 1 << 20).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(viaPq == exact)
  }

  test("pqKnn recall on clustered data: ADC shortlist finds same-cluster neighbors") {
    // 5 planted directions, 40 noisy members each: the regime PQ exists
    // for. MEASURED recall@5 with a 15% shortlist must stay high — the
    // ADC ordering does real selection work here, not just the rerank.
    val rnd = new scala.util.Random(7L)
    val bases = Seq.fill(5)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    val data = Seq.tabulate(200) { i =>
      val b = bases(i % 5)
      (i.toLong, b.map(x => x + (rnd.nextFloat() * 0.2f - 0.1f)))
    }
    val df = data.toDF("id", "vec")
    val queries = df.filter(col("id") < 10)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val approx = Quantize.pqKnn(df, queries, "vec", "id", k = 5,
        m = 4, cells = 8, shortlistK = 30).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall below 0.7 on clustered data at shortlist 30")
  }

  test("pqEncodeWith: l2 picks the nearest center, dot the largest projection, ties low") {
    // 1-subspace, 2-dim, hand-placed centers: vector (1, 0) is L2-nearest
    // to cell 0 at (0.9, 0) but projects larger onto cell 1 at (9, 9)
    val cb = Seq((0, 0, Seq(0.9f, 0.0f)), (0, 1, Seq(9.0f, 9.0f)))
      .toDF("s", "cell", "centroid")
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val l2 = Quantize.pqEncodeWith(df, "vec", "id", cb, m = 1, metric = "l2").get
      .select("codes").as[Seq[Int]].head()
    assert(l2 == Seq(0), "l2 must pick the nearest center, not the biggest projection")
    val dot = Quantize.pqEncodeWith(df, "vec", "id", cb, m = 1, metric = "dot").get
      .select("codes").as[Seq[Int]].head()
    assert(dot == Seq(1))
    // exact tie (duplicate centers) → smaller cell
    val tieCb = Seq((0, 3, Seq(1.0f, 1.0f)), (0, 1, Seq(1.0f, 1.0f)))
      .toDF("s", "cell", "centroid")
    val tie = Quantize.pqEncodeWith(df, "vec", "id", tieCb, m = 1).get
      .select("codes").as[Seq[Int]].head()
    assert(tie == Seq(1))
  }

  test("pqKnnWith with exhaustive shortlist reproduces exact brute-force top-k") {
    val data = randomVecs(120, 16, seed = 29L)
    val df = data.toDF("id", "vec")
    val queries = df.filter(col("id") < 5)
    val rnd = new scala.util.Random(3L)
    val cb = (for { s <- 0 until 4; c <- 0 until 8 }
      yield (s, c, Seq.fill(4)(rnd.nextFloat() * 2f - 1f))).toDF("s", "cell", "centroid")
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val viaPq = Quantize.pqKnnWith(df, queries, "vec", "id", cb,
        m = 4, cells = 8, k = 5, shortlistK = 1 << 20).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(viaPq == exact)
  }

  test("pqKnnWith composes with real per-subspace k-means training") {
    // the intended production flow: train spark.ml KMeans on each
    // subvector slice, feed the centers in as the codebook
    val rnd = new scala.util.Random(7L)
    val bases = Seq.fill(5)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    val data = Seq.tabulate(200) { i =>
      val b = bases(i % 5)
      (i.toLong, b.map(x => x + (rnd.nextFloat() * 0.2f - 0.1f)))
    }
    val df = data.toDF("id", "vec")
    val m = 4; val sub = 4; val cells = 8
    val cb = (0 until m).flatMap { s =>
      val withFeat = df.selectExpr(s"slice(vec, ${s * sub} + 1, $sub) AS sv")
        .selectExpr((0 until sub).map(i => s"CAST(sv[$i] AS DOUBLE) AS f$i"): _*)
      val feat = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols((0 until sub).map(i => s"f$i").toArray)
        .setOutputCol("features").transform(withFeat)
      val km = new org.apache.spark.ml.clustering.KMeans()
        .setK(cells).setSeed(42L).setFeaturesCol("features").fit(feat)
      km.clusterCenters.zipWithIndex.map { case (ctr, cell) =>
        (s, cell, ctr.toArray.map(_.toFloat).toSeq)
      }
    }.toDF("s", "cell", "centroid")
    val queries = df.filter(col("id") < 10)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val approx = Quantize.pqKnnWith(df, queries, "vec", "id", cb,
        m = m, cells = cells, k = 5, shortlistK = 30).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7,
      s"trained-codebook recall $recall below 0.7 on clustered data at shortlist 30")
  }

  test("ivfPqKnn: exhaustive settings reproduce exact top-k; pruned probes keep recall") {
    val rnd = new scala.util.Random(7L)
    val bases = Seq.fill(5)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    val data = Seq.tabulate(200) { i =>
      val b = bases(i % 5)
      (i.toLong, b.map(x => x + (rnd.nextFloat() * 0.2f - 0.1f)))
    }
    val df = data.toDF("id", "vec")
    val queries = df.filter(col("id") < 10)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val exhaustive = Quantize.ivfPqKnn(df, queries, "vec", "id", k = 5,
        nCentroids = 8, nProbe = 8, m = 4, cells = 8, shortlistK = 1 << 20).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(exhaustive == exact,
      "probe-all + exhaustive shortlist must equal exact brute force")
    // pruned: 2 of 8 cells probed, tight shortlist — the clustered
    // structure should keep most true neighbors reachable
    val pruned = Quantize.ivfPqKnn(df, queries, "vec", "id", k = 5,
        nCentroids = 8, nProbe = 2, m = 4, cells = 8, shortlistK = 30).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val recall = (exactSet intersect pruned).size.toDouble / exactSet.size
    assert(recall >= 0.6, s"IVF-PQ recall $recall below 0.6 at nProbe=2/8, shortlist 30")
    assert(Quantize.ivfPqKnn(df, df, "vec", "id", nProbe = 9, nCentroids = 8).isFailing)
  }

  // shared clustered fixture for the caller-codebook IVF path: 5 blobs,
  // coarse centers from the blob means (what a trained router would
  // find), PQ codebook from per-subspace perturbed means
  private def ivfFixture(): (
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val rnd = new scala.util.Random(19L)
    val bases = Seq.fill(5)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    val data = Seq.tabulate(200) { i =>
      val b = bases(i % 5)
      (i.toLong, b.map(x => x + (rnd.nextFloat() * 0.2f - 0.1f)))
    }
    val df = data.toDF("id", "vec")
    val coarse = bases.zipWithIndex
      .map { case (b, c) => (c, b.toSeq) }
      .toDF("cell", "centroid")
    val cb = (for {
      s <- 0 until 4
      c <- 0 until 8
    } yield {
      val base = bases(c % 5).slice(s * 4, s * 4 + 4)
      (s, c, base.map(x => x * (1f + 0.1f * (c / 5))).toSeq)
    }).toDF("s", "cell", "centroid")
    (df, coarse, cb)
  }

  test("ivfPqKnnWith: exhaustive probes + shortlist reproduce exact top-k") {
    val (df, coarse, cb) = ivfFixture()
    val queries = df.filter(col("id") < 10)
    val exact = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val exhaustive = Quantize.ivfPqKnnWith(df, queries, "vec", "id",
        coarse, cb, m = 4, cells = 8, k = 5, nProbe = 5,
        shortlistK = 1 << 20).get
      .select("queryId", "neighborId", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(exhaustive == exact,
      "probe-all + exhaustive shortlist must equal exact brute force")
  }

  test("ivfPqKnnWith: pruned probes keep recall on clustered data") {
    val (df, coarse, cb) = ivfFixture()
    val queries = df.filter(col("id") < 10)
    val exactSet = Similarity.bruteForceKnn(df, queries, "vec", "id", k = 5).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val pruned = Quantize.ivfPqKnnWith(df, queries, "vec", "id",
        coarse, cb, m = 4, cells = 8, k = 5, nProbe = 2, shortlistK = 30).get
      .select("queryId", "neighborId").as[(Long, Long)].collect().toSet
    val recall = (exactSet intersect pruned).size.toDouble / exactSet.size
    assert(recall >= 0.6,
      s"caller-codebook IVF recall $recall below 0.6 at nProbe=2/5")
  }

  test("codebookPqCodes kernel agrees with pqEncodeWith on both metrics") {
    val (df, _, cb) = ivfFixture()
    import graft.functions.VectorFunctions.codebookPqCodes
    // flatten the codebook the way ivfPqKnnWith does
    val rows = cb.select(col("s"), col("cell"), col("centroid")).collect()
    val byKey = rows.map(r => ((r.getInt(0), r.getInt(1)),
      r.getSeq[Float](2).map(_.toDouble).toArray)).toMap
    val flat = new Array[Double](4 * 8 * 4)
    for (s <- 0 until 4; c <- 0 until 8; i <- 0 until 4)
      flat((s * 8 + c) * 4 + i) = byKey((s, c))(i)
    for (metric <- Seq("l2", "dot")) {
      val viaJoin = Quantize.pqEncodeWith(df, "vec", "id", cb, m = 4,
          metric = metric).get
        .select(col("id"), col("codes"))
        .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
      val viaKernel = df
        .select(col("id"),
          codebookPqCodes(col("vec"), flat, 4, 8, metric == "l2").as("codes"))
        .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
      assert(viaKernel == viaJoin, s"kernel vs join codes differ for $metric")
    }
  }

  test("ivfScanReport: probed fraction tracks nProbe/nCells and bounds the scan") {
    val (df, coarse, _) = ivfFixture()
    val queries = df.filter(col("id") < 10)
    val rep = Quantize.ivfScanReport(df, queries, "vec", "id", coarse,
        nProbe = 2).get
      .as[(Long, Long, Long, Double)].collect()
    assert(rep.length == 10)
    rep.foreach { case (_, probed, corpus, frac) =>
      assert(corpus == 200 && probed >= 1 && probed < corpus)
      assert(math.abs(frac - probed.toDouble / corpus) < 1e-12)
    }
    // balanced blobs: mean fraction should be near 2/5, certainly < 3/5
    val mean = rep.map(_._4).sum / rep.length
    assert(mean <= 0.6, s"mean scan fraction $mean suspiciously high")
  }

  test("ivfPqKnnWith plan: candidate scan is cell-filtered — hash join on " +
      "the probed cell, never a nested loop over the corpus") {
    val (local, coarse, cb) = ivfFixture()
    // a LocalRelation would let ConvertToLocalRelation eagerly evaluate
    // the per-row kernels out of the plan — round-trip through parquet
    // so the plan shows what a real scan would run
    val dir = java.nio.file.Files.createTempDirectory("ivfplan").toString
    local.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = Quantize.ivfPqKnnWith(df, df.filter(col("id") < 5), "vec",
        "id", coarse, cb, m = 4, cells = 8, k = 3, nProbe = 2,
        shortlistK = 20).get
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("codebook_probes") &&
      plan.contains("codebook_pq_codes") && plan.contains("pq_adc_score"),
      "caller-codebook kernels missing from the plan")
    assert(plan.contains("BroadcastHashJoin"),
      "cell-keyed candidate join is not a broadcast hash join")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"IVF degenerated to an all-pairs join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      "shortlist rank-limit pushdown missing")
  }

  test("ivfEncodeWith + ivfSearchEncoded: the stored-index round trip " +
      "(cell-partitioned parquet) equals the one-shot operator") {
    val (df, coarse, cb) = ivfFixture()
    val queries = df.filter(col("id") < 10)
    val direct = Quantize.ivfPqKnnWith(df, queries, "vec", "id",
        coarse, cb, m = 4, cells = 8, k = 5, nProbe = 2, shortlistK = 30).get
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Quantize.ivfEncodeWith(df, "vec", "id", coarse, cb, m = 4,
        cells = 8).get
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val stored = spark.read.parquet(dir)
    val viaIndex = Quantize.ivfSearchEncoded(stored, df, queries, "vec",
        "id", coarse, cb, m = 4, cells = 8, k = 5, nProbe = 2,
        shortlistK = 30).get
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex == direct,
      "search over the stored index must equal the one-shot result")
  }

  test("ivfSearchEncoded plan: stored-list scan PARTITION-PRUNES to the " +
      "probed cells (VERDICT r10 #1 — files of non-probed cells never read)") {
    val (df, coarse, cb) = ivfFixture()
    val dir = java.nio.file.Files.createTempDirectory("ivfprune").toString
    Quantize.ivfEncodeWith(df, "vec", "id", coarse, cb, m = 4,
        cells = 8).get
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val stored = spark.read.parquet(dir)
    val search = Quantize.ivfSearchEncoded(stored, df,
      df.filter(col("id") < 3), "vec", "id", coarse, cb, m = 4,
      cells = 8, k = 3, nProbe = 1, shortlistK = 20).get
    val plan = search.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the probed-cell IN filter must land in the scan's PartitionFilters
    // (directory-level pruning), not merely in a post-scan Filter
    val pf = raw"PartitionFilters: \[[^\]]*cell[^\]]*\]".r.findFirstIn(plan)
    assert(pf.isDefined,
      s"stored-list scan has no cell PartitionFilters:\n$plan")
    assert(pf.get.contains("IN") || pf.get.contains("INSET") ||
      pf.get.contains("="),
      s"PartitionFilters carry no probed-cell membership test: ${pf.get}")
    // and the pruned search still returns the one-shot operator's answer
    val direct = Quantize.ivfPqKnnWith(df, df.filter(col("id") < 3), "vec",
        "id", coarse, cb, m = 4, cells = 8, k = 3, nProbe = 1,
        shortlistK = 20).get
      .collect().map(_.toString).sorted.toSeq
    assert(search.collect().map(_.toString).sorted.toSeq == direct)
  }

  test("ivfPqKnnWith validates codebooks and knobs") {
    val (df, coarse, cb) = ivfFixture()
    assert(Quantize.ivfPqKnnWith(df, df, "vec", "id", coarse, cb,
      m = 4, cells = 8, nProbe = 6).isFailing) // nProbe > nCells
    assert(Quantize.ivfPqKnnWith(df, df, "vec", "id", coarse, cb,
      m = 4, cells = 8, k = 10, shortlistK = 5).isFailing)
    // gap in coarse cells
    val badCoarse = coarse.filter(col("cell") =!= 2)
    assert(Quantize.ivfPqKnnWith(df, df, "vec", "id", badCoarse, cb,
      m = 4, cells = 8).isFailing)
    // missing codebook row
    val badCb = cb.filter(!(col("s") === 1 && col("cell") === 3))
    assert(Quantize.ivfPqKnnWith(df, df, "vec", "id", coarse, badCb,
      m = 4, cells = 8).isFailing)
    // codebook sub-dimension inconsistent with the coarse dimension
    assert(Quantize.ivfPqKnnWith(df, df, "vec", "id", coarse, cb,
      m = 2, cells = 8).isFailing)
  }

  test("pqKnn and pqEncode validate their knobs") {
    val df = randomVecs(10, 16, seed = 5L).toDF("id", "vec")
    assert(Quantize.pqKnn(df, df, "vec", "id", k = 10, shortlistK = 5).isFailing)
    assert(Quantize.pqKnn(df, df, "vec", "id", k = 1, cells = 1).isFailing)
    assert(Quantize.pqEncode(df, "vec", "id", m = 0).isFailing)
  }

  // --- randomProject -------------------------------------------------------

  test("randomProject preserves pairwise distances in the JL sense") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41L)
    val pts = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = pts.toDF("vec_id", "embedding")
    val proj = Quantize.randomProject(df, "embedding", outDim = 16,
        normalize = true).get
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = pts.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val ratios = for {
      i <- pts.indices; j <- (i + 1) until pts.size
      a = pts(i)._1; b = pts(j)._1
    } yield d2(proj(a), proj(b)) / d2(orig(a), orig(b))
    // unbiased on average, bounded spread at outDim = 16
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"JL ratio mean off: $mean")
    assert(ratios.count(r => r > 0.3 && r < 2.2) > ratios.size * 95 / 100,
      "too many badly-distorted pairs")
    // deterministic across runs and partitionings
    val again = Quantize.randomProject(df.repartition(7), "embedding",
        outDim = 16, normalize = true).get
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    assert(again == proj)
    assert(Quantize.randomProject(df, "embedding", 0).isFailing)
    assert(Quantize.randomProject(df, "embedding", 65).isFailing)
    assert(Quantize.randomProject(df.limit(0), "embedding", 8).isFailing)
  }

  test("randomProject fails loudly on ragged vectors, NULL stays NULL") {
    // zip_with would silently NULL-pad a short vector (or drop the
    // tail of a long one) — the per-row guard must raise instead
    val ragged = Seq(
      (1L, Option(Seq.fill(8)(1.0f))),
      (2L, Option(Seq.fill(5)(1.0f)))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Quantize.randomProject(ragged, "embedding", outDim = 4).get
        .select("proj").collect()
    }
    assert(exceptionChain(ex).exists(_.getMessage != null) &&
      exceptionChain(ex).exists(m => m.getMessage != null &&
        m.getMessage.contains("ragged")),
      s"expected a ragged-vector error, got: $ex")
    // a NULL vector projects to NULL, not an array of NULLs
    val withNull = Seq(
      (1L, Option(Seq.fill(8)(0.5f))),
      (2L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val got = Quantize.randomProject(withNull, "embedding", outDim = 4).get
      .orderBy("vec_id").select("proj")
      .as[Option[Seq[Double]]].collect().toSeq
    assert(got.size == 2 && got.head.isDefined && got(1).isEmpty, s"$got")
  }

  private def exceptionChain(t: Throwable): List[Throwable] =
    if (t == null) Nil else t :: exceptionChain(t.getCause)
}
