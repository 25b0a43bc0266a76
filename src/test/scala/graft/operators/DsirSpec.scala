package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DsirSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  test("logWeights ranks target-like docs above off-target docs") {
    val target = Seq(
      (1000L, "apple banana cherry apple banana"),
      (1001L, "banana cherry apple cherry")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (0L, "apple banana cherry banana"),   // target vocabulary
      (1L, "xylophone quartz vortex nebula"), // disjoint vocabulary
      (2L, "")                               // gram-less
    ).toDF("doc_id", "text")
    val w = Dsir.logWeights(raw, target, "text", "doc_id", nBuckets = 256).get
      .select("doc_id", "n_grams", "log_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(w.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(w(0)._3 > w(1)._3, s"target-like must outrank off-target: $w")
    assert(w(2) == ((2L, 0L, 0.0)))          // empty doc: zero grams, zero weight
    assert(w(0)._2 == 7L)                    // 4 unigrams + 3 bigrams
  }

  test("logWeights is invariant to raw-pool row order (pure plan)") {
    val target = Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq((0L, "alpha beta"), (1L, "delta epsilon"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val a = Dsir.logWeights(raw, target, "text", "doc_id", nBuckets = 64).get
      .as[(Long, Long, Double)].collect().toSet
    val b = Dsir.logWeights(raw.orderBy(col("doc_id").desc), target,
      "text", "doc_id", nBuckets = 64).get
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("topK selects by weight desc with id tiebreak") {
    val w = Seq((0L, 3L, 1.5), (1L, 3L, 2.5), (2L, 3L, 2.5), (3L, 3L, -1.0))
      .toDF("doc_id", "n_grams", "log_weight")
    val got = Dsir.topK(w, "doc_id", 3).get
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 0L))
  }

  test("resample is salt-deterministic and converges to topK as T → 0") {
    val w = (0L until 100L).map(id => (id, 10L, id.toDouble / 10.0))
      .toDF("doc_id", "n_grams", "log_weight")
    val s1 = Dsir.resample(w, "doc_id", 10, temperature = 1.0, salt = "a").get
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Dsir.resample(w, "doc_id", 10, temperature = 1.0, salt = "a").get
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2, "same salt must reproduce the same draw")
    // weights are spaced 0.1 apart: at T=1e-9 the weight term dwarfs any
    // gumbel perturbation (|g| < 45), so the draw equals the exact top-k
    val cold = Dsir.resample(w, "doc_id", 10, temperature = 1e-9, salt = "a").get
      .select("doc_id").as[Long].collect().toSet
    val top = Dsir.topK(w, "doc_id", 10).get
      .select("doc_id").as[Long].collect().toSet
    assert(cold == top)
    // a different salt is a genuinely different draw at T=1 (softmax over
    // 100 close weights almost surely reshuffles something)
    val s3 = Dsir.resample(w, "doc_id", 10, temperature = 1.0, salt = "b").get
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 != s3, "different salt should perturb the draw")
  }

  test("selectByThreshold filters map-side; weightCutoff keeps ~the top fraction") {
    val w = (0 until 1000).map(i => (i.toLong, 5L, i.toDouble / 100.0))
      .toDF("doc_id", "n_grams", "log_weight")
    val kept = Dsir.selectByThreshold(w, cutoff = 5.0).get
    assert(kept.count() == 500L)
    // no sort/TakeOrdered in the plan — a plain filter
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrdered") && !plan.contains("Sort"), plan)
    val cut = Dsir.weightCutoff(w, fraction = 0.25).get
    val n = Dsir.selectByThreshold(w, cut).get.count()
    assert(math.abs(n - 250L) <= 10L, s"cutoff $cut kept $n")
    assert(Dsir.weightCutoff(w, fraction = 1.5).isFailing)
  }
}
