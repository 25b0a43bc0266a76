package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  test("welchTTest: hand-computed t and Welch–Satterthwaite df") {
    // A = [1,2,3] (mean 2, var 1), B = [2,4] (mean 3, var 2)
    // se2 = 1/3 + 1 = 4/3 → t = −1/√(4/3) = −0.866025…
    // df = (4/3)² / ((1/9)/2 + 1) = 32/19 = 1.684210…
    val df0 = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Stats.welchTTest(df0, "v", "g", "a", "b").get
      .as[(Long, Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect().head
    assert(r._1 == 3L && r._2 == 2L)
    assert(r._3 == 2.0 && r._4 == 3.0 && r._5 == 1.0 && r._6 == 2.0)
    assert(close(r._7, -1.0 / math.sqrt(4.0 / 3.0)))
    assert(close(r._8, 32.0 / 19.0))
    // pooled SD = sqrt((2·1 + 1·2)/3) = sqrt(4/3) → d = −1/sqrt(4/3)
    assert(close(r._9, -1.0 / math.sqrt(4.0 / 3.0)))
  }

  test("welchTTest: NULL statistic when a group is degenerate") {
    val df0 = Seq(("a", 1.0), ("b", 2.0), ("b", 4.0)).toDF("g", "v")
    val r = Stats.welchTTest(df0, "v", "g", "a", "b").get
      .select("t", "df").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("chiSquareIndependence: textbook 2x2, absent cells expected in full") {
    val rows =
      Seq.fill(10)(("x", 0)) ++ Seq.fill(10)(("x", 1)) ++
      Seq.fill(10)(("y", 0)) ++ Seq.fill(30)(("y", 1))
    val r = Stats.chiSquareIndependence(rows.toDF("r", "c"), "r", "c").get
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(r._1 == 60L && r._2 == 2L && r._3 == 2L && r._4 == 1L)
    assert(close(r._5, 3.75))
    // disjoint categories: the zero cells carry their full expectation
    val disjoint = Seq.fill(5)(("x", 0)) ++ Seq.fill(5)(("y", 1))
    val d = Stats.chiSquareIndependence(disjoint.toDF("r", "c"), "r", "c").get
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(d._1 == 10L && d._4 == 1L && close(d._5, 10.0))
  }

  test("mannWhitneyU: midrank ties, U partition invariant") {
    // sorted: 1(a) 2(b) [3 3 3](a a b) → midranks 1, 2, 4
    // r_a = 1+4+4 = 9, r_b = 2+4 = 6, u_a = 3, u_b = 3 = n_a·n_b − u_a
    val df0 = Seq(("a", 1.0), ("a", 3.0), ("a", 3.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val r = Stats.mannWhitneyU(df0, "v", "g", "a", "b").get
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(r == ((3L, 2L, 3.0, 3.0, 9.0, 6.0)))
  }

  test("ksTest: hand-computed CDF max gap; identical samples give 0") {
    // A=[1,2], B=[2,3]: gaps at 1, 2, 3 are 0.5, 0.5, 0 → d = 0.5
    val df0 = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Stats.ksTest(df0, "v", "g", "a", "b").get
      .as[(Long, Long, Double)].collect().head
    assert(r == ((2L, 2L, 0.5)))
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    assert(Stats.ksTest(same, "v", "g", "a", "b").get
      .as[(Long, Long, Double)].collect().head._3 == 0.0)
  }

  test("proportionZTest: hand-computed pooled z; degenerate pool is NULL") {
    // A: 2/4, B: 1/4 → pooled 3/8; z = 0.25/√(0.375·0.625·0.5)
    val df0 = (Seq.fill(2)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
      Seq.fill(1)(("b", true)) ++ Seq.fill(3)(("b", false))).toDF("g", "s")
    val r = Stats.proportionZTest(df0, "s", "g", "a", "b").get
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().head
    assert(r._1 == 4L && r._2 == 2L && r._3 == 4L && r._4 == 1L)
    assert(r._5 == 0.5 && r._6 == 0.25)
    assert(close(r._7, 0.25 / math.sqrt(0.375 * 0.625 * 0.5)))
    val allTrue = Seq(("a", true), ("b", true)).toDF("g", "s")
    assert(Stats.proportionZTest(allTrue, "s", "g", "a", "b").get
      .select("z").collect().head.isNullAt(0))
  }

  test("correlationMatrix: perfect correlations, constant NULL, pairwise-complete n") {
    val df0 = Seq(
      (Some(1.0), Some(2.0), Some(3.0), 5.0),
      (Some(2.0), Some(4.0), Some(2.0), 5.0),
      (Some(3.0), Some(6.0), Some(1.0), 5.0),
      (Some(4.0), None, None, 5.0)
    ).toDF("x", "y", "z", "c")
    val got = Stats.correlationMatrix(df0, Seq("x", "y", "z", "c")).get
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("x", "y")) == ((3L, Some(1.0))))      // y = 2x exactly
    assert(got(("x", "z")) == ((3L, Some(-1.0))))     // z = 4 − x
    assert(got(("y", "z")) == ((3L, Some(-1.0))))
    assert(got(("x", "c")) == ((4L, None)))           // zero variance → NULL
    assert(got.size == 6)
  }

  test("gini: textbook extremes and a hand-computed middle") {
    // perfectly even: G = 0
    val even = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 5.0)).toDF("id", "v")
    val ge = Stats.gini(even, "v", "id").get
      .as[(Long, Double, Double)].collect().head
    assert(ge._1 == 4L && ge._2 == 20.0 && math.abs(ge._3) < 1e-12)
    // one holder: G = (n−1)/n = 0.75
    val one = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 8.0)).toDF("id", "v")
    assert(math.abs(Stats.gini(one, "v", "id").get
      .as[(Long, Double, Double)].collect().head._3 - 0.75) < 1e-12)
    // x = [1,2,3,4]: G = 2·(1+4+9+16)/(4·10) − 5/4 = 0.25
    val mid = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    assert(math.abs(Stats.gini(mid, "v", "id").get
      .as[(Long, Double, Double)].collect().head._3 - 0.25) < 1e-12)
    // negative values are rejected
    assert(Stats.gini(Seq((1L, -1.0)).toDF("id", "v"), "v", "id").isFailing)
  }

  test("gini: tie runs match the row-level ranked formula; value-grid plan") {
    // heavy ties: x = [1,1,1,2,2,7,7,7,7,10] — row-level ranked formula
    // computed by hand over any tie order (Σi per run is order-invariant)
    val xs = Seq(1.0, 1.0, 1.0, 2.0, 2.0, 7.0, 7.0, 7.0, 7.0, 10.0)
    val df0 = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val n = xs.size
    val total = xs.sum
    val iv = xs.sorted.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    val expect = 2.0 * iv / (n * total) - (n + 1.0) / n
    val got = Stats.gini(df0, "v", "id").get
    val r = got.as[(Long, Double, Double)].collect().head
    assert(r._1 == n.toLong && r._2 == total)
    assert(math.abs(r._3 - expect) < 1e-12)
    // the unavoidable order-statistic window runs over the VALUE GRID,
    // not the rows: the plan's window sits above an aggregate on __v
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition"))
    assert(!plan.toLowerCase.contains("row_number"),
      "gini must not materialize per-row ranks")
  }

  test("pairedTTest: one-sample t of differences, df = n-1") {
    // d = [2, 3, 0]: mean 5/3, var 7/3, t = 5/sqrt(7)
    val df0 = Seq((5.0, 3.0), (7.0, 4.0), (6.0, 6.0)).toDF("a", "b")
    val r = Stats.pairedTTest(df0, "a", "b").get
      .as[(Long, Double, Double, Double, Long)].collect().head
    assert(r._1 == 3L && r._5 == 2L)
    assert(close(r._2, 5.0 / 3) && close(r._3, 7.0 / 3))
    assert(close(r._4, 5.0 / math.sqrt(7.0)))
    // zero-variance differences -> NULL t
    val const = Seq((5.0, 3.0), (4.0, 2.0)).toDF("a", "b")
    assert(Stats.pairedTTest(const, "a", "b").get
      .select("t").collect().head.isNullAt(0))
  }

  test("bootstrapCI: deterministic, ordered interval around the sample mean") {
    val df0 = (1L to 200L).map(i => (i, (i % 17).toDouble)).toDF("id", "v")
    def run() = Stats.bootstrapCI(df0, "v", Seq("id"), b = 50,
        alpha = 0.1, salt = "spec").get
      .as[(Long, Int, Double, Double, Double)].collect().head
    val r = run()
    assert(r._1 == 200L && r._2 == 50)
    assert(r._4 <= r._3 && r._3 <= r._5 && r._4 < r._5,
      s"interval must bracket the sample mean: $r")
    // pure function of (data, salt): a second run is bit-identical
    assert(run() == r)
    // a different salt draws different resamples (almost surely a
    // different interval — deterministic given the fixture)
    val other = Stats.bootstrapCI(df0, "v", Seq("id"), b = 50,
        alpha = 0.1, salt = "spec2").get
      .as[(Long, Int, Double, Double, Double)].collect().head
    assert(other != r)
  }

  test("mannWhitneyU: identical distributions give symmetric U") {
    val df0 = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val r = Stats.mannWhitneyU(df0, "v", "g", "a", "b").get
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(r._3 == r._4 && r._3 + r._4 == (r._1 * r._2).toDouble)
  }

  test("anova: hand-computed F; degenerate cases NULL") {
    // groups a=[1,2,3] (mean 2), b=[4,5,6] (mean 5): SSB = 13.5,
    // SSW = 4, df = (1, 4), F = 13.5 / 1 = 13.5
    val df0 = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Stats.anova(df0, "v", "g").get
      .as[(Long, Long, Double, Double, Long, Long, Option[Double])]
      .collect().head
    assert(r._1 == 6L && r._2 == 2L)
    assert(math.abs(r._3 - 13.5) < 1e-12 && math.abs(r._4 - 4.0) < 1e-12)
    assert(r._5 == 1L && r._6 == 4L)
    assert(r._7.exists(f => math.abs(f - 13.5) < 1e-12))
    // one group → NULL F; zero within-variance → NULL F
    assert(Stats.anova(df0.filter($"g" === "a"), "v", "g").get
      .select("f").as[Option[Double]].collect().head.isEmpty)
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v")
    assert(Stats.anova(flat, "v", "g").get
      .select("f").as[Option[Double]].collect().head.isEmpty)
  }

  test("kruskalWallis: textbook three-group H with and without ties") {
    // no ties: a=[1,2], b=[3,4], c=[5,6] → ranks 1..6,
    // R = {3, 7, 11}; H = 12/(6·7)·(9/2+49/2+121/2) − 21 = 25.57…−21
    val df0 = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = Stats.kruskalWallis(df0, "v", "g").get
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect().head
    val expect = 12.0 / 42.0 * (4.5 + 24.5 + 60.5) - 21.0
    assert(r._1 == 6L && r._2 == 3L && r._3 == 2L)
    assert(r._4.exists(h => math.abs(h - expect) < 1e-12))
    assert(r._5.exists(h => math.abs(h - expect) < 1e-12)) // no ties → C=1
    // all-equal values: C = 0 → NULL h_adj
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val rt = Stats.kruskalWallis(tied, "v", "g").get
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect().head
    assert(rt._5.isEmpty)
  }

  test("fdrAdjust: BH step-up q-values, tie runs, clamp at 1") {
    // p = [0.01, 0.02, 0.02, 0.9], n = 4:
    //   raw at jhi: 0.01·4/1 = 0.04; 0.02·4/3 ≈ 0.0267 (tie run ends
    //   at j=3); 0.9·4/4 = 0.9 → reverse min: [0.04→min(0.04,…)=0.0267?
    //   no — q_1 = min(0.04, 0.0267, 0.9) = 0.0267], q(0.02) = 0.0267,
    //   q(0.9) = 0.9
    val df0 = Seq((1L, 0.01), (2L, 0.02), (3L, 0.02), (4L, 0.9))
      .toDF("id", "p")
    val got = Stats.fdrAdjust(df0, "p", alpha = 0.05).get
      .select("id", "q_value", "reject")
      .as[(Long, Option[Double], Option[Boolean])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val q2 = 0.02 * 4 / 3.0
    assert(got(1L)._1.exists(q => math.abs(q - q2) < 1e-12)) // stepped down
    assert(got(2L)._1.exists(q => math.abs(q - q2) < 1e-12))
    assert(got(3L)._1 == got(2L)._1)
    assert(got(4L)._1.contains(0.9))
    assert(got(1L)._2.contains(true) && got(4L)._2.contains(false))
    // NULL p is not a test: excluded from n and passed through with
    // NULL q (n = 1 here, so q = p exactly)
    val big = Seq((1L, Some(0.999)), (2L, None)).toDF("id", "p")
    val gb = Stats.fdrAdjust(big, "p", alpha = 0.1).get
      .select("id", "q_value").as[(Long, Option[Double])].collect().toMap
    assert(gb(1L).contains(0.999))
    assert(gb(2L).isEmpty)
    // out-of-range p rejected
    assert(Stats.fdrAdjust(Seq((1L, 1.5)).toDF("id", "p"), "p").isFailing)
  }

  test("spearman: midrank ties, perfect/reversed monotone, constant NULL") {
    // a = 1..5, b = [5,6,7,8,7]: rb = [1,2,3.5,5,3.5] →
    // rho = Pearson(ra, rb) = 0.825 (classic tied example)
    val data = Seq((1.0, 5.0), (2.0, 6.0), (3.0, 7.0), (4.0, 8.0),
      (5.0, 7.0)).toDF("a", "b")
    val ra = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val rb = Seq(1.0, 2.0, 3.5, 5.0, 3.5)
    val n = 5.0
    val (sa, sb) = (ra.sum, rb.sum)
    val sab = ra.zip(rb).map { case (x, y) => x * y }.sum
    val expected = (n * sab - sa * sb) /
      math.sqrt((n * ra.map(x => x * x).sum - sa * sa) *
        (n * rb.map(x => x * x).sum - sb * sb))
    val got = Stats.spearman(data, "a", "b").get
      .as[(Long, Option[Double])].head()
    assert(got._1 == 5L && math.abs(got._2.get - expected) < 1e-12)
    // strictly monotone → exactly 1; reversed → −1
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0)).toDF("a", "b")
    assert(math.abs(Stats.spearman(mono, "a", "b").get
      .as[(Long, Option[Double])].head()._2.get - 1.0) < 1e-12)
    val rev = Seq((1.0, 9.0), (2.0, 5.0), (3.0, 1.0)).toDF("a", "b")
    assert(math.abs(Stats.spearman(rev, "a", "b").get
      .as[(Long, Option[Double])].head()._2.get + 1.0) < 1e-12)
    // constant column → NULL
    val const = Seq((1.0, 7.0), (2.0, 7.0)).toDF("a", "b")
    assert(Stats.spearman(const, "a", "b").get
      .as[(Long, Option[Double])].head()._2.isEmpty)
  }

  test("cramersV: perfect association = 1, independence = 0, constant NULL") {
    // perfect 2×2 diagonal: χ² = n, min(r−1,c−1) = 1 → V = 1
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("r", "c")
    val vp = Stats.cramersV(perfect, "r", "c").get
      .select("v").as[Option[Double]].head()
    assert(math.abs(vp.get - 1.0) < 1e-12)
    // independent uniform grid: χ² = 0 → V = 0
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("r", "c")
    val vi = Stats.cramersV(indep, "r", "c").get
      .select("v").as[Option[Double]].head()
    assert(math.abs(vi.get) < 1e-12)
    // a constant dimension → NULL v
    val const = Seq(("a", "x"), ("b", "x")).toDF("r", "c")
    assert(Stats.cramersV(const, "r", "c").get
      .select("v").as[Option[Double]].head().isEmpty)
  }

  test("fisherExact: tea-tasting table, p = 34/70, OR = 9") {
    // a=3 b=1 c=1 d=3: PMFs over k∈0..4 are (1,16,36,16,1)/70; obs
    // pmf 16/70 → two-sided sum (1+16+16+1)/70
    val rows = Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false))
    val r = Stats.fisherExact(rows.toDF("r", "c"), "r", "c").get
      .as[(Long, Long, Long, Long, Option[Double], Double)].head()
    assert(r._1 == 3L && r._2 == 1L && r._3 == 1L && r._4 == 3L)
    assert(math.abs(r._5.get - 9.0) < 1e-12)
    assert(math.abs(r._6 - 34.0 / 70) < 1e-9)
    // empty input: p = 1, OR NULL
    val e = Stats.fisherExact(rows.toDF("r", "c").filter($"r" =!= $"r"),
        "r", "c").get
      .as[(Long, Long, Long, Long, Option[Double], Double)].head()
    assert(e == ((0L, 0L, 0L, 0L, None, 1.0)))
    // a zero margin (all r true): p = 1 by convention
    val m = Stats.fisherExact(
        Seq((true, true), (true, false)).toDF("r", "c"), "r", "c").get
      .select("p_two_sided").as[Double].head()
    assert(math.abs(m - 1.0) < 1e-12)
  }

  test("leveneTest: Brown–Forsythe W from per-group true medians") {
    // A = [1,2,3,4,10] (odd n, median 3) → z = [2,1,0,1,7]
    // B = [5,5,6,7] (even n, median 5.5) → z = [.5,.5,.5,1.5]
    val data = (Seq(1.0, 2.0, 3.0, 4.0, 10.0).map(("A", _)) ++
      Seq(5.0, 5.0, 6.0, 7.0).map(("B", _))).toDF("g", "v")
    val r = Stats.leveneTest(data, "v", "g").get
      .as[(Long, Long, Double, Double, Long, Long, Option[Double])].head()
    assert(r._1 == 9L && r._2 == 2L && r._5 == 1L && r._6 == 7L)
    val b = 121.0 / 5 + 9.0 / 4            // Σ s²/n over z
    val ssB = b - 196.0 / 9                // st = 14, n = 9
    val ssW = 58.0 - b                     // Σ z² = 58
    assert(math.abs(r._3 - ssB) < 1e-9)
    assert(math.abs(r._4 - ssW) < 1e-9)
    assert(math.abs(r._7.get - (ssB / 1) / (ssW / 7)) < 1e-9)
    // a constant group has z ≡ 0 but W still defined across groups;
    // a single group → NULL (k < 2)
    val one = Stats.leveneTest(data.filter($"g" === "A"), "v", "g").get
      .select("w").as[Option[Double]].head()
    assert(one.isEmpty)
  }

  test("andersonDarling matches the hand-computed Scholz-Stephens sum") {
    // a: [1, 2, 3], b: [2, 4] -> distinct grid 1,2,3,4 with
    // (ca, cb): (1,0), (1,1), (1,0), (0,1); N=5, n_a=3, n_b=2
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Stats.andersonDarling(df, "v", "g", "a", "b").get
      .as[(Long, Long, Option[Double])].head()
    // grid rows with B<N: j=1: l=1,B=1,M=1 -> (5·1-3·1)²·1/(1·4)=1
    //   j=2: l=2,B=3,M=2 -> (10-9)²·2/(3·2)=1/3
    //   j=3: l=1,B=4,M=3 -> (15-12)²·1/(4·1)=9/4
    val expected = (1.0 + 1.0 / 3.0 + 9.0 / 4.0) / (3.0 * 2.0)
    assert(r._1 == 3L && r._2 == 2L)
    assert(math.abs(r._3.get - expected) < 1e-12)
    // identical samples -> A² = 0
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    assert(Stats.andersonDarling(same, "v", "g", "a", "b").get
      .select("a2").as[Option[Double]].head().get == 0.0)
    // an empty group -> NULL a2
    val one = df.filter($"g" === "a")
    assert(Stats.andersonDarling(one, "v", "g", "a", "b").get
      .select("a2").as[Option[Double]].head().isEmpty)
  }

  test("cuped matches the hand-computed pooled-theta adjustment") {
    val units = Seq(
      ("c", 1.0, 2.2), ("c", 2.0, 4.1), ("c", 3.0, 6.3), ("c", 4.0, 8.0),
      ("t", 1.0, 3.1), ("t", 2.0, 5.2), ("t", 3.0, 7.0), ("t", 4.0, 9.2))
    val df = units.toDF("g", "x", "y")
    val r = Stats.cuped(df, "g", "y", "x", "t", "c").get
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .head()
    // hand computation (population moments, pooled theta)
    val xs = units.map(_._2); val ys = units.map(_._3); val n = xs.size
    val mx = xs.sum / n; val my = ys.sum / n
    val cxy = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum / n
    val vx = xs.map(a => (a - mx) * (a - mx)).sum / n
    val theta = cxy / vx
    val adj = units.map { case (g, x, y) => (g, y - theta * (x - mx)) }
    def mean(s: Seq[Double]) = s.sum / s.size
    def vpop(s: Seq[Double]) = { val m = mean(s); s.map(a => (a-m)*(a-m)).sum / s.size }
    val at = adj.filter(_._1 == "t").map(_._2)
    val ac = adj.filter(_._1 == "c").map(_._2)
    val yt = units.filter(_._1 == "t").map(_._3)
    val yc = units.filter(_._1 == "c").map(_._3)
    assert(r._1 == 4L && r._2 == 4L)
    assert(math.abs(r._3 - theta) < 1e-9)
    assert(math.abs(r._4 - (mean(yt) - mean(yc))) < 1e-9)
    assert(math.abs(r._5 - math.sqrt(vpop(yt)/4 + vpop(yc)/4)) < 1e-9)
    assert(math.abs(r._6 - (mean(at) - mean(ac))) < 1e-9)
    assert(math.abs(r._7 - math.sqrt(vpop(at)/4 + vpop(ac)/4)) < 1e-9)
    assert(math.abs(r._8 - (1.0 - vpop(adj.map(_._2)) / vpop(ys))) < 1e-9)
    // CUPED se must beat raw se on this strongly-correlated fixture
    assert(r._7 < r._5 && r._8 > 0.9)
  }

  test("cuped degrades gracefully on a zero-variance covariate") {
    val df = Seq(("t", 1.0, 3.0), ("t", 1.0, 5.0),
      ("c", 1.0, 2.0), ("c", 1.0, 4.0)).toDF("g", "x", "y")
    val r = Stats.cuped(df, "g", "y", "x", "t", "c").get
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .head()
    assert(r._3 == 0.0)               // theta
    assert(r._4 == r._6 && r._5 == r._7) // cuped == raw
    // rows outside the two groups are excluded
    val extra = df.union(Seq(("z", 9.0, 9.0)).toDF("g", "x", "y"))
    val r2 = Stats.cuped(extra, "g", "y", "x", "t", "c").get
      .select("n_treat", "n_ctrl").as[(Long, Long)].head()
    assert(r2 == ((2L, 2L)))
  }

  test("kendallTau: hand-computed tau-b with ties on both margins") {
    // x = [1,1,2,3], y = [1,2,2,3]: pairs (i<j by index over the cell
    // expansion) — concordant: (1,1)-(2,2)×? enumerate raw pairs:
    // (1,1)(1,2): tied x. (1,1)(2,2): C. (1,1)(3,3): C. (1,2)(2,2):
    // tied y. (1,2)(3,3): C. (2,2)(3,3): C. → C=4, D=0, n0=6, n1=1
    // (x tie pair), n2=1 (y tie pair) → tau = 4/sqrt(25) = 0.8
    val df0 = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 3.0))
      .toDF("x", "y")
    val r = Stats.kendallTau(df0, "x", "y").get
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().head
    assert(r == ((4L, 6L, 1L, 1L, 4L, 0L, 0L, 0.8)))
  }

  test("kendallTau: perfect inversion and the maxCells guard") {
    val inv = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    val r = Stats.kendallTau(inv, "x", "y").get
      .select("tau_b").as[Double].head()
    assert(r == -1.0)
    val e = intercept[IllegalArgumentException](
      Stats.kendallTau(inv, "x", "y", maxCells = 2).get)
    assert(e.getMessage.contains("maxCells"))
    // constant margin → NULL tau
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(Stats.kendallTau(const, "x", "y").get
      .select("tau_b").collect().head.isNullAt(0))
  }

  test("friedman: textbook rank sums, tie correction, design guards") {
    // 3 subjects x 3 treatments, no ties: ranks per subject
    // s1 A<B<C, s2 A<C<B, s3 A<B<C -> R = (3, 7, 8)
    // chi2 = 12/(3*3*4)*(9+49+64) - 3*3*4 = 122/3 - 36 = 4.666...
    val df = Seq(
      ("s1", "A", 1.0), ("s1", "B", 2.0), ("s1", "C", 3.0),
      ("s2", "A", 1.0), ("s2", "B", 3.0), ("s2", "C", 2.0),
      ("s3", "A", 1.0), ("s3", "B", 2.0), ("s3", "C", 3.0)
    ).toDF("subj", "treat", "v")
    val r = Stats.friedman(df, "v", "subj", "treat").get
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    assert(r._1 == 3L && r._2 == 3L && r._3 == 2L)
    assert(math.abs(r._4 - 122.0 / 3 + 36.0) < 1e-12, s"chi2=${r._4}")
    assert(r._5.exists(a => math.abs(a - r._4) < 1e-12),
      "no ties: adjusted == raw")
    // a fully tied subject contributes t=3: C = 1 - 24/(3*24) = 2/3
    val tied = Seq(
      ("s1", "A", 5.0), ("s1", "B", 5.0), ("s1", "C", 5.0),
      ("s2", "A", 1.0), ("s2", "B", 2.0), ("s2", "C", 3.0),
      ("s3", "A", 1.0), ("s3", "B", 2.0), ("s3", "C", 3.0)
    ).toDF("subj", "treat", "v")
    val rt = Stats.friedman(tied, "v", "subj", "treat").get
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    assert(rt._5.exists(a => math.abs(a - rt._4 / (2.0 / 3)) < 1e-12),
      s"tie correction: ${rt._4} vs ${rt._5}")
    // incomplete design and duplicate cells are rejected
    assert(Stats.friedman(df.filter($"subj" =!= "s1" || $"treat" =!= "C"),
      "v", "subj", "treat").isFailing)
    assert(Stats.friedman(df.union(df.limit(1)), "v", "subj", "treat")
      .isFailing)
  }

  test("holmAdjust: textbook step-down, tie runs share the first-index " +
      "term, null passthrough, bad-p rejection") {
    // R: p.adjust(c(.01,.04,.03,.5), "holm") = 0.04 0.09 0.09 0.50
    val df = Seq(("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.5))
      .toDF("id", "p")
    val got = Stats.holmAdjust(df, "p", alpha = 0.05).get
      .select("id", "p_adj", "reject")
      .as[(String, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, math.rint(r._2 * 1e9) / 1e9, r._3)) == Seq(
      ("a", 0.04, true), ("b", 0.09, false), ("c", 0.09, false),
      ("d", 0.5, false)), s"$got")
    // ties: p.adjust(c(.02,.02,.1), "holm") = 0.06 0.06 0.10
    val ties = Seq(0.02, 0.02, 0.1).toDF("p")
    val gt = Stats.holmAdjust(ties, "p", alpha = 0.07).get
      .select("p", "p_adj", "reject")
      .as[(Double, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(gt.map(r => (r._1, math.rint(r._2 * 1e9) / 1e9, r._3)) == Seq(
      (0.02, 0.06, true), (0.02, 0.06, true), (0.1, 0.1, false)), s"$gt")
    // null p rows pass through with NULL p_adj/reject
    val withNull = Seq(Some(0.01), None).toDF("p")
    val rows = Stats.holmAdjust(withNull, "p").get.collect()
    assert(rows.length == 2 && rows.exists(r => r.isNullAt(1) && r.isNullAt(2)))
    assert(Stats.holmAdjust(Seq(1.5).toDF("p"), "p").isFailing)
    assert(Stats.holmAdjust(df, "p", alpha = 0.0).isFailing)
  }

  test("cliffsDelta: exact pair counts against brute force") {
    val as = Seq(1.0, 2.0, 2.0, 5.0)
    val bs = Seq(2.0, 3.0, 4.0)
    val df0 = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("g", "v")
    val r = Stats.cliffsDelta(df0, "v", "g", "a", "b").get
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    val gt = (for (a <- as; b <- bs) yield ()).size // placeholder arity
    val gtN = as.flatMap(a => bs.map(b => a > b)).count(identity)
    val ltN = as.flatMap(a => bs.map(b => a < b)).count(identity)
    val tiesN = as.flatMap(a => bs.map(b => a == b)).count(identity)
    assert(gt == 12) // 4×3 pairs enumerated
    assert(r == ((4L, 3L, gtN.toDouble, ltN.toDouble, tiesN.toDouble,
      (gtN - ltN).toDouble / 12)))
  }

  test("mcnemar: textbook cells, corrected chi2 and exact binomial p") {
    // b = 5 before-only, c = 1 after-only → chi2 = (|5−1|−1)²/6 = 1.5
    // p = min(1, 2·(C(6,0)+C(6,1))/2⁶) = 2·7/64 = 0.21875
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(2)((false, false))
    val r = Stats.mcnemar(rows.toDF("bf", "af"), "bf", "af").get
      .as[(Long, Long, Long, Long, Long, Option[Double], Double)]
      .collect().head
    assert(r._1 == 11L && r._2 == 3L && r._3 == 5L && r._4 == 1L &&
      r._5 == 2L)
    assert(r._6.contains(1.5))
    assert(close(r._7, 0.21875))
    // uncorrected: (5−1)²/6 = 8/3
    val u = Stats.mcnemar(rows.toDF("bf", "af"), "bf", "af",
      correction = false).get.select("chi2").as[Double].head()
    assert(close(u, 8.0 / 3.0))
    // no discordant pairs → NULL chi2, p = 1
    val conc = Seq((true, true), (false, false)).toDF("bf", "af")
    val r2 = Stats.mcnemar(conc, "bf", "af").get
      .select("chi2", "p_exact").collect().head
    assert(r2.isNullAt(0) && r2.getDouble(1) == 1.0)
  }

  test("cochranQ: textbook 3-treatment design with arithmetic completion") {
    // subjects 1..4 over treatments A,B,C (x as 0/1):
    //   s1: A=1 B=1 C=0 | s2: A=1 B=0 C=0 | s3: A=1 B=1 C=1 | s4: 0,0,0
    // G = [3,2,1], L = [2,1,3,0], N = 6
    // Q = (k−1)(kΣG²−N²)/(kΣL−ΣL²) = 2·(3·14−36)/(18−14) = 12/4 = 3
    val rows = Seq((1, "A", true), (1, "B", true), (2, "A", true),
      (3, "A", true), (3, "B", true), (3, "C", true),
      (4, "A", false), (1, "C", false), (2, "B", false))
    // s4's B/C and s2's C are ABSENT rows — completed as failures
    val r = Stats.cochranQ(rows.toDF("s", "t", "x"), "s", "t", "x").get
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(r._1 == 4L && r._2 == 3L && r._3 == 6L && r._4 == 2L)
    assert(r._5.exists(q => close(q, 3.0)))
    // duplicate (s,t) rows collapse to any-success
    val dup = rows ++ Seq((1, "A", false), (1, "A", true))
    val r2 = Stats.cochranQ(dup.toDF("s", "t", "x"), "s", "t", "x").get
      .select("n").as[Long].head()
    assert(r2 == 6L)
  }

  test("hodgesLehmann: weighted median of pairwise differences") {
    // A = [1,2], B = [4,6] → diffs sorted [−5,−4,−3,−2], N = 4 even
    // → lower = pos 2 (−4), upper = pos 3 (−3) → HL = −3.5
    val df0 = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0), ("b", 6.0))
      .toDF("g", "v")
    val r = Stats.hodgesLehmann(df0, "v", "g", "a", "b").get
      .as[(Long, Long, Double, Double)].collect().head
    assert(r == ((2L, 2L, 4.0, -3.5)))
    // odd pair count: A = [1], B = [0, 2, 7] → diffs [1,−1,−6] → −1
    val odd = Seq(("a", 1.0), ("b", 0.0), ("b", 2.0), ("b", 7.0))
      .toDF("g", "v")
    val ro = Stats.hodgesLehmann(odd, "v", "g", "a", "b").get
      .select("hl_shift").as[Double].head()
    assert(ro == -1.0)
    // empty group → 0 pairs, NULL shift
    val re = Stats.hodgesLehmann(df0.filter($"g" === "a"), "v", "g",
      "a", "b").get.select("n_pairs", "hl_shift").collect().head
    assert(re.getDouble(0) == 0.0 && re.isNullAt(1))
  }

  test("bayesianAB: closed-form P(B>A) matches the analytic integral") {
    // A: 1/2 → Beta(2,2); B: 2/2 → Beta(3,1)
    // P(pB>pA) = ∫ 3x²(3x²−2x³)dx = 9/5 − 1 = 0.8
    val df0 = Seq(("a", true), ("a", false), ("b", true), ("b", true))
      .toDF("g", "s")
    val r = Stats.bayesianAB(df0, "s", "g", "a", "b").get
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(r._1 == 2L && r._2 == 1L && r._3 == 2L && r._4 == 2L)
    assert(r._5 == 0.5 && r._6 == 0.75)
    assert(close(r._7, 0.8))
    assert(close(r._8, 0.25))
    // symmetric groups → exactly 1/2
    val sym = Seq(("a", true), ("b", true)).toDF("g", "s")
    val rs = Stats.bayesianAB(sym, "s", "g", "a", "b").get
      .select("prob_b_beats_a").as[Double].head()
    assert(close(rs, 0.5))
  }

  test("powerMde: formula replay and degenerate-baseline NULLs") {
    val rows = Seq.fill(10)(("a", true)) ++ Seq.fill(90)(("a", false)) ++
      Seq.fill(80)(("b", false))
    val r = Stats.powerMde(rows.toDF("g", "s"), "s", "g", "a", "b").get
      .as[(Long, Long, Long, Double, Double, Double, Long)]
      .collect().head
    val z = 1.9599639845400545 + 0.8416212335729143
    val p = 0.1; val v = p * (1 - p)
    assert(r._1 == 100L && r._2 == 10L && r._3 == 80L && r._4 == 0.1)
    assert(close(r._5, z * math.sqrt(2.0 * v / 80)))
    assert(close(r._6, z * math.sqrt(2.0 * v / 80) / p))
    assert(r._7 == math.ceil(2.0 * v * math.pow(z / (p * 0.1), 2)).toLong)
    // all-failure baseline → NULL mde and n_required
    val degen = Seq(("a", false), ("b", false)).toDF("g", "s")
    val rd = Stats.powerMde(degen, "s", "g", "a", "b").get
      .select("mde_abs", "n_required").collect().head
    assert(rd.isNullAt(0) && rd.isNullAt(1))
  }

  test("jonckheereTerpstra: textbook no-tie case and tie-corrected variance") {
    // a = [1,2], b = [3,4]: J = 4, E = (16−8)/4 = 2,
    // A = (4·3·13 − 2·18)/72 = 120/72, B = C = 0 → var = 5/3
    val df0 = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df0, "v", "g").get
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(r._1 == 4L && r._2 == 2L && r._3 == 4.0 && r._4 == 2.0)
    assert(close(r._5, 5.0 / 3.0))
    assert(close(r._6, 2.0 / math.sqrt(5.0 / 3.0)))
    // ties get the half-count: a = [1,2], b = [2,3] → J = 3 + 0.5
    val tied = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val rt = Stats.jonckheereTerpstra(tied, "v", "g").get
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(rt._3 == 3.5)
    // tie-corrected variance, manual three-term formula
    val n = 4.0; val sn25 = 2 * 18.0; val st25 = 2 * 1 * 9.0
    val a = (n * 3 * 13 - sn25 - st25) / 72
    val b = 0.0 // no group or tie run of size >= 3
    val c = (2.0 + 2.0) * 2.0 / (8.0 * n * 3)
    assert(close(rt._5, a + b + c))
    // maxCells guard
    assert(Stats.jonckheereTerpstra(df0, "v", "g", maxCells = 2).isFailing)
  }

  test("wilcoxonSignedRank: textbook ranks, ties, zero-diff drop") {
    // diffs = [1,−2,3,4]: W+ = 1+3+4 = 8, E = 5, var = 4·5·9/24 = 7.5
    val df0 = Seq((0.0, 1.0), (2.0, 0.0), (0.0, 3.0), (0.0, 4.0))
      .toDF("bf", "af")
    val r = Stats.wilcoxonSignedRank(df0, "bf", "af").get
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    assert(r == ((4L, 8.0, 2.0, 5.0, 7.5, 3.0 / math.sqrt(7.5))))
    // all-|1| ties: midrank 2 → W+ = 4, W− = 2; var = 3.5 − 24/48 = 3
    val tied = Seq((0.0, 1.0), (0.0, 1.0), (1.0, 0.0)).toDF("bf", "af")
    val rt = Stats.wilcoxonSignedRank(tied, "bf", "af").get
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    assert(rt._1 == 3L && rt._2 == 4.0 && rt._3 == 2.0 && rt._5 == 3.0)
    // zero differences are dropped entirely
    val withZero = df0.union(Seq((5.0, 5.0)).toDF("bf", "af"))
    assert(Stats.wilcoxonSignedRank(withZero, "bf", "af").get
      .select("n").as[Long].head() == 4L)
  }

  test("tost: one-sided t stats against the welch moments") {
    // A = [1,2,3] (mean 2, var 1), B = [2,4] (mean 3, var 2)
    // diff = −1, se = sqrt(1/3 + 1) = sqrt(4/3)
    val df0 = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Stats.tost(df0, "v", "g", "a", "b", -2.0, 2.0).get
      .select("diff", "se", "t_lower", "t_upper")
      .as[(Double, Double, Double, Double)].head()
    val se = math.sqrt(4.0 / 3.0)
    assert(close(r._1, -1.0) && close(r._2, se))
    assert(close(r._3, (-1.0 + 2.0) / se))
    assert(close(r._4, (-1.0 - 2.0) / se))
    // margins must straddle zero
    assert(Stats.tost(df0, "v", "g", "a", "b", 1.0, 2.0).isFailing)
    // degenerate group → NULL t stats
    val degen = Seq(("a", 1.0), ("b", 2.0), ("b", 4.0)).toDF("g", "v")
    val rd = Stats.tost(degen, "v", "g", "a", "b", -1.0, 1.0).get
      .select("t_lower", "t_upper").collect().head
    assert(rd.isNullAt(0) && rd.isNullAt(1))
  }

  test("cohensKappa: textbook agreement vs chance") {
    // classic 2x2: a=[y,y,y,n,n...], agreement 70%, marginals 50/50-ish
    // cells: (y,y)=20, (y,n)=5, (n,y)=10, (n,n)=15 → n=50
    // p_o = 35/50 = 0.7; rows y=25, n=25; cols y=30, n=20
    // p_e = (25·30 + 25·20)/2500 = 0.5 → κ = 0.2/0.5 = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Stats.cohensKappa(rows.toDF("a", "b"), "a", "b").get
      .as[(Long, Double, Double, Double)].collect().head
    assert(r._1 == 50L && r._2 == 0.7 && r._3 == 0.5)
    assert(close(r._4, 0.4))
    // constant raters → p_e = 1 → NULL kappa
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Stats.cohensKappa(const, "a", "b").get
      .select("kappa").collect().head.isNullAt(0))
  }

  test("fleissKappa: Wikipedia-style fixture and the constant-n guard") {
    // 3 subjects × 3 raters: s1 all 'a' (ni2 = 9), s2 2a+1b (4+1=5),
    // s3 1a+1b+1c (3). P̄ᵢ = (9−3)/6, (5−3)/6, (3−3)/6 → P̄ = 8/18
    // marginals: a=6, b=2, c=1, total 9 → P̄e = (36+4+1)/81
    val rows = Seq((1, "a"), (1, "a"), (1, "a"),
      (2, "a"), (2, "a"), (2, "b"),
      (3, "a"), (3, "b"), (3, "c"))
    val r = Stats.fleissKappa(rows.toDF("s", "c"), "s", "c").get
      .as[(Long, Int, Long, Double, Double, Double)].collect().head
    assert(r._1 == 3L && r._2 == 3 && r._3 == 3L)
    assert(close(r._4, 8.0 / 18))
    assert(close(r._5, 41.0 / 81))
    assert(close(r._6, (8.0 / 18 - 41.0 / 81) / (1 - 41.0 / 81)))
    // unequal rating counts fail loudly
    val uneq = rows ++ Seq((1, "b"))
    assert(Stats.fleissKappa(uneq.toDF("s", "c"), "s", "c").isFailing)
    // unanimous single category → P̄e = 1 → NULL kappa
    val mono = Seq((1, "x"), (1, "x"), (2, "x"), (2, "x")).toDF("s", "c")
    assert(Stats.fleissKappa(mono, "s", "c").get
      .select("kappa").collect().head.isNullAt(0))
  }

  test("krippendorffAlpha: hand-computed nominal case with missing " +
      "ratings; unpairable units dropped; degenerate NULLs") {
    // u1 (a,a), u2 (a,b), u3 (b,b,b), u4 (c) — u4 unpairable, dropped.
    // N=7, A_o = (2·1/1 + 0 + 3·2/2)/7 = 5/7; marginals a=3 b=4 →
    // A_e = (3·2 + 4·3)/(7·6) = 3/7; alpha = (2/7)/(4/7) = 1/2
    val rows = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"),
      (3, "b"), (3, "b"), (3, "b"), (4, "c"))
    val r = Stats.krippendorffAlpha(rows.toDF("u", "v"), "u", "v").get
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(r._1 == 3L && r._2 == 7L && r._3 == 2L)
    assert(close(r._4, 5.0 / 7) && close(r._5, 3.0 / 7) && close(r._6, 0.5))
    // perfect agreement on 2 categories → alpha = 1
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"))
    val p = Stats.krippendorffAlpha(perfect.toDF("u", "v"), "u", "v").get
      .select("alpha").as[Double].head()
    assert(close(p, 1.0))
    // single category: A_e = 1 → NULL alpha, never NaN
    val mono = Seq((1, "x"), (1, "x"), (2, "x"), (2, "x"))
    assert(Stats.krippendorffAlpha(mono.toDF("u", "v"), "u", "v").get
      .select("alpha").collect().head.isNullAt(0))
    // nothing pairable: zero units, NULL coefficients
    val solo = Stats.krippendorffAlpha(
      Seq((1, "a"), (2, "b")).toDF("u", "v"), "u", "v").get
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(solo._1 == 0L && solo._2 == 0L && solo._4.isEmpty &&
      solo._6.isEmpty)
    // random multiset vs in-memory reference
    val rnd = new scala.util.Random(31L)
    val rand = (1 to 40).flatMap { u =>
      Seq.fill(rnd.nextInt(5))((u, "abc" (rnd.nextInt(3)).toString))
    }
    val byU = rand.groupBy(_._1).filter(_._2.size >= 2)
    val nn = byU.values.map(_.size).sum.toDouble
    val ao = byU.values.map { rs =>
      rs.groupBy(_._2).values.map(g =>
        g.size.toDouble * (g.size - 1) / (rs.size - 1).toDouble).sum
    }.sum / nn
    val ae = byU.values.flatten.groupBy(_._2).values
      .map(g => g.size.toDouble * (g.size - 1)).sum / (nn * (nn - 1))
    val g = Stats.krippendorffAlpha(rand.toDF("u", "v"), "u", "v").get
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(math.abs(g._4 - ao) < 1e-12 && math.abs(g._5 - ae) < 1e-12)
    assert(math.abs(g._6 - (ao - ae) / (1 - ae)) < 1e-12)
  }

  test("oneSampleTTest: hand-computed t against a target mean") {
    // [1,2,3]: mean 2, var 1, se = 1/sqrt(3); vs mu0 = 1 → t = sqrt(3)
    val df0 = Seq(1.0, 2.0, 3.0).toDF("v")
    val r = Stats.oneSampleTTest(df0, "v", mu0 = 1.0).get
      .as[(Long, Double, Double, Double, Double, Long)].collect().head
    assert(r._1 == 3L && r._2 == 2.0 && r._3 == 1.0)
    assert(close(r._4, 1.0 / math.sqrt(3.0)))
    assert(close(r._5, math.sqrt(3.0)))
    assert(r._6 == 2L)
    // constant column → NULL se/t
    val const = Seq(5.0, 5.0).toDF("v")
    val rc = Stats.oneSampleTTest(const, "v", 0.0).get
      .select("se", "t").collect().head
    assert(rc.isNullAt(0) && rc.isNullAt(1))
  }

  test("permutationTest: identical groups read non-significant; a huge " +
    "shift reads at the p floor; deterministic across runs") {
    // identical distributions: p should be large
    val same = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      (i % 5).toDouble)).toDF("id", "g", "v")
    val pSame = Stats.permutationTest(same, "v", "g", "a", "b",
      idCols = Seq("id"), rounds = 99).get
      .select("p_value").as[Double].head()
    assert(pSame > 0.2)
    // disjoint ranges: observed diff is never matched → p = 1/(R+1)
    val shifted = ((1 to 20).map(i => (i.toLong, "a", 1000.0 + i)) ++
      (21 to 40).map(i => (i.toLong, "b", i.toDouble))).toDF("id", "g", "v")
    val pShift = Stats.permutationTest(shifted, "v", "g", "a", "b",
      idCols = Seq("id"), rounds = 99).get
      .as[(Long, Long, Int, Double, Double)].head()
    assert(pShift._1 == 20L && pShift._2 == 20L && pShift._3 == 99)
    assert(pShift._5 == 1.0 / 100)
    // bit-deterministic across runs
    val again = Stats.permutationTest(shifted, "v", "g", "a", "b",
      idCols = Seq("id"), rounds = 99).get
      .select("p_value").as[Double].head()
    assert(again == pShift._5)
  }

  // --- msprt -------------------------------------------------------------

  test("msprt matches an in-memory reference on a hand sequence") {
    val xs = Seq(0.0, 2.0, 4.0, 1.0, 3.0)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("ord", "v")
    val got = Stats.msprt(df, "v", theta0 = 0.0, tau2 = 1.0,
      orderCols = Seq("ord")).get
      .orderBy("seq")
      .select("seq", "xbar", "llr", "p_always")
      .as[(Long, Double, Option[Double], Option[Double])].collect().toSeq
    // reference: same arithmetic in plain Scala
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var s = 0L; var q = 0L; var pmin = Double.MaxValue
    val want = xs.zipWithIndex.map { case (x, idx) =>
      val i = idx + 1L; val c = math.round(x)
      s += c; q += c * c
      val id = i.toDouble
      val v = (q.toDouble * id - s.toDouble * s.toDouble) / (id * id)
      val xbar = s.toDouble / id
      if (v > 0) {
        val dm = xbar - 0.0
        val nm = ((id * id) * 1.0) * (dm * dm)
        val dn = (2.0 * v) * (v + id * 1.0)
        val llr = 0.5 * math.log(v / (v + id * 1.0)) + nm / dn
        val lam = math.sqrt(v / (v + id * 1.0)) * math.exp(nm / dn)
        pmin = math.min(pmin, math.min(1.0, 1.0 / lam))
        (i, r6(xbar), Some(r6(llr)), Some(r6(pmin)))
      } else (i, r6(xbar), None,
        if (pmin == Double.MaxValue) None else Some(r6(pmin)))
    }
    assert(got == want, s"got $got want $want")
  }

  test("msprt detects a strong drift and stays calm under the null") {
    val drift = Seq.tabulate(400)(i => (i.toLong, 10.0)).toDF("ord", "v")
      .withColumn("v", col("v") + (col("ord") % 2).cast("double"))
    val pDrift = Stats.msprt(drift, "v", theta0 = 0.0, tau2 = 1.0,
      orderCols = Seq("ord")).get
      .orderBy(col("seq").desc).select("p_always")
      .as[Option[Double]].head()
    assert(pDrift.exists(_ < 1e-6), s"drift not detected: $pDrift")
    // alternating +1/-1 around the true mean 0: no evidence
    val nullSeq = Seq.tabulate(400)(i =>
      (i.toLong, if (i % 2 == 0) 1.0 else -1.0)).toDF("ord", "v")
    val pNull = Stats.msprt(nullSeq, "v", theta0 = 0.0, tau2 = 1.0,
      orderCols = Seq("ord")).get
      .orderBy(col("seq").desc).select("p_always")
      .as[Option[Double]].head()
    assert(pNull.exists(_ > 0.3), s"null rejected: $pNull")
  }

  test("msprt p_always is non-increasing and tied rows are interchangeable") {
    val rnd = new scala.util.Random(3L)
    val df = Seq.tabulate(300)(i =>
      (i.toLong % 7, i.toLong, rnd.nextInt(5).toDouble)).toDF("k", "ord", "v")
    val ps = Stats.msprt(df, "v", theta0 = 2.0, tau2 = 0.5,
      orderCols = Seq("ord"), keys = Seq("k")).get
      .orderBy("k", "seq").select("k", "p_always")
      .as[(Long, Option[Double])].collect().toSeq
    ps.groupBy(_._1).values.foreach { g =>
      val vals = g.flatMap(_._2)
      assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    }
    // ties in (ord) with equal values: shuffling tied rows changes nothing
    val tied = Seq((1L, 3.0), (1L, 3.0), (2L, 5.0), (2L, 5.0), (3L, 1.0))
    val a = Stats.msprt(tied.toDF("ord", "v"), "v", 0.0, 1.0,
      Seq("ord")).get.orderBy("seq").collect().toSeq
    val b = Stats.msprt(tied.reverse.toDF("ord", "v"), "v", 0.0, 1.0,
      Seq("ord")).get.orderBy("seq").collect().toSeq
    assert(a == b)
  }

  test("msprt reports xbar in original units under scaling") {
    // cents-scaled values: the llr/p machinery runs on exact scaled
    // integers, but the REPORTED running mean must compare to theta0
    // in the caller's units — 0.05-ish discounts, not 5-cent means
    val df = Seq((1L, 0.04), (2L, 0.06), (3L, 0.05)).toDF("ord", "v")
    val xbars = Stats.msprt(df, "v", theta0 = 0.05, tau2 = 0.0004,
      orderCols = Seq("ord"), scaleDecimals = 2).get
      .orderBy("seq").select("xbar").as[Double].collect().toSeq
    assert(xbars == Seq(0.04, 0.05, 0.05), s"xbar not descaled: $xbars")
  }

  test("msprt validates knobs") {
    val df = Seq((1L, 1.0)).toDF("ord", "v")
    assert(Stats.msprt(df, "v", 0.0, 0.0, Seq("ord")).isFailing)
    assert(Stats.msprt(df, "v", 0.0, 1.0, Nil).isFailing)
    assert(Stats.msprt(df, "v", 0.0, 1.0, Seq("ord"),
      scaleDecimals = 10).isFailing)
  }

  // --- jackknifeRatio ------------------------------------------------------

  test("jackknifeRatio matches the hand-computed closed form") {
    val df = Seq(
      ("g1", 1.0, 1.0), ("g2", 2.0, 1.0), ("g3", 3.0, 1.0)
    ).toDF("g", "y", "x")
    val got = Stats.jackknifeRatio(df, "y", "x", "g").get
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].head()
    // theta = 2, loo = (2.5, 2, 1.5), thbar = 2,
    // SE = sqrt((2/3) * 0.5) = 0.5773502691896257
    assert(got._1 == 3L && got._2 == Some(2.0) && got._3 == Some(2.0))
    assert(got._4 == Some(0.57735))
    assert(got._5 == Some(BigDecimal(2.0 - 1.96 * 0.5773502691896257 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("jackknifeRatio surfaces undefined cases as NULL") {
    // one group: resampling impossible
    val one = Seq(("g1", 1.0, 1.0)).toDF("g", "y", "x")
    val r1 = Stats.jackknifeRatio(one, "y", "x", "g").get
      .select("theta").as[Option[Double]].head()
    assert(r1.isEmpty)
    // a dominant group: deleting it zeroes the denominator
    val dom = Seq(("g1", 1.0, 5.0), ("g2", 2.0, 0.0), ("g3", 1.0, 0.0))
      .toDF("g", "y", "x")
    val r2 = Stats.jackknifeRatio(dom, "y", "x", "g").get
      .select("se_jack").as[Option[Double]].head()
    assert(r2.isEmpty)
  }

  test("jackknifeRatio cent scaling keeps group sums exact") {
    val df = Seq(
      ("a", 0.1, 1.0), ("a", 0.2, 1.0), ("b", 0.3, 2.0), ("c", 0.1, 1.0)
    ).toDF("g", "y", "x")
    // scaled: y cents (10,20,30,10), x units; theta = 70/500 cents/unit...
    val got = Stats.jackknifeRatio(df, "y", "x", "g",
      numScaleDecimals = 2, denScaleDecimals = 2).get
      .select("n_groups", "theta").as[(Long, Option[Double])].head()
    // theta in scaled units: (10+20+30+10)/(100+100+200+100) = 70/500
    assert(got._1 == 3L && got._2 == Some(0.14))
  }

  test("jackknifeRatio reports original units when scales differ") {
    // cents numerator over unit denominator: θ must come back in
    // num-units per den-unit (0.14), not cents-per-unit (14) — and the
    // SE/CI must descale WITH it, so the interval brackets θ
    val df = Seq(
      ("a", 0.1, 1.0), ("a", 0.2, 1.0), ("b", 0.3, 2.0), ("c", 0.1, 1.0)
    ).toDF("g", "y", "x")
    val got = Stats.jackknifeRatio(df, "y", "x", "g",
      numScaleDecimals = 2, denScaleDecimals = 0).get
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].head()
    assert(got._2 == Some(0.14), s"theta not descaled: $got")
    assert(got._5.get <= 0.14 && 0.14 <= got._6.get,
      s"CI must bracket theta in the SAME units: $got")
    // and the mirrored case: unit numerator over cents denominator
    val got2 = Stats.jackknifeRatio(df, "x", "y", "g",
      numScaleDecimals = 0, denScaleDecimals = 2).get
      .select("theta").as[Option[Double]].head()
    assert(got2 == Some(BigDecimal(500.0 / 70.0 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      s"theta not upscaled: $got2")
  }

  // --- splitConformal ------------------------------------------------------

  test("splitConformal picks the finite-sample rank and appends intervals") {
    // residuals |y - yhat| = 1, 2, 3 on calibration; alpha = 0.5 ->
    // rank ceil(4 * 0.5) = 2 -> qhat = 2
    val cal = Seq((10.0, 11.0), (10.0, 12.0), (10.0, 13.0)).toDF("y", "yh")
    val test = Seq((0.0, 5.0), (0.0, 9.0)).toDF("y", "yh")
    val got = Stats.splitConformal(cal, test, "y", "yh", alpha = 0.5).get
      .select("yh", "conformal_lo", "conformal_hi")
      .as[(Double, Double, Double)].collect().toSeq.sorted
    assert(got == Seq((5.0, 3.0, 7.0), (9.0, 7.0, 11.0)))
  }

  test("splitConformal covers exchangeable data at the nominal rate") {
    val rnd = new scala.util.Random(23L)
    val rows = Seq.tabulate(4000)(i =>
      (i, 50.0 + rnd.nextGaussian() * 5, 50.0))
    val df = rows.toDF("id", "y", "yh")
    val cal = df.filter(col("id") % 2 === 1)
    val test = df.filter(col("id") % 2 === 0)
    val iv = Stats.splitConformal(cal, test, "y", "yh", alpha = 0.1).get
    val cov = iv.agg(
      avg(when(col("y") >= col("conformal_lo") &&
        col("y") <= col("conformal_hi"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(cov >= 0.87 && cov <= 0.95, s"coverage off nominal: $cov")
  }

  test("splitConformal fails loudly on undefined q-hat") {
    val cal = Seq((1.0, 1.5)).toDF("y", "yh")
    val test = Seq((1.0, 1.5)).toDF("y", "yh")
    // rank ceil(2 * 0.99) = 2 > n_cal = 1
    assert(Stats.splitConformal(cal, test, "y", "yh", alpha = 0.01)
      .isFailing)
    assert(Stats.splitConformal(cal.limit(0), test, "y", "yh").isFailing)
    assert(Stats.splitConformal(cal, test, "y", "yh", alpha = 0.0)
      .isFailing)
  }

  // --- poissonBootstrap ----------------------------------------------------

  test("poissonBootstrap brackets the mean, deterministically") {
    val rnd = new scala.util.Random(31L)
    val df = Seq.tabulate(2000)(i =>
      (i.toLong, 10.0 + rnd.nextGaussian())).toDF("id", "v")
      .withColumn("v", round(col("v") * 100) / 100)
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.poissonBootstrap(d, "v", Seq("id"), nBoot = 60,
        alpha = 0.1, scaleDecimals = 2, salt = "s").get
        .as[(Long, Double, Long, Double, Double)].head()
    val r = run(df)
    assert(r._1 == 2000L && r._3 == 60L)
    assert(r._4 <= r._2 && r._2 <= r._5, s"CI must bracket theta: $r")
    assert(r._4 > 9.8 && r._5 < 10.2, s"CI implausibly wide: $r")
    // bit-deterministic across reruns and partitionings
    assert(run(df.repartition(17)) == r)
    // a different salt is a fresh draw (bounds move, theta does not)
    val r2 = Stats.poissonBootstrap(df, "v", Seq("id"), nBoot = 60,
      alpha = 0.1, scaleDecimals = 2, salt = "t").get
      .as[(Long, Double, Long, Double, Double)].head()
    assert(r2._2 == r._2 && (r2._4 != r._4 || r2._5 != r._5))
    assert(Stats.poissonBootstrap(df, "v", Nil).isFailing)
    assert(Stats.poissonBootstrap(df, "v", Seq("id"), nBoot = 2).isFailing)
  }

  test("poissonBootstrap separates adjacent id tuples (no concat collision)") {
    // un-separated concat would hash ("1","23") and ("12","3") to the
    // SAME input — the two rows would share every Poisson draw and
    // every replicate mean would collapse to the plain mean, so the CI
    // would have zero width. The '§'-interleaved hash keeps the draws
    // independent: some replicate must weight the rows unequally.
    val df = Seq(("1", "23", 0.0), ("12", "3", 100.0))
      .toDF("a", "b", "v")
    val r = Stats.poissonBootstrap(df, "v", Seq("a", "b"), nBoot = 200,
      alpha = 0.1, salt = "sep").get
      .as[(Long, Double, Long, Double, Double)].head()
    assert(r._2 == 50.0)
    assert(r._4 < r._5, s"CI has zero width — id tuples collided: $r")
  }

  // --- didEstimator --------------------------------------------------------

  test("didEstimator matches the hand-computed 2x2 closed form") {
    val df = Seq(
      ("t", "pre", 1.0), ("t", "pre", 3.0),
      ("t", "post", 5.0), ("t", "post", 7.0),
      ("c", "pre", 1.0), ("c", "pre", 3.0),
      ("c", "post", 3.0), ("c", "post", 5.0),
      ("x", "post", 99.0), ("t", "mid", 99.0) // outside cells: dropped
    ).toDF("g", "p", "v")
    val got = Stats.didEstimator(df, "g", "t", "c", "p", "post", "pre",
      "v").get
      .as[(Long, Long, Long, Long, Long, Double, Double, Double, Double,
        Double, Option[Double], Option[Double], Option[Double])].head()
    // means 2/6/2/4, all cell vars = 2 with n = 2:
    // did = (6-2)-(4-2) = 2, se = sqrt(4*(2/2)/... ) = sqrt(4) = 2
    assert(got._1 == 8L && got._2 == 2L && got._5 == 2L)
    assert((got._6, got._7, got._8, got._9) == ((2.0, 6.0, 2.0, 4.0)))
    assert(got._10 == 2.0 && got._11 == Some(2.0))
    assert(got._12 == Some(BigDecimal(2.0 - 1.96 * 2.0 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("didEstimator surfaces thin cells as NULL SE, validates knobs") {
    val thin = Seq(("t", "pre", 1.0), ("t", "post", 2.0),
      ("c", "pre", 1.0), ("c", "pre", 2.0), ("c", "post", 3.0),
      ("c", "post", 4.0)).toDF("g", "p", "v")
    val r = Stats.didEstimator(thin, "g", "t", "c", "p", "post", "pre",
      "v").get.select("se_did").as[Option[Double]].head()
    assert(r.isEmpty, "single-row cells must yield NULL SE")
    assert(Stats.didEstimator(thin, "g", "t", "t", "p", "post", "pre",
      "v").isFailing)
    assert(Stats.didEstimator(thin, "g", "t", "c", "p", "post", "post",
      "v").isFailing)
  }

  // --- srmCheck --------------------------------------------------------------

  test("srmCheck: hand chi-square, absent and undesigned arms surface") {
    val df = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("arm")
    val got = Stats.srmCheck(df, "arm", Map("a" -> 1.0, "b" -> 1.0)).get
      .orderBy("arm")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSeq
    // N = 100, e = 50 each: terms 100/50 = 2, chi2 = 4, df = 1
    assert(got.map(_._2) == Seq(60L, 40L))
    assert(got.forall(r => r._3 == 0.5 && r._4 == 50.0 && r._5 == 2.0 &&
      r._6 == 4.0 && r._7 == 1L), s"$got")
    // a designed arm with zero observations contributes its full term
    val absent = Stats.srmCheck(df, "arm",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 2.0)).get
      .filter(col("arm") === "c")
      .as[(String, Long, Double, Double, Double, Double, Long)].head()
    assert(absent._2 == 0L && absent._4 == 50.0 && absent._5 == 50.0)
    // an observed-but-undesigned arm blows the total up, never NaN
    val rogue = Stats.srmCheck(
      df.union(Seq("z").toDF("arm")), "arm",
      Map("a" -> 1.0, "b" -> 1.0)).get
      .agg(max(col("chi2_total"))).head().getDouble(0)
    assert(rogue > 1e300 && !rogue.isNaN)
    assert(Stats.srmCheck(df, "arm", Map.empty).isFailing)
    assert(Stats.srmCheck(df, "arm", Map("a" -> 0.0)).isFailing)
  }

  // --- postStratifiedMean ----------------------------------------------------

  test("postStratifiedMean matches the hand closed form; missing " +
      "designed strata surface as NULL") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0),
      ("zz", 100.0)).toDF("h", "v") // zz: outside the design, dropped
    val got = Stats.postStratifiedMean(df, "v", "h",
      Map("a" -> 0.75, "b" -> 0.25)).get
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])]
      .head()
    // mean_post = .75*2 + .25*6 = 3; se = sqrt(.75^2*1 + .25^2*1)
    assert(got._1 == 4L && got._2 == 2L && got._3 == 2L)
    assert(got._4 == 4.0 && got._5 == Some(3.0))
    assert(got._6 == Some(BigDecimal(math.sqrt(0.625) + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // a designed stratum absent from the sample: estimator undefined
    val missing = Stats.postStratifiedMean(df, "v", "h",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)).get
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])]
      .head()
    assert(missing._2 == 3L && missing._3 == 2L && missing._5.isEmpty &&
      missing._6.isEmpty)
    assert(Stats.postStratifiedMean(df, "v", "h", Map.empty).isFailing)
  }

  // --- quantileEffect --------------------------------------------------------

  test("quantileEffect recovers a planted median shift with a " +
      "bracketing deterministic CI") {
    val rows = (1 to 400).map(i => (i.toLong, "c", i % 100 + 1.0)) ++
      (1 to 400).map(i => (1000L + i, "t", i % 100 + 6.0))
    val df = rows.toDF("id", "g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.quantileEffect(d, "g", "t", "c", "v", Seq("id"),
        p = 0.5, nBoot = 60, alpha = 0.1, salt = "qe").get
        .as[(Long, Long, Double, Double, Long, Double, Double)].head()
    val r = run(df)
    assert(r._1 == 400L && r._2 == 400L && r._3 == 0.5)
    assert(r._4 == 5.0, s"planted +5 shift must be exact at p50: $r")
    assert(r._5 == 60L)
    assert(r._6 <= 5.0 && 5.0 <= r._7, s"CI must bracket the shift: $r")
    assert(r._7 - r._6 < 20.0, s"CI implausibly wide: $r")
    // bit-deterministic across partitionings
    assert(run(df.repartition(13)) == r)
    // knobs
    assert(Stats.quantileEffect(df, "g", "t", "t", "v", Seq("id"))
      .isFailing)
    assert(Stats.quantileEffect(df, "g", "t", "c", "v", Nil).isFailing)
    assert(Stats.quantileEffect(df, "g", "t", "c", "v", Seq("id"),
      p = 0.0).isFailing)
    assert(Stats.quantileEffect(df, "g", "t", "c", "v", Seq("id"),
      nBoot = 2).isFailing)
  }

  // --- cmhTest ---------------------------------------------------------------

  test("cmhTest matches the hand-computed statistic on 2x2x2 tables") {
    def rows(s: String, x: Boolean, y: Boolean, k: Int) =
      Seq.fill(k)((s, x, y))
    val df = (rows("s1", true, true, 10) ++ rows("s1", true, false, 5) ++
      rows("s1", false, true, 3) ++ rows("s1", false, false, 12) ++
      rows("s2", true, true, 4) ++ rows("s2", true, false, 6) ++
      rows("s2", false, true, 8) ++ rows("s2", false, false, 2))
      .toDF("s", "x", "y")
    val got = Stats.cmhTest(df, "x", "y", "s").get
      .as[(Long, Long, Option[Double], Option[Double])].head()
    // reference with the operator's own op order
    def term(a: Double, b: Double, c: Double, d: Double) = {
      val n = a + b + c + d
      (a, (a + b) * (a + c) / n,
        (((a + b) * (c + d)) * (a + c) * (b + d)) / ((n * n) * (n - 1.0)),
        a * d / n, b * c / n)
    }
    val ts = Seq(term(10, 5, 3, 12), term(4, 6, 8, 2))
    val (sa, se, sv, son, sod) = (ts.map(_._1).sum, ts.map(_._2).sum,
      ts.map(_._3).sum, ts.map(_._4).sum, ts.map(_._5).sum)
    def r6(x: Double) = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 == 2L && got._2 == 50L)
    assert(got._3 == Some(r6(((sa - se) * (sa - se)) / sv)))
    assert(got._4 == Some(r6(son / sod)))
  }

  // --- psi -------------------------------------------------------------------

  test("psi is 0 for identical distributions and NULL on empty bins") {
    val a = (Seq.fill(50)(1.0) ++ Seq.fill(50)(10.0)).toDF("v")
    val same = Stats.psi(a, a, "v", Seq(5.0)).get
      .select("psi_total").as[Option[Double]].collect().toSeq
    assert(same.forall(_ == Some(0.0)))
    val b = Seq.fill(100)(1.0).toDF("v") // bin 1 empty on cur side
    val mixed = Stats.psi(a, b, "v", Seq(5.0)).get
      .orderBy("bin")
      .select("n_cur", "contrib", "psi_total")
      .as[(Long, Option[Double], Option[Double])].collect().toSeq
    assert(mixed.map(_._1) == Seq(100L, 0L))
    assert(mixed.forall(_._3.isEmpty) && mixed(1)._2.isEmpty)
    assert(Stats.psi(a, b, "v", Nil).isFailing)
    assert(Stats.psi(a, b, "v", Seq(2.0, 1.0)).isFailing)
  }

  test("psi detects a planted shift with the textbook magnitude") {
    // ref 80/20, cur 60/40 across one edge:
    // psi = (0.6-0.8)ln(0.75) + (0.4-0.2)ln(2) = 0.196166
    val ref = (Seq.fill(80)(1.0) ++ Seq.fill(20)(10.0)).toDF("v")
    val cur = (Seq.fill(60)(1.0) ++ Seq.fill(40)(10.0)).toDF("v")
    val got = Stats.psi(ref, cur, "v", Seq(5.0)).get
      .select("psi_total").as[Option[Double]].head()
    val want = (0.6 - 0.8) * math.log(0.6 / 0.8) +
      (0.4 - 0.2) * math.log(0.4 / 0.2)
    assert(got == Some(BigDecimal(want + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  // --- calibrationReport ------------------------------------------------------

  test("calibrationReport: hand bins, perfect calibration has tiny ECE") {
    // scores 0.25 (40% pos) and 0.75 (80% pos): gaps 0.15 and 0.05
    val df = (Seq.fill(4)((0.25, true)) ++ Seq.fill(6)((0.25, false)) ++
      Seq.fill(8)((0.75, true)) ++ Seq.fill(2)((0.75, false)))
      .toDF("s", "y")
    val got = Stats.calibrationReport(df, "s", "y", bins = 4).get
      .orderBy("bin")
      .select("bin", "n", "acc", "conf", "gap", "ece_total")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 3L))
    assert(got.map(_._3) == Seq(0.4, 0.8))
    assert(got.map(_._4) == Seq(0.25, 0.75))
    assert(got.map(_._5) == Seq(0.15, 0.05))
    // ece = 0.5*0.15 + 0.5*0.05 = 0.1
    assert(got.forall(_._6 == 0.1))
    // perfectly calibrated scores
    val cal = (Seq.fill(7)((0.7, true)) ++ Seq.fill(3)((0.7, false)))
      .toDF("s", "y")
    val ece = Stats.calibrationReport(cal, "s", "y", bins = 10).get
      .select("ece_total").as[Double].head()
    assert(ece == 0.0)
    assert(Stats.calibrationReport(df, "s", "y", bins = 1).isFailing)
  }

  // --- brierDecomposition ------------------------------------------------

  test("brierDecomposition: hand case satisfies the grid Murphy identity") {
    // constant-within-bin scores: brier == rel - res + unc exactly
    val df = (Seq.fill(4)((0.25, true)) ++ Seq.fill(6)((0.25, false)) ++
      Seq.fill(8)((0.75, true)) ++ Seq.fill(2)((0.75, false)))
      .toDF("s", "y")
    val got = Stats.brierDecomposition(df, "s", "y", bins = 4).get
      .as[(Long, Double, Double, Double, Double)].head()
    val (n, brier, rel, res, unc) = got
    assert(n == 20L)
    // hand: ybar = 0.6; unc = 0.24
    // bin .25: conf .25 acc .4 -> rel term .5*(.15)^2 = .01125
    // bin .75: conf .75 acc .8 -> .5*(.05)^2 = .00125 -> rel .0125
    // res: .5*(.4-.6)^2 + .5*(.8-.6)^2 = .04
    // brier: mean((s-y)^2): bin1: 4*(.75)^2+6*(.25)^2; bin2:
    //   8*(.25)^2+2*(.75)^2 -> (2.25+.375+.5+1.125)/20 = 0.2125
    assert(brier == 0.2125 && rel == 0.0125 && res == 0.04 && unc == 0.24)
    assert(math.abs(brier - (rel - res + unc)) < 1e-9)
    assert(Stats.brierDecomposition(df, "s", "y", bins = 1).isFailing)
  }

  // --- medianCI -------------------------------------------------------------

  test("medianCI picks the hand order statistics and brackets the median") {
    // n = 25 of 1..25: z sqrt(25) = 9.8 -> l = floor(15.2/2) = 7,
    // u = 26 - 7 = 19, median rank ceil(12.5) = 13
    val df = (1 to 25).map(_.toDouble).toDF("v")
    val got = Stats.medianCI(df, "v").get
      .as[(Long, Double, Option[Double], Option[Double])].head()
    assert(got == ((25L, 13.0, Some(7.0), Some(19.0))))
    // tiny n: interval collapses to defined picks, never crashes
    val two = Seq(1.0, 2.0).toDF("v")
    val r2 = Stats.medianCI(two, "v").get
      .as[(Long, Double, Option[Double], Option[Double])].head()
    assert(r2._1 == 2L && r2._2 == 1.0 && r2._3.isDefined)
    // duplicate-heavy grid still picks by cumulative rank
    val dup = (Seq.fill(10)(5.0) ++ Seq.fill(10)(7.0)).toDF("v")
    val r3 = Stats.medianCI(dup, "v").get
      .as[(Long, Double, Option[Double], Option[Double])].head()
    assert(r3 == ((20L, 5.0, Some(5.0), Some(7.0))))
  }

  test("medianCI returns ONE row of NULLs on an empty input") {
    val empty = Seq(1.0).toDF("v").limit(0)
    val got = Stats.medianCI(empty, "v").get
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq((0L, None, None, None)),
      s"one-row contract violated on empty input: $got")
    // all-null values are an empty sample too
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    val g2 = Stats.medianCI(nulls, "v").get
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(g2 == Seq((0L, None, None, None)))
  }

  test("poissonBootstrapBy slices the same resampling universe per key") {
    val rnd = new scala.util.Random(37L)
    val df = Seq.tabulate(1500)(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b",
        (if (i % 3 == 0) 5.0 else 9.0) + rnd.nextGaussian() * 0.5))
      .toDF("id", "k", "v")
      .withColumn("v", round(col("v") * 100) / 100)
    val by = Stats.poissonBootstrapBy(df, "v", Seq("id"), Seq("k"),
      nBoot = 50, scaleDecimals = 2, salt = "z").get
      .as[(String, Long, Double, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(by("a")._5 <= by("a")._3 && by("a")._3 <= by("a")._6)
    assert(by("b")._5 <= by("b")._3 && by("b")._3 <= by("b")._6)
    assert(by("a")._6 < by("b")._5, "segment CIs must separate the means")
    // draws are key-independent: the per-key CI equals the global CI
    // of the key's own rows (same ids, same salt)
    val onlyA = Stats.poissonBootstrap(df.filter(col("k") === "a"), "v",
      Seq("id"), nBoot = 50, scaleDecimals = 2, salt = "z").get
      .as[(Long, Double, Long, Double, Double)].head()
    assert((by("a")._2, by("a")._3, by("a")._4, by("a")._5, by("a")._6)
      == onlyA)
    assert(Stats.poissonBootstrapBy(df, "v", Seq("id"), Nil).isFailing)
  }

  test("splitConformalBy covers per group and NULLs thin/unseen groups") {
    val rnd = new scala.util.Random(43L)
    // group a: tight residuals; group b: 10x wider
    val rows = Seq.tabulate(3000)(i => {
      val g = if (i % 2 == 0) "a" else "b"
      val scale = if (g == "a") 1.0 else 10.0
      (i, g, 100.0 + rnd.nextGaussian() * scale, 100.0)
    })
    val df = rows.toDF("id", "g", "y", "yh")
    val cal = df.filter(col("id") % 4 < 2)
    val test = df.filter(col("id") % 4 >= 2)
    val iv = Stats.splitConformalBy(cal, test, "y", "yh", Seq("g")).get
    val width = iv.groupBy("g")
      .agg(max(col("conformal_hi") - col("conformal_lo")))
      .as[(String, Double)].collect().toMap
    assert(width("b") > width("a") * 4,
      s"group widths must reflect group scales: $width")
    val cov = iv.groupBy("g").agg(
      avg(when(col("y") >= col("conformal_lo") &&
        col("y") <= col("conformal_hi"), 1.0).otherwise(0.0)))
      .as[(String, Double)].collect().toMap
    assert(cov.values.forall(c => c >= 0.85 && c <= 0.97),
      s"per-group coverage off: $cov")
    // a group unseen in calibration gets NULL intervals, not a Fail
    val testX = test.withColumn("g",
      when(col("id") % 100 === 98, "zz").otherwise(col("g")))
    val nulls = Stats.splitConformalBy(cal, testX, "y", "yh", Seq("g"))
      .get.filter(col("g") === "zz")
      .select("conformal_lo").as[Option[Double]].collect()
    assert(nulls.nonEmpty && nulls.forall(_.isEmpty))
    assert(Stats.splitConformalBy(cal, test, "y", "yh", Nil).isFailing)
  }

  test("trimmedMean: hand band overlap, trim 0 equals the mean") {
    // 1..10, trim .2 -> g = 2, keep 3..8, mean 5.5
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val got = Stats.trimmedMean(df, "v", trim = 0.2).get
      .as[(Long, Long, Option[Double])].head()
    assert(got == ((10L, 6L, Some(5.5))))
    val plain = Stats.trimmedMean(df, "v", trim = 0.0).get
      .as[(Long, Long, Option[Double])].head()
    assert(plain == ((10L, 10L, Some(5.5))))
    // duplicates straddling the cut: 5x1, 5x2 with trim .3 -> g = 3,
    // keep ranks 4..7 = two 1s and two 2s -> 1.5
    val dup = (Seq.fill(5)(1.0) ++ Seq.fill(5)(2.0)).toDF("v")
    val d = Stats.trimmedMean(dup, "v", trim = 0.3).get
      .as[(Long, Long, Option[Double])].head()
    assert(d == ((10L, 4L, Some(1.5))))
    assert(Stats.trimmedMean(df, "v", trim = 0.5).isFailing)
    assert(Stats.trimmedMean(df, "v", -0.1).isFailing)
  }

  test("mmdLinear: calm on same distribution, fires on a shifted one, " +
      "deterministic") {
    val rnd = new scala.util.Random(47L)
    def mk(n: Int, shift: Float, ids: Int => Long) =
      Seq.tabulate(n)(i =>
        (ids(i), Seq.fill(16)(rnd.nextFloat() + shift)))
        .toDF("vec_id", "embedding")
    val a = mk(400, 0f, i => i.toLong * 2)
    val b = mk(400, 0f, i => i.toLong * 2 + 1)
    val calm = Stats.mmdLinear(a, b, "embedding", "vec_id",
      gamma = 0.5, nBuckets = 8).get
      .as[(Long, Double, Double, Option[Double])].head()
    assert(calm._1 > 150 && calm._4.exists(z => math.abs(z) < 3.0),
      s"same-dist z too large: $calm")
    val c = mk(400, 1.5f, i => i.toLong * 2 + 1)
    val hot = Stats.mmdLinear(a, c, "embedding", "vec_id",
      gamma = 0.5, nBuckets = 8).get
      .as[(Long, Double, Double, Option[Double])].head()
    assert(hot._4.exists(_ > 5.0), s"shifted dist not detected: $hot")
    // bit-deterministic across partitionings
    val again = Stats.mmdLinear(a.repartition(13), c.repartition(5),
      "embedding", "vec_id", gamma = 0.5, nBuckets = 8).get
      .as[(Long, Double, Double, Option[Double])].head()
    assert(again == hot)
    assert(Stats.mmdLinear(a, b, "embedding", "vec_id", 0.0).isFailing)
  }

  test("proportionCIBy: Wilson brackets, sane at extremes, hand value") {
    val df = (Seq.fill(8)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
      Seq.fill(5)(("b", false))).toDF("g", "y")
    val got = Stats.proportionCIBy(df, "y", Seq("g")).get
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val z = 1.959963984540054
    def wilson(s: Long, n: Long) = {
      val ph = s.toDouble / n; val nd = n.toDouble; val z2 = z * z
      val den = 1.0 + z2 / nd
      val c = (ph + z2 / (2.0 * nd)) / den
      val h = (z * math.sqrt(ph * (1.0 - ph) / nd +
        z2 / ((4.0 * nd) * nd))) / den
      def r6(x: Double) = BigDecimal(x + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r6(c - h), r6(c + h))
    }
    val (lo, hi) = wilson(8, 10)
    assert(got("a") == (("a", 10L, 8L, 0.8, lo, hi)))
    // all-failure group: lo = 0-ish but hi stays meaningfully above 0
    // (the Wald interval would collapse to [0, 0])
    assert(got("b")._4 == 0.0 && got("b")._6 > 0.3)
    assert(got("b")._5 >= 0.0 && got("b")._6 <= 1.0)
    assert(Stats.proportionCIBy(df, "y", Nil).isFailing)
  }

  test("cochranArmitage detects a planted dose-response trend") {
    // rates 10% / 50% / 90% at scores 1, 2, 3
    def rows(s: Int, k: Int, pos: Int) =
      Seq.tabulate(k)(i => (s.toDouble, i < pos))
    val up = (rows(1, 100, 10) ++ rows(2, 100, 50) ++ rows(3, 100, 90))
      .toDF("score", "y")
    val got = Stats.cochranArmitage(up, "y", "score").get
      .as[(Long, Long, Long, Double, Option[Double])].head()
    assert(got._1 == 3L && got._2 == 300L && got._3 == 150L)
    // hand: A = 10 + 100 + 270 = 380; B = 600; T = 380 - 0.5*600 = 80
    assert(got._4 == 80.0)
    assert(got._5.exists(_ > 10.0), s"trend not detected: $got")
    // flat rates: z near 0; constant outcome: NULL
    val flat = (rows(1, 100, 50) ++ rows(2, 100, 50) ++ rows(3, 100, 50))
      .toDF("score", "y")
    val zf = Stats.cochranArmitage(flat, "y", "score").get
      .select("z").as[Option[Double]].head()
    assert(zf.exists(z => math.abs(z) < 1e-6))
    val const = rows(1, 50, 50).toDF("score", "y")
    assert(Stats.cochranArmitage(const, "y", "score").get
      .select("z").as[Option[Double]].head().isEmpty)
  }

  test("runsTest: hand run counts, clustered vs alternating extremes") {
    // perfectly alternating: R = n -> large positive z
    val alt = Seq.tabulate(100)(i => (i.toLong, i % 2 == 0))
      .toDF("ord", "x")
    val ra = Stats.runsTest(alt, "x", Seq("ord")).get
      .as[(Long, Long, Long, Option[Double])].head()
    assert(ra == ((100L, 50L, 100L, ra._4)) && ra._4.exists(_ > 9.0))
    // perfectly clustered: R = 2 -> large negative z
    val clu = Seq.tabulate(100)(i => (i.toLong, i < 50)).toDF("ord", "x")
    val rc = Stats.runsTest(clu, "x", Seq("ord")).get
      .as[(Long, Long, Long, Option[Double])].head()
    assert(rc._3 == 2L && rc._4.exists(_ < -9.0))
    // one-sided degenerate: NULL z
    val one = Seq.tabulate(10)(i => (i.toLong, true)).toDF("ord", "x")
    assert(Stats.runsTest(one, "x", Seq("ord")).get
      .select("z").as[Option[Double]].head().isEmpty)
    assert(Stats.runsTest(one, "x", Nil).isFailing)
  }
}
