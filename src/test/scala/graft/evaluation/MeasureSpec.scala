package graft.evaluation

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MeasureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // Fixture shaped like the reference's W(i, d, label) rows
  // (reference AllTest.scala:768-775): pred vs label with known residuals.
  private lazy val df = Seq(
    (0.0, 0.0), (1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (4.0, 4.0)
  ).toDF("pred", "label")

  test("RMSE golden") {
    // residuals²: 0,1,1,4,0 → mean 1.2 → sqrt
    val r = RMSE.%(df, "pred", "label").get
    assert(math.abs(r - math.sqrt(1.2)) < 1e-12)
    assert(RMSE.isBetter(0.1, 0.2))
  }

  test("MAE golden") {
    // |residuals|: 0,1,1,2,0 → mean 0.8
    val r = MAE.%(df, "pred", "label").get
    assert(math.abs(r - 0.8) < 1e-12)
  }

  test("MPE matches reference |p-l|/l (signed denom, unscaled); zero labels drop") {
    // rows with l≠0: 1/2=.5, 1/1=1, 2/5=.4, 0/4=0 → avg .475
    val r = MPE.%(df, "pred", "label").get
    assert(math.abs(r - 0.475) < 1e-12)
    // signed denominator: pred=0, label=-2 → |0-(-2)|/(-2) = -1
    val neg = Seq((0.0, -2.0)).toDF("pred", "label")
    assert(math.abs(MPE.%(neg, "pred", "label").get - (-1.0)) < 1e-12)
  }

  test("PearsonCorr matches df.stat.corr and prefers higher") {
    val r = PearsonCorr.%(df, "pred", "label").get
    assert(math.abs(r - df.stat.corr("pred", "label")) < 1e-12)
    assert(PearsonCorr.isBetter(0.9, 0.3))
  }

  test("R2 equals 1 for perfect predictions") {
    val perfect = Seq((1.0, 1.0), (2.0, 2.0), (5.0, 5.0)).toDF("pred", "label")
    assert(math.abs(R2.%(perfect, "pred", "label").get - 1.0) < 1e-12)
  }

  test("R2 is numerically stable when mean(label) >> stddev(label)") {
    // labels ~1e8 with unit spread: Σl²−(Σl)²/n cancels catastrophically
    // in doubles; var_pop-based SS_tot must not
    val base = 1e8
    val rows = Seq((base + 1.0, base + 1.1), (base + 2.0, base + 1.9),
      (base + 3.0, base + 3.05), (base + 4.0, base + 3.95))
    val r = R2.%(rows.toDF("pred", "label"), "pred", "label").get
    // definitional R² computed driver-side
    val labels = rows.map(_._2); val mean = labels.sum / labels.size
    val ssTot = labels.map(l => (l - mean) * (l - mean)).sum
    val ssRes = rows.map { case (p, l) => (l - p) * (l - p) }.sum
    val expected = 1.0 - ssRes / ssTot
    assert(math.abs(r - expected) < 1e-6, s"got $r, expected $expected")
  }
}
