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

  test("MPE excludes zero labels via null propagation") {
    // |1 - p/l| over rows with l≠0: |1-0.5|=.5, |1-2|=1, |1-0.6|=.4, |1-1|=0 → avg .475 ×100
    val r = MPE.%(df, "pred", "label").get
    assert(math.abs(r - 47.5) < 1e-9)
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
}
