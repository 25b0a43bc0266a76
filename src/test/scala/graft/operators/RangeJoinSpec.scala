package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("pointInInterval equals the theta join, half-open bounds") {
    val pts = Seq((1L, 0.0), (2L, 4.9), (3L, 5.0), (4L, 14.99), (5L, 15.0), (6L, -1.0))
      .toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 5.0), (11L, 5.0, 15.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binSize = 3.0).get
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val expect = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == expect)
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 11L)))
  }

  test("pointInInterval with by-keys restricts matches") {
    val pts = Seq(("a", 1.0, 1L), ("b", 1.0, 2L)).toDF("k", "p", "pid")
    val ivs = Seq(("a", 0.0, 10.0, 10L)).toDF("k", "lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 5.0, by = Seq("k")).get
    assert(got.select("pid").as[Long].collect().toSeq == Seq(1L))
  }

  test("open-ended intervals raise a descriptive error instead of exploding") {
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val open = Seq((10L, 0.0, 1e12)).toDF("iid", "lo", "hi") // sentinel end
    val r = RangeJoin.pointInInterval(pts, open, "p", "lo", "hi", binSize = 1.0)
    // plan builds fine; the guard fires at execution
    val err = intercept[Exception](r.get.count())
    assert(err.getMessage.contains("interval spans more than") ||
      Option(err.getCause).exists(_.getMessage.contains("interval spans more than")))
  }

  test("shared non-key column names are rejected up front") {
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val ivs = Seq((1L, 0.0, 9.0)).toDF("pid", "lo", "hi") // pid clashes
    assert(RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 1.0).isFailing)
  }

  test("intervalOverlap finds intersecting intervals once each") {
    val l = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0)).toDF("lid", "ls", "le")
    val r = Seq((10L, 5.0, 25.0), (11L, 40.0, 50.0)).toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
      binSize = 4.0, leftKey = "lid", rightKey = "rid").get
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L))) // 10 overlaps both; 11 neither
  }
}
