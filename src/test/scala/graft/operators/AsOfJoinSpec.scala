package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val left = Seq(
    ("u1", 5L, "e1"), ("u1", 10L, "e2"), ("u1", 3L, "e3"), ("u2", 7L, "e4")
  ).toDF("user", "t", "eid")
  private lazy val right = Seq(
    ("u1", 4L, 40.0), ("u1", 9L, 90.0), ("u3", 1L, 10.0)
  ).toDF("user", "rt", "rv")

  test("backward as-of attaches most recent right row at or before left ts") {
    val got = AsOfJoin.backward(left, right, "t", "rt", Seq("user"), Seq("rv")).get
      .select("eid", "rv", "rt").as[(String, Option[Double], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("e1") == ((Some(40.0), Some(4L))))  // t=5 → rt=4
    assert(got("e2") == ((Some(90.0), Some(9L))))  // t=10 → rt=9
    assert(got("e3") == ((None, None)))            // t=3 → no earlier right row
    assert(got("e4") == ((None, None)))            // u2 has no right rows
  }

  test("inclusive semantics: equal timestamps match") {
    val l = Seq(("u1", 4L, "e")).toDF("user", "t", "eid")
    val got = AsOfJoin.backward(l, right, "t", "rt", Seq("user"), Seq("rv")).get
    assert(got.select("rv").as[Option[Double]].head().contains(40.0))
  }

  test("left row count is preserved (left-join shape)") {
    val got = AsOfJoin.backward(left, right, "t", "rt", Seq("user"), Seq("rv")).get
    assert(got.count() == left.count())
  }

  test("clashing payload columns are rejected") {
    val bad = right.withColumnRenamed("rv", "eid")
    assert(AsOfJoin.backward(left, bad, "t", "rt", Seq("user"), Seq("eid")).isFailing)
  }

  test("identical timestamp names on both sides work (ts not emitted)") {
    val sameName = right.withColumnRenamed("rt", "t")
    val got = AsOfJoin.backward(left, sameName, "t", "t", Seq("user"), Seq("rv")).get
    val byEid = got.select("eid", "rv").as[(String, Option[Double])]
      .collect().toMap
    assert(byEid("e1").contains(40.0) && byEid("e2").contains(90.0))
    assert(byEid("e3").isEmpty)
    assert(got.columns.count(_ == "t") == 1) // left's t only
  }
}
