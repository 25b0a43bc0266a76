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

  private def byEid(df: org.apache.spark.sql.DataFrame): Map[String, (Option[Double], Option[Long])] =
    df.select("eid", "rv", "rt").as[(String, Option[Double], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("forward as-of attaches the earliest right row at or after left ts") {
    val got = byEid(AsOfJoin.asOf(left, right, "t", "rt", Seq("user"), Seq("rv"),
      direction = "forward").get)
    assert(got("e1") == ((Some(90.0), Some(9L)))) // t=5 → rt=9
    assert(got("e2") == ((None, None)))           // t=10 → nothing after
    assert(got("e3") == ((Some(40.0), Some(4L)))) // t=3 → rt=4
    assert(got("e4") == ((None, None)))
  }

  test("nearest as-of picks the closer side; exact ties go backward") {
    val got = byEid(AsOfJoin.asOf(left, right, "t", "rt", Seq("user"), Seq("rv"),
      direction = "nearest").get)
    assert(got("e1") == ((Some(40.0), Some(4L)))) // t=5: back 1 vs fwd 4
    assert(got("e2") == ((Some(90.0), Some(9L)))) // t=10: back 1, no fwd
    assert(got("e3") == ((Some(40.0), Some(4L)))) // t=3: fwd 1, no back
    // exact tie: left at 6.5 is impossible with longs — plant 6 vs (4, 9):
    // back 2 < fwd 3 → backward; and a true tie at equidistant rows
    val l2 = Seq(("u1", 6L, "tie1")).toDF("user", "t", "eid")
    val r2 = Seq(("u1", 4L, 40.0), ("u1", 8L, 80.0)).toDF("user", "rt", "rv")
    val tie = byEid(AsOfJoin.asOf(l2, r2, "t", "rt", Seq("user"), Seq("rv"),
      direction = "nearest").get)
    assert(tie("tie1") == ((Some(40.0), Some(4L))),
      "equidistant match must resolve backward (pandas tie order)")
  }

  test("tolerance nulls out matches beyond the bound, per direction") {
    import org.apache.spark.sql.functions.lit
    val gotB = byEid(AsOfJoin.asOf(left, right, "t", "rt", Seq("user"), Seq("rv"),
      direction = "backward", tolerance = Some(lit(1L))).get)
    assert(gotB("e1") == ((Some(40.0), Some(4L)))) // distance 1 ≤ 1
    assert(gotB("e2") == ((Some(90.0), Some(9L))))
    val tight = byEid(AsOfJoin.asOf(left, right, "t", "rt", Seq("user"), Seq("rv"),
      direction = "backward", tolerance = Some(lit(0L))).get)
    assert(tight("e1") == ((None, None)), "distance 1 must fail a 0 tolerance")
    val gotN = byEid(AsOfJoin.asOf(left, right, "t", "rt", Seq("user"), Seq("rv"),
      direction = "nearest", tolerance = Some(lit(2L))).get)
    assert(gotN("e3") == ((Some(40.0), Some(4L)))) // fwd distance 1 ≤ 2
    assert(gotN("e1") == ((Some(40.0), Some(4L))))
  }

  test("allowExactMatches=false makes the inequality strict in both directions") {
    val l = Seq(("u1", 4L, "eq")).toDF("user", "t", "eid")
    val strictB = byEid(AsOfJoin.asOf(l, right, "t", "rt", Seq("user"), Seq("rv"),
      direction = "backward", allowExactMatches = false).get)
    assert(strictB("eq") == ((None, None)), "rt=4 must not match t=4 strictly")
    val strictF = byEid(AsOfJoin.asOf(l, right, "t", "rt", Seq("user"), Seq("rv"),
      direction = "forward", allowExactMatches = false).get)
    assert(strictF("eq") == ((Some(90.0), Some(9L))), "strict forward skips rt=4 for rt=9")
    val bad = AsOfJoin.asOf(left, right, "t", "rt", Seq("user"), Seq("rv"),
      direction = "sideways")
    assert(bad.isFailing)
  }
}
