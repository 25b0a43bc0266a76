package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("node", "rank").as[(Long, Long)].collect().toMap

  test("outDegrees dedupes the edge list before counting") {
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val got = Graph.outDegrees(e, "s", "d").get
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("two-node cycle is the exact fixed point: ranks stay at scale") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val got = ranksOf(Graph.pageRank(e, "s", "d", iterations = 4,
      scale = 1000000000L).get)
    // (scale*17) div 20 + (scale*3) div 20 = scale exactly (scale % 20 == 0)
    assert(got == Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("dangling mass redistributes; hand-computed 2-iteration golden") {
    // 1 → 2, node 2 dangling; scale 1000, teleport (1000*3) div 20 = 150
    // iter1: dang = (1000*17) div 20 = 850, share 850 div 2 = 425
    //        r(1) = 150+425 = 575; r(2) = (1000*17) div 20 + 575 = 1425
    // iter2: dang = (1425*17) div 20 = 1211, share 605
    //        r(1) = 150+605 = 755; r(2) = (575*17) div 20 + 755 = 1243
    val e = Seq((1L, 2L)).toDF("s", "d")
    val it1 = ranksOf(Graph.pageRank(e, "s", "d", iterations = 1, scale = 1000L).get)
    assert(it1 == Map(1L -> 575L, 2L -> 1425L))
    val it2 = ranksOf(Graph.pageRank(e, "s", "d", iterations = 2, scale = 1000L).get)
    assert(it2 == Map(1L -> 755L, 2L -> 1243L))
  }

  test("ranks are a pure function of the graph — partitioning-invariant") {
    val edges = (1L to 40L).map(i => (i % 7, (i * 3) % 7)).toDF("s", "d")
    val a = ranksOf(Graph.pageRank(edges, "s", "d", iterations = 3,
      scale = 100000L, checkpointEvery = 1).get)
    val b = ranksOf(Graph.pageRank(edges.repartition(13), "s", "d",
      iterations = 3, scale = 100000L).get)
    assert(a == b && a.nonEmpty)
  }

  test("score normalizes by total initial mass") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val got = Graph.pageRank(e, "s", "d", iterations = 1, scale = 1000000000L)
      .get.select("node", "score").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.5 && got(2L) == 0.5)
  }

  test("scale overflow guard rejects unsafe n * scale * dampNum") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", iterations = 1, scale = Long.MaxValue / 20)
    assert(r.isFailing)
  }
}
