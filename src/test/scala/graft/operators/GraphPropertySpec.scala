package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized cross-checks of the graph operators against brute-force
  * reference implementations on small Erdős–Rényi-ish graphs — the
  * orientation/peeling/fixed-point machinery must agree with the naive
  * definition on EVERY sampled graph, not just the hand goldens.
  * Seeded loop (scalacheck is not in the offline cache). */
class GraphPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20240814L)

  /** Random undirected simple graph as a normalized edge set. */
  private def randomGraph(maxN: Int, pPercent: Int): Set[(Long, Long)] = {
    val n = 2 + rnd.nextInt(maxN - 1)
    (for {
      a <- 1 to n; b <- (a + 1) to n
      if rnd.nextInt(100) < pPercent
    } yield (a.toLong, b.toLong)).toSet
  }

  private def toDf(edges: Set[(Long, Long)]) = {
    // feed each edge in a random orientation, with occasional duplicates,
    // to exercise normalization on every sample
    val rows = edges.toSeq.flatMap { case (a, b) =>
      val base = if (rnd.nextBoolean()) Seq((a, b)) else Seq((b, a))
      if (rnd.nextInt(4) == 0) base :+ base.head else base
    }
    rows.toDF("s", "d")
  }

  test("triangleCount matches brute-force enumeration on random graphs") {
    (0 until 12).foreach { _ =>
      val g = randomGraph(12, 40)
      if (g.nonEmpty) {
        val adj = g.foldLeft(Map.empty[Long, Set[Long]].withDefaultValue(Set.empty[Long])) {
          case (m, (a, b)) => m.updated(a, m(a) + b).updated(b, m(b) + a)
        }
        val nodes = adj.keys.toSeq.sorted
        val expect = nodes.map { v =>
          val nb = adj(v).toSeq
          v -> (for {
            i <- nb.indices; j <- (i + 1) until nb.size
            if adj(nb(i)).contains(nb(j))
          } yield 1).size.toLong
        }.toMap
        val got = Graph.triangleCount(toDf(g), "s", "d").get
          .select("node", "triangles").as[(Long, Long)].collect().toMap
        assert(got == expect, s"graph=$g")
      }
    }
  }

  test("kCore matches reference peeling on random graphs") {
    (0 until 12).foreach { _ =>
      val g = randomGraph(12, 40)
      val k = 2L + rnd.nextInt(3)
      if (g.nonEmpty) {
        val adj = g.foldLeft(Map.empty[Long, Set[Long]].withDefaultValue(Set.empty[Long])) {
          case (m, (a, b)) => m.updated(a, m(a) + b).updated(b, m(b) + a)
        }
        var alive = adj.keySet
        var changed = true
        while (changed) {
          val drop = alive.filter(v => (adj(v) & alive).size < k)
          changed = drop.nonEmpty
          alive = alive -- drop
        }
        val expect = alive.map(v => v -> (adj(v) & alive).size.toLong).toMap
        val got = Graph.kCore(toDf(g), "s", "d", k).get
          .as[(Long, Long)].collect().toMap
        assert(got == expect, s"graph=$g k=$k")
      }
    }
  }

  test("connectedComponents matches reference union-find on random sparse graphs") {
    (0 until 8).foreach { _ =>
      val g = randomGraph(14, 12)
      if (g.nonEmpty) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        g.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = g.flatMap(e => Seq(e._1, e._2))
        val expect = nodes.map(v => v -> find(v)).toMap
        val got = Graph.connectedComponents(toDf(g), "s", "d").get
          .as[(Long, Long)].collect().toMap
        assert(got == expect, s"graph=$g")
      }
    }
  }

  test("pageRank conserves mass within the documented floor-leak bound") {
    (0 until 8).foreach { _ =>
      val g = randomGraph(10, 35)
      if (g.nonEmpty) {
        // directed: keep each undirected edge's random orientation as-is
        val dir = g.map(e => if (rnd.nextBoolean()) e else e.swap)
        val iterations = 1 + rnd.nextInt(3)
        val scale = 1000000L
        val ranks = Graph.pageRank(dir.toSeq.toDF("s", "d"), "s", "d",
          iterations = iterations, scale = scale).get
          .select("rank").as[Long].collect()
        val n = ranks.length.toLong
        val m = n * scale
        val total = ranks.sum
        // per iteration: < 1 unit per edge (transfer floor) + 1 per
        // dangling node (damp floor) + n (teleport + dangling-share
        // floors); the bound is loose but the DIRECTION is strict —
        // fixed-point arithmetic can only leak, never create mass
        val bound = iterations.toLong * (dir.size + 2 * n)
        assert(total <= m, s"mass created: $total > $m (graph=$dir)")
        assert(m - total <= bound,
          s"leak ${m - total} exceeds bound $bound (graph=$dir iters=$iterations)")
      }
    }
  }
}
