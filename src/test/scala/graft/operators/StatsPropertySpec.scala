package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized cross-checks of the statistical tests against direct
  * Scala reference computations. Values are drawn from a small integer
  * grid: sums stay exact (the module's determinism convention) and ties
  * actually occur, so the midrank/contingency paths are exercised on
  * every sample. Seeded loop (scalacheck is not in the offline cache). */
class StatsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(8140814L)

  private def sample(): (Seq[Double], Seq[Double]) = {
    val na = 3 + rnd.nextInt(20)
    val nb = 3 + rnd.nextInt(20)
    (Seq.fill(na)(rnd.nextInt(12).toDouble), Seq.fill(nb)(rnd.nextInt(12).toDouble))
  }

  private def toDf(a: Seq[Double], b: Seq[Double]) =
    (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")

  test("welchTTest matches the direct formula on random integral samples") {
    (0 until 15).foreach { _ =>
      val (a, b) = sample()
      def m(x: Seq[Double]) = x.sum / x.size
      def va(x: Seq[Double]) =
        x.map(v => (v - m(x)) * (v - m(x))).sum / (x.size - 1)
      val r = Stats.welchTTest(toDf(a, b), "v", "g", "a", "b").get
        .collect().head
      assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
      assert(math.abs(r.getAs[Double]("mean_a") - m(a)) < 1e-12)
      assert(math.abs(r.getAs[Double]("var_b") - va(b)) < 1e-9, s"a=$a b=$b")
      val se2 = va(a) / a.size + va(b) / b.size
      if (se2 > 0) {
        assert(math.abs(r.getAs[Double]("t") - (m(a) - m(b)) / math.sqrt(se2)) < 1e-9)
        val df0 = se2 * se2 / (math.pow(va(a) / a.size, 2) / (a.size - 1) +
          math.pow(va(b) / b.size, 2) / (b.size - 1))
        assert(math.abs(r.getAs[Double]("df") - df0) < 1e-6, s"a=$a b=$b")
      } else assert(r.isNullAt(r.fieldIndex("t")))
    }
  }

  test("mannWhitneyU matches reference midranks; U partition always holds") {
    (0 until 15).foreach { _ =>
      val (a, b) = sample()
      val all = (a.map((_, "a")) ++ b.map((_, "b"))).sortBy(_._1)
      val mids = all.map(_._1).zipWithIndex.map { case (v, i) =>
        val first = all.indexWhere(_._1 == v)
        val cnt = all.count(_._1 == v)
        (v, first + 1 + (cnt - 1) / 2.0)
      }.toMap
      val ra = a.map(mids).sum
      val r = Stats.mannWhitneyU(toDf(a, b), "v", "g", "a", "b").get
        .collect().head
      assert(r.getAs[Double]("r_a") == ra, s"a=$a b=$b")
      assert(r.getAs[Double]("u_a") + r.getAs[Double]("u_b") ==
        (a.size.toLong * b.size).toDouble)
    }
  }

  test("ksTest matches the reference CDF max gap exactly") {
    (0 until 15).foreach { _ =>
      val (a, b) = sample()
      val values = (a ++ b).distinct.sorted
      val expect = values.map { v =>
        math.abs(a.count(_ <= v).toDouble / a.size -
          b.count(_ <= v).toDouble / b.size)
      }.max
      val d = Stats.ksTest(toDf(a, b), "v", "g", "a", "b").get
        .collect().head.getAs[Double]("d")
      assert(d == expect, s"a=$a b=$b got=$d expect=$expect")
    }
  }

  test("chiSquareIndependence matches the reference grid on random tables") {
    (0 until 10).foreach { _ =>
      val rows = Seq.fill(30 + rnd.nextInt(40))(
        (s"r${rnd.nextInt(3)}", s"c${rnd.nextInt(3)}"))
      val cats = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val rKeys = rows.map(_._1).distinct
      val cKeys = rows.map(_._2).distinct
      val n = rows.size.toDouble
      val expect = (for { r <- rKeys; c <- cKeys } yield {
        val o = cats.getOrElse((r, c), 0L).toDouble
        val e = rows.count(_._1 == r) * rows.count(_._2 == c) / n
        (o - e) * (o - e) / e
      }).sum
      val got = Stats.chiSquareIndependence(rows.toDF("r", "c"), "r", "c").get
        .collect().head
      assert(got.getAs[Long]("n") == rows.size)
      assert(got.getAs[Long]("dof") ==
        (rKeys.size - 1).toLong * (cKeys.size - 1))
      assert(math.abs(got.getAs[Double]("chi2") - expect) < 1e-9, s"rows=$rows")
    }
  }

  test("correlationMatrix matches the direct product-moment formula") {
    (0 until 10).foreach { _ =>
      val n = 5 + rnd.nextInt(20)
      val x = Seq.fill(n)(rnd.nextInt(10).toDouble)
      val y = Seq.fill(n)(rnd.nextInt(10).toDouble)
      val df0 = x.zip(y).toDF("x", "y")
      val got = Stats.correlationMatrix(df0, Seq("x", "y")).get
        .collect().head
      val sx = x.sum; val sy = y.sum
      val num = n * x.zip(y).map { case (a, b) => a * b }.sum - sx * sy
      val vx = n * x.map(v => v * v).sum - sx * sx
      val vy = n * y.map(v => v * v).sum - sy * sy
      if (vx > 0 && vy > 0)
        assert(math.abs(got.getAs[Double]("r") - num / math.sqrt(vx * vy)) < 1e-9)
      else assert(got.isNullAt(got.fieldIndex("r")))
    }
  }

  test("srmFromCounts is invariant under random split-and-union of the " +
      "count rows (r12 verdict ask #6: the duplicate-row re-aggregation " +
      "law behind q393/q395)") {
    // a union of drained snapshots carries the SAME (keys, arm) cell as
    // multiple partial rows; srmFromCounts must see only their sum
    (0 until 12).foreach { round =>
      val keys = Seq("w1", "w2").take(1 + rnd.nextInt(2))
      val arms = Seq("control", "treat", "rogue").take(2 + rnd.nextInt(2))
      val cells = for (k <- keys; a <- arms if rnd.nextInt(4) > 0)
        yield (k, a, (1 + rnd.nextInt(400)).toLong)
      if (cells.nonEmpty) {
        val whole = cells.toDF("win", "arm", "n_obs")
        // split every cell's count into 1..4 random positive shards and
        // union them in shuffled order — the drained-snapshot shape
        val shards = rnd.shuffle(cells.flatMap { case (k, a, n) =>
          val cuts = (Seq(0L, n) ++
            Seq.fill(rnd.nextInt(3))(1L + rnd.nextLong(n))).distinct.sorted
          cuts.zip(cuts.tail).map { case (lo, hi) => (k, a, hi - lo) }
        })
        val split = shards.toDF("win", "arm", "n_obs")
        val design = Map("control" -> 1.0, "treat" -> 1.0)
        def run(df0: org.apache.spark.sql.DataFrame) =
          Stats.srmFromCounts(df0, design, keys = Seq("win")).get
            .collect().map(r => (r.getAs[String]("win"),
              r.getAs[String]("arm"), r.getAs[Long]("n_obs"),
              r.getAs[Double]("n_expected"), r.getAs[Double]("chi2_term"),
              r.getAs[Double]("chi2_total"))).toSet
        assert(run(split) == run(whole),
          s"round $round: split-and-union diverged — cells=$cells " +
            s"shards=$shards")
      }
    }
  }
}
