package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // key "a": events in buckets 0, 30, 40 (bucketSec 10) — buckets 10 and
  // 20 are gaps; key "b": a single bucket (no grid beyond itself)
  private lazy val ev = Seq(
    ("a", 1L, 5.0), ("a", 7L, 2.0), ("a", 32L, 4.0), ("a", 45L, 1.0),
    ("b", 100L, 9.0)
  ).toDF("k", "epoch", "v").withColumn("ts", timestamp_seconds(col("epoch")))

  private def cells(fill: String) =
    TimeSeries.gapFill(ev, "ts", Seq("k"), bucketSec = 10L, valueCol = "v",
        how = "sum", fill = fill).get
      .select(col("k"), col("bucket_ts").cast("long").as("b"), col("n"), col("value"))
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("crossCorrelation: shifted-copy peak at the true lag") {
    // B is A delayed by exactly 1 bucket: r = 1.0 at lag +1 (A at t
    // aligns with B at t+1), degenerate or weaker elsewhere
    val a = Seq(10.0, 50.0, 20.0, 80.0, 30.0)
    val rows =
      a.zipWithIndex.map { case (v, i) => ("A", i.toLong * 10, v) } ++
      a.zipWithIndex.map { case (v, i) => ("B", (i + 1).toLong * 10, v) }
    val data = rows.toDF("k", "epoch", "v")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = TimeSeries.crossCorrelation(data, "ts", "k", "v",
        keyA = "A", keyB = "B", bucketSec = 10L, maxLag = 2).get
      .as[(Int, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1) == ((5L, Some(1.0))))
    assert(got(0)._1 == 4L)                    // 4 co-observed buckets
    assert(got(1)._2.get > got(0)._2.getOrElse(-2.0))
    assert(got(-2)._1 == 2L)
    // keyA == keyB is the ACF: lag 0 reads exactly 1.0
    val acf = TimeSeries.crossCorrelation(data, "ts", "k", "v",
        keyA = "A", keyB = "A", bucketSec = 10L, maxLag = 1).get
      .as[(Int, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(acf(0).contains(1.0))
  }

  test("trend: exact slope/intercept, origin shift, degenerate NULLs") {
    // key a: v = 10 + 2t at t = 100, 101, 102 (origin shifts to 0) ->
    // slope 2, intercept 10; key b: single point -> NULL fit
    val data = Seq(
      ("a", 100L, 10.0), ("a", 101L, 12.0), ("a", 102L, 14.0),
      ("b", 5L, 9.0),
      ("c", 7L, 1.0), ("c", 7L, 3.0)      // zero time variance -> NULL
    ).toDF("k", "t", "v").withColumn("ts", timestamp_seconds(col("t")))
    val got = TimeSeries.trend(data, "ts", Seq("k"), "v").get
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((3L, Some(2.0), Some(10.0))))
    assert(got("b") == ((1L, None, None)))
    assert(got("c") == ((2L, None, None)))
  }

  test("cusum: two-sided recursion, slack band, NULL hold, key reset") {
    val data = Seq(
      ("a", 1L, Some(5.0)), ("a", 2L, Some(-20.0)), ("a", 3L, Some(30.0)),
      ("a", 4L, None),
      ("b", 1L, Some(100.0))
    ).toDF("k", "t", "v")
    val got = TimeSeries.cusum(data, "t", Seq("k"), "v",
        target = 3.0, slack = 0.0).get
      .select("k", "t", "cusum_hi", "cusum_lo")
      .as[(String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // hi: max(0,5-3)=2 -> max(0,2-23)=0 -> max(0,27)=27; NULL holds 27
    // lo: 0 -> -23 -> min(0,-23+27)=0
    assert(got(("a", 1L)) == ((2.0, 0.0)))
    assert(got(("a", 2L)) == ((0.0, -23.0)))
    assert(got(("a", 3L)) == ((27.0, 0.0)))
    assert(got(("a", 4L)) == ((27.0, 0.0)))
    // key reset: b starts from 0, not from a's state
    assert(got(("b", 1L)) == ((97.0, 0.0)))
    // slack widens the dead band on both sides
    val slacked = TimeSeries.cusum(data.filter(col("k") === "a"), "t",
        Seq("k"), "v", target = 3.0, slack = 1.0).get
      .select("t", "cusum_hi", "cusum_lo")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(slacked(1L) == ((1.0, 0.0)))
    assert(slacked(2L) == ((0.0, -22.0)))
    assert(slacked(3L) == ((26.0, 0.0)))
  }

  test("gaps materialize with n=0; zero fill writes 0.0") {
    val got = cells("zero")
    assert(got.size == 5 + 1, s"a spans 5 buckets + b 1: ${got.keys}")
    assert(got(("a", 0L)) == ((2L, Some(7.0))))
    assert(got(("a", 10L)) == ((0L, Some(0.0))))
    assert(got(("a", 20L)) == ((0L, Some(0.0))))
    assert(got(("a", 30L)) == ((1L, Some(4.0))))
    assert(got(("a", 40L)) == ((1L, Some(1.0))))
    assert(got(("b", 100L)) == ((1L, Some(9.0))))
  }

  test("null fill leaves gap values NULL; ffill carries the last sum forward") {
    val nulls = cells("null")
    assert(nulls(("a", 10L)) == ((0L, None)))
    val ff = cells("ffill")
    assert(ff(("a", 10L)) == ((0L, Some(7.0))))
    assert(ff(("a", 20L)) == ((0L, Some(7.0))))
    assert(ff(("a", 30L)) == ((1L, Some(4.0))))
  }

  test("linear fill interpolates gaps between the surrounding cells") {
    // a: cells at buckets 0 (sum 7), 30 (4), 40 (1) — buckets 10/20 sit
    // 1/3 and 2/3 of the way from 7.0 to 4.0
    val got = cells("linear")
    assert(got(("a", 0L)) == ((2L, Some(7.0))))
    assert(got(("a", 10L))._2.get === 7.0 + (4.0 - 7.0) / 3.0)
    assert(got(("a", 20L))._2.get === 7.0 + (4.0 - 7.0) * 2.0 / 3.0)
    assert(got(("a", 30L)) == ((1L, Some(4.0))))
    assert(got(("b", 100L)) == ((1L, Some(9.0))))
  }

  test("rollingStats: leak-free trailing mean/std and z; NULL until 2 obs") {
    val base = Seq(
      ("a", 1L, 10.0), ("a", 2L, 12.0), ("a", 3L, 11.0), ("a", 4L, 50.0),
      ("b", 1L, 5.0)
    ).toDF("k", "t", "v")
    val got = TimeSeries.rollingStats(base, "t", Seq("k"), "v", window = 3).get
      .select(col("k"), col("t"), col("roll_n"), col("roll_mean"), col("z"))
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", 1L)) == ((0L, None, None)))
    assert(got(("a", 2L))._1 == 1L)
    assert(got(("a", 2L))._3.isEmpty, "one trailing obs -> no z")
    assert(got(("a", 3L))._2.get === 11.0) // mean of 10, 12
    val (n4, m4, z4) = got(("a", 4L))
    assert(n4 == 3L && m4.get === 11.0)
    assert(z4.get === (50.0 - 11.0) / 1.0) // std of 10,12,11 = 1.0
    assert(got(("b", 1L)) == ((0L, None, None)))
    // zero-variance trailing window -> NULL z
    val flat = Seq(("a", 1L, 3.0), ("a", 2L, 3.0), ("a", 3L, 9.0))
      .toDF("k", "t", "v")
    val fz = TimeSeries.rollingStats(flat, "t", Seq("k"), "v", 3).get
      .filter(col("t") === 3).select("z").as[Option[Double]].head()
    assert(fz.isEmpty)
    assert(TimeSeries.rollingStats(flat, "t", Seq("k"), "v", 1).isFailing)
  }

  test("ewma replays the recursion per key; NULLs carry state") {
    val base = Seq(
      ("a", 1L, Some(4.0)), ("a", 2L, Some(8.0)), ("a", 3L, None),
      ("a", 4L, Some(2.0)), ("b", 1L, None), ("b", 2L, Some(6.0))
    ).toDF("k", "t", "v")
    val got = TimeSeries.ewma(base, "t", Seq("k"), "v", alpha = 0.25).get
      .select(col("k"), col("t"), col("ewma"))
      .as[(String, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val s2 = 0.25 * 8.0 + 0.75 * 4.0 // 5.0
    assert(got(("a", 1L)).get === 4.0)
    assert(got(("a", 2L)).get === s2)
    assert(got(("a", 3L)).get === s2, "NULL value emits carried state")
    assert(got(("a", 4L)).get === 0.25 * 2.0 + 0.75 * s2)
    assert(got(("b", 1L)).isEmpty, "NULL before first obs -> NULL")
    assert(got(("b", 2L)).get === 6.0)
    assert(TimeSeries.ewma(base, "t", Seq("k"), "v", 0.0).isFailing)
    assert(TimeSeries.ewma(base, "t", Seq(), "v", 0.5).isFailing)
  }

  test("seasonalDecompose: pure square wave — flat trend, exact seasonal") {
    // v alternates 10/20 with period 2 → interior trend = 15 exactly,
    // seasonal = ∓5 (re-centered), residual = 0; the last row's window
    // is incomplete → NULL trend/residual
    val rows = (0L until 8L).map(i => ("k", i, if (i % 2 == 0) 10.0 else 20.0))
    val df0 = rows.toDF("key", "t", "v")
    val got = TimeSeries.seasonalDecompose(df0, "t", Seq("key"), "v", 2).get
      .select("t", "phase", "trend", "seasonal", "residual")
      .as[(Long, Int, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    got.foreach { case (t, phase, trend, seasonal, residual) =>
      assert(phase == (t % 2).toInt)
      if (t == 7) { // incomplete trailing window (period 2: 0 before, 1 after)
        assert(trend.isEmpty && residual.isEmpty)
      } else {
        assert(trend.contains(15.0), s"t=$t: $trend")
        assert(residual.contains(0.0), s"t=$t: $residual")
      }
      assert(seasonal.contains(if (t % 2 == 0) -5.0 else 5.0))
    }
  }

  test("seasonalDecompose: linear trend passes through; keys independent") {
    // v = 10·t (no seasonality): detrended values are identical for
    // every phase, so re-centered seasonal is exactly 0 and trend
    // recovers the line on interior rows. Period 3 (odd → symmetric).
    val rows = (0L until 9L).map(i => ("k", i, 10.0 * i)) ++
      Seq(("other", 0L, 1.0), ("other", 1L, 2.0), ("other", 2L, 3.0))
    val got = TimeSeries.seasonalDecompose(
        rows.toDF("key", "t", "v"), "t", Seq("key"), "v", 3).get
      .filter(col("key") === "k")
      .select("t", "trend", "seasonal", "residual")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    got.foreach { case (t, trend, seasonal, residual) =>
      if (t >= 1 && t <= 7) {
        assert(trend.contains(10.0 * t), s"t=$t: $trend")
        assert(residual.exists(r => math.abs(r) < 1e-12), s"t=$t: $residual")
      } else assert(trend.isEmpty)
      assert(seasonal.exists(s => math.abs(s) < 1e-12), s"t=$t: $seasonal")
    }
    // knob validation
    assert(TimeSeries.seasonalDecompose(
      rows.toDF("key", "t", "v"), "t", Seq("key"), "v", 1).isFailing)
    assert(TimeSeries.seasonalDecompose(
      rows.toDF("key", "t", "v"), "t", Seq.empty, "v", 2).isFailing)
  }

  test("holt: Brown cascade hand golden, NULL holds state, key reset") {
    // v = [4, 8, 12] at α = 0.5: s1 = [4, 6, 9], s2 = [4, 5, 7] →
    // level = [4, 7, 11], trend = [0, 1, 2], forecast = [4, 8, 13]
    val data = Seq(("k", 1L, Some(4.0)), ("k", 2L, Some(8.0)),
      ("k", 3L, Some(12.0)), ("k", 4L, None),
      ("z", 1L, Some(10.0))).toDF("key", "t", "v")
    val r = TimeSeries.holt(data, "t", Seq("key"), "v", alpha = 0.5).get
      .select("key", "t", "holt_level", "holt_trend", "holt_forecast")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(x => (x._1, x._2) -> ((x._3, x._4, x._5))).toMap
    assert(r(("k", 1L)) == ((Some(4.0), Some(0.0), Some(4.0))))
    assert(r(("k", 2L)) == ((Some(7.0), Some(1.0), Some(8.0))))
    assert(r(("k", 3L)) == ((Some(11.0), Some(2.0), Some(13.0))))
    // NULL holds state and emits the current outputs
    assert(r(("k", 4L)) == ((Some(11.0), Some(2.0), Some(13.0))))
    // a fresh key reseeds
    assert(r(("z", 1L)) == ((Some(10.0), Some(0.0), Some(10.0))))
    // alpha bounds
    assert(TimeSeries.holt(data, "t", Seq("key"), "v", alpha = 1.0).isFailing)
  }

  test("count aggregation and knob validation") {
    val got = TimeSeries.gapFill(ev, "ts", Seq("k"), 10L, "v", how = "count").get
      .filter(col("k") === "a").orderBy("bucket_ts")
      .select("value").as[Double].collect().toSeq
    assert(got == Seq(2.0, 0.0, 0.0, 1.0, 1.0))
    assert(TimeSeries.gapFill(ev, "ts", Seq("k"), 0L, "v").isFailing)
    assert(TimeSeries.gapFill(ev, "ts", Seq(), 10L, "v").isFailing)
    assert(TimeSeries.gapFill(ev, "ts", Seq("k"), 10L, "v", how = "median").isFailing)
    assert(TimeSeries.gapFill(ev, "ts", Seq("k"), 10L, "v", fill = "interp").isFailing)
  }

  private def tsOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("changepoint finds the planted mean shift with exact gain") {
    val rows = Seq(0.0, 0.0, 0.0, 10.0, 10.0, 10.0).zipWithIndex
      .map { case (v, i) => ("a", tsOf(i + 1), v) }
    val df = rows.toDF("k", "ts", "v")
    val r = TimeSeries.changepoint(df, Seq("k"), "ts", "v",
        minSegment = 1).get
      .select("k", "n", "t_index", "mean_left", "mean_right", "gain")
      .as[(String, Long, Long, Double, Double, Double)].head()
    // split after point 3; total SSE around mean 5 is 6*25 = 150,
    // segment SSEs are 0 -> gain exactly 150
    assert(r == (("a", 6L, 3L, 0.0, 10.0, 150.0)))
  }

  test("changepoint: minSegment bounds, short keys absent, tie -> earliest t") {
    val short = Seq(("s", tsOf(1), 1.0), ("s", tsOf(2), 2.0),
      ("s", tsOf(3), 3.0)).toDF("k", "ts", "v")
    assert(TimeSeries.changepoint(short, Seq("k"), "ts", "v",
      minSegment = 2).get.count() == 0)
    // constant series: every split gains exactly 0 -> earliest valid t
    val const = (1 to 6).map(i => ("c", tsOf(i.toLong), 5.0))
      .toDF("k", "ts", "v")
    val r = TimeSeries.changepoint(const, Seq("k"), "ts", "v",
        minSegment = 2).get
      .select("t_index", "gain").as[(Long, Double)].head()
    assert(r == ((2L, 0.0)))
  }

  test("forecastBacktest: hand-computed sMAPE/MASE for both baselines") {
    val vals = Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0, 10.0, 21.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("k", "t", "v")
    val r = TimeSeries.forecastBacktest(df, Seq("k"), "t", "v",
        period = 2, horizon = 2).get
      .select("n_train", "horizon", "smape_naive", "mase_naive",
        "smape_snaive", "mase_snaive")
      .as[(Long, Long, Double, Double, Double, Option[Double])].head()
    assert(r._1 == 6L && r._2 == 2L)
    // naive fc = 20 for both tests (y = 10, 21):
    val smapeN = (2.0 * 1000 / 3000 + 2.0 * 100 / 4100) / 2
    assert(math.abs(r._3 - smapeN) < 1e-12)
    assert(math.abs(r._4 - 550.0 / 1000.0) < 1e-12) // train |Δ1| mean 1000
    // seasonal fc = 10, 20 -> errors 0, 100
    val smapeS = (0.0 + 2.0 * 100 / 4100) / 2
    assert(math.abs(r._5 - smapeS) < 1e-12)
    // constant same-phase train differences -> zero scale -> NULL MASE
    assert(r._6.isEmpty)
    // too-short keys emit nothing (need horizon + period + 1 points)
    val short = vals.take(4).zipWithIndex
      .map { case (v, i) => ("s", i.toLong, v) }.toDF("k", "t", "v")
    assert(TimeSeries.forecastBacktest(short, Seq("k"), "t", "v",
      period = 2, horizon = 2).get.count() == 0)
  }

  test("holtWinters: perfectly periodic series is fitted exactly") {
    // alternating 10/20 with period 2: seasonal = ∓5, deseasonalized
    // series is the constant 15, Brown smoothing of a constant is that
    // constant with zero trend -> hw_fitted reproduces every value
    val rows = (1 to 8).map(i =>
      ("a", i.toLong, if (i % 2 == 1) 10.0 else 20.0))
    val df = rows.toDF("k", "t", "v")
    val got = TimeSeries.holtWinters(df, "t", Seq("k"), "v", period = 2).get
      .select("t", "v", "seasonal", "hw_level", "hw_trend", "hw_fitted")
      .as[(Long, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(got.length == 8)
    got.foreach { case (t, v, seas, lvl, tr, fit) =>
      assert(seas == (if (t % 2 == 1) -5.0 else 5.0))
      assert(lvl == 15.0 && tr == 0.0 && fit == v)
    }
  }

  test("theilSen: median pairwise slope, maxPoints window, equal ts excluded") {
    val df = Seq(("a", tsOf(0), 0.0), ("a", tsOf(1), 1.0),
      ("a", tsOf(2), 2.0), ("a", tsOf(3), 103.0)).toDF("k", "ts", "v")
    val r = TimeSeries.theilSen(df, Seq("k"), "ts", "v").get
      .select("n_points", "n_pairs", "slope")
      .as[(Long, Long, Double)].head()
    assert(r._1 == 4L && r._2 == 6L)
    // sorted slopes [1,1,1,103/3,51,101] -> median avg(1, 103/3)
    assert(math.abs(r._3 - (1.0 + 103.0 / 3.0) / 2.0) < 1e-12)
    // latest-3 window: slopes [1, 51, 101] -> median 51
    val capped = TimeSeries.theilSen(df, Seq("k"), "ts", "v",
        maxPoints = 3).get.select("slope").as[Double].head()
    assert(capped == 51.0)
    // duplicate-ts pair contributes no slope
    val dup = Seq(("d", tsOf(1), 1.0), ("d", tsOf(1), 5.0),
      ("d", tsOf(2), 3.0)).toDF("k", "ts", "v")
    val rd = TimeSeries.theilSen(dup, Seq("k"), "ts", "v").get
      .select("n_pairs").as[Long].head()
    assert(rd == 2L)
    // scale must divide 1e6
    assert(TimeSeries.theilSen(df, Seq("k"), "ts", "v", scale = 3L).isFailing)
  }

  test("mannKendall: hand-computed S, tie-corrected variance, z") {
    // strictly increasing [1,2,3,4]: S = 6, no ties →
    // var = 4·3·13/18 = 26/3, z = (6−1)/sqrt(26/3)
    val inc = Seq(("a", tsOf(0), 1.0), ("a", tsOf(1), 2.0),
      ("a", tsOf(2), 3.0), ("a", tsOf(3), 4.0)).toDF("k", "ts", "v")
    val r = TimeSeries.mannKendall(inc, Seq("k"), "ts", "v").get
      .select("n_points", "s", "var_s", "z")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == 4L && r._2 == 6L)
    assert(math.abs(r._3 - 26.0 / 3.0) < 1e-12)
    assert(math.abs(r._4 - 5.0 / math.sqrt(26.0 / 3.0)) < 1e-12)
    // value ties correct the variance: [1,1,2] → S = 2,
    // var = (3·2·11 − 2·1·9)/18 = 48/18
    val tied = Seq(("t", tsOf(0), 1.0), ("t", tsOf(1), 1.0),
      ("t", tsOf(2), 2.0)).toDF("k", "ts", "v")
    val rt = TimeSeries.mannKendall(tied, Seq("k"), "ts", "v").get
      .select("s", "var_s").as[(Long, Double)].head()
    assert(rt._1 == 2L && math.abs(rt._2 - 48.0 / 18.0) < 1e-12)
    // equal-timestamp pairs are excluded; decreasing gives negative S
    // with the +1 continuity shift
    val mix = Seq(("d", tsOf(1), 5.0), ("d", tsOf(1), 1.0),
      ("d", tsOf(2), 3.0), ("d", tsOf(3), 2.0)).toDF("k", "ts", "v")
    val rd = TimeSeries.mannKendall(mix, Seq("k"), "ts", "v").get
      .select("s").as[Long].head()
    // pairs (5,3)(5,2)(1,3)(1,2)(3,2): −1 −1 +1 +1 −1 = −1
    assert(rd == -1L)
    // single-point key still emits a row with NULL z
    val one = Seq(("o", tsOf(0), 1.0)).toDF("k", "ts", "v")
    val ro = TimeSeries.mannKendall(one, Seq("k"), "ts", "v").get
      .select("n_points", "z").collect().head
    assert(ro.getLong(0) == 1L && ro.isNullAt(1))
  }

  // reference full DP for the DTW kernel
  private def dtwRef(a: Array[Double], b: Array[Double]): Double = {
    val dp = Array.fill(a.length + 1, b.length + 1)(Double.MaxValue)
    dp(0)(0) = 0.0
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
    dp(a.length)(b.length)
  }

  test("dtwPairs: matches the full-DP reference; shift costs less than L2") {
    val s1 = Array(0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0, 0.0)
    val s2 = Array(0.0, 0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0) // s1 shifted 1
    val s3 = Array(5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0)
    val df = Seq(("a", s1.toSeq), ("b", s2.toSeq), ("c", s3.toSeq))
      .toDF("k", "series")
    val got = TimeSeries.dtwPairs(df, "k", "series").get
      .orderBy("key_a", "key_b")
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got(0)._5 == dtwRef(s1, s2))
    assert(got(1)._5 == dtwRef(s1, s3))
    assert(got(2)._5 == dtwRef(s2, s3))
    // the phase shift aligns away: DTW(a,b) = 0 < Manhattan distance
    assert(got(0)._5 == 0.0)
    // maxKeys guard
    assert(TimeSeries.dtwPairs(df, "k", "series", maxKeys = 2).isFailing)
  }

  test("dtw band: band 0 forces the diagonal; unequal lengths widen it") {
    val df = Seq(("a", Seq(0.0, 1.0, 2.0, 3.0)), ("b", Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("k", "series")
    val diag = TimeSeries.dtwPairs(df, "k", "series", band = 0).get
      .select("dtw").as[Double].head()
    // band 0 = pure pointwise path: |0-1|+|1-1|+|2-1|+|3-1| = 4
    assert(diag == 4.0)
    val full = TimeSeries.dtwPairs(df, "k", "series").get
      .select("dtw").as[Double].head()
    assert(full <= diag)
    // length mismatch still feasible at band 0 (window >= |n-m|)
    val uneq = Seq(("a", Seq(1.0, 2.0)), ("b", Seq(1.0, 2.0, 2.0)))
      .toDF("k", "series")
    val d = TimeSeries.dtwPairs(uneq, "k", "series", band = 0).get
      .select("dtw").as[Double].head()
    assert(d == 0.0)
  }

  test("seasonalStrength: pure cycle reads 1.0; pure trend reads ~0 seasonal") {
    // period-2 alternating series: all variation is seasonal
    val cyc = (0 until 12).map(i => ("c", tsOf(i), if (i % 2 == 0) 10.0 else 20.0))
      .toDF("k", "ts", "v")
    val rc = TimeSeries.seasonalStrength(cyc, "ts", Seq("k"), "v",
        period = 2).get
      .select("seasonal_strength", "trend_strength")
      .as[(Option[Double], Option[Double])].head()
    assert(rc._1.exists(s => math.abs(s - 1.0) < 1e-9))
    // pure linear ramp: seasonal component ~0, trend strength 1
    val ramp = (0 until 12).map(i => ("r", tsOf(i), i.toDouble))
      .toDF("k", "ts", "v")
    val rr = TimeSeries.seasonalStrength(ramp, "ts", Seq("k"), "v",
        period = 2).get
      .select("seasonal_strength", "trend_strength")
      .as[(Option[Double], Option[Double])].head()
    assert(rr._2.exists(t => math.abs(t - 1.0) < 1e-9))
    // a constant series has zero variance everywhere -> NULL strengths
    val const = (0 until 8).map(i => ("x", tsOf(i), 5.0)).toDF("k", "ts", "v")
    val rx = TimeSeries.seasonalStrength(const, "ts", Seq("k"), "v",
        period = 2).get.select("seasonal_strength").collect().head
    assert(rx.isNullAt(0))
  }

  test("stlAnomaly: flags only the spike on a seasonal series") {
    // period-4 cycle with mild deterministic jitter (a perfect cycle
    // has all-zero residuals → MAD 0 → NULL z everywhere) and ONE
    // spiked point in the middle; period 4 keeps the trend window
    // from absorbing the spike (period 2's two-row trend splits it)
    val vals = (0 until 24).map(i =>
      if (i == 13) 500.0
      else Seq(10.0, 20.0, 15.0, 25.0)(i % 4) + (i % 3) * 0.5)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", tsOf(i), v) }
      .toDF("k", "ts", "v")
    val got = TimeSeries.stlAnomaly(df, "ts", Seq("k"), "v", period = 4)
      .get.orderBy("ts")
      .select("anomaly").as[Boolean].collect()
    // the MAD flag must fire AT the spike
    assert(got(13))
    // far-from-spike rows stay quiet
    assert(!got(2) && !got(3) && !got(20))
    // edge rows (incomplete trend window) are never anomalies
    assert(!got(0) && !got(23))
  }

  test("pageHinkley: flat series never alarms; a level shift does") {
    // flat [10,10,10]: every term = 0 → m = 0, ph = 0
    val flat = (0 to 2).map(i => ("f", tsOf(i), 10.0)).toDF("k", "ts", "v")
    val rf = TimeSeries.pageHinkley(flat, Seq("k"), "ts", "v",
        delta = 0.0, lambda = 1.0).get
      .select("ph_m", "ph", "alarm").as[(Double, Double, Boolean)].collect()
    assert(rf.forall(r => r._1 == 0.0 && r._2 == 0.0 && !r._3))
    // [0,0,0,0,100]: at the jump, mean_5 = 20 → term = 80, prior m
    // dipped to 0 → ph = 80 > λ = 50
    val shift = (0 to 3).map(i => ("s", tsOf(i), 0.0)) :+ (("s", tsOf(4), 100.0))
    val rs = TimeSeries.pageHinkley(shift.toDF("k", "ts", "v"), Seq("k"),
        "ts", "v", delta = 0.0, lambda = 50.0).get
      .orderBy("ts").select("ph", "alarm").as[(Double, Boolean)].collect()
    assert(rs.dropRight(1).forall(r => r._1 == 0.0 && !r._2))
    assert(rs.last._1 == 80.0 && rs.last._2)
    // delta drains slow drift: same jump with delta = 80 never alarms
    val rd = TimeSeries.pageHinkley(shift.toDF("k", "ts", "v"), Seq("k"),
        "ts", "v", delta = 80.0, lambda = 50.0).get
      .select("alarm").as[Boolean].collect()
    assert(rd.forall(!_))
  }

  test("toSeries: order-sorted arrays; duplicate order key raises") {
    val df = Seq(("a", 3, 30.0), ("a", 1, 10.0), ("a", 2, 20.0),
      ("b", 1, 5.0)).toDF("k", "o", "v")
    val r = TimeSeries.toSeries(df, Seq("k"), "o", "v").get
      .orderBy("k").as[(String, Long, Seq[Double])].collect()
    assert(r(0) == (("a", 3L, Seq(10.0, 20.0, 30.0))))
    assert(r(1) == (("b", 1L, Seq(5.0))))
    val dup = df.union(Seq(("a", 2, 99.0)).toDF("k", "o", "v"))
    val ex = intercept[Exception](
      TimeSeries.toSeries(dup, Seq("k"), "o", "v").get.collect())
    assert(ex.getMessage != null)
  }
}
