package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("event_id", "user_id", "epoch", "t")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")

  // u1 completes; u2's click lands outside the 100 s window; u3 has no
  // entry event; u4's same-second click is excluded by strict ordering
  // but a later one counts, purchase is out of window; u5 completes at
  // the window edge (inclusive)
  private lazy val funnelEv = ev(Seq(
    (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "purchase"),
    (4L, 2L, 10L, "view"), (5L, 2L, 150L, "click"), (6L, 2L, 12L, "purchase"),
    (7L, 3L, 5L, "click"),
    (8L, 4L, 10L, "view"), (9L, 4L, 10L, "click"), (10L, 4L, 11L, "click"),
    (11L, 4L, 200L, "purchase"),
    (12L, 5L, 50L, "view"), (13L, 5L, 60L, "click"), (14L, 5L, 150L, "purchase")
  ))

  test("funnelSteps: strict step order, conversion window from entry") {
    val per = Behavior.funnelSteps(funnelEv, "ts", "user_id", "t",
        Seq("view", "click", "purchase"), windowSec = 100L).get
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(per(1L) == ((Some(10000000L), Some(20000000L), Some(30000000L))))
    // click at 150 s > 10 s + 100 s window; the 12 s purchase precedes
    // any click so it can't satisfy step 3 either
    assert(per(2L) == ((Some(10000000L), None, None)))
    // no view: every later step stays NULL even though a click exists
    assert(per(3L) == ((None, None, None)))
    // click at the SAME second as the view is excluded (strictly-after),
    // the 11 s click counts; purchase at 200 s is out of window
    assert(per(4L) == ((Some(10000000L), Some(11000000L), None)))
    // purchase exactly at t1 + window is included (inclusive bound)
    assert(per(5L) == ((Some(50000000L), Some(60000000L), Some(150000000L))))
  }

  test("funnel summary: counts and both conversion rates") {
    val rows = Behavior.funnel(funnelEv, "ts", "user_id", "t",
        Seq("view", "click", "purchase"), windowSec = 100L).get
      .as[(Int, String, Long, Option[Double], Option[Double])].collect()
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, "view", 4L), (2, "click", 3L), (3, "purchase", 2L)))
    assert(rows(0)._4.contains(1.0) && rows(0)._5.isEmpty)
    assert(rows(1)._4.contains(0.75) && rows(1)._5.contains(0.75))
    assert(rows(2)._4.contains(0.5) && rows(2)._5.contains(0.6667))
  }

  test("funnelBySegment: per-segment counts and conversions, unsegmented dropped") {
    val segs = Seq((1L, "g1"), (2L, "g1"), (4L, "g2"), (5L, "g2"))
      .toDF("user_id", "seg") // u3 has no segment row
    val got = Behavior.funnelBySegment(funnelEv, "ts", "user_id", "t",
        segs, "seg", Seq("view", "click", "purchase"), windowSec = 100L).get
      .as[(String, Int, String, Long, Option[Double], Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
    // g1 = {u1 complete, u2 entry-only}; g2 = {u4 two steps, u5 complete}
    assert(got(("g1", 1)) == ((2L, Some(1.0), None)))
    assert(got(("g1", 2)) == ((1L, Some(0.5), Some(0.5))))
    assert(got(("g1", 3)) == ((1L, Some(0.5), Some(1.0))))
    assert(got(("g2", 2)) == ((2L, Some(1.0), Some(1.0))))
    assert(got(("g2", 3)) == ((1L, Some(0.5), Some(0.5))))
    assert(got.size == 6) // u3 contributes to no segment
  }

  test("funnelTiming: exact min/max/mean seconds from entry, NULL for step 1") {
    // step-2 reachers: u1 (10 s), u4 (1 s), u5 (10 s) → mean exactly 7;
    // step-3 reachers: u1 (20 s), u5 (100 s) → mean 60
    val got = Behavior.funnelTiming(funnelEv, "ts", "user_id", "t",
        Seq("view", "click", "purchase"), windowSec = 100L).get
      .as[(Int, String, Long, Option[Long], Option[Long], Option[Double])]
      .collect()
    assert(got(0) == ((1, "view", 4L, None, None, None)))
    assert(got(1) == ((2, "click", 3L, Some(1L), Some(10L), Some(7.0))))
    assert(got(2) == ((3, "purchase", 2L, Some(20L), Some(100L), Some(60.0))))
  }

  test("cohortRetention: first-bucket cohorts, per-bucket distinct activity") {
    val data = ev(Seq(
      (1L, 1L, 1L, "x"), (2L, 1L, 12L, "x"), (3L, 1L, 25L, "x"),
      (4L, 2L, 5L, "x"), (5L, 2L, 25L, "x"),
      (6L, 3L, 11L, "x"), (7L, 3L, 15L, "x")
    ))
    val got = Behavior.cohortRetention(data, "ts", "user_id", bucketSec = 10L).get
      .select(col("cohort_ts").cast("long"), col("offset"), col("active"),
        col("cohort_size"), col("retention"))
      .as[(Long, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((0L, 0)) == ((2L, 2L, 1.0)))   // u1, u2 start in bucket 0
    assert(got((0L, 1)) == ((1L, 2L, 0.5)))   // only u1 active in bucket 10
    assert(got((0L, 2)) == ((2L, 2L, 1.0)))   // both back in bucket 20
    assert(got((10L, 0)) == ((1L, 1L, 1.0)))  // u3's duplicate events dedupe
    assert(got.size == 4)
  }

  test("attribution: last touch within window, NULL beyond it or absent") {
    val data = ev(Seq(
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "purchase"),
      (4L, 1L, 300L, "purchase"),             // 280 s after the click: out of window
      (5L, 2L, 5L, "purchase"),               // no touches at all
      (6L, 4L, 10L, "view"), (7L, 4L, 20L, "purchase"),
      (8L, 4L, 30L, "purchase")               // both purchases hit the same view
    ))
    val got = Behavior.attribution(data, "ts", "event_id", "user_id", "t",
        "purchase", Seq("click", "view"), windowSec = 100L).get
      .select(col("event_id"), col("touch_type"),
        col("touch_ts").cast("long"), col("gap_sec"))
      .as[(Long, Option[String], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(3L) == ((Some("click"), Some(20L), Some(10L))))
    assert(got(4L) == ((None, None, None)))
    assert(got(5L) == ((None, None, None)))
    assert(got(7L) == ((Some("view"), Some(10L), Some(10L))))
    assert(got(8L) == ((Some("view"), Some(10L), Some(20L))))
    assert(got.size == 5)
  }

  test("rfm: recency vs corpus max day, 1 = best, id tiebreaks") {
    // u1: days 0..2, value 10+20+30; u2: day 2 only, value 100;
    // u3: day 0 only, value 1 → corpus max day 2
    val data = Seq(
      (1L, 1L, 10L, 10.0), (2L, 1L, 86400L + 1, 20.0),
      (3L, 1L, 2 * 86400L + 2, 30.0),
      (4L, 2L, 2 * 86400L + 5, 100.0),
      (5L, 3L, 7L, 1.0)
    ).toDF("event_id", "user_id", "epoch", "value")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = Behavior.rfm(data, "ts", "user_id", "value", nTiles = 3).get
      .as[(Long, Long, Long, Double, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // recency: u1 0, u2 0, u3 2; frequency: 3/1/1; monetary: 60/100/1
    assert(got(1L) == ((0L, 3L, 60.0, 1, 1, 2)))
    assert(got(2L) == ((0L, 1L, 100.0, 2, 2, 1)))
    assert(got(3L) == ((2L, 1L, 1.0, 3, 3, 3)))
  }

  test("kaplanMeier: textbook product-limit with censoring") {
    // durations: 1 event, 2 censored, 3 event, 4 event, 5 censored
    //  t=1: n=5, d=1 → S = 0.8
    //  t=2: n=4, c=1 → S unchanged
    //  t=3: n=3, d=1 → S = 0.8·(2/3)
    //  t=4: n=2, d=1 → S = 0.8·(2/3)·(1/2)
    //  t=5: n=1, c=1 → S unchanged
    val data = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 1), (5L, 0))
      .toDF("duration", "observed")
    val rows = Behavior.kaplanMeier(data, "duration", "observed").get
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 5L, 1L, 0L), (2L, 4L, 0L, 1L), (3L, 3L, 1L, 0L),
      (4L, 2L, 1L, 0L), (5L, 1L, 0L, 1L)))
    val s = rows.map(r => r._1 -> r._5).toMap
    assert(math.abs(s(1L) - 0.8) < 1e-12)
    assert(s(2L) == s(1L))
    assert(math.abs(s(3L) - 0.8 * 2 / 3) < 1e-12)
    assert(math.abs(s(4L) - 0.8 * 2 / 3 * 0.5) < 1e-12)
    assert(s(5L) == s(4L))
    // Greenwood: se(t=1) = 0.8·√(1/(5·4)); censor rows add no term;
    // CI clamps inside [0, 1]
    val se = rows.map(r => r._1 -> r._6).toMap
    assert(math.abs(se(1L) - 0.8 * math.sqrt(1.0 / 20.0)) < 1e-12)
    assert(se(2L) == se(1L))
    val g3 = 1.0 / 20.0 + 1.0 / (3.0 * 2.0)
    assert(math.abs(se(3L) - s(3L) * math.sqrt(g3)) < 1e-12)
    rows.foreach { r =>
      assert(r._7 >= 0.0 && r._8 <= 1.0 && r._7 <= r._5 && r._5 <= r._8)
    }
    // negative/null durations are dropped
    val dirty = Seq((Some(-1L), Some(1)), (None, Some(1)), (Some(2L), None),
      (Some(0L), Some(1))).toDF("duration", "observed")
    assert(Behavior.kaplanMeier(dirty, "duration", "observed").get.count() == 1)
  }

  test("nelsonAalen: running hazard and Poisson SE on the KM fixture") {
    val data = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 1), (5L, 0))
      .toDF("duration", "observed")
    val rows = Behavior.nelsonAalen(data, "duration", "observed").get
      .as[(Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 5L, 1L, 0L), (2L, 4L, 0L, 1L), (3L, 3L, 1L, 0L),
      (4L, 2L, 1L, 0L), (5L, 1L, 0L, 1L)))
    val h = rows.map(r => r._1 -> r._5).toMap
    assert(math.abs(h(1L) - 0.2) < 1e-12)
    assert(h(2L) == h(1L)) // censor-only row: hazard unchanged
    assert(math.abs(h(3L) - (0.2 + 1.0 / 3)) < 1e-12)
    assert(math.abs(h(4L) - (0.2 + 1.0 / 3 + 0.5)) < 1e-12)
    assert(h(5L) == h(4L))
    val se = rows.map(r => r._1 -> r._6).toMap
    assert(math.abs(se(3L) - math.sqrt(1.0 / 25 + 1.0 / 9)) < 1e-12)
  }

  test("logRank: textbook two-group hypergeometric moments") {
    // A: 1e, 3e, 5c; B: 2e, 4c, 6e →
    //  t=1: n=(3,3), d1=1 → e1=0.5,  v=0.25
    //  t=2: n=(2,3), d2=1 → e1=0.4,  v=0.24
    //  t=3: n=(2,2), d1=1 → e1=0.5,  v=0.25
    //  t=6: n=(0,1), d2=1 → e1=0,    v=0 (nt=1 guard)
    val data = Seq((1L, 1, "A"), (3L, 1, "A"), (5L, 0, "A"),
      (2L, 1, "B"), (4L, 0, "B"), (6L, 1, "B"))
      .toDF("duration", "observed", "grp")
    val r = Behavior.logRank(data, "duration", "observed", "grp").get
      .as[(String, String, Long, Long, Double, Double, Double, Option[Double])]
      .collect()
    assert(r.length == 1)
    val (ga, gb, o1, o2, e1, e2, v, chi2) = r.head
    assert(ga == "A" && gb == "B" && o1 == 2L && o2 == 2L)
    assert(math.abs(e1 - 1.4) < 1e-12)
    assert(math.abs(e2 - 2.6) < 1e-12)
    assert(math.abs(v - 0.74) < 1e-12)
    assert(math.abs(chi2.get - 0.36 / 0.74) < 1e-12)
    // symmetric: swapping labels swaps obs/exp, same chi2
    val sw = Behavior.logRank(
        data.withColumn("grp",
          when(col("grp") === "A", "Z").otherwise("Y")),
        "duration", "observed", "grp").get
      .as[(String, String, Long, Long, Double, Double, Double, Option[Double])]
      .collect().head
    assert(sw._1 == "Y" && sw._3 == 2L &&
      math.abs(sw._5 - 2.6) < 1e-12 &&
      math.abs(sw._8.get - chi2.get) < 1e-12)
    // not-exactly-two groups → Fail
    assert(Behavior.logRank(
      data.withColumn("grp", lit("one")),
      "duration", "observed", "grp").isFailing)
  }

  test("attributionCredits: position/linear/time-decay hand-computed") {
    // u1: v,c,s then purchase (k=3); u2: v→conv1, c→conv2 (k=1 each);
    // u3: touch with no conversion; u4: touch outside the window
    val data = ev(Seq(
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "signup"),
      (4L, 1L, 40L, "purchase"),
      (5L, 2L, 10L, "view"), (6L, 2L, 20L, "purchase"),
      (7L, 2L, 30L, "click"), (8L, 2L, 40L, "purchase"),
      (9L, 3L, 10L, "click"),
      (10L, 4L, 10L, "view"), (11L, 4L, 150L, "purchase")))
    def run(model: String, hl: Long = 86400L) =
      Behavior.attributionCredits(data, "ts", "event_id", "user_id", "t",
          "purchase", Seq("view", "click", "signup"), windowSec = 100L,
          model = model, halfLifeSec = hl).get
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val pos = run("position")
    assert(pos.keySet == Set("view", "click", "signup"))
    assert(pos("view")._1 == 2L && pos("view")._2 == 2L &&
      math.abs(pos("view")._3 - 1.4) < 1e-9)
    assert(pos("click")._1 == 2L && pos("click")._2 == 2L &&
      math.abs(pos("click")._3 - 1.2) < 1e-9)
    assert(pos("signup") == ((1L, 1L, 0.4)))
    val lin = run("linear")
    assert(math.abs(lin("view")._3 - (1.0 / 3 + 1)) < 1e-9)
    assert(math.abs(lin("signup")._3 - 1.0 / 3) < 1e-9)
    // half-life 10 s: u1 Δt = 30/20/10 → 1/7, 2/7, 4/7
    val td = run("time_decay", hl = 10L)
    assert(math.abs(td("view")._3 - (1.0 / 7 + 1)) < 1e-9)
    assert(math.abs(td("click")._3 - (2.0 / 7 + 1)) < 1e-9)
    assert(math.abs(td("signup")._3 - 4.0 / 7) < 1e-9)
    // Σ credit = attributed conversions (3) for every model
    for (m <- Seq(pos, lin, td))
      assert(math.abs(m.values.map(_._3).sum - 3.0) < 1e-9)
    assert(Behavior.attributionCredits(data, "ts", "event_id", "user_id",
      "t", "purchase", Seq("view"), 100L, model = "bogus").isFailing)
  }

  test("markovAttribution: hand-solved removal effects on a toy chain") {
    // u1: A→conv (+ a post-conversion B that must be ignored)
    // u2: A→B→conv;  u3: B (no conversion);  u4: direct conversion
    // Chain: start→{A:.5, B:.25, conv:.25}; A→{conv:.5, B:.5};
    // B→{conv:.5, null:.5} → base 0.75; remove A → 0.375 (effect .5);
    // remove B → 0.5 (effect 1/3); attribution .6/.4
    val data = ev(Seq(
      (1L, 1L, 10L, "A"), (2L, 1L, 20L, "conv"), (8L, 1L, 30L, "B"),
      (3L, 2L, 10L, "A"), (4L, 2L, 20L, "B"), (5L, 2L, 30L, "conv"),
      (6L, 3L, 10L, "B"),
      (7L, 4L, 10L, "conv")))
    val got = Behavior.markovAttribution(data, "ts", "event_id", "user_id",
        "t", "conv", iterations = 10).get
      .as[(String, Double, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("A", "B"))
    val a = got("A"); val b = got("B")
    assert(math.abs(a._2 - 0.75) < 1e-9 && math.abs(b._2 - 0.75) < 1e-9)
    assert(math.abs(a._3 - 0.375) < 1e-9)
    assert(math.abs(b._3 - 0.5) < 1e-9)
    assert(math.abs(a._4.get - 0.5) < 1e-9)
    assert(math.abs(b._4.get - 1.0 / 3) < 1e-9)
    assert(math.abs(a._5.get - 0.6) < 1e-9)
    assert(math.abs(b._5.get - 0.4) < 1e-9)
    // no conversions at all: base 0, effects NULL, no blowup
    val none = Behavior.markovAttribution(
        ev(Seq((1L, 1L, 10L, "A"), (2L, 2L, 10L, "B"))),
        "ts", "event_id", "user_id", "t", "conv", iterations = 3).get
      .as[(String, Double, Double, Option[Double], Option[Double])]
      .collect()
    assert(none.length == 2)
    assert(none.forall(r => r._2 == 0.0 && r._3 == 0.0 &&
      r._4.isEmpty && r._5.isEmpty))
  }

  test("rfm: ntile parity on uneven buckets, no single-partition sort") {
    // 7 users / 3 tiles → bucket sizes 3,2,2; heavy monetary ties so
    // id tiebreaks decide every boundary. Expect bit-parity with
    // ntile() over the same (metric, id) orders.
    val data = (1L to 7L).map { u =>
      (u, u, (u % 3) * 86400L + u, if (u <= 4) 50.0 else 10.0 * u)
    }.toDF("event_id", "user_id", "epoch", "value")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = Behavior.rfm(data, "ts", "user_id", "value", nTiles = 3).get
    val viaNtile = got
      .withColumn("r2", ntile(3).over(
        Window.orderBy(col("recency_days"), col("user_id"))))
      .withColumn("f2", ntile(3).over(
        Window.orderBy(col("frequency").desc, col("user_id"))))
      .withColumn("m2", ntile(3).over(
        Window.orderBy(col("monetary").desc, col("user_id"))))
      .filter(col("r_score") =!= col("r2") ||
        col("f_score") =!= col("f2") || col("m_score") =!= col("m2"))
    assert(viaNtile.count() == 0, "closed-form scores must equal ntile")
    // the operator's own plan must not contain an unpartitioned window
    // (its windows are partitioned by __pid / run over the tiny offset
    // frame only) — assert no ntile survives in the optimized plan
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"), "rfm must not plan an ntile window")
  }

  test("activityHistogram and newVsReturning: exact engagement splits") {
    // u1 active days 0,1,2; u2 days 0,2; u3 day 1 (two events dedupe)
    val data = ev(Seq(
      (1L, 1L, 10L, "x"), (2L, 1L, 86400L + 1, "x"), (3L, 1L, 2 * 86400L + 1, "x"),
      (4L, 2L, 20L, "x"), (5L, 2L, 2 * 86400L + 9, "x"),
      (6L, 3L, 86400L + 3, "x"), (7L, 3L, 86400L + 9, "x")
    ))
    val hist = Behavior.activityHistogram(data, "ts", "user_id").get
      .as[(Long, Long)].collect().toMap
    assert(hist == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val nvr = Behavior.newVsReturning(data, "ts", "user_id").get
      .select(col("day_ts").cast("long"), col("new_users"),
        col("returning_users"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 / 86400 -> ((r._2, r._3))).toMap
    assert(nvr == Map(0L -> ((2L, 0L)), 1L -> ((1L, 1L)), 2L -> ((0L, 2L))))
  }

  test("stickiness: trailing-window MAU membership, empty days, NULL on dead windows") {
    // u1 on days 0 and 2, u2 on day 1; 2-day window
    val data = ev(Seq(
      (1L, 1L, 10L, "x"), (2L, 1L, 2L * 86400 + 5L, "x"),
      (3L, 2L, 86400L + 7L, "x"),
      (4L, 3L, 4L * 86400 + 1L, "x")   // u3 far out: creates dead days
    ))
    val got = Behavior.stickiness(data, "ts", "user_id", windowDays = 2).get
      .select(col("day_ts").cast("long"), col("dau"), col("mau"),
        col("stickiness"))
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 / 86400 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((1L, 1L, Some(1.0))))
    assert(got(1L) == ((1L, 2L, Some(0.5))))   // u1 carries over, u2 active
    assert(got(2L) == ((1L, 2L, Some(0.5))))   // u1 active, u2 carries
    assert(got(3L) == ((0L, 1L, Some(0.0))))   // only u1's day-2 carry
    assert(got(4L) == ((1L, 1L, Some(1.0))))
    assert(got.size == 5)
  }

  test("sessionize + sessionStats: gap splits, 0-based index, exact durations") {
    val data = ev(Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 100L, "b"), (3L, 1L, 250L, "c"),
      (4L, 1L, 5000L, "d"),
      (5L, 2L, 7L, "x")
    ))
    val idx = Behavior.sessionize(data, "ts", "event_id", "user_id", gapSec = 200L)
      .get.select("event_id", "session_idx")
      .as[(Long, Long)].collect().toMap
    assert(idx == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
    val stats = Behavior.sessionStats(data, "ts", "event_id", "user_id",
        gapSec = 200L).get
      .select(col("user_id"), col("session_idx"),
        col("start_ts").cast("long"), col("end_ts").cast("long"),
        col("n_events"), col("duration_sec"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(stats((1L, 0L)) == ((0L, 250L, 3L, 250L)))
    assert(stats((1L, 1L)) == ((5000L, 5000L, 1L, 0L)))
    assert(stats((2L, 0L)) == ((7L, 7L, 1L, 0L)))
    assert(stats.size == 3)
  }

  test("topPaths: ordered prefixes, count-desc path-asc order, id tiebreak") {
    val data = ev(Seq(
      (1L, 1L, 1L, "a"), (2L, 1L, 2L, "b"), (3L, 1L, 3L, "c"),
      (4L, 2L, 1L, "a"), (5L, 2L, 5L, "b"),
      (6L, 3L, 1L, "b"), (7L, 3L, 2L, "a"),
      (8L, 4L, 1L, "a"),
      (9L, 5L, 7L, "y"), (10L, 5L, 7L, "x")   // same second: id orders y→x
    ))
    val got = Behavior.topPaths(data, "ts", "event_id", "user_id", "t",
        maxLen = 2, k = 3).get
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b", 2L), ("a", 1L), ("b>a", 1L)))
  }

  test("transitionMatrix: lag pairs, equal-ts id tiebreak, gap cap") {
    val data = ev(Seq(
      (1L, 1L, 1L, "a"), (2L, 1L, 2L, "b"), (3L, 1L, 3L, "a"),
      (4L, 2L, 1L, "a"), (5L, 2L, 2L, "a"),
      (6L, 3L, 5L, "x"), (7L, 3L, 5L, "y"),     // same second: id orders x→y
      (8L, 4L, 1L, "a"), (9L, 4L, 100L, "b")    // 99 s silence
    ))
    def matrix(gap: Option[Long]) =
      Behavior.transitionMatrix(data, "ts", "event_id", "user_id", "t", gap).get
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val capped = matrix(Some(10L))
    assert(capped == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "a") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0)), ("x", "y") -> ((1L, 1.0))))
    // uncapped links u4's pair too; prev=a row normalizes over 3
    val open = matrix(None)
    assert(open(("a", "b")) == ((2L, 0.6667)))
    assert(open(("a", "a")) == ((1L, 0.3333)))
  }

  test("conversionSeries: Wilson interval matches the closed form") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // bucket 0: users 1,2,3,4 view; 1,2 purchase -> 2/4
    // bucket 1: user 5 views only -> 0/1; user 6 purchases WITHOUT a
    // view -> not a base entity, excluded
    val ev = Seq(
      (1L, ts(10), "view"), (1L, ts(20), "purchase"),
      (2L, ts(30), "view"), (2L, ts(40), "purchase"),
      (3L, ts(50), "view"), (4L, ts(60), "view"),
      (5L, ts(3700), "view"), (6L, ts(3800), "purchase"))
      .toDF("uid", "ts", "et")
    val got = Behavior.conversionSeries(ev, "ts", "uid", "et",
        "view", "purchase", bucketSec = 3600L).get
      .orderBy("bucket_ts")
      .select("n", "k", "rate", "ci_low", "ci_high")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length == 2)
    assert(got(0)._1 == 4L && got(0)._2 == 2L && got(0)._3 == 0.5)
    assert(got(1) == ((1L, 0L, 0.0, got(1)._4, got(1)._5)))
    def wilson(k: Long, n: Long, z: Double = 1.96): (Double, Double) = {
      val p = k.toDouble / n; val z2 = z * z
      val denom = 1.0 + z2 / n
      val c = (p + z2 / (2.0 * n)) / denom
      val h = z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)) / denom
      (c - h, c + h)
    }
    val (lo0, hi0) = wilson(2, 4)
    assert(math.abs(got(0)._4 - lo0) < 1e-12 && math.abs(got(0)._5 - hi0) < 1e-12)
    // Wilson stays inside [0,1] even at rate 0 with n=1
    assert(got(1)._4 >= 0.0 && got(1)._5 < 1.0 && got(1)._5 > 0.0)
  }

  test("conversionLag: exact per-channel lag percentiles") {
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // user 1: click@0 → buy@10 (lag 10); user 2: click@0 → buy@30;
    // user 3: view@0 → buy@20; user 4: buy with no touch (excluded)
    val ev = Seq(
      (1L, 1L, "click", t(0)), (1L, 2L, "purchase", t(10)),
      (2L, 3L, "click", t(0)), (2L, 4L, "purchase", t(30)),
      (3L, 5L, "view", t(0)), (3L, 6L, "purchase", t(20)),
      (4L, 7L, "purchase", t(5))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.conversionLag(ev, "ts", "event_id", "user_id",
        "event_type", "purchase", Seq("click", "view"), windowSec = 3600L,
        ps = Seq(0.5, 1.0)).get
      .orderBy("touch_type", "p")
      .as[(String, Double, Long, Long)].collect()
    // click lags [10, 30]: p50 → ceil(0.5·2)=1st → 10; p100 → 30
    // view lags [20]: both percentiles → 20
    assert(got.toSeq == Seq(("click", 0.5, 2L, 10L), ("click", 1.0, 2L, 30L),
      ("view", 0.5, 1L, 20L), ("view", 1.0, 1L, 20L)))
  }

  test("cohortLtv: exact cumulative revenue per user by cohort age") {
    def ts(bucket: Int) = new java.sql.Timestamp(bucket * 100000L)
    // cohort 0: users 1, 2. age 0 revenue 10+20, age 2 revenue 30 (u1)
    // cohort 1 (bucket 1): user 3, age 0 revenue 5
    val df = Seq(
      (1L, ts(0), 10.0), (2L, ts(0), 20.0), (1L, ts(2), 30.0),
      (3L, ts(1), 5.0)).toDF("u", "ts", "v")
    val got = Behavior.cohortLtv(df, "ts", "u", "v", bucketSec = 100L).get
      .orderBy("cohort_ts", "age")
      .select("age", "active", "cohort_size", "revenue", "cum_revenue", "ltv")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(got.toSeq == Seq(
      (0, 2L, 2L, 30.0, 30.0, 15.0),
      (2, 1L, 2L, 30.0, 60.0, 30.0),
      (0, 1L, 1L, 5.0, 5.0, 5.0)))
    // NULL-value rows count for nothing (not even cohort assignment)
    val withNull = df.union(Seq((4L, ts(0), null.asInstanceOf[java.lang.Double]))
      .toDF("u", "ts", "v"))
    assert(Behavior.cohortLtv(withNull, "ts", "u", "v", 100L).get
      .orderBy("cohort_ts", "age")
      .select("cohort_size").as[Long].collect().toSeq == Seq(2L, 2L, 1L))
  }

  test("frequentPairs: hand-computed supports and lift; Apriori prune; " +
      "duplicate basket rows count once") {
    // baskets: 1:{x,y,z} 2:{x,y} 3:{x,y} 4:{z,w} — w has support 1
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"), (1L, "x"), // dup (1,x) row
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"),
      (4L, "z"), (4L, "w")).toDF("b", "i")
    val got = Behavior.frequentPairs(df, "b", "i", minSupport = 2L).get
      .as[(String, String, Long, Double)].collect().toSet
    // (x,y) in 3 baskets of 4; sup x=3 y=3 → lift = 3·4/9
    val lift = math.rint((3.0 * 4.0 / (3.0 * 3.0) + 1e-9) * 1e6) / 1e6
    assert(got == Set(("x", "y", 3L, lift)))
    // minSupport=1 admits the singletons' pairs too
    val all = Behavior.frequentPairs(df, "b", "i", minSupport = 1L).get
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(all == Set(("x", "y"), ("x", "z"), ("y", "z"), ("w", "z")))
  }

  test("frequentPairs: oversized basket fails loudly; guards") {
    val big = (1 to 40).map(i => (1L, s"i$i")).toDF("b", "i")
    val r = Behavior.frequentPairs(big, "b", "i",
      minSupport = 1L, maxBasket = 10)
    assert(r.map(_.count()).isFailing)
    assert(Behavior.frequentPairs(big, "b", "i", minSupport = 0L).isFailing)
    assert(Behavior.frequentPairs(big, "b", "i", maxBasket = 1).isFailing)
  }
}
