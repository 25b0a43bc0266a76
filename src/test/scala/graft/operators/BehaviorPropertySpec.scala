package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized cross-checks of the behavioral operators against direct
  * per-entity fold simulations — the window chains must agree with the
  * obvious sequential definition on every sampled event log. Seeded
  * loop (scalacheck is not in the offline cache). */
class BehaviorPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(77214L)
  private val types = Vector("s1", "s2", "s3", "x")

  /** (event_id, user_id, epoch_sec, type) with unique ids; duplicate
    * (user, ts) rows occur on purpose — the id tiebreak must resolve them. */
  private def randomLog(): Seq[(Long, Long, Long, String)] = {
    var id = 0L
    (1L to (3 + rnd.nextInt(6))).flatMap { u =>
      Seq.fill(1 + rnd.nextInt(12)) {
        id += 1
        (id, u, rnd.nextInt(50).toLong, types(rnd.nextInt(types.size)))
      }
    }
  }

  private def toDf(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("event_id", "user_id", "epoch", "t")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")

  test("funnelSteps matches a per-user sequential fold") {
    (0 until 12).foreach { _ =>
      val rows = randomLog()
      val win = (10 + rnd.nextInt(30)).toLong
      val steps = Seq("s1", "s2", "s3")
      val expect = rows.filter(r => steps.contains(r._4))
        .groupBy(_._2).map { case (u, evs) =>
          val sorted = evs.sortBy(e => (e._3, e._1))
          val t1 = sorted.collectFirst { case e if e._4 == "s1" => e._3 * 1000000L }
          var prev = t1
          val all = steps.tail.scanLeft(t1) { (p, step) =>
            p.flatMap { _ =>
              sorted.collectFirst {
                case e if e._4 == step && p.exists(e._3 * 1000000L > _) &&
                  t1.exists(e._3 * 1000000L <= _ + win * 1000000L) =>
                  e._3 * 1000000L
              }
            }
          }
          u -> all
        }
      val got = Behavior.funnelSteps(toDf(rows), "ts", "user_id", "t",
          steps, win).get
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
      assert(got == expect.map { case (k, v) => k -> v.toSeq },
        s"rows=$rows win=$win")
    }
  }

  test("sessionStats matches reference gap splitting") {
    (0 until 12).foreach { _ =>
      val rows = randomLog()
      val gap = (3 + rnd.nextInt(10)).toLong
      val expect = rows.groupBy(_._2).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._1))
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
          case (acc, e) =>
            acc match {
              case cur :: rest if e._3 - cur.head._3 <= gap =>
                (e :: cur) :: rest // cur.head is the session's LAST event
              case _ => List(e) :: acc
            }
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (s, i) =>
          (u, i.toLong) -> ((s.head._3, s.last._3, s.size.toLong,
            s.last._3 - s.head._3))
        }
      }
      val got = Behavior.sessionStats(toDf(rows), "ts", "event_id",
          "user_id", gap).get
        .select(col("user_id"), col("session_idx"),
          col("start_ts").cast("long"), col("end_ts").cast("long"),
          col("n_events"), col("duration_sec"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
      assert(got == expect, s"rows=$rows gap=$gap")
    }
  }

  test("transitionMatrix matches reference lag pairs with and without a gap cap") {
    (0 until 12).foreach { _ =>
      val rows = randomLog()
      val cap = if (rnd.nextBoolean()) Some((2 + rnd.nextInt(8)).toLong) else None
      val expect = rows.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._1))
        sorted.sliding(2).collect {
          case Seq(p, c) if cap.forall(g => c._3 - p._3 <= g) => (p._4, c._4)
        }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = Behavior.transitionMatrix(toDf(rows), "ts", "event_id",
          "user_id", "t", cap).get
        .select("prev_type", "type", "n")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == expect, s"rows=$rows cap=$cap")
    }
  }
}
