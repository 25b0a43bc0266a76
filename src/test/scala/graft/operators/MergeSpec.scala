package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("upsert replaces matched keys, inserts new ones, passes the rest") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val updates = Seq((2L, "B2", 21.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    val got = Merge.upsert(base, updates, Seq("id")).get
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert with broadcastUpdates produces the same result") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("id", "name")
    val got = Merge.upsert(base, updates, Seq("id"), broadcastUpdates = true).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("upsert takes the update side for null-valued keys too") {
    val base = Seq((Option(1L), "a"), (Option.empty[Long], "nullkey-old"))
      .toDF("id", "name")
    val updates = Seq((Option.empty[Long], "nullkey-new")).toDF("id", "name")
    val got = Merge.upsert(base, updates, Seq("id")).get
      .select("name").as[String].collect().sorted.toSeq
    assert(got == Seq("a", "nullkey-new"))
  }

  test("upsert rejects mismatched column sets") {
    val base = Seq((1, "a")).toDF("id", "name")
    val upd = Seq((1, "a", 2.0)).toDF("id", "name", "extra")
    assert(Merge.upsert(base, upd, Seq("id")).isFailing)
  }

  test("latestByKey keeps exactly the newest row per key") {
    val log = Seq(
      (1L, ts(1), "v1"), (1L, ts(3), "v3"), (1L, ts(2), "v2"),
      (2L, ts(5), "x")).toDF("id", "changed", "val")
    val got = Merge.latestByKey(log, Seq("id"), "changed").get
      .select("id", "val").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "v3"), (2L, "x")))
  }

  test("scd2 chains valid_from/valid_to per key and flags the current row") {
    val log = Seq(
      (1L, ts(1), "a"), (1L, ts(5), "b"), (1L, ts(9), "c"),
      (2L, ts(2), "z")).toDF("id", "changed", "val")
    val got = Merge.scd2(log, Seq("id"), "changed").get
      .select("id", "val", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime)).toSeq
    assert(got == Seq(
      (1L, "a", ts(1), Some(ts(5)), false),
      (1L, "b", ts(5), Some(ts(9)), false),
      (1L, "c", ts(9), None, true),
      (2L, "z", ts(2), None, true)))
  }

  test("corpusDiff labels added/removed/changed/unchanged; whitespace is not a change") {
    val v1 = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"),
      (4L, Option.empty[String].orNull)).toDF("id", "text")
    val v2 = Seq((1L, "alpha text"), (2L, "  Beta   TEXT "), (3L, "rewritten"),
      (5L, "fresh doc")).toDF("id", "text")
    val got = Merge.corpusDiff(v1, v2, "text", "id").get
      .as[(Long, String)].collect().toMap
    // id 2: case/whitespace normalize away; id 4 removed (null text = empty)
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("applyChanges: highest-seq op wins, winning delete removes the key") {
    val log = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),          // → b
      (2L, 1L, "I", "x"), (2L, 3L, "D", "-"),          // deleted
      (3L, 5L, "D", "-"), (3L, 7L, "U", "back"),       // re-inserted
      (4L, 1L, "I", "only")                             // → only
    ).toDF("k", "seq", "op", "payload")
    val got = Merge.applyChanges(log, Seq("k"), "seq", "op").get
      .select("k", "payload").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 3L -> "back", 4L -> "only"))
    // custom delete vocabulary
    // with U as the delete vocabulary, keys 1 and 3 (U winners) drop
    val got2 = Merge.applyChanges(log, Seq("k"), "seq", "op",
        deleteOps = Seq("U")).get
      .select("k", "payload").as[(Long, String)].collect().toMap
    assert(got2 == Map(2L -> "-", 4L -> "only"))
  }

  test("pointInTimeJoin: each fact picks the version valid at its ts; " +
      "pre-history facts NULL; broadcast and shuffle paths agree") {
    val log = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "silver"), (1L, 30L, "gold"),
      (2L, 15L, "bronze")).toDF("k", "ts", "tier")
    val dim = Merge.scd2(log, Seq("k"), "ts").get.drop("ts", "is_current")
    val fact = Seq(
      (100L, 1L, 10L), // exactly at version start → that version
      (101L, 1L, 19L), // inside [10, 20)
      (102L, 1L, 20L), // boundary → NEXT version (valid_to exclusive)
      (103L, 1L, 99L), // open-ended current version
      (104L, 1L, 5L),  // before first version → NULL
      (105L, 2L, 16L), // other key
      (106L, 9L, 50L)  // unknown key → NULL
    ).toDF("fid", "k", "fts")
    val got = Merge.pointInTimeJoin(fact, dim, Seq("k"), "fts").get
      .select("fid", "tier").as[(Long, Option[String])].collect().toMap
    assert(got == Map(100L -> Some("bronze"), 101L -> Some("bronze"),
      102L -> Some("silver"), 103L -> Some("gold"), 104L -> None,
      105L -> Some("bronze"), 106L -> None))
    // fact row count preserved (1:<=1 by SCD-2 construction)
    assert(Merge.pointInTimeJoin(fact, dim, Seq("k"), "fts").get.count() ==
      fact.count())
    // the shuffled path returns the same rows
    val shuffled = Merge.pointInTimeJoin(fact, dim, Seq("k"), "fts",
        broadcastDim = false).get
      .select("fid", "tier").as[(Long, Option[String])].collect().toMap
    assert(shuffled == got)
    // never a nested-loop: the keys are the hash-join keys
    val plan = Merge.pointInTimeJoin(fact, dim, Seq("k"), "fts").get
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), s"range join degenerated:\n$plan")
    // self-derived dim (shared lineage) must not trip the self-join trap
    val selfDim = Merge.scd2(fact.select($"k", $"fts".as("ts"),
        $"fid".as("tier")), Seq("k"), "ts").get.drop("ts", "is_current")
    assert(Merge.pointInTimeJoin(fact, selfDim, Seq("k"), "fts").get
      .count() == fact.count())
    // colliding non-key columns are rejected loudly
    assert(Merge.pointInTimeJoin(fact.withColumn("tier", lit("x")), dim,
      Seq("k"), "fts").isFailing)
    assert(Merge.pointInTimeJoin(fact, dim.drop("valid_to"), Seq("k"),
      "fts").isFailing)
  }
}
