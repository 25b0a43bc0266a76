package graft.physical

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Behavior goldens for the relational layer, mirroring the reference's
  * semantics quirks (SURVEY §2.2-2.4, §2.7, §4). */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val kv = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0), ("c", 4, 40.0)
  ).toDF("key", "id", "v")

  test("Join.inner On dedupes key columns; Join.left keeps unmatched") {
    val right = Seq(("a", "x"), ("b", "y")).toDF("key", "tag")
    val inner = Join.inner(kv, right, Join.On(Seq("key"))).get
    assert(inner.columns.count(_ == "key") == 1)
    assert(inner.count() == 3)
    val left = Join.left(kv, right, Join.On(Seq("key"))).get
    assert(left.count() == 4)
    assert(left.filter($"tag".isNull).select("key").as[String].collect().toSet == Set("c"))
  }

  test("Join.broadcast has INNER semantics (reference quirk) and preserves 1:N") {
    val small = Seq(("a", "m1"), ("a", "m2"), ("b", "m3")).toDF("key", "meta")
    val j = Join.broadcast(kv, small, Seq("key")).get
    // "c" (unmatched) dropped; key "a" rows fan out ×2
    assert(j.filter($"key" === "c").count() == 0)
    assert(j.filter($"key" === "a").count() == 4)
    assert(j.count() == 5)
  }

  test("Join.broadcast projects right side to on ++ rightColumns") {
    val small = Seq(("a", "m", 9), ("b", "n", 8)).toDF("key", "meta", "junk")
    val j = Join.broadcast(kv, small, Seq("key"), Seq("meta")).get
    assert(!j.columns.contains("junk") && j.columns.contains("meta"))
  }

  test("Join semi/anti") {
    val right = Seq(("a", 0), ("b", 0)).toDF("key", "z")
    assert(Join.semi(kv, right, Join.On(Seq("key"))).get.count() == 3)
    assert(Join.anti(kv, right, Join.On(Seq("key"))).get
      .select("key").as[String].collect().toSet == Set("c"))
  }

  test("Group.Map strategy auto-names output columns fn(col)") {
    val g = Group.agg(kv, Seq("key"), Group.Map(Map("v" -> "min"))).get
    assert(g.columns.toSet == Set("key", "min(v)"))
    assert(g.filter($"key" === "a").select("min(v)").as[Double].head() == 10.0)
  }

  test("Group.Agg strategy takes arbitrary aggregate expressions") {
    val g = Group.agg(kv, Seq("key"),
      Group.Agg(Seq(sum($"v").as("sv"), count(lit(1)).as("n"),
        approx_count_distinct($"id").as("ad")))).get
    assert(g.filter($"key" === "a").select("sv").as[Double].head() == 30.0)
  }

  test("Agg.on whole-column fold and Agg.byKey per-key fold") {
    assert(Agg.on[Double](kv, "v", math.max).get == 40.0)
    val bk = Agg.byKey[String, Double](kv, "key", "v", _ + _).get
    assert(bk.columns.toSeq == Seq("key", "v"))
    assert(bk.filter($"key" === "a").select("v").as[Double].head() == 30.0)
  }

  test("Filter.na drops rows with ANY null among listed cols") {
    val withNulls = Seq(
      (Some(1), Some("x")), (None, Some("y")), (Some(3), None)
    ).toDF("i", "s")
    assert(Filter.na(withNulls, Seq("i", "s")).get.count() == 1)
    assert(Filter.na(withNulls, Seq("i")).get.count() == 2)
  }

  test("Filter.byRange is inclusive on both bounds") {
    val r = Filter.byRange(kv, "v", (20.0, 30.0)).get
    assert(r.select("id").as[Int].collect().toSet == Set(2, 3))
  }

  test("Order.by asc/desc and topK") {
    assert(Order.by(kv, Seq("v")).get.select("id").as[Int].head() == 1)
    assert(Order.by(kv, Seq("v"), descending = true).get.select("id").as[Int].head() == 4)
    assert(Order.topK(kv, Seq($"v".desc), 2).get.select("id").as[Int].collect().toSeq == Seq(4, 3))
  }

  test("SetOp union is bag semantics; intersect/except deduplicate") {
    val a = Seq(1, 1, 2).toDF("x")
    val b = Seq(1, 3).toDF("x")
    assert(SetOp.union(a, b).get.count() == 5)
    assert(SetOp.intersect(a, b).get.as[Int].collect().toSeq == Seq(1))
    assert(SetOp.except(a, b).get.as[Int].collect().toSeq == Seq(2))
  }

  test("Transform.rename + select + distinct + drop") {
    val r = (for {
      t <- Transform.rename(kv, Map("v" -> "value"))
      s <- Transform.select(t, Seq("key", "value"))
      d <- Transform.distinct(s)
    } yield d).get
    assert(r.columns.toSeq == Seq("key", "value") && r.count() == 4)
  }

  test("Optimise.repar coalesces at n<=1, repartitions otherwise; snapshot round-trips") {
    assert(Optimise.repar(kv, 1).get.rdd.getNumPartitions == 1)
    assert(Optimise.repar(kv, 3).get.rdd.getNumPartitions == 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val snap = Optimise.snapshot(kv, tmp)(spark).get
    assert(snap.orderBy("id").collect().toSeq == kv.orderBy("id").collect().toSeq)
  }

  test("bind sugar >> composes and captures failures") {
    import Implicits._
    val ok = kv >> (_.filter($"v" > 15)) >> (_.select("key"))
    assert(ok.get.count() == 3)
    val bad = kv >> (_.select("no_such_col"))
    assert(bad.isFailing)
  }

  test("sumOfSqrDiff / sumOfSqr aggregate helpers") {
    import Implicits._
    val df = Seq((1.0, 2.0), (3.0, 5.0)).toDF("a", "b")
    assert(df.sumOfSqrDiff("a", "b") == 5.0)
    assert(df.sumOfSqr("a") == 10.0)
  }

  test("Screen.showDF HideComplex masks array columns") {
    val df = Seq((1, Seq(1, 2))).toDF("i", "arr")
    val masked = Screen.hideComplex(df)
    assert(masked.select("arr").as[String].head().startsWith("<array"))
  }

  test("compact merges small files preserving data") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = Seq.tabulate(1000)(i => (i.toLong, s"row$i")).toDF("id", "v")
    df.repartition(50).write.parquet(dir) // 50 tiny files
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 50)
    val compacted = Optimise.compact(dir, targetFileBytes = 1L << 30).get
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 1, s"expected 1 file, got $after")
    assert(compacted.count() == 1000)
    assert(compacted.agg(sum($"id")).head.getLong(0) == (0L until 1000).sum)
  }

  test("zorderBy interleaves correctly and clusters both dimensions") {
    // bit-interleave golden: a=0b101 (cells even bits), b=0b011 (odd bits)
    assert(graft.functions.ZOrderImpl.interleave(0x5L, 0x3L) == 0x1BL) // 0b011011
    assert(graft.functions.ZOrderImpl.interleave(0xffffL, 0L) == 0x55555555L)
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y))
      .toDF("x", "y")
    val z = Optimise.zorderBy(grid, "x", "y", partitions = 4).get
    assert(z.count() == 1024 && z.columns.toSeq == Seq("x", "y"))
    // locality: within each partition, both x and y spans are bounded
    // (a single-column sort would leave the other column's span at max)
    import org.apache.spark.sql.functions.spark_partition_id
    val spans = z.withColumn("p", spark_partition_id())
      .groupBy("p").agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .select("sx", "sy").as[(Int, Int)].collect()
    assert(spans.forall { case (sx, sy) => sx < 32 && sy < 32 && (sx < 31 || sy < 31) },
      s"no locality: ${spans.toSeq}")
  }

  test("zorderBy handles constant columns and null values") {
    // constant y column: no interior quantile splits exist — must still
    // lay out (regression: Bucketizer rejects a 2-boundary split array)
    val constCol = (0 until 64).map(x => (x, 7)).toDF("x", "y")
    assert(Optimise.zorderBy(constCol, "x", "y", partitions = 2).get.count() == 64)
    // null keys survive the layout (dedicated invalid cell)
    val withNulls = (0 until 32).map(x => (x, if (x % 8 == 0) None else Some(x)))
      .toDF("x", "y")
    assert(Optimise.zorderBy(withNulls, "x", "y", partitions = 2).get.count() == 32)
    // cells = 65536 would wrap the invalid cell past the 16-bit mask
    assert(Optimise.zorderBy(constCol, "x", "y", cells = 65536).isFailing)
    // an all-null column gives approxQuantile nothing at all — must
    // still lay out rather than crash on the empty quantile array
    val allNull = (0 until 16).map(x => (x, Option.empty[Int])).toDF("x", "y")
    assert(Optimise.zorderBy(allNull, "x", "y", partitions = 2).get.count() == 16)
  }

  test("saltedJoin equals the plain join result") {
    val small = Seq(("a", "x"), ("b", "y")).toDF("key", "tag")
    val plain = kv.join(small, Seq("key"), "inner")
      .orderBy("id").collect().toSeq
    val salted = Optimise.saltedJoin(kv, small, Seq("key"), saltFactor = 4).get
      .select(kv.columns.map(col).toSeq :+ col("tag"): _*)
      .orderBy("id").collect().toSeq
    assert(salted == plain)
    assert(Optimise.saltedJoin(kv, small, Seq("key"), 4, how = "outer").isFailing)
  }

  test("bucketedTable: same-bucket join plans without a shuffle on the join key") {
    import graft.SparkTestBase.spark.sql
    // clear any leftover table + warehouse dir from a prior (crashed) run
    for (t <- Seq("bk_a", "bk_b")) {
      sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    val a = Seq.tabulate(100)(i => (i.toLong % 10, i.toDouble)).toDF("k", "v")
    Write.bucketedTable(a, "bk_a", Seq("k"), 4, sortBy = Seq("k"), overwrite = true).get
    Write.bucketedTable(a, "bk_b", Seq("k"), 4, sortBy = Seq("k"), overwrite = true).get
    // disable auto-broadcast so the join must rely on bucketing, then
    // assert there is no shuffle Exchange (BroadcastExchange would be one)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = sql("SELECT a.k, a.v, b.v AS v2 FROM bk_a a JOIN bk_b b ON a.k = b.k")
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val hasShuffle = plan.linesIterator
        .exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      assert(!hasShuffle, s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000) // 10 keys × 10 × 10
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      sql("DROP TABLE bk_a"); sql("DROP TABLE bk_b")
    }
  }

  test("Read.kafka fails gracefully without the connector jar") {
    assert(Read.kafka("topic", "localhost")(spark).isFailing)
  }

  test("Read.dynamo and Write.dynamo fail gracefully") {
    assert(Read.dynamo("r", "s", "t")(spark).isFailing)
    assert(Write.dynamo(kv, "r", "t").isFailing)
  }

  test("Order.topKPerGroup keeps k deterministic rows per group with optional rank") {
    val df = Seq(
      ("a", 1L, 10), ("a", 2L, 30), ("a", 3L, 30), ("a", 4L, 20),
      ("b", 5L, 5)
    ).toDF("g", "id", "score")
    val got = Order.topKPerGroup(df, Seq("g"),
        Seq($"score".desc, $"id"), 2, rankCol = "rank").get
      .orderBy("g", "rank")
      .select("g", "id", "rank").as[(String, Long, Int)].collect().toSeq
    // ties broken by id: (2,30) rank 1, (3,30) rank 2; group b keeps its 1 row
    assert(got == Seq(("a", 2L, 1), ("a", 3L, 2), ("b", 5L, 1)))
    // without rankCol the helper column is dropped
    val cols = Order.topKPerGroup(df, Seq("g"), Seq($"score".desc, $"id"), 2).get.columns
    assert(cols.toSeq == Seq("g", "id", "score"))
  }

  test("Order.topKPerGroup rejects empty keys and bad k") {
    val df = Seq(("a", 1)).toDF("g", "v")
    assert(Order.topKPerGroup(df, Nil, Seq($"v"), 1).isFailing)
    assert(Order.topKPerGroup(df, Seq("g"), Seq($"v"), 0).isFailing)
  }
}
