package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  // in-memory reference: candidates -> greedy-min -> max-split
  private def refChunks(s: String, bits: Int, w: Int, minL: Int,
      maxL: Int): Seq[(Long, Long, String)] = {
    val mask = (1L << bits) - 1
    val cands = (w to s.length - 1)
      .filter(p => (hash60(s.substring(p - w, p)) & mask) == 0L)
      .map(_.toLong)
    val acc = cands.foldLeft(Vector(0L)) { (a, p) =>
      if (p - a.last >= minL) a :+ p else a
    }
    val bounds = acc :+ s.length.toLong
    bounds.zip(bounds.tail).filter { case (lo, hi) => hi > lo }
      .flatMap { case (lo, hi) =>
        (lo until hi by maxL.toLong).map { cs =>
          val cl = math.min(maxL.toLong, hi - cs)
          (cs + 1, cl, md5hex(s.substring(cs.toInt, (cs + cl).toInt)))
        }
      }
  }

  test("chunks equal the in-memory reference on random strings at " +
      "several knob sets; chunks tile the document exactly") {
    val rnd = new scala.util.Random(19L)
    val docs = Seq.tabulate(25) { i =>
      val n = 40 + rnd.nextInt(400)
      (i.toLong, Seq.fill(n)("abcdef" (rnd.nextInt(6))).mkString)
    }
    val df = docs.toDF("id", "text")
    for ((bits, w, minL, maxL) <- Seq((4, 6, 8, 64), (5, 8, 16, 96),
        (3, 4, 4, 32))) {
      val got = Cdc.chunks(df, "text", "id", bits, w, minL, maxL).get
        .select("id", "start", "chunk_len", "chunk_md5")
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).map { case (k, v) =>
          k -> v.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq
        }
      val want = docs.map { case (id, s) =>
        id -> refChunks(s, bits, w, minL, maxL)
      }.toMap
      assert(got == want, s"knobs ($bits,$w,$minL,$maxL)")
      // tiling law: contiguous starts, lengths sum to the doc length
      got.foreach { case (id, cs) =>
        assert(cs.head._1 == 1L)
        assert(cs.map(_._2).sum == docs(id.toInt)._2.length.toLong)
        cs.zip(cs.tail).foreach { case ((s1, l1, _), (s2, _, _)) =>
          assert(s2 == s1 + l1)
        }
      }
    }
  }

  test("content-defined shift resistance: a one-char prepend re-aligns " +
      "after the first boundary; fixed-size blocking would not") {
    val rnd = new scala.util.Random(23L)
    val s = Seq.fill(600)("abcdef" (rnd.nextInt(6))).mkString
    val df = Seq((1L, s), (2L, "x" + s)).toDF("id", "text")
    val h = Cdc.chunks(df, "text", "id").get
      .select("id", "chunk_md5").as[(Long, String)].collect()
    val a = h.filter(_._1 == 1L).map(_._2).toSeq
    val b = h.filter(_._1 == 2L).map(_._2).toSeq
    val shared = a.intersect(b).size
    assert(a.size >= 5, s"need enough chunks to be meaningful: ${a.size}")
    assert(shared >= a.size / 2,
      s"content-defined chunks must re-align: $shared of ${a.size}")
    // fixed-size 96-blocks of the shifted string share nothing
    val fixA = s.grouped(96).map(md5hex).toSet
    val fixB = ("x" + s).grouped(96).map(md5hex).toSet
    assert(fixA.intersect(fixB).isEmpty)
  }

  test("short docs emit a single chunk (max-split only); dedupReport " +
      "finds planted cross-doc chunks; guards fail loudly") {
    val df = Seq((1L, "tiny"), (2L, "y" * 200)).toDF("id", "text")
    val got = Cdc.chunks(df, "text", "id").get
      .select("id", "start", "chunk_len")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(got(1L).toSeq == Seq((1L, 1L, 4L)))
    // 200 identical chars: candidates everywhere or nowhere, but the
    // max-split guarantees pieces of <= 96
    assert(got(2L).map(_._3).sum == 200L && got(2L).forall(_._3 <= 96L))
    // random 240-char boilerplate carries ~8 internal candidates, so
    // both docs re-align inside it whatever their prefixes did
    val brnd = new scala.util.Random(99L)
    val boiler = Seq.fill(240)("abcdef" (brnd.nextInt(6))).mkString
    val rnd = new scala.util.Random(5L)
    def noise(n: Int) = Seq.fill(n)("abcdef" (rnd.nextInt(6))).mkString
    val planted = Seq((1L, noise(80) + boiler + noise(70)),
      (2L, noise(95) + boiler + noise(40)), (3L, noise(150)))
      .toDF("id", "text")
    val rep = Cdc.dedupReport(planted, "text", "id").get
      .as[(String, Long, Long, Long)].collect()
    assert(rep.nonEmpty, "the planted 120-char boilerplate must yield " +
      "at least one shared chunk")
    assert(rep.forall(_._2 >= 2))
    assert(Cdc.chunks(df, "text", "id", bits = 0).isFailing)
    assert(Cdc.chunks(df, "text", "id", minLen = 0).isFailing)
    assert(Cdc.chunks(df, "text", "id", minLen = 50, maxLen = 40).isFailing)
    assert(Cdc.dedupReport(df, "text", "id", minDocs = 1).isFailing)
  }
}
