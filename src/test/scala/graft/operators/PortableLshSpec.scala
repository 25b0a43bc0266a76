package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The portable (md5-derived) LSH kernels exist so an EXTERNAL engine can
  * recompute every fingerprint bit-for-bit — these specs lock the formula
  * with goldens produced by DuckDB (the driver's oracle engine) and pin
  * the operator outputs to brute-force recomputations in Spark itself. */
class PortableLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("sign matrix matches the SQL md5 formula (DuckDB goldens)") {
    // CASE WHEN (CAST(('0x' || substring(md5(j || '_' || i),1,15)) AS
    // BIGINT) & 1) = 1 THEN 1 ELSE -1 END, evaluated in DuckDB 2026-08-12
    assert(PortableLsh.sign(0, 0) == -1)
    assert(PortableLsh.sign(0, 1) == -1)
    assert(PortableLsh.sign(1, 0) == -1)
    assert(PortableLsh.sign(7, 33) == 1)
    assert(PortableLsh.sign(59, 63) == 1)
  }

  test("portableSimhash matches the DuckDB text-simhash golden") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "   \t  "), // all-whitespace: drops out
      (4L, "The  QUICK brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val sh = Dedup.portableSimhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == 71287727808099948L)  // DuckDB golden
    assert(sh(2L) == 216835218948318751L) // DuckDB golden
    assert(!sh.contains(3L))
    // lowercase + multi-whitespace tokenization: doc 4 == doc 1
    assert(sh(4L) == sh(1L))
  }

  test("PortableVecSimhash bit j = [projection under md5 signs > 0]") {
    val vecs = Seq(
      (1L, Array.fill(8)(0.5f)),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)),
      (3L, Array.fill(8)(0.0f)) // zero vector: ties -> all bits 0
    ).toDF("id", "v")
    val out = PortableLsh.vecSimhash(vecs, "v", "id", bits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = PortableLsh.signMatrix(16, 8)
    def expected(v: Array[Float]): Long =
      (0 until 16).map { j =>
        val p = (0 until 8).map(i => v(i).toDouble * s(j)(i)).sum
        if (p > 0.0) 1L << j else 0L
      }.sum
    assert(out(1L) == expected(Array.fill(8)(0.5f)))
    assert(out(2L) == expected(Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
    assert(out(3L) == 0L)
  }

  test("portableSimhash matches an independent reimplementation on random corpora") {
    // the contract in one place, written differently: md5 via MessageDigest,
    // bit votes via a fold — locks the kernel without DuckDB in the loop
    def reference(text: String): Option[Long] = {
      val toks = text.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hashes = toks.map { t =>
          val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
          java.lang.Long.parseLong(hex.take(15), 16)
        }
        Some((0 until 60).map { b =>
          val vote = hashes.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
          if (vote > 0) 1L << b else 0L
        }.sum)
      }
    }
    val rnd = new scala.util.Random(23)
    val words = Vector("lorem", "ipsum", "dolor", "sit", "amet", "sed", "do")
    val docs = (0 until 25).map { i =>
      val body =
        if (i % 7 == 0) "   " // whitespace-only: must drop out
        else Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString("  ")
      (i.toLong, body)
    }
    val got = Dedup.portableSimhash(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, text) =>
      reference(text) match {
        case Some(sh) => assert(got(id) == sh, s"doc $id diverged")
        case None     => assert(!got.contains(id), s"doc $id should have dropped")
      }
    }
  }

  test("PortableVecSimhash reads array<double> correctly and rejects other types") {
    // exactly-representable values: float and double vectors must produce
    // the SAME signature (getFloat on a double array would read garbage)
    val vals = Array(0.5, -1.25, 2.0, -0.75, 1.5, -2.5, 0.25, 3.0)
    val both = Seq((1L, vals.map(_.toFloat), vals)).toDF("id", "vf", "vd")
    val row = both.select(
      PortableLsh.vecSimhashCol(col("vf"), bits = 16).as("sf"),
      PortableLsh.vecSimhashCol(col("vd"), bits = 16).as("sd")).head()
    assert(row.getLong(0) == row.getLong(1))
    val bad = Seq((1L, Array(1, 2, 3))).toDF("id", "vi")
    val err = intercept[Exception] {
      bad.select(PortableLsh.vecSimhashCol(col("vi"), bits = 16)).head()
    }
    assert(err.getMessage.contains("portable_vec_simhash") ||
      Option(err.getCause).exists(_.getMessage.contains("portable_vec_simhash")))
  }

  test("embeddingNearDupPairsPortable == exact {band agreement AND cos >= t}") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(12)(rnd.nextFloat() * 2 - 1)
    val base = (0 until 40).map(i => (i.toLong, vec()))
    // plant near-dups: jittered copies of vectors 0..4
    val dups = (0 until 5).map(i =>
      (100L + i, base(i)._2.map(x => x + 0.01f * rnd.nextFloat())))
    val df = (base ++ dups).toDF("id", "v")

    val got = Dedup.embeddingNearDupPairsPortable(df, "v", "id",
      threshold = 0.8, bandBits = 5, nBands = 8)
      .get.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute force with the same signature column (bits = 5×8 = 40)
    val sigs = PortableLsh.vecSimhash(df, "v", "id", bits = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = (base ++ dups).map { case (i, v) => i -> v }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    def shares(a: Long, b: Long): Boolean =
      (0 until 8).exists(t => ((sigs(a) >> (t * 5)) & 31) == ((sigs(b) >> (t * 5)) & 31))
    val want = (for {
      a <- all.keys; b <- all.keys
      if a < b
      if shares(a, b)
      if cos(all(a), all(b)) >= 0.8
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce at least one near-dup pair")
    // jittered copies share every band with overwhelming probability —
    // the planted duplicates must be retrieved
    assert((0 until 5).forall(i => want.contains((i.toLong, 100L + i))))
  }

  test("lshKnnPortable == direct band-agreement candidates + exact ranking") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 60).map(i => (i.toLong, Array.fill(12)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val queries = df.filter(col("id") < 3)
    val got = Similarity.lshKnnPortable(df, queries, "v", "id",
      k = 4, bandBits = 2, nBands = 10)
      .get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val sigs = PortableLsh.vecSimhash(df, "v", "id", bits = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    def shares(a: Long, b: Long): Boolean =
      (0 until 10).exists(t => ((sigs(a) >> (t * 2)) & 3) == ((sigs(b) >> (t * 2)) & 3))
    val want = (for (q <- 0L until 3L) yield {
      val cands = rows.keys.filter(c => c != q && shares(q, c))
        .toSeq.map(c => (c, cos(rows(q), rows(c))))
        .sortBy { case (c, s) => (-s, c) }.take(4)
      cands.zipWithIndex.map { case ((c, _), r) => (q, c, r + 1) }
    }).flatten.toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}
