package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functional.Fail

class SegmentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def byId[T](df: org.apache.spark.sql.DataFrame)(implicit
      e: org.apache.spark.sql.Encoder[T]): Seq[T] =
    df.orderBy("id").as[T].collect().toSeq

  test("segmentDedup keeps only the globally-first occurrence of each paragraph") {
    val df = Seq(
      (1L, "alpha\n\nshared one\n\nbeta"),
      (2L, "shared one\n\ngamma\n\nshared two"),
      (3L, "shared two\n\ndelta")
    ).toDF("id", "text")
    val out = Segments.segmentDedup(df, "text", "id").get
    val rows = byId[(Long, String, Long, Long)](
      out.select("id", "text", "n_segments", "n_kept"))
    assert(rows == Seq(
      (1L, "alpha\n\nshared one\n\nbeta", 3L, 3L),     // first sees everything
      (2L, "gamma\n\nshared two", 3L, 2L),             // "shared one" already taken by doc 1
      (3L, "delta", 2L, 1L)))                          // "shared two" taken by doc 2
  }

  test("segmentDedup drops intra-document repeats and keeps order") {
    val df = Seq((1L, "x\n\ny\n\nx\n\nz")).toDF("id", "text")
    val out = Segments.segmentDedup(df, "text", "id").get
    val (txt, n, kept) = byId[(String, Long, Long)](
      out.select("text", "n_segments", "n_kept")).head
    assert(txt == "x\n\ny\n\nz" && n == 4L && kept == 3L)
  }

  test("segmentDedup retains all-duplicate and null-text documents with empty output") {
    val df = Seq(
      (1L, Some("only para")),
      (2L, Some("only para")), // every segment a dup => empty text, 0 kept
      (3L, None)               // null text => no segments at all
    ).toDF("id", "text")
    val rows = byId[(Long, String, Long, Long)](
      Segments.segmentDedup(df, "text", "id").get
        .select("id", "text", "n_segments", "n_kept"))
    assert(rows == Seq(
      (1L, "only para", 1L, 1L),
      (2L, "", 1L, 0L),
      (3L, "", 0L, 0L)))
  }

  test("boilerplate detects normalized segments at the minDocs boundary") {
    // "Cookie  Notice" vs "cookie notice" must count as one segment;
    // the nav line sits in exactly minDocs-1 docs and must NOT be flagged
    val df = (
      (1 to 4).map(i => (i.toLong, s"unique $i\nCookie  Notice")) ++
        (5 to 7).map(i => (i.toLong, s"unique $i\nnav bar"))
      ).toDF("id", "text")
    val bp = Segments.boilerplate(df, "text", "id", minDocs = 4L).get
      .as[(String, Long)].collect().toSeq
    assert(bp == Seq(("cookie notice", 4L)))
  }

  test("boilerplate counts documents, not occurrences") {
    // one doc repeating a line 5 times is still one document
    val df = Seq(
      (1L, Seq.fill(5)("promo line").mkString("\n")),
      (2L, "promo line\nreal content")
    ).toDF("id", "text")
    assert(Segments.boilerplate(df, "text", "id", minDocs = 3L).get.isEmpty)
    val bp = Segments.boilerplate(df, "text", "id", minDocs = 2L).get
      .as[(String, Long)].collect().toSeq
    assert(bp == Seq(("promo line", 2L)))
  }

  test("stripBoilerplate removes flagged lines, preserving raw form and order") {
    val df = Seq(
      (1L, "Intro one\nSubscribe NOW\nbody text 1"),
      (2L, "subscribe  now\nIntro two"),
      (3L, "Intro three\nsubscribe now")
    ).toDF("id", "text")
    val out = Segments.stripBoilerplate(df, "text", "id", minDocs = 3L).get
    val rows = byId[(Long, String, Long, Long, Long)](
      out.select("id", "text", "n_segments", "n_kept", "n_removed"))
    assert(rows == Seq(
      (1L, "Intro one\nbody text 1", 3L, 2L, 1L),
      (2L, "Intro two", 2L, 1L, 1L),
      (3L, "Intro three", 2L, 1L, 1L)))
  }

  test("boilerplate rejects minDocs < 2") {
    val df = Seq((1L, "a")).toDF("id", "text")
    assert(Segments.boilerplate(df, "text", "id", minDocs = 1L) match {
      case Fail(e) => e.getMessage.contains("minDocs")
      case _       => false
    })
  }
}
