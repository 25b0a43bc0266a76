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

  test("spanDedup removes non-first occurrences of a duplicated n-token span") {
    // docs 1 and 2 share the 4-token span "the quick brown fox"; doc 1
    // is the keeper, doc 2 loses exactly those 4 tokens
    val df = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "again the quick brown fox runs far"),
      (3L, "nothing shared here at all today")
    ).toDF("id", "text")
    val rows = byId[(Long, String, Long, Long)](
      Segments.spanDedup(df, "text", "id", n = 4).get
        .select("id", "text", "n_tokens", "n_dropped"))
    assert(rows == Seq(
      (1L, "the quick brown fox jumps high", 6L, 0L),
      (2L, "again runs far", 7L, 4L),
      (3L, "nothing shared here at all today", 6L, 0L)))
  }

  test("spanDedup merges overlapping duplicated spans into one removed region") {
    // a 6-token duplicated region with n=4 produces 3 overlapping grams;
    // their drop positions union to the whole region, not 3x4 tokens
    val shared = "one two three four five six"
    val df = Seq(
      (1L, s"$shared tail1"),
      (2L, s"head2 $shared tail2")
    ).toDF("id", "text")
    val rows = byId[(Long, String, Long, Long)](
      Segments.spanDedup(df, "text", "id", n = 4).get
        .select("id", "text", "n_tokens", "n_dropped"))
    assert(rows == Seq(
      (1L, s"$shared tail1", 7L, 0L),
      (2L, "head2 tail2", 8L, 6L)))
  }

  test("spanDedup matches case-insensitively but rebuilds original case") {
    val df = Seq(
      (1L, "The Quick Brown Fox ends"),
      (2L, "the quick brown fox ENDS")
    ).toDF("id", "text")
    val rows = byId[(Long, String, Long, Long)](
      Segments.spanDedup(df, "text", "id", n = 5).get
        .select("id", "text", "n_tokens", "n_dropped"))
    assert(rows == Seq(
      (1L, "The Quick Brown Fox ends", 5L, 0L),
      (2L, "", 5L, 5L)))
  }

  test("spanDedup leaves short and null documents untouched") {
    val df = Seq(
      (1L, Some("too short")),
      (2L, Some("too short")), // 2 tokens < n: no grams, both survive
      (3L, None)
    ).toDF("id", "text")
    val rows = byId[(Long, String, Long, Long)](
      Segments.spanDedup(df, "text", "id", n = 4).get
        .select("id", "text", "n_tokens", "n_dropped"))
    assert(rows == Seq(
      (1L, "too short", 2L, 0L),
      (2L, "too short", 2L, 0L),
      (3L, "", 0L, 0L)))
  }

  test("spanDedup intra-document repeats keep only the first occurrence") {
    val df = Seq((1L, "a b c d x a b c d y a b c d")).toDF("id", "text")
    val (txt, n, dropped) = byId[(String, Long, Long)](
      Segments.spanDedup(df, "text", "id", n = 4).get
        .select("text", "n_tokens", "n_dropped")).head
    assert(txt == "a b c d x y" && n == 14L && dropped == 8L)
  }

  test("decontaminateSpans excises only benchmark-overlapping spans") {
    val bench = Seq((100L, "the secret eval answer is forty two")).toDF("id", "text")
    val corpus = Seq(
      (1L, "intro text the secret eval answer is forty two outro text"),
      (2L, "totally clean document with nothing shared here")
    ).toDF("id", "text")
    val rows = byId[(Long, String, Long, Long)](
      Segments.decontaminateSpans(corpus, bench, "text", "id", n = 7).get
        .select("id", "text", "n_tokens", "n_dropped"))
    assert(rows == Seq(
      (1L, "intro text outro text", 11L, 7L),
      (2L, "totally clean document with nothing shared here", 7L, 0L)))
  }

  test("decontaminateSpans leaves benchmark-free and null docs intact") {
    val bench = Seq((100L, "a b c d")).toDF("id", "text")
    val corpus = Seq((1L, Some("x y z")), (2L, None)).toDF("id", "text")
    val rows = byId[(Long, String, Long, Long)](
      Segments.decontaminateSpans(corpus, bench, "text", "id", n = 4).get
        .select("id", "text", "n_tokens", "n_dropped"))
    assert(rows == Seq((1L, "x y z", 3L, 0L), (2L, "", 0L, 0L)))
  }

  test("chunk emits overlapping windows covering every token, no redundant tail") {
    // 10 tokens, chunk 4, stride 2: nc = ((10-4+1)//2)+1 = 4 -> starts 0,2,4,6
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("id", "text")
    val rows = Segments.chunk(df, "text", "id", chunkTokens = 4, stride = 2).get
      .orderBy("chunk_id")
      .select("chunk_id", "n_tokens", "text_chunk")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows == Seq(
      (0L, 4L, "t0 t1 t2 t3"),
      (1L, 4L, "t2 t3 t4 t5"),
      (2L, 4L, "t4 t5 t6 t7"),
      (3L, 4L, "t6 t7 t8 t9")))
  }

  test("chunk: short docs give one chunk, empty docs give none, tail may be partial") {
    val df = Seq(
      (1L, Some("a b")),                 // n <= chunkTokens: one chunk
      (2L, None),                        // no tokens: no rows
      (3L, Some("a b c d e"))            // n=5, c=4, s=2: starts 0,2 -> tail has 3
    ).toDF("id", "text")
    val rows = Segments.chunk(df, "text", "id", chunkTokens = 4, stride = 2).get
      .orderBy("id", "chunk_id")
      .select("id", "chunk_id", "n_tokens", "text_chunk")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(rows == Seq(
      (1L, 0L, 2L, "a b"),
      (3L, 0L, 4L, "a b c d"),
      (3L, 1L, 3L, "c d e")))
  }

  test("chunk rejects stride outside [1, chunkTokens]") {
    val df = Seq((1L, "a")).toDF("id", "text")
    assert(Segments.chunk(df, "text", "id", chunkTokens = 4, stride = 5) match {
      case Fail(e) => e.getMessage.contains("stride")
      case _       => false
    })
  }

  test("spanDedup rejects n < 2") {
    val df = Seq((1L, "a")).toDF("id", "text")
    assert(Segments.spanDedup(df, "text", "id", n = 1) match {
      case Fail(e) => e.getMessage.contains("n must be")
      case _       => false
    })
  }

  test("c4Clean applies the line rules and the document verdicts") {
    val good = "this line has enough words to survive."
    val docs = Seq(
      (0L, s"$good\nanother decent line ends with a mark!"), // keeps 2 → kept
      (1L, s"$good\nno terminal punctuation on this one"),   // keeps 1 → dropped
      (2L, s"$good\ntiny line."),                            // word floor drops line 2
      (3L, s"$good\nenable javascript to see this content."),// javascript drops line 2
      (4L, s"$good\n$good\nbut lorem ipsum poisons the doc."),
      (5L, s"$good\n$good\nbrace { poisons } the document."),
      (6L, "")                                               // empty: nothing survives
    ).toDF("doc_id", "text")
    val got = Segments.c4Clean(docs, "text", "doc_id", minLineWords = 5, minLines = 2).get
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_lines_kept", "kept")
      .as[(Long, String, Long, Boolean)].collect()
    assert(got(0) == ((0L, s"$good\nanother decent line ends with a mark!", 2L, true)))
    assert(got(1) == ((1L, good, 1L, false)))
    assert(got(2) == ((2L, good, 1L, false)))
    assert(got(3) == ((3L, good, 1L, false)))
    assert(got(4)._3 == 3L && !got(4)._4) // lines fine, lorem ipsum kills the doc
    assert(got(5)._3 == 3L && !got(5)._4) // brace kills the doc
    assert(got(6) == ((6L, "", 0L, false)))
  }
}
