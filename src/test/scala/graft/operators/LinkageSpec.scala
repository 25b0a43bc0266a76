package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.{JaroWinklerImpl, TextFunctions}

class LinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("jaroWinkler matches DuckDB golden values (byte semantics)") {
    // goldens fetched from duckdb jaro_winkler_similarity this round
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
    assert(math.abs(jw("hello world", "hello wrold") - 0.9818181818181818) < 1e-15)
    // boost threshold: jaro 0.6 <= 0.7 -> no prefix boost
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // prefix cap at 4: jaro 5/6, prefix 6 capped to 4 -> 0.9
    assert(math.abs(jw("abcdefxx", "abcdefyy") - 0.9) < 1e-15)
    // byte-level unicode: 'é' is two bytes, same as DuckDB
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-15)
    // empty sides are 0.0 (DuckDB), even '' vs ''
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0)
    assert(jw("a", "a") == 1.0 && jw("a", "b") == 0.0)
    // window 0 at length 2: transposed pair has no matches at all
    assert(jw("ab", "ba") == 0.0)
    // case-sensitive
    assert(jw("ABC", "abc") == 0.0)
  }

  test("jaroWinkler column expression evaluates inside codegen") {
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"))
      .toDF("a", "b")
      .select(TextFunctions.jaroWinkler(col("a"), col("b")).as("s"))
    val got = df.as[Double].collect().sorted
    assert(math.abs(got(0) - 0.8133333333333332) < 1e-15)
    assert(math.abs(got(1) - 0.9611111111111111) < 1e-15)
    // null-safe: null input -> null output
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(TextFunctions.jaroWinkler(col("a"), col("b")).as("s"))
    assert(withNull.filter(col("s").isNull).count() == 1)
  }

  test("linkage finds the planted twin and ranks by score") {
    val left = Seq((1L, "jonathan smith"), (2L, "maria garcia"),
      (3L, "wei zhang")).toDF("lid", "name")
    val right = Seq(
      (10L, "jonathan smyth"),  // near twin of 1
      (11L, "jonathan smith"),  // exact twin of 1
      (20L, "maria garcja"),    // near twin of 2
      (30L, "completely other")).toDF("rid", "name")
    val got = Linkage.linkage(left, right, "lid", "rid", "name", "name",
        threshold = 0.9, topPerLeft = 2).get
      .select("lid", "rid", "rank").as[(Long, Long, Int)].collect().toSet
    // lid 1: exact twin ranks 1, near twin ranks 2; lid 2 matches 20;
    // lid 3 ("we...") shares no block with anything
    assert(got == Set((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)))
  }

  test("linkage maxBlockSize drops hot blocks; cap report lists them") {
    val left = Seq((1L, "aa target")).toDF("lid", "name")
    val right = (1L to 10L).map(i => (i, s"aa filler $i")).toDF("rid", "name")
    val capped = Linkage.linkage(left, right, "lid", "rid", "name", "name",
      threshold = 0.0, maxBlockSize = 5).get
    assert(capped.count() == 0) // block "aa" has 10 rights > 5 -> dropped
    val report = Linkage.linkageCapReport(right, "name",
        Linkage.prefixBlocker(2), maxBlockSize = 5).get
      .as[(String, Long)].collect().toSeq
    assert(report == Seq(("aa", 10L)))
    // uncapped finds matches again
    assert(Linkage.linkage(left, right, "lid", "rid", "name", "name",
      threshold = 0.0, topPerLeft = 1).get.count() == 1)
  }

  test("linkage score ties break toward the smaller rightId") {
    val left = Seq((1L, "abcd")).toDF("lid", "name")
    // two identical rights -> identical scores
    val right = Seq((7L, "abcx"), (5L, "abcx")).toDF("rid", "name")
    val got = Linkage.linkage(left, right, "lid", "rid", "name", "name",
        threshold = 0.5, topPerLeft = 2).get
      .select("rid", "rank").as[(Long, Int)].collect().toSet
    assert(got == Set((5L, 1), (7L, 2)))
  }
}
