package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val companies = Seq(
    (1L, "acme corporation of america global holdings"),
    (2L, "zenith widgets international manufacturing group"),
    (3L, "completely unrelated entity name here")
  ).toDF("cid", "cname")

  private lazy val invoices = Seq(
    (10L, "acme corporation of america global holdings ltd"),
    (11L, "zenith widgets international manufacturing group"),
    (12L, "some other business entirely different words")
  ).toDF("iid", "iname")

  test("byText matches near-duplicate keys and skips unrelated ones") {
    val got = FuzzyJoin.byText(companies, invoices, "cname", "iname",
      "cid", "iid", threshold = 0.5).get
    val pairs = got.select("cid", "iid").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)), s"missing fuzzy match, got $pairs")
    assert(pairs.contains((2L, 11L)))
    assert(!pairs.exists { case (c, i) => c == 3L || i == 12L })
    // similarity column present and exact match scores 1.0
    val exact = got.filter($"cid" === 2L).select("similarity").as[Double].head()
    assert(exact == 1.0)
  }

  test("char n-gram mode catches small edits words miss") {
    val l = Seq((1L, "kubernetes")).toDF("lk", "lv")
    val r = Seq((2L, "kuberneets"), (3L, "postgres")).toDF("rk", "rv")
    val got = FuzzyJoin.byText(l, r, "lv", "rv", "lk", "rk",
      threshold = 0.4, charNGrams = 3, bands = 32, rowsPerBand = 2).get
    val pairs = got.select("lk", "rk").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("shared column names are rejected up front") {
    val r = invoices.withColumnRenamed("iname", "cname")
    assert(FuzzyJoin.byText(companies, r, "cname", "cname", "cid", "iid").isFailing)
  }
}
