package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("tokens drops empties, lowercases; tokenCount counts") {
    val df = Seq("  Hello   World  ", "", "one").toDF("t")
    val got = df.select(tokenCount($"t")).as[Int].collect().toSeq
    assert(got == Seq(2, 0, 1))
    assert(df.select(tokens($"t")).as[Seq[String]].head() == Seq("hello", "world"))
  }

  test("tokens use the portable whitespace class: \\x0B is a token character, not a separator") {
    // Java's \s matches vertical tab, RE2's (DuckDB's) does not — the
    // explicit class pins the DuckDB-replayable semantics: "a\x0Bb" is
    // ONE token on every engine
    val df = Seq("a\u000Bb c").toDF("t")
    assert(df.select(tokens($"t")).as[Seq[String]].head() == Seq("a\u000Bb", "c"))
    assert(df.select(normalizeText($"t")).as[String].head() == "a\u000Bb c")
  }

  test("wordShingles produces n-grams in order; short docs give empty") {
    val df = Seq("a b c d", "a b").toDF("t")
    val sh = df.select(wordShingles($"t", 3)).as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq.empty)
  }

  test("wordNgrams native kernel matches the split/slice/array_join formulation") {
    // the HOF formulation is the semantic reference (it is what the
    // DuckDB oracles replay); the native kernel must be value-identical
    // on whitespace runs, every separator class member, unicode
    // lowercasing, and short/empty docs
    val df = Seq(
      "  the quick   brown\tfox\njumps\r over\f the lazy dog  ",
      "ÅÄÖ Ünïcödé TÉXT",
      "ab c",
      "one",
      "",
      "a b",
      "tab\t\t\tseparated\twords"
    ).toDF("t")
    for (n <- Seq(1, 2, 3)) {
      val toks = filter(split(lower($"t"), "[ \\t\\n\\r\\f]+"), x => length(x) > 0)
      val ref = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      df.select(wordNgrams($"t", n).as("g"), ref.as("r"))
        .as[(Seq[String], Seq[String])].collect()
        .foreach { case (g, r) => assert(g == r, s"n=$n") }
    }
  }

  test("charShingles over normalized text") {
    val sh = Seq("ab  cd").toDF("t")
      .select(charShingles($"t", 3)).as[Seq[String]].head()
    assert(sh == Seq("ab ", "b c", " cd"))
  }

  test("fingerprint is whitespace/case-insensitive; rollingFingerprint is order-sensitive") {
    val df = Seq(
      ("A  B\tC", "a b c"),   // same normalized content
      ("c b a", "a b c")      // same tokens, different order
    ).toDF("x", "y")
    val fp = df.select(fingerprint($"x") === fingerprint($"y")).as[Boolean].collect()
    assert(fp(0) && fp(1) == false || fp(0)) // first row equal
    assert(fp(0))
    val rfp = df.select(rollingFingerprint($"x") === rollingFingerprint($"y")).as[Boolean].collect()
    assert(rfp(0) && !rfp(1))
  }

  test("minhash signatures of similar docs agree on most components") {
    val doc = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = ((1 to 59).map(i => s"w$i") :+ "zzz").mkString(" ")
    val far = (1 to 60).map(i => s"x$i").mkString(" ")
    val df = Seq((doc, near, far)).toDF("a", "b", "c")
      .select(
        minhashSignature(wordShingles($"a", 3), 64).as("sa"),
        minhashSignature(wordShingles($"b", 3), 64).as("sb"),
        minhashSignature(wordShingles($"c", 3), 64).as("sc"))
    val row = df.as[(Seq[Long], Seq[Long], Seq[Long])].head()
    val simNear = row._1.zip(row._2).count { case (x, y) => x == y } / 64.0
    val simFar = row._1.zip(row._3).count { case (x, y) => x == y } / 64.0
    assert(simNear > 0.8, s"near-dup minhash agreement $simNear")
    assert(simFar < 0.1, s"unrelated minhash agreement $simFar")
  }

  test("simhash: near-identical docs have small hamming distance, unrelated large") {
    val doc = (1 to 100).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 98).map(i => s"tok$i") :+ "aa" :+ "bb").mkString(" ")
    val far = (1 to 100).map(i => s"other$i").mkString(" ")
    val r = Seq((doc, near, far)).toDF("a", "b", "c")
      .select(
        bit_count(simhash($"a").bitwiseXOR(simhash($"b"))).as("hNear"),
        bit_count(simhash($"a").bitwiseXOR(simhash($"c"))).as("hFar"))
      .as[(Int, Int)].head()
    assert(r._1 < 12, s"near hamming ${r._1}")
    assert(r._2 > 20, s"far hamming ${r._2}")
  }

  test("jaccard of string arrays") {
    val r = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(TextFunctions.jaccard($"x", $"y")).as[Double].head()
    assert(math.abs(r - 0.5) < 1e-9)
  }

  test("langId: stopword and script heuristics") {
    val df = Seq(
      "the cat sat on the mat and it is fine",
      "der Hund und die Katze ist nicht da",
      "el perro y la casa de los gatos",
      "这 是 中文 文本",
      "xqzt blorp glork"
    ).toDF("t")
    val got = df.select(langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "zh", "und"))
  }

  test("qualityScore in [0,1]; longer clean text scores higher than junk") {
    val good = (1 to 60).map(_ => "reasonable words flowing nicely here").mkString(" ")
    val junk = "!!! ??? ,,, ;;; ### 12 34 !!"
    val r = Seq((good, junk)).toDF("g", "j")
      .select(qualityScore($"g"), qualityScore($"j")).as[(Double, Double)].head()
    assert(r._1 > 0.7 && r._2 < 0.4 && r._1 <= 1.0 && r._2 >= 0.0)
  }

  test("vector ops: dot, norm, cosine (native expressions)") {
    val df = Seq((Array(1f, 0f, 2f), Array(2f, 1f, 0f))).toDF("a", "b")
    val (d, na, cs) = df.select(
      vecDot($"a", $"b"), vecNorm($"a"), vecCosine($"a", $"b")).as[(Double, Double, Double)].head()
    assert(d == 2.0)
    assert(math.abs(na - math.sqrt(5)) < 1e-12)
    assert(math.abs(cs - 2.0 / (math.sqrt(5) * math.sqrt(5))) < 1e-12)
  }

  test("vecCosine handles zero vectors") {
    val r = Seq((Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
      .select(vecCosine($"a", $"b")).as[Double].head()
    assert(r == 0.0)
  }

  test("GraftFunctions.register exposes the kernels to SQL") {
    GraftFunctions.register(spark)
    Seq((Array(1f, 2f), Array(3f, 4f), "a b c a")).toDF("x", "y", "t")
      .createOrReplaceTempView("gf_test")
    val r = spark.sql("""
      SELECT vec_dot(x, y) AS d, round(vec_cosine(x, y), 6) AS c,
             simhash64(t) AS sh,
             jaccard_hashes(word_shingle_hashes(t, 2), word_shingle_hashes(t, 2)) AS j
      FROM gf_test""").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(2) != 0L)
    assert(r.getDouble(3) == 1.0)
    val r2 = spark.sql("""
      SELECT double_vec_cosine(CAST(x AS ARRAY<DOUBLE>), CAST(x AS ARRAY<DOUBLE>)) AS c,
             portable_vec_simhash(x, 16) AS ps,
             band_keys_from_simhash(portable_vec_simhash(x, 16), 4, 4) AS bk
      FROM gf_test""").head()
    assert(math.abs(r2.getDouble(0) - 1.0) < 1e-12)
    assert(r2.getSeq[Long](2).length == 4)
    // band keys reassemble to the signature (4 bands x 4 bits)
    val reassembled = r2.getSeq[Long](2).zipWithIndex.map { case (b, i) => b << (4 * i) }.sum
    assert(reassembled == r2.getLong(1))
    val r3 = spark.sql("""
      SELECT double_vec_dot(CAST(x AS ARRAY<DOUBLE>), CAST(y AS ARRAY<DOUBLE>)) AS d,
             keep_tokens_except(array('a','b','c','d'), array(1, 3)) AS kt,
             pack_bins_next_fit(array(40L, 50L, 20L, 90L), 100) AS pb
      FROM gf_test""").head()
    assert(r3.getDouble(0) == 11.0)
    assert(r3.getSeq[String](1) == Seq("a", "c"))
    assert(r3.getSeq[Int](2) == Seq(0, 0, 1, 2))
    // cluster assignment agrees with the column API and lands in range
    val r4 = spark.sql("SELECT portable_cluster(x, 8) AS c FROM gf_test").head()
    val viaCol = Seq((Array(1f, 2f))).toDF("x")
      .select(graft.operators.PortableLsh.clusterCol($"x", 8)).as[Int].head()
    assert(r4.getInt(0) == viaCol && r4.getInt(0) >= 0 && r4.getInt(0) < 8)
  }

  test("canonicalizeUrl: case, fragment, tracking params, default ports, bare-root slash") {
    val cases = Seq(
      ("HTTP://WWW.Example.COM:80/Path/Page?utm_source=x&a=1&fbclid=z#top",
        "http://www.example.com/Path/Page?a=1"),
      ("https://A.com:443/", "https://a.com"),
      ("https://a.com/x?utm_campaign=spring", "https://a.com/x"),
      ("http://a.com/?b=2", "http://a.com/?b=2"),      // real param: slash stays
      ("http://a.com:8080/x", "http://a.com:8080/x"),  // non-default port kept
      ("https://a.com/p?id=1&utm_a=2&id2=3", "https://a.com/p?id=1&id2=3"),
      // trackers strip case-insensitively — the same page crawled with
      // uppercased params must land on the same dedup key
      ("https://a.com/p?UTM_SOURCE=x&id=1&FbClId=z", "https://a.com/p?id=1")
    ).toDF("url", "want")
    val bad = cases.filter(canonicalizeUrl($"url") =!= $"want")
      .select("url", "want").collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("encoding anomaly counts: mojibake digraphs, U+FFFD, control chars") {
    val df = Seq(
      ("clean text, nothing wrong", 0L, 0L, 0L, false),
      ("caf\u00c3\u00a9 and \u00e2\u20ac\u2122quoted\u00e2\u20ac\u2122", 0L, 3L, 0L, true), // mojibake e-acute + two broken apostrophes
      ("lost \ufffd bytes \ufffd\ufffd", 3L, 0L, 0L, true),
      ("c\u0001tl and d\u007fel", 0L, 0L, 2L, true),
      ("caf\u00e9 is fine", 0L, 0L, 0L, false) // real accented char is NOT mojibake
    ).toDF("t", "wr", "wm", "wc", "ws")
    val bad = df.filter(
      replacementCharCount($"t") =!= $"wr" || mojibakeCount($"t") =!= $"wm" ||
        controlCharCount($"t") =!= $"wc" || encodingSuspect($"t") =!= $"ws")
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("unicodeNormalize: NFC composes, NFKC folds compatibility forms") {
    val df = Seq(
      "cafe\u0301",        // e + combining acute -> precomposed
      "A\u030Angstro\u0308m", // ring + diaeresis compose
      "d\u00e9j\u00e0",     // already NFC: unchanged
      "\uFB01le",          // LATIN SMALL LIGATURE FI: NFC keeps, NFKC folds to "fi"
      "\uFF21BC",          // FULLWIDTH A: NFKC folds to "A"
      "x\u00B2"            // superscript two: NFKC folds to "x2"
    ).toDF("t")
    val nfc = df.select(unicodeNormalize($"t", "NFC")).as[String].collect().toSeq
    assert(nfc == Seq("caf\u00e9", "\u00c5ngstr\u00f6m", "d\u00e9j\u00e0",
      "\uFB01le", "\uFF21BC", "x\u00B2"))
    val nfkc = df.select(unicodeNormalize($"t", "NFKC")).as[String].collect().toSeq
    assert(nfkc == Seq("caf\u00e9", "\u00c5ngstr\u00f6m", "d\u00e9j\u00e0",
      "file", "ABC", "x2"))
    // dedup motivation: byte-different spellings, one key after NFC
    val a = spark.sql("SELECT 1").select(lit("caf\u00e9").as("x"))
    val b = spark.sql("SELECT 1").select(lit("cafe\u0301").as("x"))
    assert(a.select(unicodeNormalize($"x")).as[String].head() ==
      b.select(unicodeNormalize($"x")).as[String].head())
    // invalid form fails fast at plan time, null passes through
    intercept[IllegalArgumentException] { unicodeNormalize($"t", "NFX") }
    val withNull = Seq[Option[String]](Some("a"), None).toDF("t")
    assert(withNull.select(unicodeNormalize($"t")).as[Option[String]]
      .collect().toSeq == Seq(Some("a"), None))
  }

  test("unigramEntropy and typeTokenRatio: hand-computed signals") {
    val df = Seq(
      "spam spam spam spam",      // one type: H = 0, ttr = 0.25
      "a b a b",                  // two types at 1/2 each: H = ln 2
      "w x y z",                  // all distinct: H = ln 4, ttr = 1
      "A a",                      // lowercased: one type
      ""                          // empty: both 0
    ).toDF("t")
    val got = df.select(unigramEntropy($"t").as("h"), typeTokenRatio($"t").as("r"))
      .as[(Double, Double)].collect().toSeq
    assert(math.abs(got(0)._1) < 1e-12 && got(0)._2 == 0.25)
    assert(math.abs(got(1)._1 - math.log(2)) < 1e-12 && got(1)._2 == 0.5)
    assert(math.abs(got(2)._1 - math.log(4)) < 1e-12 && got(2)._2 == 1.0)
    assert(math.abs(got(3)._1) < 1e-12 && got(3)._2 == 0.5)
    assert(got(4) == ((0.0, 0.0)))
    // 3:1 mix: H = -(3/4)ln(3/4) - (1/4)ln(1/4)
    val mix = Seq("x x x y").toDF("t")
      .select(unigramEntropy($"t")).as[Double].head()
    val want = -(0.75 * math.log(0.75)) - (0.25 * math.log(0.25))
    assert(math.abs(mix - want) < 1e-12)
  }

  test("domainSuffixes walks every parent domain") {
    val df = Seq("a.b.example.com", "example.com", "localhost").toDF("d")
    val got = df.select(domainSuffixes($"d")).as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Seq("a.b.example.com", "b.example.com", "example.com", "com"),
      Seq("example.com", "com"),
      Seq("localhost")))
  }

  test("hyperplaneBits: identical vectors share all bits, scaled vectors too") {
    val df = Seq((Array(1f, 2f, 3f, 4f), Array(2f, 4f, 6f, 8f), Array(-1f, 5f, -3f, 0.5f)))
      .toDF("a", "b", "c")
    val (ba, bb, bc) = df.select(
      hyperplaneBits($"a", 16), hyperplaneBits($"b", 16), hyperplaneBits($"c", 16))
      .as[(Long, Long, Long)].head()
    assert(ba == bb) // cosine-sim 1 ⇒ identical signature
    assert(ba != bc)
  }

  test("urls/urlDomain: extraction boundaries and case folding") {
    val df = Seq(
      "see https://Sub.Example.ORG/a/b_c%20d and http://m1.example.net/raw? done",
      "no links here",
      "bare http://x.io trailing,punct https://y.co/p."
    ).toDF("t")
    val got = df.select(TextFunctions.urls($"t").as("u"))
      .select(explode($"u").as("url"))
      .select(TextFunctions.urlDomain($"url").as("d"))
      .as[String].collect().toSeq.sorted
    // '?' and ',' sit outside the URL charclass; trailing '.' IS in it
    // (path dots are ubiquitous) — boundary behavior locked here
    assert(got == Seq("m1.example.net", "sub.example.org", "x.io", "y.co"))
  }
}
