package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the native kernels — these run without a Spark
  * session (the kernels are plain JVM statics, which is also what makes
  * them codegen-friendly). */
class KernelPropertySpec extends AnyFunSuite {

  // deterministic sample-based property loop (scalatest/scalacheck bridge
  // is not in the offline cache; a seeded loop gives the same coverage)
  private val rnd = new scala.util.Random(42)
  private def samples(n: Int)(body: => Unit): Unit = (0 until n).foreach(_ => body)
  private def randLongs(max: Int, bound: Long = 50L): List[Long] =
    List.fill(rnd.nextInt(max))(rnd.nextLong() % bound)

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)

  test("jaccardLongs matches a set-based reference implementation") {
    samples(200) {
        val a = randLongs(30); val b = randLongs(30)
        val expect =
          if (a.isEmpty && b.isEmpty) 0.0
          else (a.toSet & b.toSet).size.toDouble / (a.toSet | b.toSet).size
        val got = TextHashImpl.jaccardLongs(arr(a), arr(b))
        assert(math.abs(got - expect) < 1e-12, s"a=$a b=$b got=$got expect=$expect")
    }
  }

  test("jaccardLongs is symmetric and bounded") {
    samples(200) {
      val a = randLongs(30, Long.MaxValue); val b = randLongs(30, Long.MaxValue)
      val ab = TextHashImpl.jaccardLongs(arr(a), arr(b))
      val ba = TextHashImpl.jaccardLongs(arr(b), arr(a))
      assert(ab == ba && ab >= 0.0 && ab <= 1.0)
    }
  }

  test("minhash agreement estimates true jaccard (statistical bound)") {
    // fixed corpus pairs with known overlap fractions
    for (overlap <- Seq(0.2, 0.5, 0.8)) {
      val n = 200
      val shared = (0 until (n * overlap).toInt).map(i => s"s$i ")
      val a = shared ++ ((0 until (n - shared.size)).map(i => s"a$i "))
      val b = shared ++ ((0 until (n - shared.size)).map(i => s"b$i "))
      val trueJ = shared.size.toDouble / (a.size + b.size - shared.size)
      val k = 256
      def sig(tokens: Seq[String]): Array[Long] = {
        val hashes = tokens.map(t => SimHashImpl.tokenHash(UTF8String.fromString(t)))
        TextHashImpl.minsFromHashes(arr(hashes), k, 42L)
      }
      val agree = sig(a).zip(sig(b)).count { case (x, y) => x == y }.toDouble / k
      assert(math.abs(agree - trueJ) < 0.12,
        s"overlap=$overlap trueJ=$trueJ minhash=$agree")
    }
  }

  test("wordShingleHashes: count = tokens-n+1; invariant to case and extra whitespace") {
    val s1 = UTF8String.fromString("The quick  Brown fox JUMPS over the dog")
    val s2 = UTF8String.fromString("the quick brown fox jumps over the dog")
    val h1 = TextHashImpl.wordShingleHashes(s1, 3, 42L)
    val h2 = TextHashImpl.wordShingleHashes(s2, 3, 42L)
    assert(h1.toLongArray.toSeq == h2.toLongArray.toSeq)
    assert(h1.numElements() == 8 - 3 + 1)
    // fewer tokens than n → empty
    assert(TextHashImpl.wordShingleHashes(UTF8String.fromString("a b"), 3, 42L).numElements() == 0)
  }

  test("charShingleHashes normalizes whitespace runs") {
    val a = TextHashImpl.charShingleHashes(UTF8String.fromString("ab   cd"), 3, 42L)
    val b = TextHashImpl.charShingleHashes(UTF8String.fromString("ab cd"), 3, 42L)
    assert(a.toLongArray.toSeq == b.toLongArray.toSeq)
  }

  test("simhash of permuted tokens is identical; disjoint vocab far apart") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val permuted = scala.util.Random.shuffle((1 to 80).map(i => s"w$i").toList).mkString(" ")
    val ha = SimHashText.compute(UTF8String.fromString(base), 42L)
    val hb = SimHashText.compute(UTF8String.fromString(permuted), 42L)
    assert(ha == hb) // bag-of-words: order-invariant
    val far = SimHashText.compute(
      UTF8String.fromString((1 to 80).map(i => s"x$i").mkString(" ")), 42L)
    assert(SimHashImpl.hamming(ha, far) > 15)
  }

  test("hyperplane bits: scale-invariant, deterministic across calls") {
    val v = new GenericArrayData(Array.tabulate(32)(i => math.sin(i).toFloat))
    val v2 = new GenericArrayData(Array.tabulate(32)(i => (math.sin(i) * 7.5).toFloat))
    assert(VecOps.hyperplaneBits(v, 16, 42L) == VecOps.hyperplaneBits(v2, 16, 42L))
    assert(VecOps.hyperplaneBits(v, 16, 42L) == VecOps.hyperplaneBits(v, 16, 42L))
  }

  test("vector kernels agree with naive implementations") {
    samples(200) {
        val a = List.fill(16)(rnd.nextFloat() * 10f - 5f)
        val b = List.fill(16)(rnd.nextFloat() * 10f - 5f)
        val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray)
        val bd = new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray)
        val dotRef = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        assert(math.abs(VecOps.dot(ad, bd) - dotRef) < 1e-9)
        assert(math.abs(VecOps.norm(ad) - math.sqrt(a.map(x => x.toDouble * x).sum)) < 1e-9)
    }
  }

  test("keepExcept matches a naive index filter for random sorted drop lists") {
    samples(300) {
      val nT = rnd.nextInt(40)
      val toks = List.fill(nT)(UTF8String.fromString("t" + rnd.nextInt(10)))
      // random subset of indices, sorted — may be empty, full, or contain
      // out-of-range values (tolerated by contract)
      val drops = (List.fill(rnd.nextInt(10))(rnd.nextInt(nT + 5))).distinct.sorted
      val got = SpanImpl.keepExcept(
        new GenericArrayData(toks.toArray),
        new GenericArrayData(drops.map(Int.box).toArray))
      val expect = toks.zipWithIndex.collect { case (t, i) if !drops.contains(i) => t }
      assert((0 until got.numElements()).map(got.getUTF8String) == expect,
        s"toks=${toks.map(_.toString)} drops=$drops")
    }
  }

  test("nextFit matches a sequential reference and respects capacity") {
    samples(300) {
      val counts = List.fill(rnd.nextInt(30))(rnd.nextLong() % 120L) // may be negative
      val cap = 1L + rnd.nextInt(100)
      val got = PackImpl.nextFit(
        new GenericArrayData(counts.toArray), cap)
      val gotBins = (0 until got.numElements()).map(got.getInt)
      // sequential reference with the documented rule
      var running = 0L; var bin = 0
      val expect = counts.zipWithIndex.map { case (c0, i) =>
        val c = math.max(c0, 0L)
        if (i == 0) running = c
        else if (running + c > cap) { bin += 1; running = c }
        else running += c
        bin
      }
      assert(gotBins == expect, s"counts=$counts cap=$cap")
      // invariants: bins are nondecreasing and dense; every bin's sum fits
      // unless it holds a single oversize element
      assert(gotBins.sliding(2).forall(w => w.length < 2 || w(1) - w(0) >= 0))
      assert(gotBins.sliding(2).forall(w => w.length < 2 || w(1) - w(0) <= 1))
      gotBins.zip(counts).groupBy(_._1).values.foreach { members =>
        val tot = members.map(m => math.max(m._2, 0L)).sum
        assert(tot <= cap || members.length == 1)
      }
    }
  }

  test("wordNgrams matches a sliding-window reference on random text") {
    // adversarial alphabet: every separator-class member, multi-byte
    // unicode (2- and 3-byte UTF-8), uppercase needing lowercasing,
    // punctuation glued to words
    val alphabet = "abcXYZ  \t\n\r\fæØ魚9'-"
    samples(300) {
      val s = List.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val n = 1 + rnd.nextInt(3)
      val toks = s.toLowerCase(java.util.Locale.ROOT)
        .split("[ \t\n\r\f]+").filter(_.nonEmpty).toSeq
      val expect =
        if (toks.size < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val got = TextHashImpl.wordNgrams(UTF8String.fromString(s), n, lowercase = true)
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq == expect, s"s=${s.replace("\n", "\\n")} n=$n")
      // lowercase = false must preserve the original token bytes
      val raw = TextHashImpl.wordNgrams(UTF8String.fromString(s), n, lowercase = false)
      val rawSeq = (0 until raw.numElements()).map(i => raw.getUTF8String(i).toString)
      val rawToks = s.split("[ \t\n\r\f]+").filter(_.nonEmpty).toSeq
      val rawExpect =
        if (rawToks.size < n) Seq.empty
        else rawToks.sliding(n).map(_.mkString(" ")).toSeq
      assert(rawSeq == rawExpect)
    }
  }

  // the naive reference: one left-to-right fold per merge, in order —
  // exactly the pre-r12 chained functions.aggregate semantics
  private def bpeApplyRef(
      word: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word) { case (syms, (l, r)) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == l && x == r) {
          out.remove(out.length - 1); out += (l + r)
        } else out += x
      }
      out.toSeq
    }

  private def bpeRanked(
      word: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
    val in = new GenericArrayData(
      word.map(UTF8String.fromString).toArray[Any])
    val out = BpeApplyImpl.apply(in, new BpeRankIndex(merges))
    (0 until out.numElements()).map(out.getUTF8String(_).toString)
  }

  test("BPE rank-map AND sequential kernels equal the per-merge " +
      "greedy-fold reference on random words and random merge tables") {
    val alphabet = "abcd"
    samples(400) {
      val word = List.fill(1 + rnd.nextInt(24))(
        alphabet(rnd.nextInt(alphabet.length)).toString)
      // random merge table over random (possibly multi-char) symbols —
      // include merges of previously-merged tokens, repeats, doubles,
      // and NON-prefix-closed entries (tokens no earlier merge builds):
      // the rank-map floor rule must match the fold on ALL of them
      val merges = List.fill(rnd.nextInt(20)) {
        def sym() = List.fill(1 + rnd.nextInt(2))(
          alphabet(rnd.nextInt(alphabet.length))).mkString
        (sym(), sym())
      }
      val in = new GenericArrayData(
        word.map(UTF8String.fromString).toArray[Any])
      val table = merges.flatMap(p => Seq(p._1, p._2)).toArray
      val seqGot = {
        val out = BpeApplyImpl.applySequential(in, table)
        (0 until out.numElements()).map(out.getUTF8String(_).toString)
      }
      val want = bpeApplyRef(word, merges)
      assert(seqGot == want,
        s"sequential: word=$word merges=$merges got=$seqGot want=$want")
      val rankGot = bpeRanked(word, merges)
      assert(rankGot == want,
        s"rank-map: word=$word merges=$merges got=$rankGot want=$want")
    }
  }

  test("BPE rank-map kernel equals the greedy-fold reference under " +
      "DEEP merge tables (>= 32k entries — the production-vocab path " +
      "the sequential kernel could not afford)") {
    // a 64-deep prefix-closed run chain (a^i + a -> a^{i+1}) so long
    // merges actually FIRE, padded to 32768 entries with bounded
    // dormant pairs (tokens a real vocabulary's size — run-shaped
    // padding would make the table itself ~1 GiB of strings); the
    // table SIZE is the r12-ask regression target (the old kernel
    // swept 32k times per word)
    val chain = Seq.tabulate(64)(i => ("a" * (i + 1), "a"))
    // a tail of pairs over 'b'/'c' so multi-symbol interleavings merge
    // under ranks far apart in the table
    val tail = Seq(("b", "c"), ("bc", "bc"), ("c", "b"), ("a", "bc"))
    val pad = Seq.tabulate(32768 - chain.size - tail.size)(
      i => ("x" + i, "y" + i))
    val table = chain ++ pad ++ tail
    val alphabet = "abc"
    samples(60) {
      val word = List.fill(1 + rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length)).toString)
      val want = bpeApplyRef(word, table)
      val got = bpeRanked(word, table)
      assert(got == want, s"word=$word got=$got want=$want")
    }
    // and a targeted long-run word: 200 a's — pass 0 pairs them into
    // 100 "aa" tokens and no (aa, a) adjacency survives, so the deep
    // chain is a 32k-entry table where ONE rank fires; the rank-map
    // kernel must pay nothing for the 32767 dormant entries
    val runWord = List.fill(200)("a")
    val runWant = bpeApplyRef(runWord, table)
    assert(bpeRanked(runWord, table) == runWant)
    assert(runWant == Seq.fill(100)("aa"))
  }

  test("VocabSegmentImpl equals the greedy longest-match reference on " +
      "random words and vocabularies; non-UNK pieces tile the word") {
    // independent reference: filter ALL vocab entries prefixing the
    // remaining characters, take the longest, whole-word UNK on a gap
    def ref(word: String, vocab: Set[String], unk: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var rest = word
      while (rest.nonEmpty) {
        val hits = vocab.filter(rest.startsWith)
        if (hits.isEmpty) return Seq(unk)
        val tok = hits.maxBy(_.length)
        out += tok
        rest = rest.substring(tok.length)
      }
      out.toSeq
    }
    val alphabet = "abc"
    samples(400) {
      val word = List.fill(1 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      // random vocab of 1-3 char entries — single chars NOT guaranteed,
      // so the UNK path genuinely fires
      val vocab = List.fill(1 + rnd.nextInt(6))(
        List.fill(1 + rnd.nextInt(3))(
          alphabet(rnd.nextInt(alphabet.length))).mkString).toSet
      val idx = new VocabIndex(vocab.toSeq, "<unk>")
      val out = VocabSegmentImpl.apply(UTF8String.fromString(word), idx)
      val got = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      val want = ref(word, vocab, "<unk>")
      assert(got == want, s"word=$word vocab=$vocab got=$got want=$want")
      if (got != Seq("<unk>"))
        assert(got.mkString("") == word, "pieces must tile the word")
    }
  }
}
