package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Search probe for StreamSpec's capped-band parity fixture (not part of
  * the API): find a deterministic text triple (refHot, refDup, streamDoc)
  * where, at bands=16 / rowsPerBand=4 / maxBucket=1,
  *  - refDup and refHot collide in ≥ 1 band (those buckets hold 2 docs →
  *    dropped by the cap),
  *  - streamDoc near-dups refDup (jaccard ≥ 0.7),
  *  - the EARLIEST stream-vs-refDup colliding band is one of the capped
  *    bands, and a later colliding band survives —
  * i.e. exactly the configuration where a raw earlier-band key-equality
  * predicate loses the pair but the surviving-band predicate keeps it. */
object NeardupCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu stone river cloud " +
      "ember").split(" ").toVector
    require(base.length == 30)

    // candidates: id 0 = refDup (the base text); 1000+a = refHot variant
    // (replace 12 words spread by seed a — partial band overlap with the
    // base); 2000+b = stream variant (replace 1 word at position b)
    val hotVariants = (for (a <- 0 until 40; k <- Seq(2, 3, 4, 6)) yield {
      val repl = (0 until k).map(i => (i * 7 + a) % 30).toSet
      (10000L + a * 10 + k, base.indices.map(i =>
        if (repl(i)) s"w${a}x$i" else base(i)).mkString(" "))
    }).toVector
    val streamVariants = (0 until 30).map { b =>
      (2000L + b, base.indices.map(i =>
        if (i == b) s"q$b" else base(i)).mkString(" "))
    }
    val all = ((0L, base.mkString(" ")) +: (hotVariants ++ streamVariants))
      .toDF("id", "text")

    val sh = graft.operators.Dedup.minhashShingled(all, "text", "id", 3)
    val keyed = graft.operators.Dedup.minhashKeyed(sh, 16, 4)
      .select(col("id"), col("__keys"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).toVector).toMap
    val shingles = sh.collect().map(r => r.getLong(0) ->
      r.getSeq[Long](1).toSet).toMap

    val kDup = keyed(0L)
    var found = 0
    for ((ha, _) <- hotVariants; (sb, _) <- streamVariants if found < 8) {
      val kHot = keyed(ha)
      val kS = keyed(sb)
      val cX = (0 until 16).filter(j => kDup(j) == kHot(j)).toSet
      val cS = (0 until 16).filter(j => kDup(j) == kS(j))
      val inter = shingles(0L).intersect(shingles(sb)).size.toDouble
      val jac = inter / (shingles(0L) ++ shingles(sb)).size
      // also require the stream doc NOT to collide with refHot in any
      // surviving band (keeps the expected pair set easy to reason about)
      val cSH = (0 until 16).filter(j => kHot(j) == kS(j)).toSet
      if (cS.nonEmpty && cX.nonEmpty && jac >= 0.7 &&
          cX.contains(cS.head) && cS.exists(j => !cX.contains(j)) &&
          cSH.subsetOf(cX)) {
        println(s"FOUND hot=$ha stream=$sb jac=$jac cX=${cX.toSeq.sorted} " +
          s"cS=$cS cSH=${cSH.toSeq.sorted}")
        found += 1
      }
    }
    if (found == 0) println("NONE — widen the variant grid")
    spark.stop()
  }
}
