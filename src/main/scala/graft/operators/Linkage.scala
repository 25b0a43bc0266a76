package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions

/** Blocked fuzzy record linkage (entity resolution) — match records of
  * one table to records of another on a noisy string key (names,
  * addresses, titles) where exact equality fails. The classic
  * Fellegi–Sunter shape, reduced to its scalable core: a cheap BLOCKING
  * key bounds the candidate space, the codegen'd Jaro–Winkler kernel
  * scores candidates, and a per-left rank keeps the best matches.
  *
  * Complements [[graft.operators.FuzzyJoin]] (MinHash set similarity —
  * right tool for long documents): Jaro–Winkler is the right tool for
  * SHORT strings where character transpositions and single-character
  * edits dominate and shingle sets are too small to band reliably.
  *
  * Scale posture: candidates exist only within a block, so the join is
  * an equi-join on the block key — never a cartesian. A viral block (all
  * names sharing a stop-word prefix) would be quadratic, so blocks whose
  * RIGHT side exceeds `maxBlockSize` are dropped BEFORE the join via a
  * partial-agg count + broadcast anti-join (the projectBipartite
  * discipline: caps prune candidates, never scores) and are queryable
  * via [[linkageCapReport]]. The per-left rank is a window partitioned
  * by left id — frames are candidate-set-sized, never global.
  *
  * Determinism: scores are ROUNDED (`scoreDigits`, with the house
  * `+1e-9` tie-shift) before thresholding and ranking. Jaro–Winkler
  * values are small-denominator rationals, so a raw-double threshold
  * sits one ulp from flipping when a score's rational equals the
  * threshold exactly (0.9 is attainable); rounding absorbs cross-engine
  * ulp noise, makes the threshold well-defined, and the rank tie-break
  * on `rightId` total and engine-portable.
  */
object Linkage {

  /** Default blocking key: first `prefixLen` bytes of the lowercased,
    * trimmed string. Cheap, order-preserving under suffix noise; misses
    * matches whose noise hits the prefix (pick a blocker that survives
    * your noise model — that's a recall decision, not a mechanical one). */
  def prefixBlocker(prefixLen: Int)(c: Column): Column =
    substring(lower(trim(c)), 1, prefixLen)

  /** Match `left` rows to `right` rows by Jaro–Winkler similarity of
    * `leftCol`/`rightCol`, within blocks, keeping per left row the
    * `topPerLeft` best matches at or above `threshold`.
    *
    * Returns `(leftId, rightId, score, rank)`, rank 1 = best; ties in
    * score break toward the smaller `rightId`.
    */
  def linkage(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      rightId: String,
      leftCol: String,
      rightCol: String,
      threshold: Double,
      topPerLeft: Int = 1,
      blocker: Column => Column = prefixBlocker(2),
      maxBlockSize: Long = 100000L,
      scoreDigits: Int = 6
  ): MayFail[DataFrame] = MayFail {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0, 1]: $threshold")
    require(topPerLeft >= 1, s"topPerLeft must be >= 1: $topPerLeft")
    require(maxBlockSize >= 1, s"maxBlockSize must be >= 1: $maxBlockSize")
    require(scoreDigits >= 1 && scoreDigits <= 9,
      s"scoreDigits must be in [1, 9]: $scoreDigits")
    val l = left.select(col(leftId).as("__lid"), col(leftCol).as("__ls"),
        blocker(col(leftCol)).as("__bk"))
      .filter(col("__ls").isNotNull && col("__bk").isNotNull)
    val r0 = right.select(col(rightId).as("__rid"), col(rightCol).as("__rs"),
        blocker(col(rightCol)).as("__bk"))
      .filter(col("__rs").isNotNull && col("__bk").isNotNull)
    val hot = r0.groupBy("__bk").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBlockSize)
      .select("__bk")
    val r = r0.join(broadcast(hot), Seq("__bk"), "left_anti")

    // Score DISTINCT (block, string) pairs, not id pairs: real-world
    // match keys repeat heavily (Zipf), so the quadratic kernel loop
    // runs once per distinct pair and ids re-attach linearly. With
    // all-unique strings this degenerates to the naive plan plus two
    // cheap distincts.
    val ld = l.select("__bk", "__ls").distinct()
    val rd = r.groupBy("__bk", "__rs").agg(count(lit(1)).as("__nr"))
    val scored = ld.join(rd, Seq("__bk"))
      .select(col("__bk"), col("__ls"), col("__rs"), col("__nr"),
        round(TextFunctions.jaroWinkler(col("__ls"), col("__rs"))
          + lit(1e-9), scoreDigits).as("score"))
      .filter(col("score") >= threshold)

    // Rank-safe pruning before re-expansion. Final rank orders by
    // (score desc, rid asc), so for one left row: every id of a
    // strictly-better-scored string outranks every id of a worse one,
    // and within a string only its `topPerLeft` smallest ids can make
    // the cut. Keep a string pair iff the FULL id count of strictly
    // better strings is < topPerLeft, and keep per right string its
    // `topPerLeft` smallest ids — expansion is O(topPerLeft) per left
    // row instead of O(ids-per-name).
    val wCum = Window.partitionBy("__ls")
      .orderBy(col("score").desc, col("__rs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTie = Window.partitionBy("__ls", "score")
    val kept = scored
      .withColumn("__cumAll", sum(col("__nr")).over(wCum))
      .withColumn("__tieCum",
        sum(col("__nr")).over(wTie.orderBy(col("__rs"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__better", col("__cumAll") - col("__tieCum"))
      .filter(col("__better") < topPerLeft)
      .select("__bk", "__ls", "__rs", "score")
    val rKeep = r.withColumn("__rr", row_number().over(
        Window.partitionBy("__bk", "__rs").orderBy(col("__rid"))))
      .filter(col("__rr") <= topPerLeft)
      .select("__bk", "__rs", "__rid")

    val expanded = l.join(kept, Seq("__bk", "__ls"))
      .join(rKeep, Seq("__bk", "__rs"))
    val w = Window.partitionBy("__lid")
      .orderBy(col("score").desc, col("__rid"))
    expanded.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topPerLeft)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        col("score"), col("rank"))
  }

  /** What [[linkage]]'s `maxBlockSize` cap would drop: per-block RIGHT
    * sizes for the blocks above the cap, hottest first. Query this
    * before trusting a capped linkage — silent recall loss is the
    * failure mode cap reports exist for. Returns `(block_key, n_right)`. */
  def linkageCapReport(
      right: DataFrame,
      rightCol: String,
      blocker: Column => Column,
      maxBlockSize: Long
  ): MayFail[DataFrame] = MayFail {
    require(maxBlockSize >= 1, s"maxBlockSize must be >= 1: $maxBlockSize")
    right.select(blocker(col(rightCol)).as("block_key"))
      .filter(col("block_key").isNotNull)
      .groupBy("block_key").agg(count(lit(1)).as("n_right"))
      .filter(col("n_right") > maxBlockSize)
      .orderBy(col("n_right").desc, col("block_key"))
  }
}
