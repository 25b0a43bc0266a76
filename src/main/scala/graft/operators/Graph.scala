package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Link-analysis over edge lists — the graph counterpart of the
  * connected-components pass inside [[Dedup.transitive]]. PageRank
  * scores source authority for crawl prioritization and dedup
  * tie-breaking ("keep the copy from the highest-ranked host").
  *
  * Arithmetic is FIXED-POINT on BIGINT mass units rather than double:
  * floating-point PageRank sums contributions in whatever order the
  * partial aggregates arrive, so two runs (or two engines) disagree in
  * the last ulps and the result is not reproducible bit-for-bit.
  * Integer mass makes every sum exact and order-independent — the rank
  * vector is a pure function of the graph, at any parallelism, which is
  * what lets a 1000-executor run be replayed and audited. Floor
  * division leaks < 1 mass unit per edge per iteration (≈ 1e-9 of a
  * node's mass at the default scale) — bounded, deterministic, and
  * documented here rather than hidden in float noise.
  */
object Graph {

  /** Out-degrees of `src` over the deduplicated edge list — also the
    * shape used internally by [[pageRank]].
    * Returns `(node, outdeg: bigint)`. */
  def outDegrees(edges: DataFrame, srcCol: String, dstCol: String): MayFail[DataFrame] =
    MayFail {
      edges.select(col(srcCol).as("node"), col(dstCol).as("__dst"))
        .distinct()
        .groupBy("node").agg(count(lit(1)).as("outdeg"))
    }

  /** Fixed-point PageRank with damping `dampNum/dampDen` (default
    * 17/20 = 0.85) for `iterations` rounds over the distinct edge set.
    *
    * Every node starts with `scale` mass units. Per iteration, each
    * node keeps teleport mass `(scale * (dampDen-dampNum)) div dampDen`
    * and receives `(rank * dampNum) div (dampDen * outdeg)` along each
    * in-edge, plus an equal share of the damped mass of dangling
    * (out-degree-0) nodes. All sums are BIGINT — exact in any order.
    *
    * Returns `(node, rank: bigint, score: double)` where `score` is the
    * rank normalized by total initial mass (`n * scale`), so scores sum
    * to ≈ 1 (minus the documented floor leakage).
    *
    * Plan per iteration: ranks ⋈ edges on the source (both sides hash
    * on the same key; the slim persisted edge/degree frames are reused
    * every round), ONE partial-agg shuffle summing in-mass per dst, and
    * a left join back onto the node set. The dangling term is a 1-row
    * aggregate per iteration — the standard driver-side scalar every
    * distributed PageRank (including GraphX's) pays. Lineage is cut
    * with `localCheckpoint` every `checkpointEvery` rounds so deep
    * iteration counts don't grow the plan unboundedly; all persisted
    * frames are released before returning (the library's unpersist
    * discipline).
    *
    * `scale` must satisfy `n * scale * dampNum < Long.MaxValue`
    * (enforced) — at 1e9 nodes pick `scale = 1e8`; precision is
    * 1/scale of a node's share, far below any ranking decision.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      scale: Long = 1000000000L,
      dampNum: Long = 17L,
      dampDen: Long = 20L,
      checkpointEvery: Int = 5
  ): MayFail[DataFrame] = MayFail {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(scale > 0, s"scale must be positive: $scale")
    require(dampNum > 0 && dampDen > dampNum,
      s"damping must satisfy 0 < dampNum < dampDen: $dampNum/$dampDen")
    require(checkpointEvery >= 0, s"checkpointEvery must be >= 0: $checkpointEvery")

    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .persist()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    require(scale <= Long.MaxValue / dampNum / n,
      s"n * scale * dampNum overflows Long: n=$n scale=$scale")

    val teleport = (scale * (dampDen - dampNum)) / dampDen
    var ranks = nodes.withColumn("rank", lit(scale))
    for (i <- 1 to iterations) {
      val dangling = ranks.join(outdeg, Seq("node"), "left_anti")
        .agg(coalesce(sum(expr(s"(rank * $dampNum) div $dampDen")), lit(0L)))
        .first().getLong(0)
      val perNodeBase = teleport + dangling / n
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, e("src") === outdeg("node"))
        .select(e("dst").as("node"),
          expr(s"(rank * $dampNum) div (${dampDen}L * outdeg)").as("c"))
      val in = contrib.groupBy("node").agg(sum("c").as("in_mass"))
      ranks = nodes.join(in, Seq("node"), "left")
        .select(col("node"),
          (coalesce(col("in_mass"), lit(0L)) + lit(perNodeBase)).as("rank"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    val result = ranks.withColumn("score",
      col("rank").cast("double") / lit((n * scale).toDouble))
      .localCheckpoint(true)
    e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    result
  }
}
