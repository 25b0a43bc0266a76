package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hyperplane LSH with an md5-derived sign matrix, so the signature of a
  * vector is reproducible bit-for-bit by any engine with `md5()` — the
  * cross-engine-validation variant of the seeded-splitmix hyperplanes in
  * [[graft.functions.VectorFunctions.hyperplaneBits]].
  *
  * Sign `s(j)(i)` (hyperplane `j`, vector component `i`) is bit 0 of the
  * first 15 hex chars of `md5("j_i")` mapped to ±1 — in SQL:
  * `CAST(('0x' || substring(md5(j || '_' || i), 1, 15)) AS BIGINT) & 1`.
  * Signature bit j is `[Σ_i v_i · s(j)(i) > 0]`; 60 bits by default so the
  * packed signature stays positive in a signed int64. The projection is
  * accumulated in double on both engines; a bit can only disagree if the
  * projection lands within float-summation-order noise (~1e-13) of zero,
  * vanishingly unlikely for real-valued embeddings.
  */
object PortableLsh {

  /** ±1 sign for hyperplane `j`, component `i` — delegates to the single
    * source of the md5 formula,
    * [[graft.functions.PortableVecSimhashImpl.sign]]. */
  def sign(j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    graft.functions.PortableVecSimhashImpl.sign(md, j, i).toInt
  }

  def signMatrix(bits: Int, dim: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dim)((j, i) =>
      graft.functions.PortableVecSimhashImpl.sign(md, j, i).toInt)
  }

  /** Packed hyperplane signature of `vecCol` (an `array<float>`) as a
    * single BIGINT column — one native codegen'd multiply-add loop per row
    * (a 60×64 inline expression tree overflows Janino's method limit, so
    * this is a [[graft.functions.PortableVecSimhash]] Catalyst expression,
    * same pattern as the other hot-loop kernels). */
  def vecSimhashCol(vecCol: Column, bits: Int = 60): Column = {
    require(bits > 0 && bits <= 60, s"bits out of range: $bits")
    graft.functions.FunctionBridge.column(
      graft.functions.PortableVecSimhash(
        graft.functions.FunctionBridge.expression(vecCol), bits))
  }

  /** Nearest-portable-centroid cluster id of `vecCol` — argmax of the
    * md5-sign projections over `nClusters` hyperplanes (ties → smallest
    * index). See [[graft.functions.PortableClusterImpl]] for the
    * cross-engine contract; in SQL the assignment is
    * `row_number() OVER (PARTITION BY id ORDER BY p DESC, j) = 1` over
    * the same `signs`/`proj` CTEs as the signature. */
  def clusterCol(vecCol: Column, nClusters: Int): Column = {
    // no 60-bit packing here (argmax, not a signature); the ceiling only
    // bounds the cached sign matrix
    require(nClusters > 0 && nClusters <= 65536, s"nClusters out of range: $nClusters")
    graft.functions.FunctionBridge.column(
      graft.functions.PortableClusterAssign(
        graft.functions.FunctionBridge.expression(vecCol), nClusters))
  }

  /** `(id, sh)` signature frame for [[Dedup.simhashPairsFrom]]. */
  def vecSimhash(df: DataFrame, vecCol: String, idCol: String,
                 bits: Int = 60): DataFrame =
    df.select(col(idCol).as("id"), vecSimhashCol(col(vecCol), bits).as("sh"))
}
