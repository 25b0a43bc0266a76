package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API and catalyst `Expression`s
  * (Spark 4 moved the converters to `sql.classic.ExpressionUtils`). */
object FunctionBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)
}

/** Embedding-vector column functions (`array<float>` columns). All are
  * native codegen'd Catalyst expressions — see `expressions.scala`. */
object VectorFunctions {
  import FunctionBridge._

  def vecDot(a: Column, b: Column): Column =
    column(FloatVecDot(expression(a), expression(b)))

  def vecNorm(a: Column): Column = column(FloatVecNorm(expression(a)))

  def vecCosine(a: Column, b: Column): Column =
    column(FloatVecCosine(expression(a), expression(b)))

  /** Cosine over `array<double>` columns (derived weight vectors). */
  def vecCosineDouble(a: Column, b: Column): Column =
    column(DoubleVecCosine(expression(a), expression(b)))

  /** Dot product over `array<double>` columns — the cosine of two UNIT
    * vectors at a third of the arithmetic. */
  def vecDotDouble(a: Column, b: Column): Column =
    column(DoubleVecDot(expression(a), expression(b)))

  /** Random-hyperplane LSH signature (cosine space): `nBits` sign bits
    * against deterministic seed-derived hyperplanes. Vectors with small
    * angular distance share long bit-prefixes with high probability. */
  def hyperplaneBits(v: Column, nBits: Int = 16, seed: Long = 42L): Column =
    column(HyperplaneBits(expression(v), nBits, seed))

  /** Product-quantization codes over the portable md5-sign codebook:
    * `m` subspace codes, each in `[0, k)`. */
  def portablePqCodes(v: Column, m: Int, k: Int): Column =
    column(PortablePqCodes(expression(v), m, k))

  /** Flattened per-query ADC lookup table for [[portablePqCodes]]:
    * `table[s·k + c]` = projection of query subvector `s` onto codebook
    * row `(s, c)`. */
  def portablePqTable(v: Column, m: Int, k: Int): Column =
    column(PortablePqTable(expression(v), m, k))

  /** Asymmetric-distance score: `Σ_s table[s·k + codes[s]]` — `m` array
    * reads per candidate instead of a full-dimension dot product. */
  def pqAdcScore(codes: Column, table: Column): Column =
    column(PqAdcScore(expression(codes), expression(table)))

  /** PQ codes against a caller-supplied flat row-major codebook
    * (`[(s·k + c)·sub + i]` doubles) — per-row, no shuffle. `l2` picks
    * nearest-center assignment (k-means convention) vs argmax-dot. */
  def codebookPqCodes(v: Column, cb: Array[Double], m: Int, k: Int,
      l2: Boolean): Column =
    column(CodebookPqCodes(expression(v), cb, m, k, l2))

  /** Flattened per-query ADC table for [[codebookPqCodes]] under the
    * same codebook/metric; score candidates with [[pqAdcScore]]. */
  def codebookPqTable(v: Column, cb: Array[Double], m: Int, k: Int,
      l2: Boolean): Column =
    column(CodebookPqTable(expression(v), cb, m, k, l2))

  /** The `nProbe` nearest coarse cells (full-dim L2, best first) over a
    * flat cell-major centroid matrix; `nProbe = 1` is the corpus-side
    * cell assignment. */
  def codebookProbes(v: Column, cb: Array[Double], k: Int, nProbe: Int): Column =
    column(CodebookProbes(expression(v), cb, k, nProbe))
}
