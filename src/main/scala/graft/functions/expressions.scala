package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row hot paths of dedup and
  * similarity search. These stay inside whole-stage codegen (real
  * `doGenCode`, not `CodegenFallback`) — at 100 TB the per-row cost of a
  * deserializing Scala UDF dominates, so the inner loops are static JVM
  * methods invoked straight from generated code.
  */
object VecOps {

  /** Dot product of two float vectors stored as `array<float>`. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def norm(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  /** Sign-bit signature of a vector against `nBits` deterministic,
    * seed-derived hyperplanes (random-hyperplane LSH for cosine space).
    * Bit i is set iff `dot(v, H_i) >= 0` where `H_i` entries are derived
    * from splitmix64(seed, i, j) — no hyperplane materialisation needed. */
  def hyperplaneBits(v: ArrayData, nBits: Int, seed: Long): Long = {
    var bits = 0L
    val dim = v.numElements()
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      var j = 0
      while (j < dim) {
        // splitmix64-derived pseudo-gaussian-ish coefficient in [-1, 1)
        val h = splitmix64(seed + i.toLong * 0x9E3779B97F4A7C15L + j.toLong)
        val coef = (h >> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
        acc += v.getFloat(j).toDouble * coef
        j += 1
      }
      if (acc >= 0.0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

/** 64-bit SimHash over a token array (document fingerprint for near-dup
  * detection). Each token is hashed to 64 bits; per bit position the
  * signature accumulates +1/-1 across tokens and the final bit is the
  * accumulator's sign. Equivalent semantics to the classic Charikar
  * simhash; token hash is xxhash64-style (splitmix over bytes) — stable
  * across JVMs and Scala versions.
  */
object SimHashImpl {

  def tokenHash(s: UTF8String): Long = {
    // FNV-1a 64 over UTF-8 bytes, then splitmix finalizer: stable, fast,
    // well-mixed — avoids depending on Scala's MurmurHash3 ordering.
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    VecOps.splitmix64(h)
  }

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = tokenHash(tokens.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecCosine =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

case class FloatVecNorm(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any = VecOps.norm(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.norm($c)")
  override protected def withNewChildInternal(newChild: Expression): FloatVecNorm =
    copy(child = newChild)
  override def prettyName: String = "vec_norm"
}

/** Random-hyperplane signature bits for cosine-space LSH bucketing. */
case class HyperplaneBits(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    VecOps.hyperplaneBits(a.asInstanceOf[ArrayData], nBits, seed)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecOps.hyperplaneBits($c, $nBits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bits"
}
