package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for text sketches.
  *
  * The HOF formulation (transform(sequence(1,H), s -> array_min(transform(
  * shingles, sh -> xxhash64(sh, s))))) is semantically right but evaluates
  * interpreted lambdas per (seed x shingle) element — measured 453 s for
  * the MinHash stage at sf0.1 (5k docs), i.e. ~45 ms/row. These expressions
  * hash each shingle ONCE and derive the H signature slots with a 64-bit
  * finalizer mix (standard one-hash MinHash), in a tight JVM loop:
  * the same stage drops to under a second. Preference order per the build
  * rules: compose built-ins (tried, too slow here) -> custom Expression
  * (this) -> custom physical operator (unnecessary).
  *
  * CodegenFallback is acceptable: the per-row work dominates, and the
  * expression sits in a projection (not a join hot loop).
  */
object Sketches {

  /** splitmix64 finalizer — full-avalanche 64-bit mixer. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** MinHash signature over word shingles, computed straight from the
    * token array: array<long> of length numHashes.
    *
    * Each token is hashed once; a shingle's hash is the mixed combination
    * of its n consecutive token hashes (never materializing the shingle
    * string); slot k = min over shingles of mix64(shingleHash ^ seed_k).
    * Fewer than n tokens -> one shingle over all tokens (mirrors
    * TextFns.wordShingles).
    */
  case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val t = arr.numElements()
      val th = new Array[Long](t)
      var i = 0
      while (i < t) {
        th(i) = if (arr.isNullAt(i)) 0L else hashUtf8(arr.getUTF8String(i), 42L)
        i += 1
      }
      val sig = Array.fill(numHashes)(Long.MaxValue)
      val nShingles = math.max(t - shingleSize + 1, 1)
      val width = math.min(shingleSize, t)
      i = 0
      while (i < nShingles) {
        var h = 0x87c37b91114253d5L
        var j = 0
        while (j < width) { h = (h * 0x4cf5ad432745937fL) ^ th(i + j); j += 1 }
        val sh = mix64(h)
        var k = 0
        while (k < numHashes) {
          val hk = mix64(sh ^ (k * 0xff51afd7ed558ccdL))
          if (hk < sig(k)) sig(k) = hk
          k += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "graft_minhash_sig"
  }

  /** SimHash over array<string> tokens as nBands band values of bandBits
    * bits each (64 bits total by default): one xxh64 per token, bit i of
    * the hash votes +/-1; band value packs the sign bits.
    */
  case class SimHashBands(child: Expression, nBands: Int = 4, bandBits: Int = 16)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val nBits = nBands * bandBits
      val counts = new Array[Int](nBits)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = hashUtf8(arr.getUTF8String(i), 42L)
          var b = 0
          while (b < nBits) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      val bands = new Array[Long](nBands)
      var b = 0
      while (b < nBands) {
        var v = 0L
        var k = 0
        while (k < bandBits) {
          if (counts(b * bandBits + k) > 0) v |= (1L << k)
          k += 1
        }
        bands(b) = v
        b += 1
      }
      new GenericArrayData(bands)
    }
    override protected def withNewChildInternal(c: Expression): SimHashBands = copy(child = c)
    override def prettyName: String = "graft_simhash_bands"
  }

  /** Rolling fingerprint: min of xxh64 over all 8-byte windows of the
    * string (whole string if shorter) — winnowing with one global window.
    */
  case class Fingerprint64(child: Expression, window: Int = 8)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val n = s.numBytes
      if (n <= window) hashUtf8(s, 42L)
      else {
        var minH = Long.MaxValue
        var i = 0
        while (i <= n - window) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset + i, window, 42L)
          if (h < minH) minH = h
          i += 1
        }
        minH
      }
    }
    override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(child = c)
    override def prettyName: String = "graft_fingerprint64"
  }

  /** Dense dot product over two numeric arrays (float or double elements)
    * in a single primitive loop. The HOF formulation
    * (aggregate(zip_with(a, b, _*_), 0.0, _+_)) allocates a zipped array
    * and evaluates interpreted lambdas per element — it dominates the
    * embedding dedup/ANN profiles the same way the HOF MinHash did.
    * Matches zip_with semantics: a null element nulls the result, and a
    * length mismatch nulls the result too (zip_with pads the shorter side
    * with nulls, poisoning the sum) — a partial dot over min(len) would let
    * a dimension-mismatch bug upstream produce plausible-looking scores.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    private lazy val leftFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    private lazy val rightFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) return null
      val n = a.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y
        i += 1
      }
      s
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
    override def prettyName: String = "graft_dot"
  }

  /** Register the sketch expressions in a session's function registry so
    * they are callable via functions.call_function (idempotent).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // skip if already present: createOrReplaceTempFunction logs a WARN per
    // replacement, which floods bench/verify output when every catalog
    // query re-ensures registration on the same session
    if (reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
      return
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      es => MinHashSig(es.head, es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash_bands",
      es => SimHashBands(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_fingerprint64",
      es => Fingerprint64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotProduct(es.head, es(1)), "built-in")
  }
}
