package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for text sketches.
  *
  * The HOF formulation (transform(sequence(1,H), s -> array_min(transform(
  * shingles, sh -> hash(sh, s))))) is semantically right but evaluates
  * interpreted lambdas per (seed x shingle) element — measured 453 s for
  * the MinHash stage at sf0.1 (5k docs), i.e. ~45 ms/row. These expressions
  * hash each shingle/token ONCE and derive the signature slots with cheap
  * integer arithmetic, in a tight JVM loop: the same stage drops to under
  * a second. Preference order per the build rules: compose built-ins
  * (tried, too slow here) -> custom Expression (this) -> custom physical
  * operator (unnecessary).
  *
  * HASH FAMILY — md5-derived, SQL-replayable. The base hash of a string is
  * a prefix of its md5 (an engine-portable primitive: Spark `md5`, DuckDB
  * `md5`, and this JVM loop all agree on the hex digest), and everything
  * derived from it is pure 64-bit integer arithmetic with every
  * intermediate product below 2^63 — so a SQL oracle can replay the
  * sketches bit-exactly with `CAST('0x' || substr(md5(s), 1, n) AS BIGINT)`
  * and add/multiply/mod on BIGINT (the LCG-plane precedent from the
  * sign-LSH family):
  *
  *  - h32(s) = first 8 md5 hex chars as int, in [0, 2^32)
  *  - h60(s) = first 15 md5 hex chars as int, in [0, 2^60) — non-negative,
  *    so bit tests need no sign handling in engines without logical shift
  *  - MinHash slot k = min over shingles of (a_k·h32 + b_k) mod P with
  *    P = 4294967311 (smallest prime > 2^32) and LCG-derived coefficients
  *    a_k = 1 + (2654435761·(k+1) + 1013904223) mod 1073741789 < 2^30,
  *    b_k = (2654435761·(k+777) + 1013904223) mod P — the classic affine
  *    universal family; a_k·h32 < 2^62 never overflows a signed 64-bit int
  *    in ANY engine.
  *
  * xxhash64 (the previous family) is Spark-only — no other engine can
  * replay it, which forced the whole LSH dedup stack into rows-only
  * correctness checks. md5 on short shingles costs ~2-3x xxh64 and is
  * irrelevant against the shuffle-dominated dedup profile; in exchange
  * every candidate pair is driver-verifiable end to end.
  *
  * CodegenFallback is acceptable: the per-row work dominates, and the
  * expressions sit in projections (not a join hot loop).
  */
object Sketches {

  /** Affine-family modulus: smallest prime above 2^32. */
  val MinhashP: Long = 4294967311L

  def minhashA(k: Int): Long = 1L + (2654435761L * (k + 1) + 1013904223L) % 1073741789L
  def minhashB(k: Int): Long = (2654435761L * (k + 777) + 1013904223L) % MinhashP

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  @inline private def md5Of(buf: Array[Byte], len: Int): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.update(buf, 0, len)
    md.digest()
  }

  /** First 8 hex chars of the digest = first 4 bytes big-endian: [0, 2^32). */
  @inline private def h32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** First 15 hex chars of the digest = first 60 bits big-endian: [0, 2^60). */
  @inline private def h60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** MinHash signature over word shingles, computed straight from the
    * token array: array<long> of length numHashes.
    *
    * The shingle string is tokens i..i+n-1 joined with a single space
    * (exactly concat_ws(' ', slice(toks, i, n)) — nulls skipped, so the
    * bytes hashed here are the bytes any engine hashes for the same
    * shingle); fewer than n tokens -> one shingle over all tokens (mirrors
    * TextFns.wordShingles). Slot k = min over shingles of the affine
    * family (a_k·h32 + b_k) mod P described on [[Sketches]].
    */
  case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val aK: Array[Long] = Array.tabulate(numHashes)(minhashA)
    private lazy val bK: Array[Long] = Array.tabulate(numHashes)(minhashB)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val t = arr.numElements()
      val tb = new Array[Array[Byte]](t)
      var i = 0
      while (i < t) {
        tb(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
        i += 1
      }
      val sig = Array.fill(numHashes)(Long.MaxValue)
      val nShingles = math.max(t - shingleSize + 1, 1)
      val width = math.min(shingleSize, t)
      var buf = new Array[Byte](64)
      i = 0
      while (i < nShingles) {
        var len = 0
        var first = true
        var j = 0
        while (j < width) {
          val b = tb(i + j)
          if (b != null) {
            val need = len + b.length + 1
            if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
            if (!first) { buf(len) = ' '.toByte; len += 1 }
            System.arraycopy(b, 0, buf, len, b.length)
            len += b.length
            first = false
          }
          j += 1
        }
        val h = h32(md5Of(buf, len))
        var k = 0
        while (k < numHashes) {
          val v = (aK(k) * h + bK(k)) % MinhashP
          if (v < sig(k)) sig(k) = v
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
    * bits each (4 x 15 = 60 bits by default): one h60 per token, bit i of
    * the hash votes +/-1; band value packs the sign bits. 60 bits (not 64)
    * so the per-token hash stays a non-negative BIGINT in every engine —
    * bit tests are plain (h >> i) & 1 with no sign handling.
    */
  case class SimHashBands(child: Expression, nBands: Int = 4, bandBits: Int = 15)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val nBits = nBands * bandBits
      val counts = new Array[Int](nBits)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val tok = arr.getUTF8String(i).getBytes
          val h = h60(md5Of(tok, tok.length))
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

  /** Rolling fingerprint: min of h60 over all `window`-CHARACTER windows of
    * the string (whole string if shorter) — winnowing with one global
    * window. Character windows (not byte windows) so SQL `substr` replays
    * the identical slices.
    */
  case class Fingerprint64(child: Expression, window: Int = 8)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val n = s.numChars()
      if (n <= window) {
        val b = s.getBytes
        h60(md5Of(b, b.length))
      } else {
        var minH = Long.MaxValue
        var i = 0
        while (i <= n - window) {
          val b = s.substring(i, i + window).getBytes
          val h = h60(md5Of(b, b.length))
          if (h < minH) minH = h
          i += 1
        }
        minH
      }
    }
    override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(child = c)
    override def prettyName: String = "graft_fingerprint64"
  }

  /** All `window`-TOKEN rolling window hashes of a token array, in window
    * order: h60 of the window's tokens joined with a single space (the
    * exact bytes `concat_ws(' ', slice(toks, i, window))` would hash, and
    * the bytes a SQL oracle hashes for `array_to_string(w[i:i+window-1],
    * ' ')`). Fewer than `window` tokens -> ONE window over all tokens
    * (mirrors [[MinHashSig]]'s short-document convention, so exact copies
    * of short documents still collide). This is the signature stage of
    * substring-level duplicate-span detection (Lee et al.,
    * arXiv:2107.06499: cross-document repeated ~50-token spans): unlike
    * [[Fingerprint64]] (which keeps only the min hash), every window
    * survives, so downstream can COUNT shared spans per document, not just
    * detect them. Null tokens are skipped within a window, matching
    * concat_ws semantics. The shared buffer + per-token cached bytes keep
    * this one md5 per window with zero per-window allocation.
    */
  case class RollingWindowHashes(child: Expression, window: Int)
      extends UnaryExpression with CodegenFallback {
    require(window >= 1, "window must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val t = arr.numElements()
      val tb = new Array[Array[Byte]](t)
      var i = 0
      while (i < t) {
        tb(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
        i += 1
      }
      val nWindows = math.max(t - window + 1, 1)
      val width = math.min(window, t)
      val out = new Array[Long](nWindows)
      var buf = new Array[Byte](64)
      i = 0
      while (i < nWindows) {
        var len = 0
        var first = true
        var j = 0
        while (j < width) {
          val b = tb(i + j)
          if (b != null) {
            val need = len + b.length + 1
            if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
            if (!first) { buf(len) = ' '.toByte; len += 1 }
            System.arraycopy(b, 0, buf, len, b.length)
            len += b.length
            first = false
          }
          j += 1
        }
        out(i) = h60(md5Of(buf, len))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): RollingWindowHashes =
      copy(child = c)
    override def prettyName: String = "graft_rolling_hashes"
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

  /** Top-`nProbe` nearest IVF cells by dot(v, unit centroid): ONE
    * expression node carrying the whole codebook as a single literal child
    * — the scale-safe replacement for composing nCells separate
    * dot+struct+array_sort built-ins, whose expression TREE grew O(nCells)
    * and blew codegen past a few dozen cells. Here the tree is O(1)
    * however many cells the codebook has; scoring is one primitive loop
    * (same fold order as [[DotProduct]], so assignments are bit-identical
    * to the composed form), and top-k selection is O(nCells·k) insertion —
    * no per-row allocation-heavy sort.
    *
    * second: foldable array<struct<cell:int, unit:array<double>>> (the
    * UNIT-normalized codebook); third: foldable int nProbe. Both are
    * evaluated once per plan, not per row. Output mirrors the composed
    * form exactly: cell ids ascending by (score, cell), ties to the
    * HIGHER cell id, nProbe clamped to the codebook size. Dimension
    * mismatches score over the common prefix (callers guarantee
    * consistent dims; a null vector yields null).
    */
  case class NearestCells(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    private lazy val vecFloat =
      first.dataType.asInstanceOf[ArrayType].elementType == FloatType
    private lazy val codebook: (Array[Int], Array[Array[Double]]) = {
      val arr = second.eval().asInstanceOf[ArrayData]
      val n = arr.numElements()
      val cs = new Array[Int](n)
      val us = new Array[Array[Double]](n)
      var i = 0
      while (i < n) {
        val st = arr.getStruct(i, 2)
        cs(i) = st.getInt(0)
        us(i) = st.getArray(1).toDoubleArray()
        i += 1
      }
      (cs, us)
    }
    private lazy val nProbe = third.eval().asInstanceOf[Int]
    @inline private def gt(s1: Double, c1: Int, s2: Double, c2: Int): Boolean =
      s1 > s2 || (s1 == s2 && c1 > c2)
    override def nullSafeEval(v0: Any, cb0: Any, np0: Any): Any = {
      val v = v0.asInstanceOf[ArrayData]
      val nv = v.numElements()
      val (cells, units) = codebook
      val n = units.length
      val k = math.min(nProbe, n)
      // top-k kept ascending by (score, cell) in a bounded insertion buffer
      val topScore = new Array[Double](k)
      val topCell = new Array[Int](k)
      var filled = 0
      var c = 0
      while (c < n) {
        val u = units(c)
        val m = math.min(nv, u.length)
        var s = 0.0
        var i = 0
        while (i < m) {
          val x = if (vecFloat) v.getFloat(i).toDouble else v.getDouble(i)
          s += x * u(i)
          i += 1
        }
        val cell = cells(c)
        if (filled < k) {
          // initial fill: insertion sort into the ascending prefix
          var pos = filled
          while (pos > 0 && gt(topScore(pos - 1), topCell(pos - 1), s, cell)) {
            topScore(pos) = topScore(pos - 1); topCell(pos) = topCell(pos - 1); pos -= 1
          }
          topScore(pos) = s
          topCell(pos) = cell
          filled += 1
        } else if (gt(s, cell, topScore(0), topCell(0))) {
          // evict the minimum (slot 0), shifting left until order restores
          var pos = 0
          while (pos + 1 < k && gt(s, cell, topScore(pos + 1), topCell(pos + 1))) {
            topScore(pos) = topScore(pos + 1); topCell(pos) = topCell(pos + 1); pos += 1
          }
          topScore(pos) = s
          topCell(pos) = cell
        }
        c += 1
      }
      val out = new Array[Int](filled)
      System.arraycopy(topCell, 0, out, 0, filled)
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): NearestCells =
      copy(first = f, second = s, third = t)
    override def prettyName: String = "graft_nearest_cells"
  }

  /** Linear-classifier score over a TOKEN array (the
    * [[graft.operators.HashClassifier]] hot loop): the features are every
    * token plus every adjacent-pair bigram (token[i] + " " + token[i+1] —
    * exactly `concat_ws(" ", slice(toks, i, 2))`, the bytes the oracle
    * hashes); per feature, bucket = h32(md5(feature)) mod dims, weight =
    * h32(md5("w:" + bucket)) mod 2001 − 1000 (milli-units), score = Σ
    * weights. Identical arithmetic to the Column spelling
    * `conv(substring(md5(f),1,8),16,10) % dims`, but one tight JVM loop
    * per row: both the bigram construction (an interpreted `transform` +
    * `slice` + `concat_ws` per element — measured ~11 µs/bigram) and the
    * HOF fold (~10 µs/feature) collapse to ~1 µs/feature here (the
    * MinHash lesson above). Null tokens are skipped (tokenizers never
    * produce them).
    */
  case class ClassifierScore(child: Expression, dims: Int)
      extends UnaryExpression with CodegenFallback {
    require(dims > 0, "dims must be positive")
    override def dataType: DataType = LongType
    private def weightOf(f: Array[Byte], sum: Long): Long = {
      val bucket = h32(md5Of(f, f.length)) % dims
      val wk = ("w:" + bucket).getBytes("UTF-8")
      sum + h32(md5Of(wk, wk.length)) % 2001 - 1000
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val tb = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        tb(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
        i += 1
      }
      var sum = 0L
      i = 0
      while (i < n) { // unigrams
        if (tb(i) != null) sum = weightOf(tb(i), sum)
        i += 1
      }
      var buf = new Array[Byte](64)
      i = 0
      while (i < n - 1) { // adjacent bigrams
        val a = tb(i)
        val b = tb(i + 1)
        if (a != null && b != null) {
          val need = a.length + 1 + b.length
          if (need > buf.length) buf = new Array[Byte](math.max(need, buf.length * 2))
          System.arraycopy(a, 0, buf, 0, a.length)
          buf(a.length) = ' '.toByte
          System.arraycopy(b, 0, buf, a.length + 1, b.length)
          val bucket = h32(md5Of(buf, need)) % dims
          val wk = ("w:" + bucket).getBytes("UTF-8")
          sum += h32(md5Of(wk, wk.length)) % 2001 - 1000
        }
        i += 1
      }
      sum
    }
    override protected def withNewChildInternal(c: Expression): ClassifierScore =
      copy(child = c)
    override def prettyName: String = "graft_classifier_score"
  }

  /** Unicode NFC normalization (canonical composition: decomposed
    * e + COMBINING ACUTE becomes the single é codepoint) via the JDK's
    * `java.text.Normalizer` — deterministic, engine-portable semantics
    * (DuckDB's `nfc_normalize` implements the same UAX #15 form, which
    * is what makes the tx_unicode oracle replayable). The fast path
    * (`isNormalized`, true for most real text) allocates nothing.
    * Not expressible with built-in Spark functions — normalization
    * needs the Unicode composition tables; preference order per the
    * build rules lands on a custom Expression.
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val u = input.asInstanceOf[UTF8String]
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
    override def prettyName: String = "graft_nfc"
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
    reg.createOrReplaceTempFunction("graft_rolling_hashes",
      es => RollingWindowHashes(es.head, es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_cells",
      es => NearestCells(es.head, es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_classifier_score",
      es => ClassifierScore(es.head, es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      es => NfcNormalize(es.head), "built-in")
  }
}
