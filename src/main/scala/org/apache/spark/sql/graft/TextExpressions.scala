package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup hot path.
  *
  * The built-in formulation of word n-gram shingling —
  * `transform(sequence(1, size(ts)-n+1), i -> concat_ws(" ", slice(ts, i, n)))`
  * — runs interpreted per element with a lambda frame and an array slice
  * allocation per shingle; over millions of documents that dominates the
  * dedup pipeline. These expressions do the same work in one tight pass.
  * Codegen delegates to static helpers, so the enclosing stage stays inside
  * whole-stage codegen.
  */
object TextKernels {

  private val md5TL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String =
    md5HexBytes(s.getBytes(StandardCharsets.UTF_8), 0, -1)

  /** md5 hex of `bytes[from, from+len)`; len < 0 = to end. */
  private def md5HexBytes(b: Array[Byte], from: Int, len: Int): String = {
    val d = md5TL.get()
    d.reset()
    d.update(b, from, if (len < 0) b.length - from else len)
    val bytes = d.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Word n-gram shingles, space-joined — byte-identical to the
    * `split(" ")`-based higher-order formulation (empty tokens from repeated
    * separators are preserved, docs shorter than n yield an empty array). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: sig_i = min over shingles of md5hex(s"$i:$shingle"),
    * identical to the aggregation `min(md5(concat(lit(s"$i:"), shingle)))`
    * over the exploded shingle table (duplicates cannot change a min, so the
    * input need not be distinct). Empty input → null (caller filters; an
    * empty doc has no signature, matching the group-by formulation where the
    * doc simply has no rows). */
  def minHashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return null
    // hot path: md5 over raw bytes (UTF-8 concat of the "i:" prefix and the
    // shingle bytes equals the bytes of s"$i:$sh"), mins kept as RAW digests
    // (unsigned byte order == hex-string order, both compare nibble-first),
    // hex-encoded only for the numHashes finalists — the naive per-hash
    // String build + hex encode + compareTo was ~4x this cost
    val prefixes = new Array[Array[Byte]](numHashes)
    var p = 0
    while (p < numHashes) {
      prefixes(p) = (p.toString + ":").getBytes(StandardCharsets.US_ASCII)
      p += 1
    }
    val d = md5TL.get()
    val mins = new Array[Array[Byte]](numHashes)
    var k = 0
    while (k < m) {
      val shBytes = shingles.getUTF8String(k).getBytes
      var i = 0
      while (i < numHashes) {
        d.reset()
        d.update(prefixes(i))
        d.update(shBytes)
        val h = d.digest()
        if (mins(i) == null ||
          java.util.Arrays.compareUnsigned(h, mins(i)) < 0) mins(i) = h
        i += 1
      }
      k += 1
    }
    new GenericArrayData(mins.map { b =>
      val out = new Array[Char](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = HEX((b(i) >> 4) & 0xf)
        out(2 * i + 1) = HEX(b(i) & 0xf)
        i += 1
      }
      UTF8String.fromString(new String(out)): Any
    })
  }

  /** 16-bit md5-nibble SimHash, one pass per document. Identical to the
    * explode-tokens → md5 → 16 vote-sums → groupBy formulation (which
    * shuffles the entire token stream; this moves nothing): bit i votes +1
    * when hex nibble i of md5(token) ≥ 8 else −1, signature bit i = (Σ > 0).
    * Tokens are `split(" ", -1)` — empty tokens from repeated/trailing
    * separators vote too, matching `explode(split(text, ' '))`. */
  def simHash16(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](16)
    var t = 0
    while (t < toks.length) {
      val h = md5Hex(toks(t))
      var i = 0
      while (i < 16) {
        val c = h.charAt(i)
        votes(i) += (if (c >= '8') 1 else -1) // hex chars: '8'..'9','a'..'f' ≥ '8'
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 16) {
      if (votes(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over xxhash64(token) (Spark's seed 42) — the scale
    * variant: one 8-byte hash per token, no md5 string churn, zero shuffle.
    * Bit semantics match the explode+groupBy formulation bit-for-bit
    * (vote +1 when hash bit i is set, signature bit i = votes > 0). */
  /** Unicode NFC normalization (canonical composition) — é as e+◌́ and é
    * as one code point hash differently, so exact dedup, shingles, and
    * fingerprints all silently miss equal-looking text unless the corpus
    * is canonicalized first. One pass; java.text.Normalizer implements
    * the same Unicode standard DuckDB's nfc_normalize does. */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    // fast path: Normalizer.isNormalized is a cheap scan, and real corpora
    // are overwhelmingly already NFC
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Shannon entropy (bits/char) over Unicode code points; summation runs
    * code-point-ascending (TreeMap iteration), so the double result is
    * deterministic for a given input. One pass, no token split. */
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
      n += 1L
    }
    var h = 0.0
    val ln2 = math.log(2.0)
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * (math.log(p) / ln2)
    }
    h
  }

  def simHash64(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(toks(t)), StringType, 42L)
      var i = 0
      while (i < 64) {
        votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Signed feature-hashing ("hashing trick") counts, one pass per
    * document: token t votes ±1 (sign = parity of md5 hex nibble 9) into
    * dimension `(first 8 md5 hex nibbles as uint32) mod d`. Identical to
    * the explode → md5 arithmetic → groupBy(id, dim) formulation (which
    * shuffles the whole token stream; this moves nothing) — integer
    * accumulation is order-free, so per-row and per-group summation agree
    * exactly. Returns all d dimensions including zeros; callers keep the
    * sparse non-zero slice. */
  def hashEmbed(text: UTF8String, d: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Long](d)
    var t = 0
    while (t < toks.length) {
      val h = md5Hex(toks(t))
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 4) | Character.digit(h.charAt(i), 16); i += 1 }
      val sign = if ((Character.digit(h.charAt(8), 16) & 1) == 1) 1L else -1L
      votes((v % d).toInt) += sign
      t += 1
    }
    new GenericArrayData(votes)
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Unordered ±window co-occurrence pairs, one pass per document —
    * identical to the nested
    * `flatten(transform(sequence(0, n-2), i -> transform(sequence(i+1,
    * least(i+w, n-1)), j -> sorted-pair)))` higher-order formulation
    * (which allocates two lambda frames per pair): for every i < j ≤
    * i+window, the two tokens space-joined in BINARY (UTF8String) order —
    * the same order the Column `<=` comparison uses, so non-ASCII tokens
    * sort identically. Docs shorter than 2 tokens yield an empty array. */
  def coocPairs(text: UTF8String, window: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val us = new Array[UTF8String](n)
    var i = 0
    while (i < n) { us(i) = UTF8String.fromString(toks(i)); i += 1 }
    val out = new java.util.ArrayList[Any](n * window)
    i = 0
    while (i <= n - 2) {
      val jMax = math.min(i + window, n - 1)
      var j = i + 1
      while (j <= jMax) {
        val (a, b) =
          if (us(i).compareTo(us(j)) <= 0) (us(i), us(j)) else (us(j), us(i))
        out.add(UTF8String.concat(a, SPACE, b))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Adjacent token pairs in document order, space-joined — identical to
    * `transform(sequence(0, n-2), i -> concat_ws(" ", ts[i+1], ts[i+2]))`
    * (one interpreted lambda frame per pair) in one pass. Order is
    * PRESERVED, not canonicalized — BPE merge candidates are directed.
    * Docs shorter than 2 tokens yield an empty array. */
  def adjPairs(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.concat(
        UTF8String.fromString(toks(i)), SPACE, UTF8String.fromString(toks(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing-style minimum over character 8-gram md5s; full-doc md5 for
    * texts shorter than 8 chars. Identical to the
    * `array_min(transform(sequence(1, len-7), i -> md5(substr(text, i, 8))))`
    * higher-order formulation, which allocates a lambda frame and an md5
    * string per character position — this is one tight loop over the UTF-8
    * bytes, hashing each gram's byte range in place (characters = code
    * points, exactly `substr`'s semantics; the only allocation kept is the
    * winning hex string). */
  def minGramMd5(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    // char-start byte offsets (UTF-8 continuation bytes are 10xxxxxx)
    val offs = new Array[Int](text.numChars() + 1)
    var nc = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { offs(nc) = b; nc += 1 }
      b += 1
    }
    offs(nc) = bytes.length
    if (nc < 8) return UTF8String.fromString(md5HexBytes(bytes, 0, -1))
    var best: String = null
    var i = 0
    while (i <= nc - 8) {
      val h = md5HexBytes(bytes, offs(i), offs(i + 8) - offs(i))
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    UTF8String.fromString(best)
  }
}

/** `word_shingles(text, n)` → array<string> (see [[TextKernels.shingles]]). */
/** `char_entropy(text)` → double: Shannon entropy in bits per character
  * over the string's Unicode code points — the cheap gibberish /
  * compressibility proxy quality filters cut on (low entropy = repeated
  * filler, high ≈ log2(alphabet) = random noise). Counts accumulate in a
  * TreeMap so the Σ runs in code-point-ascending order: deterministic
  * within the engine, and within 1 ulp-sum of any other engine's grouped
  * sum — round to 6 dp at the consumer for cross-engine comparison.
  * Empty string → 0.0. */
/** `nfc_normalize(text)` → string (see [[TextKernels.nfcNormalize]]). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    TextKernels.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    TextKernels.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `minhash_sig(shingles, h)` → array<string> of h hex minima
  * (see [[TextKernels.minHashSig]]). Null on empty shingle arrays. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    TextKernels.minHashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // result can be null even for non-null input (empty shingle set)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  org.apache.spark.sql.graft.TextKernels.minHashSig($c, $numHashes);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `simhash16(text)` → bigint in [0, 65535] (see [[TextKernels.simHash16]]). */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simHash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.simHash16($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** `simhash64(text)` → bigint (see [[TextKernels.simHash64]]). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `hash_embed(text, d)` → array<bigint> of d signed hash-trick counts
  * (see [[TextKernels.hashEmbed]]). */
case class HashEmbed(child: Expression, d: Int) extends UnaryExpression {
  // plan-time guard: d <= 0 would otherwise surface as a per-row
  // ArithmeticException (v % 0) deep inside codegen
  require(d >= 1, s"hash_embed: need d >= 1 dims, got $d")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_embed"

  override def nullSafeEval(input: Any): Any =
    TextKernels.hashEmbed(input.asInstanceOf[UTF8String], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.hashEmbed($c, $d)")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

/** `cooc_pairs(text, w)` → array<string> of sorted space-joined
  * co-occurrence pairs (see [[TextKernels.coocPairs]]). */
case class CoocPairs(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cooc_pairs"

  override def nullSafeEval(input: Any): Any =
    TextKernels.coocPairs(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.coocPairs($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): CoocPairs =
    copy(child = newChild)
}

/** `adj_pairs(text)` → array<string> of in-order adjacent token pairs
  * (see [[TextKernels.adjPairs]]). */
case class AdjPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "adj_pairs"

  override def nullSafeEval(input: Any): Any =
    TextKernels.adjPairs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.adjPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): AdjPairs =
    copy(child = newChild)
}

/** `min_gram_md5(text)` → string (see [[TextKernels.minGramMd5]]). */
case class MinGramMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "min_gram_md5"

  override def nullSafeEval(input: Any): Any =
    TextKernels.minGramMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.minGramMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): MinGramMd5 =
    copy(child = newChild)
}
