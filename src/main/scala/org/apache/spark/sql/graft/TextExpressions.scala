package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

  def md5Hex(s: String): String = {
    val d = md5TL.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
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
    val mins = new Array[String](numHashes)
    var k = 0
    while (k < m) {
      val sh = shingles.getUTF8String(k).toString
      var i = 0
      while (i < numHashes) {
        val h = md5Hex(i + ":" + sh)
        if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
        i += 1
      }
      k += 1
    }
    new GenericArrayData(mins.map(s => UTF8String.fromString(s): Any))
  }
}

/** `word_shingles(text, n)` → array<string> (see [[TextKernels.shingles]]). */
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
