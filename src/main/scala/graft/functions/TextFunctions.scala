package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{AdjPairs, CharEntropy, ColumnBridge, CoocPairs, NfcNormalize, HashEmbed, MinGramMd5, MinHashSig, SimHash16, SimHash64, WordShingles}

/** Column-level API over the native text expressions (implementation in
  * `org.apache.spark.sql.graft.TextExpressions`). */
object TextFunctions {

  /** Space-joined word n-grams in one pass (byte-identical to the
    * `split`/`transform`/`slice` composition it replaces). */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Per-row MinHash signature (array of `numHashes` hex minima); null for
    * empty shingle arrays. */
  def minHashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))

  /** d-dim signed feature-hashing counts, one pass per row (zero
    * shuffle); see [[graft.ops.Embeddings.hashEmbed]] for the operator. */
  def hashEmbedVec(text: Column, d: Int): Column =
    ColumnBridge.column(HashEmbed(ColumnBridge.expression(text), d))

  /** 16-bit md5-nibble SimHash, one pass per row (zero shuffle). */
  def simHash16(text: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(text)))

  /** 64-bit xxhash64 SimHash, one pass per row (zero shuffle). */
  def simHash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** Winnowing-style minimum over character 8-gram md5s, one pass per row. */
  def minGramMd5(text: Column): Column =
    ColumnBridge.column(MinGramMd5(ColumnBridge.expression(text)))

  /** Shannon entropy (bits/char) over code points, one pass per row —
    * the gibberish/compressibility quality proxy. Round to 6 dp for
    * cross-engine comparison. */
  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))

  /** Unicode NFC canonicalization, one pass per row — run BEFORE hashing,
    * shingling, or exact dedup so visually-equal text hashes equal. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** Sorted unordered ±window co-occurrence pairs, one pass per row (zero
    * shuffle); see [[graft.ops.Corpus.cooccurrence]] for the operator. */
  def coocPairs(text: Column, window: Int): Column =
    ColumnBridge.column(CoocPairs(ColumnBridge.expression(text), window))

  /** In-order adjacent token pairs, one pass per row (zero shuffle); see
    * [[graft.ops.Corpus.bpePairCounts]] for the operator. */
  def adjPairs(text: Column): Column =
    ColumnBridge.column(AdjPairs(ColumnBridge.expression(text)))
}
