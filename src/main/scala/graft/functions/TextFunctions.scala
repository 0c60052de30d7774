package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, MinHashSig, WordShingles}

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
}
