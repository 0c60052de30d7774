package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage transforms: scalar int8 quantization (and its
  * inverse) — the 4× storage/bandwidth cut a 100 TB embedding corpus
  * takes before ANN indexing. Pure per-row projections in the scan
  * stage: no shuffle, rides whole-stage codegen, reproducible on any
  * engine (IEEE divide + half-away-from-zero rounding only).
  */
object Embeddings {

  /** Per-vector absolute max — the quantization range. */
  private def absMax(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric scalar int8 quantization: per-vector scale = max|x|/127,
    * elements mapped to round(x/scale) clamped into [-127, 127] (so the
    * max-magnitude element hits ±127 exactly). All-zero vectors get
    * scale 0 and all-zero codes. Output: id, scale, `qvec: array<int>`
    * (int-typed for engine portability; pack to bytes at the storage
    * boundary). */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = absMax(col(vecCol)) / lit(127.0)
    emb.select(
      col(idCol),
      scale.as("scale"),
      when(scale === 0.0,
        transform(col(vecCol), _ => lit(0)))
        .otherwise(transform(col(vecCol), x =>
          greatest(lit(-127), least(lit(127),
            round(x.cast("double") / scale).cast("int")))))
        .as("qvec"))
  }

  /** Inverse of [[quantizeInt8]]: `qvec[i] * scale` (float). Lossy by
    * design; [[quantizeInt8]]'s scale choice bounds per-element error by
    * scale/2 = max|x|/254. */
  def dequantize(df: DataFrame, qvecCol: String, scaleCol: String): Column =
    transform(col(qvecCol), q => (q.cast("double") * col(scaleCol)).cast("float"))
}
