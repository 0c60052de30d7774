package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Scale-validation runner (not part of the driver contract): times the
  * dedup/ANN family's SCALED parameterizations against an arbitrary data
  * dir — the measurement half of SCALE10X.md.
  *
  * The oracle-pinned benchmark queries freeze their LSH/IVF granularity
  * parameters at values calibrated for the benchmark's row counts (the
  * oracle replays the exact candidate sets, so the parameters are part of
  * the query identity). Those parameters are the knob that keeps the
  * banded paths linear: bucket/cell COUNT must grow with N so per-bucket
  * occupancy stays bounded. This main measures the same operators at the
  * granularity a 10× corpus calls for, proving the operator SHAPE scales
  * when the parameters do.
  *
  * Usage: `sbt "runMain graft.ScaleProbe /tmp/scale10x"` — prints one JSON
  * line of per-probe seconds.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = graft.core.Tables.tableRebalanced(spark, dir, "documents")
    def emb = graft.core.Tables.tableRebalanced(spark, dir, "embeddings")
    // scaled granularity: 10× rows → ~3–4 more bucket bits / 8× more IVF
    // cells keep per-bucket occupancy at the 1× operating point
    val probes: Seq[(String, () => DataFrame)] = Seq(
      "q44_shape_bits8_bands8" -> (() =>
        graft.ops.Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          0.4, 8, 8)),
      "q38_shape_cells64" -> (() =>
        graft.ops.Similarity.ivfTopK(emb, "vec_id", "embedding", 3, 64, 2)),
      "q336_shape_bands4x16" -> (() =>
        graft.ops.Multimodal.perceptualNearDupPairs(spark,
          graft.ops.Multimodal.asMediaTable(docs, "doc_id", "text", "text"),
          4, 12)),
    )
    val out = probes.map { case (name, fn) =>
      var secs = -1.0
      var rows = -1L
      try graft.core.CacheRegistry.scoped {
        val t0 = System.nanoTime()
        rows = fn().count()
        secs = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[probe] $name FAILED: ${e.getMessage}")
      }
      graft.core.CacheRegistry.drain()
      f""""$name":{"sec":$secs%.3f,"rows":$rows}"""
    }
    println(out.mkString(s"""{"dir":"$dir",""", ",", "}"))
    spark.stop()
  }
}
