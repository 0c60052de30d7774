package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shm = new java.io.File("/dev/shm")
    val localDir =
      if (shm.isDirectory && shm.getUsableSpace > (16L << 30)) "/dev/shm/graft-spark-local"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // fresh warehouse per run: the default ./spark-warehouse persists
      // across JVMs while the in-memory catalog does not, so a catalog-
      // backed query (q109) would find its versioned table's DIRECTORY
      // already on disk and refuse the create
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_QUERIES=q53,q106 restricts the dump (local iteration only;
    // the driver always runs the full set)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // single-file dumps keep the driver's row-level comparator simple; at
    // scale-fixture volumes (q336 at 100x: 454 M rows) one writer task
    // becomes the bottleneck — SPARK_GRAFT_VERIFY_COALESCE=0 keeps the
    // parallel writers (validate_scale.py globs the directory either way)
    val singleFile = sys.env.getOrElse("SPARK_GRAFT_VERIFY_COALESCE", "1") != "0"
    SparkEntry.queries
      .filter { case (name, _) => only.forall(f => f.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try graft.core.CacheRegistry.scoped {
        val df = fn(spark, sfDir)
        (if (singleFile) df.coalesce(1) else df)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally graft.core.CacheRegistry.drain()
    }
    SparkEntry.clearCaches(spark)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // chunked replays for the vote-grid family (tools/validate_grid_chunked.py)
    val cjson = SparkEntry.chunkedOracle.map { case (k, v) =>
      val stages = v.stages.map { st =>
        s"""{"table": ${q(st.table)}, "sql": ${q(st.sql)}, "chunked": ${st.chunked}}"""
      }.mkString("[", ",", "]")
      s"""${q(k)}: {"stages": $stages, "final": ${q(v.finalSql)}}"""
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_chunked.json"), cjson)
    spark.stop()
  }
}
