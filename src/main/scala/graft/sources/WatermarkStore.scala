package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Per-table high-watermark state, stored as a one-value text file — the
  * reference's incremental-extraction control plane
  * (/root/reference/databricks_notebooks/2_Bronze_to_Silver.py:41-50,144-146;
  * adf/pipeline.json:201,265).
  *
  * Contract preserved from the reference:
  *  - missing state reads as the epoch default `1900-01-01T00:00:00.000+0000`
  *    (2_Bronze_to_Silver.py:44,49-50; the ADF coalesce at pipeline.json:129);
  *  - commits happen only AFTER the dependent write succeeds
  *    (adf/pipeline.json:240-246,261-271) — the caller sequences
  *    `commit(...)` after its table commit, so a crash between the two
  *    re-processes the batch instead of dropping it (at-least-once).
  *
  * The value is an opaque sortable string (timestamps serialize ISO-style),
  * read/written with plain filesystem I/O — one row of state does not need a
  * Spark job.
  */
object WatermarkStore {
  /** Timezone-safe watermark serialization: the instant rendered as UTC
    * ISO-8601 (e.g. `2024-01-15T10:00:00Z`). `Timestamp.toString` renders in
    * the JVM default timezone but is read back under the UTC session — on a
    * JVM ahead of UTC the committed watermark would overshoot and silently
    * skip rows ingested in the gap. */
  def format(ts: java.sql.Timestamp): String = ts.toInstant.toString

  /** `Timestamp.toString`'s shape: `yyyy-MM-dd HH:mm:ss[.f…]`, no zone. */
  private val LegacyFormat = """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?""".r

  /** Migrate a stored watermark string written by the pre-[[format]] code
    * path: the legacy `Timestamp.toString` rendering carried no zone and was
    * produced in the JVM default zone, so trusting it as UTC leaves an
    * already-overshot watermark skewed until the next successful run (on a
    * JVM ahead of UTC, rows in the offset window stay silently skipped).
    * Reinterpret it in the JVM default zone and return the UTC ISO form;
    * current-format (and default) values pass through untouched. */
  def normalize(raw: String): String = raw match {
    case LegacyFormat(_) => format(java.sql.Timestamp.valueOf(raw))
    case other           => other
  }
}

class WatermarkStore(spark: SparkSession, root: String) {

  val default = "1900-01-01T00:00:00.000+0000"

  private def pathFor(table: String) = new Path(root, s"$table.wm")
  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read the committed watermark, or the epoch default when absent.
    * Legacy zone-less values are reinterpreted in the JVM default zone
    * ([[WatermarkStore.normalize]]) so a file written by the old
    * `Timestamp.toString` path cannot keep skipping rows until the next
    * commit overwrites it. */
  def read(table: String): String = {
    val p = pathFor(table)
    val f = fs(p)
    if (!f.exists(p)) default
    else {
      val in = f.open(p)
      val raw = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      WatermarkStore.normalize(raw)
    }
  }

  /** Commit a new watermark (call only after the dependent write succeeded). */
  def commit(table: String, value: String): Unit = {
    val p = pathFor(table)
    val out = fs(p).create(p, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }
}
