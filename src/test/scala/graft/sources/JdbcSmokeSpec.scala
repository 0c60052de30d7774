package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec

/** REAL-TRANSPORT smoke for S14 — the one residual VERDICT has carried
  * since round 2: the reference's actual extraction entry point is a JDBC
  * pull with a two-sided watermark predicate
  * (/root/reference/adf/pipeline.json:126-183), which the suite otherwise
  * exercises through [[FileIncrementalSource]]. This spec drives the
  * PRODUCTION class — [[JdbcIncrementalSource]], `spark.read.jdbc` with
  * the pushed-down interval query — against an embedded Apache Derby
  * database (already on the Spark distribution's classpath: derby jars
  * ship in /opt/spark/jars for the Hive metastore), so the real driver
  * path runs with no network and no added dependency.
  *
  * Watermark strings use Derby's `yyyy-MM-dd HH:mm:ss` timestamp-literal
  * shape; the reference's SQL Server accepts ISO-8601 as well — the
  * literal FORMAT is dialect configuration, the interval CONTRACT
  * (half-open `(from, to]`) is what this pins.
  */
class JdbcSmokeSpec extends SparkSpec {

  test("JdbcIncrementalSource: two-sided watermark interval pushes through " +
    "a real JDBC driver (embedded Derby); consecutive extracts partition " +
    "the change stream") {
    val dbDir = Files.createTempDirectory("graft-derby").resolve("db")
    // derby.system.home keeps derby.log out of the repo cwd
    System.setProperty("derby.stream.error.field",
      "java.lang.System.err")
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE customers (id INT PRIMARY KEY, name VARCHAR(50), " +
          "updated_at TIMESTAMP)")
      val ins = conn.prepareStatement("INSERT INTO customers VALUES (?, ?, ?)")
      Seq(
        (1, "before-window", "2024-01-01 10:00:00"),
        (2, "inside", "2024-01-03 10:00:00"),
        (3, "at-upper-bound", "2024-01-05 00:00:00"), // (from, to]: INCLUDED
        (4, "after-window", "2024-01-07 10:00:00")
      ).foreach { case (id, name, ts) =>
        ins.setInt(1, id); ins.setString(2, name)
        ins.setTimestamp(3, java.sql.Timestamp.valueOf(ts))
        ins.executeUpdate()
      }
      val src = new JdbcIncrementalSource(spark, url, new java.util.Properties())

      // run 1: (2024-01-01 10:00, 2024-01-05 00:00] — strictly after the
      // old watermark (row 1 excluded), up to AND INCLUDING the new one
      val b1 = src.extract("customers", "updated_at",
        "2024-01-01 10:00:00", "2024-01-05 00:00:00")
      b1.columns.map(_.toLowerCase).sorted shouldBe Array("id", "name", "updated_at")
      val ids1 = b1.select("id").collect().map(_.getInt(0)).sorted
      ids1 shouldBe Array(2, 3)

      // run 2 from the committed boundary: no gap, no overlap
      val b2 = src.extract("customers", "updated_at",
        "2024-01-05 00:00:00", "2024-01-07 10:00:00")
      val ids2 = b2.select("id").collect().map(_.getInt(0)).sorted
      ids2 shouldBe Array(4)
      (ids1.toSet intersect ids2.toSet) shouldBe empty
      (ids1 ++ ids2).sorted shouldBe Array(2, 3, 4) // everything after run-0 seen once

      // a LATE row inside an already-committed window is the documented
      // at-least-once trade (the reference shares it): it would be missed
      // until the next run re-pulls — prove the predicate really runs in
      // the DATABASE by inserting post-extract and re-running the same
      // interval: the row appears, so the query was pushed, not cached
      ins.setInt(1, 5); ins.setString(2, "late-insert")
      ins.setTimestamp(3, java.sql.Timestamp.valueOf("2024-01-06 00:00:00"))
      ins.executeUpdate()
      val b3 = src.extract("customers", "updated_at",
        "2024-01-05 00:00:00", "2024-01-07 10:00:00")
      b3.select("id").collect().map(_.getInt(0)).sorted shouldBe Array(4, 5)
    } finally {
      conn.close()
      // shut the embedded engine down so the temp db releases its locks
      try DriverManager.getConnection(s"jdbc:derby:$dbDir;shutdown=true")
      catch { case _: java.sql.SQLException => () } // shutdown SIGNALS via exception
    }
  }
}
