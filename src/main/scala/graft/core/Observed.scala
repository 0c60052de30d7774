package graft.core

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** Row-count observation during a write — the Spark-native replacement for
  * the reference's count-after-write logging (2_Bronze_to_Silver.py:60,104;
  * our stages previously did `write; df.count()`).
  *
  * `df.observe` attaches a `CollectMetrics` node: the count accumulates on
  * the executors DURING the single action the caller runs, so the report
  * number costs zero extra jobs — the count-after-write pattern re-scans
  * the whole batch (or re-reads the just-written table) once per table per
  * run, which at 100 TB is a second full pass that exists only for a log
  * line.
  *
  * Contract: `run` must execute exactly ONE action on the frame it is
  * given; the observed frame must not be consumed anywhere else (a second
  * action on the same Observation throws).
  */
object Observed {

  /** Run `run` on an observed copy of `df` and return the number of rows
    * the action processed. */
  def countDuring(df: DataFrame)(run: DataFrame => Unit): Long = {
    val obs = Observation()
    run(df.observe(obs, count(lit(1)).as("rows")))
    obs.get("rows").asInstanceOf[Long]
  }
}
