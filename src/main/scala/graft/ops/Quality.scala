package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the engine-side counterpart of
  * the source schema's CHECK constraints (the reference declares
  * `CHECK (ReasonType IN ('Cancellation','Return'))` in SQL Server,
  * /root/reference/setup_database.sql:87, and SURVEY §1.2 notes the engine
  * had no equivalent). A `Rule` is a named boolean predicate a row must
  * satisfy; NULL predicate results count as VIOLATIONS (unlike SQL CHECK,
  * which lets NULL pass — a DQ gate that silently passes nulls hides the
  * most common data fault; write `c.isNull || pred` to opt into SQL
  * semantics).
  *
  * Scale notes: [[auditCounts]] is ONE scan ending in a single-row global
  * aggregate (map-side partial counts, one tiny shuffle); [[split]] tags
  * each row in the scan stage — no shuffle at all. Rules are plain Column
  * predicates, so they ride whole-stage codegen.
  */
object Quality {

  final case class Rule(name: String, predicate: Column)

  private def violated(r: Rule): Column = !coalesce(r.predicate, lit(false))

  /** One row: total row count + one violation count per rule, in a single
    * pass. The audit a pipeline logs (and alerts on) per batch. */
  def auditCounts(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "auditCounts: provide at least one rule")
    df.agg(
      count(lit(1)).as("total_rows"),
      rules.map(r => count(when(violated(r), lit(1))).as(s"viol_${r.name}")): _*)
  }

  /** Tag every row with the names of the rules it violates (`failed_rules`,
    * empty array = clean). Feed `.where(size($"failed_rules") === 0)` to
    * enforce, or the complement to quarantine — one scan serves both. */
  def withViolations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "withViolations: provide at least one rule")
    df.withColumn("failed_rules",
      filter(
        array(rules.map(r => when(violated(r), lit(r.name))): _*),
        c => c.isNotNull))
  }

  /** (clean rows, quarantined rows with `failed_rules`) — both lazy views
    * over the same tagged scan. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = withViolations(df, rules)
    (tagged.where(size(col("failed_rules")) === 0).drop("failed_rules"),
      tagged.where(size(col("failed_rules")) > 0))
  }
}
