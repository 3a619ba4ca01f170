package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Constraint operators replacing the warehouse DDL's enforcement
  * (migrations/001_core_schema.sql:45-192): Spark enforces nothing, so
  * each PK/UNIQUE/FK/CHECK becomes an audit that returns violations.
  * All audits are single-pass aggregates or joins — no collect loops —
  * so they run at any scale the underlying tables do. */
object Validate {

  final case class Violation(rule: String, count: Long)

  /** PK / UNIQUE: groups with more than one row (001_core_schema.sql:46...). */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** FK: child rows whose key has no parent (left-anti = orphan set). */
  def fkOrphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey)),
      child(childKey) === parent(parentKey), "left_anti")

  /** CHECK: rows violating a boolean predicate. */
  def checkViolations(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!coalesce(predicate, lit(false)))

  /** All five warehouse-table rule families in one report, single action
    * per rule. Timestamp-ordering, enum, non-negative and hex checks are
    * the DDL's (001_core_schema.sql:104-119,187-190). */
  def report(rules: Seq[(String, DataFrame)]): Seq[Violation] =
    rules.map { case (name, viol) => Violation(name, viol.count()) }

  val ShaHex = "^[0-9a-fA-F]{40}$"

  def isHexSha(c: Column): Column = c.rlike(ShaHex)

  def visibilityValid(c: Column): Column =
    c.isin("public", "private", "internal")
}
