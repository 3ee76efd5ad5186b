package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the constraint-validation
  * surface a production ingest pipeline runs in front of every table
  * (the Delta Live Tables `EXPECT` shape; the reference's nearest
  * analog is pack query validation, pkg/compliance, which validates
  * QUERIES — this validates DATA). A rule is a named boolean predicate
  * over the row; the three verbs differ only in what they do with the
  * verdict:
  *
  *  - [[annotate]]: keep every row, add one flag per rule plus a
  *    `_valid` conjunction — a pure codegen scan, zero shuffles.
  *  - [[split]]: route rows into (valid, quarantined) — quarantined
  *    rows carry `_failed`, the array of violated rule names, because
  *    "which rule" is the first triage question; both halves are
  *    filters over the same annotated scan, never a second read.
  *  - [[metrics]]: per-rule pass/fail counts + IEEE fail rate from ONE
  *    partial-aggregated scan (k·2 sums in a single agg, unpivoted from
  *    the 1-row frame) — never an explode that would ×k the corpus
  *    before the shuffle.
  *
  * Determinism: counts are exact integers; `fail_rate` is one IEEE
  * division of exact operands — both engines agree bit-for-bit.
  */
object Expectations {

  /** A named expectation; `predicate` must evaluate TRUE for a passing
    * row. NULL evaluates as a FAILURE (the SQL trap: `value > 0` is
    * NULL, not false, for NULL values — an expectation must not let
    * nulls slip through a range check).
    */
  final case class Rule(name: String, predicate: Column)

  private def pass(r: Rule): Column = coalesce(r.predicate, lit(false))

  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation required")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name).mkString(", ")}")
    val flagged = rules.foldLeft(df)((acc, r) =>
      acc.withColumn(s"ok_${r.name}", pass(r)))
    flagged.withColumn("_valid",
      rules.map(r => col(s"ok_${r.name}")).reduce(_ && _))
  }

  /** (valid rows — original columns, quarantined rows — original columns
    * plus `_failed`: the violated rule names in declaration order).
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val ann = annotate(df, rules)
    val orig = df.columns.map(col).toSeq
    val valid = ann.filter(col("_valid")).select(orig: _*)
    val failedNames = filter(
      array(rules.map(r =>
        when(col(s"ok_${r.name}"), lit(null).cast("string"))
          .otherwise(lit(r.name))): _*),
      x => x.isNotNull)
    val quarantined = ann.filter(!col("_valid"))
      .withColumn("_failed", failedNames)
      .select(orig :+ col("_failed"): _*)
    (valid, quarantined)
  }

  /** One row per rule: (rule, n_pass, n_fail, fail_rate), in declaration
    * order of evaluation but emitted unordered (callers sort). Single
    * scan, single partial agg.
    */
  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation required")
    val sums = rules.flatMap(r => Seq(
      sum(pass(r).cast("long")).as(s"p_${r.name}"),
      sum((!pass(r)).cast("long")).as(s"f_${r.name}")))
    val one = df.agg(sums.head, sums.tail: _*)
    val stacked = rules.map(r =>
      struct(lit(r.name).as("rule"),
        coalesce(col(s"p_${r.name}"), lit(0L)).as("n_pass"),
        coalesce(col(s"f_${r.name}"), lit(0L)).as("n_fail")))
    one.select(explode(array(stacked: _*)).as("m"))
      .select(col("m.rule").as("rule"), col("m.n_pass").as("n_pass"),
        col("m.n_fail").as("n_fail"))
      .withColumn("fail_rate",
        col("n_fail").cast("double") /
          (col("n_pass") + col("n_fail")).cast("double"))
  }
}
