package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative consistency-rule matrix.
  *
  * The reference (utils.py:133 `filter_consistent_data_by_rules` +
  * constants.py:609-895 rule dictionaries) evaluates Excel-letter formulas
  * per row in Python (`eval` inside `DataFrame.apply`) and keeps the
  * highest-priority violated rule's color. graft compiles the whole matrix
  * to ONE `CASE WHEN` chain ordered by priority — a single codegen'd
  * projection, embarrassingly parallel, zero shuffle at any scale.
  */
object Rules {

  /** One consistency rule: when `predicate` holds the row is flagged `tag`
    * (higher `priority` wins, like the reference's max-priority color pick,
    * utils.py:300-315). */
  final case class Rule(name: String, predicate: Column, priority: Int, tag: String)

  /** Highest-priority matching rule's tag, NULL when no rule fires
    * (= "consistent" row). */
  def flagColumn(rules: Seq[Rule]): Column =
    rules
      .sortBy(-_.priority)
      .foldRight(lit(null).cast("string")) { (r, acc) => when(r.predicate, lit(r.tag)).otherwise(acc) }

  /** Attach the flag column. */
  def applyRules(df: DataFrame, rules: Seq[Rule], flagName: String = "rule_flag"): DataFrame =
    df.withColumn(flagName, flagColumn(rules))

  /** Split into (consistent = no rule fired, inconsistent = some rule fired);
    * mirrors the reference's include/exclude switch (utils.py:196-207). */
  def splitConsistent(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val flagged = applyRules(df, rules)
    (flagged.filter(col("rule_flag").isNull).drop("rule_flag"),
      flagged.filter(col("rule_flag").isNotNull))
  }
}
