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

  /** Per-column cell colors: for every `(column -> rules)` entry, append a
    * `<column>__color` holding the highest-priority firing rule's tag (an
    * ARGB color for the xlsx export), NULL when the cell is consistent —
    * the declarative twin of the reference's per-cell
    * `get_dataframe_color_rules` loop (utils.py:1047): one codegen'd
    * projection for the whole matrix, zero shuffle. */
  def colorMatrix(df: DataFrame, colRules: Seq[(String, Seq[Rule])]): DataFrame =
    df.select(
      df.columns.map(col).toSeq ++
        colRules.map { case (c, rules) => flagColumn(rules).as(s"${c}__color") }: _*)

  /** Write the consistency matrix as a colored workbook — the reference's
    * `matrice_de_coherence_*.xlsx` deliverable (pipeline.py:351): data rows
    * that violate at least one rule, each violating cell painted with its
    * highest-priority rule's color.
    *
    * The collect is driver-side by design: this is a human-review report
    * (the reference saves it with openpyxl on one machine), bounded by
    * `maxRows` — the distributed work (rule evaluation + filter) happens
    * before it.
    *
    * @param columns  output column order; `orderBy` keys should come first
    * @param colRules (column -> rules); a Rule's tag is its ARGB fill color
    */
  def exportMatrix(
      df: DataFrame,
      columns: Seq[String],
      orderBy: Seq[String],
      colRules: Seq[(String, Seq[Rule])],
      path: String,
      maxRows: Int = 1 << 20): Unit = {
    val (rows, fills) = matrixRows(df, columns, orderBy, colRules, maxRows)
    graft.sources.Xlsx.write(path, rows, fills)
  }

  /** One sheet per matrix in a single workbook — the reference's
    * per-pathology consistency workbook (`workbook[pathologie]`,
    * utils.py:813): each entry is (sheet display name, data, columns,
    * order keys, per-column rules). */
  def exportMatrixSheets(
      path: String,
      sheets: Seq[(String, DataFrame, Seq[String], Seq[String], Seq[(String, Seq[Rule])])],
      maxRows: Int = 1 << 20): Unit =
    graft.sources.Xlsx.writeSheets(
      path,
      sheets.map { case (name, df, columns, orderBy, colRules) =>
        val (rows, fills) = matrixRows(df, columns, orderBy, colRules, maxRows)
        (name, rows, fills)
      })

  private def matrixRows(
      df: DataFrame,
      columns: Seq[String],
      orderBy: Seq[String],
      colRules: Seq[(String, Seq[Rule])],
      maxRows: Int): (Seq[Seq[Any]], Seq[Seq[String]]) = {
    val colored = colorMatrix(df, colRules)
    val anyViolation = colRules
      .map { case (c, _) => col(s"${c}__color").isNotNull }
      .reduce(_ || _)
    val rows = colored
      .filter(anyViolation)
      .orderBy(orderBy.map(col): _*)
      .limit(maxRows)
      .collect()
    val header: Seq[Any] = columns
    val data = rows.toSeq.map(r => columns.map(c => r.get(r.fieldIndex(c))))
    val colorCols = colRules.map(_._1).toSet
    val noFill: Seq[String] = columns.map(_ => null: String)
    val fills = Seq(noFill) ++ rows.toSeq.map { r =>
      columns.map { c =>
        if (colorCols.contains(c)) r.getString(r.fieldIndex(s"${c}__color")) else null
      }
    }
    (Seq(header) ++ data, fills)
  }
}
