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

  /** Excel-letter formula compiler — the reference stores its consistency
    * rules as letter-formula STRINGS in the matrix workbook ("AS<BC",
    * "AI!=AJ+AK", "(J+I)>G"; constants.py:609-895) and rewrites them into
    * pandas eval strings at runtime (utils.py:292 `remplacement`, which
    * resolves each letter against the frame's column ORDER with a fixed
    * offset — `columns[column_index_from_string(L) - 3]`). This is the
    * Spark-native twin: the same grammar compiles ONCE into a codegen'd
    * boolean `Column` — no per-row eval, no interpreter in the hot path.
    *
    * Grammar: comparison of two arithmetic expressions —
    * `sum (op sum)` with op ∈ {<, >, <=, >=, =, ==, !=, <>},
    * `sum := term ((+|-) term)*`, `term := factor ((*|/) factor)*`,
    * `factor := LETTERS | NUMBER | (sum)`. Letters resolve by Excel
    * column index (A=1, Z=26, AA=27 …) into `columns(index - shift)`,
    * `shift = 3` matching the reference's convention (its frame drops the
    * first grid columns); pass `shift = 1` for a frame aligned from A.
    * Null semantics are SQL's (a NULL operand yields NULL → rule does not
    * fire), vs Python eval which would throw — documented divergence. */
  def compileFormula(formula: String, columns: Seq[String], shift: Int = 3): Column = {
    // tokenize
    sealed trait Tok
    case class TLet(s: String) extends Tok
    case class TNum(s: String) extends Tok
    case class TOp(s: String) extends Tok
    val src = formula
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var i = 0
    while (i < src.length) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isUpper) {
        val j = (i until src.length).find(k => !src.charAt(k).isUpper).getOrElse(src.length)
        val s = src.substring(i, j)
        require(s.length <= 2, s"column letters longer than 2 unsupported: '$s' in '$formula'")
        toks += TLet(s); i = j
      } else if (c.isDigit) {
        val j = (i until src.length).find(k => !(src.charAt(k).isDigit || src.charAt(k) == '.'))
          .getOrElse(src.length)
        toks += TNum(src.substring(i, j)); i = j
      } else {
        val two = if (i + 1 < src.length) src.substring(i, i + 2) else ""
        if (Set("<=", ">=", "!=", "<>", "==").contains(two)) { toks += TOp(two); i += 2 }
        else if ("<>=+-*/()".indexOf(c) >= 0) { toks += TOp(c.toString); i += 1 }
        else throw new IllegalArgumentException(s"unexpected '$c' in formula '$formula'")
      }
    }
    // recursive-descent parse
    var p = 0
    def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None
    def eat(): Tok = {
      require(p < toks.length, s"formula '$formula' ends mid-expression")
      val t = toks(p); p += 1; t
    }
    def letterIndex(s: String): Int =
      s.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1))
    def factor(): Column = eat() match {
      case TLet(s) =>
        val idx = letterIndex(s) - shift
        require(idx >= 0 && idx < columns.length,
          s"letter '$s' resolves to position $idx outside the ${columns.length}-column frame " +
            s"(shift=$shift) in '$formula'")
        col(columns(idx))
      case TNum(s) => if (s.contains('.')) lit(s.toDouble) else lit(s.toLong)
      case TOp("(") =>
        val e = sum()
        require(peek.contains(TOp(")")), s"missing ')' in '$formula'"); eat(); e
      case t => throw new IllegalArgumentException(s"unexpected $t in formula '$formula'")
    }
    def term(): Column = {
      var l = factor()
      while (peek.exists { case TOp(o) => o == "*" || o == "/"; case _ => false })
        l = if (eat() == TOp("*")) l * factor() else l / factor()
      l
    }
    def sum(): Column = {
      var l = term()
      while (peek.exists { case TOp(o) => o == "+" || o == "-"; case _ => false })
        l = if (eat() == TOp("+")) l + term() else l - term()
      l
    }
    val left = sum()
    val cmp = eat() match {
      case TOp(o) if Set("<", ">", "<=", ">=", "=", "==", "!=", "<>").contains(o) => o
      case t => throw new IllegalArgumentException(
        s"expected a comparison, got $t in '$formula'")
    }
    val right = sum()
    require(p == toks.length, s"trailing tokens after comparison in '$formula'")
    cmp match {
      case "<" => left < right
      case ">" => left > right
      case "<=" => left <= right
      case ">=" => left >= right
      case "=" | "==" => left === right
      case "!=" | "<>" => left =!= right
    }
  }

  /** Compile a reference-shaped rule dictionary — entries of
    * (name, formula, color/tag, priority), the DICO_RULES_* layout
    * (constants.py:609) — into [[Rule]]s against `columns`. */
  def rulesFromFormulas(
      dico: Seq[(String, String, String, Int)],
      columns: Seq[String],
      shift: Int = 3): Seq[Rule] =
    dico.map { case (name, formula, tag, priority) =>
      Rule(name, compileFormula(formula, columns, shift), priority, tag)
    }

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
