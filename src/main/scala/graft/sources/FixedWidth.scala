package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Fixed-width text files — the mainframe/legacy-export format that still
  * feeds real integration pipelines (COBOL copybook extracts, bank/claims
  * feeds): no delimiters, every field a byte range of the line.
  *
  * Read is `spark.read.text` (splittable, parallel) plus one codegen'd
  * projection of `substring` + `trim` + `cast` per field — no per-row
  * parser object, no UDF; a malformed short line simply yields nulls from
  * the out-of-range substrings (cast failures under ANSI are the caller's
  * signal, same contract as the CSV quarantine path). Write pads each
  * field to its declared width with `rpad` and concatenates — also pure
  * projection. Both directions scale like any text scan.
  */
object FixedWidth {

  /** Field spec: (name, width, target type). Fields are laid out in order
    * with no separators. */
  type Field = (String, Int, DataType)

  /** Blank fields (all-space byte ranges — how fixed-width encodes NULL)
    * read back as null for every type; without that, an ANSI cast of ''
    * to a numeric type would fail the whole scan on one missing value. */
  def read(s: SparkSession, path: String, fields: Seq[Field]): DataFrame = {
    require(fields.nonEmpty, "fixed-width schema needs at least one field")
    val offsets = fields.scanLeft(1) { case (pos, (_, w, _)) => pos + w }
    val cols = fields.zip(offsets).map { case ((name, w, dt), start) =>
      val t = trim(substring(col("value"), start, w))
      when(t === "", lit(null)).otherwise(t).cast(dt).as(name)
    }
    s.read.text(path).select(cols: _*)
  }

  def write(df: DataFrame, path: String, widths: Seq[(String, Int)]): Unit = {
    require(widths.nonEmpty, "fixed-width layout needs at least one field")
    val line = concat(widths.map { case (name, w) =>
      rpad(coalesce(col(name).cast("string"), lit("")), w, " ")
    }: _*)
    df.select(line.as("value")).write.mode("overwrite").text(path)
  }
}
