package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** XML source/sink over Spark 4's built-in xml data source — the
  * enterprise-interchange format next to csv/json/xlsx/fixed-width. Reads
  * are splittable by row tag and schema-inferred; pass an explicit select
  * + casts downstream when the consumer needs pinned types (XML carries no
  * type metadata, so inference is content-dependent by design). */
object Xml {

  /** Read rows delimited by `rowTag` from XML file(s) at `path`. Passing
    * `schema` skips the inference pre-scan — for a large extract that
    * halves the read (inference reads every file once before the real
    * scan). */
  def read(
      s: SparkSession,
      path: String,
      rowTag: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = s.read.format("xml").option("rowTag", rowTag)
    schema.fold(r)(r.schema).load(path)
  }

  /** Write `df` as XML with one `rowTag` element per row under `rootTag`.
    * Partitioned like any other sink — one file per task; coalesce first
    * if a single document is required. */
  def write(df: DataFrame, path: String, rootTag: String, rowTag: String): Unit =
    df.write.mode("overwrite").format("xml")
      .option("rootTag", rootTag).option("rowTag", rowTag)
      .save(path)
}
