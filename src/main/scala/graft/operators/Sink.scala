package graft.operators

import org.apache.spark.sql.DataFrame

/** Output sinks. Reference utils.py:395 `export_file` writes one CSV per
  * period value with a Python loop; graft uses Spark's native
  * `partitionBy` writer — one distributed job, one directory per value,
  * works at any cardinality/scale.
  */
object Sink {

  def writePartitionedCsv(df: DataFrame, partCol: String, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").partitionBy(partCol).csv(path)

  def writePartitionedParquet(df: DataFrame, partCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
}
