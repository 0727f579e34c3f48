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

  /** JSON-lines shard export — the training-data interchange format: fixed
    * shard count via a round-robin repartition (uniform shard sizes
    * regardless of input skew, no shard-key small-files risk), one file per
    * shard. Binary columns base64-encode per JSON spec; timestamps are ISO
    * strings — round-trip with an explicit read schema when types matter. */
  def writeJsonl(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards).write.mode("overwrite").json(path)

  /** Bucketed managed table: pre-shuffles rows into `nBuckets` hash buckets
    * on `bucketCols` at write time. Two tables bucketed the same way join
    * WITHOUT a shuffle (co-located sort-merge) — at 100 TB this moves the
    * fact-join shuffle from every query to a one-time write. Requires the
    * session catalog (`saveAsTable`); see SinkSpec for the shuffle-free
    * join assertion. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    // explicit location -> external table: bucketed data lands where the
    // caller says (e.g. a temp dir) instead of the session warehouse
    path.foreach(p => w = w.option("path", p))
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
