package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source + sink — the enterprise-database integration edge next to
  * the file formats (parquet/ORC/CSV/JSONL/xlsx/XML/fixed-width): admin
  * hierarchies, reference dimensions and publish targets live in RDBMSes
  * (the reference pipeline's own inputs are REST+files, but its outputs
  * feed DB-backed dashboards — utils.py:133's export stage).
  *
  * 100 TB posture: JDBC is NEVER the bulk path — it is the integration
  * edge for dimension-scale data. Reads of anything beyond toy size MUST
  * go through [[readPartitioned]] so each executor pulls its own key
  * slice concurrently (a plain [[read]] is ONE connection on ONE task);
  * writes batch-insert per partition, so a `coalesce` upstream bounds the
  * connection count. Exercised against the embedded Derby engine on the
  * classpath — zero external services, and the exact same Spark code path
  * as any networked RDBMS (url + driver are the only differences). */
object Jdbc {

  /** JDK-embedded Derby — the always-available test/demo engine. */
  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def props(driver: String): Properties = {
    val p = new Properties()
    p.setProperty("driver", driver)
    p
  }

  /** Full-table read on a single connection — dimension-scale only. */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      driver: String = DerbyDriver): DataFrame =
    spark.read.jdbc(url, table, props(driver))

  /** Range-partitioned parallel read: Spark issues `numPartitions` WHERE
    * slices on `partitionColumn` ∈ [lowerBound, upperBound], one
    * connection per task — the only JDBC read shape that scales. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      driver: String = DerbyDriver): DataFrame =
    spark.read.jdbc(
      url, table, partitionColumn, lowerBound, upperBound, numPartitions,
      props(driver))

  /** Overwrite-publish `df` as `table` (drop/recreate, batched inserts —
    * one connection per input partition). */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      driver: String = DerbyDriver): Unit =
    df.write.mode("overwrite").jdbc(url, table, props(driver))
}
