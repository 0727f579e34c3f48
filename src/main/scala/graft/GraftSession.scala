package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder for graft entry points: every conf here is part
  * of the engine's contract (UTC semantics, AQE on, ns-parquet readable).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // runtime skew handling is part of the scale contract: a hot key in a
      // sort-merge join splits into subpartitions instead of stalling one
      // task (deterministic salting in Skew covers aggregates and the
      // joins AQE can't see)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // the synthetic events table stores ns timestamps; read as long and
      // convert in sources.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
