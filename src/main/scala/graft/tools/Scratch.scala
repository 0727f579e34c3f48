package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}
import graft.operators._
import graft.sources.Tables

/** Throwaway profiling harness for in-flight plan experiments. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm codegen
    noop(SparkEntry.queries("q_spatial_clusters")(spark, "/root/testdata/sf0.001"))

    val cust = Tables.customer(spark, d).select(
      col("c_custkey"),
      ((col("c_custkey").cast("long") * 7919L % 12000L) / 100.0 - 60.0).as("c_lat"),
      ((col("c_custkey").cast("long") * 104729L % 36000L) / 100.0 - 180.0).as("c_lon"))
    val probe = Tables.customer(spark, d).select(
      col("c_custkey").as("c_custkey2"),
      ((col("c_custkey").cast("long") * 7919L % 12000L) / 100.0 - 60.0).as("c_lat2"),
      ((col("c_custkey").cast("long") * 104729L % 36000L) / 100.0 - 180.0).as("c_lon2"))
    def pairs = Spatial.radiusJoin(probe, cust, "c_lat2", "c_lon2",
        "c_lat", "c_lon", radiusKm = 300.0, maxAbsLat = 60.0)
      .filter(col("c_custkey2") < col("c_custkey"))
      .select(col("c_custkey2").as("u"), col("c_custkey").as("v"))
    time("spatial: radius join pairs only")(noop(pairs))
    time("spatial: radius join pairs again")(noop(pairs))
    time("spatial: CC over pairs") {
      noop(Graph.connectedComponents(pairs, "u", "v"))
    }
    time("spatial: full q_spatial_clusters") {
      noop(SparkEntry.queries("q_spatial_clusters")(spark, d))
    }
    time("dbscan: full q_dbscan") {
      noop(SparkEntry.queries("q_dbscan")(spark, d))
    }
    spark.stop()
  }
}
