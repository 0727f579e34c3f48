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
    noop(SparkEntry.queries("q_hits")(spark, "/root/testdata/sf0.001"))

    time("hits: string ids (current query)") {
      noop(SparkEntry.queries("q_hits")(spark, d))
    }
    // long-id variant: same graph, ids encoded 2k / 2k+1; decode at the end
    val eL = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(
        (col("o_custkey") * 2L).as("u"),
        (col("l_partkey") * 2L + 1L).as("v"))
    time("hits: long ids + decode") {
      val out = Graph.hits(eL, "u", "v", iterations = 3)
        .select(
          when(col("node") % 2 === 0, concat(lit("c"), (col("node") / 2).cast("long").cast("string")))
            .otherwise(concat(lit("p"), ((col("node") - 1) / 2).cast("long").cast("string"))).as("node"),
          col("hub"), col("authority"))
        .orderBy("node")
      noop(out)
    }
    time("hits: string ids again") {
      noop(SparkEntry.queries("q_hits")(spark, d))
    }
    spark.stop()
  }
}
