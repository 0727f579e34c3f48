package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dev-only plan snapshotter for the optimization rounds: writes
  * `.explain("formatted")` for the named queries to `<outDir>/<name>_<tag>.txt`
  * so plan-shape claims (Exchange counts, join strategies, PushedFilters)
  * are checkable without running Spark.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> q_a,q_b,...
  * Streaming twins (whose builder EXECUTES a stream before returning the
  * memory-sink result) are skipped — their returned plan is just the sink
  * scan, and building it would run the stream.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <tag> <q_a,q_b,...>")
    val Array(outDir, tag, list) = args
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.local()
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(_) if name.endsWith("_stream") =>
          System.err.println(s"[plandump] skipping streaming twin: $name")
        case Some(fn) =>
          val df = fn(spark, d)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.write(Paths.get(outDir, s"${name}_$tag.txt"), txt.getBytes("UTF-8"))
          System.err.println(s"[plandump] wrote $name ($tag)")
      }
    }
    spark.stop()
  }
}
