package graft.tools

import org.apache.spark.sql.DataFrame

import graft.{GraftSession, SparkEntry}

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
    val q = SparkEntry.queries("q_er_pipeline")(spark, d)
    q.explain("formatted")
    time("q_er_pipeline warm1")(noop(q))
    time("q_er_pipeline warm2")(noop(q))
    spark.stop()
  }
}
