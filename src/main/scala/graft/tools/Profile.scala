package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.operators._
import graft.sources.Tables

/** Dev-only micro-profiler: times sub-plans of the slow bench queries so
  * regressions are attributable to a specific stage, not a whole query.
  * Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, d)
    println(s"[profile] docs rows=${docs.count()}")
    println(s"[profile] docs total text chars=${docs.select(sum(length(col("text")))).head().getLong(0)}")
    time("md5 exact dedup (no sort)")(noop(Dedup.exact(docs, "doc_id", "text")))
    time("md5 exact dedup (again)")(noop(Dedup.exact(docs, "doc_id", "text")))
    time("md5 exact dedup + orderBy")(noop(Dedup.exact(docs, "doc_id", "text").orderBy("keep_id")))

    time("q1_agg (cold lineitem)")(noop(SparkEntry.queries("q1_agg")(spark, d)))
    time("q1_agg (warm)")(noop(SparkEntry.queries("q1_agg")(spark, d)))

    val emb = Tables.embeddings(spark, d)
    println(s"[profile] embeddings rows=${emb.count()} dim=${emb.select(size(col("embedding"))).head().getInt(0)}")
    time("lsh signature only")(noop(
      emb.select(col("vec_id"), Similarity.lshSignature(col("embedding"), 0, 12).as("sig"))))
    time("q_ann_lsh full")(noop(SparkEntry.queries("q_ann_lsh")(spark, d)))
    time("q_cosine_topk full")(noop(SparkEntry.queries("q_cosine_topk")(spark, d)))

    time("q_json_extract")(noop(SparkEntry.queries("q_json_extract")(spark, d)))
    time("q_json_extract no sort")(noop(
      Tables.events(spark, d).select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))))
    spark.stop()
  }
}
