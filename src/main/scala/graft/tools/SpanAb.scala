package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.window_hash_keys

/** A/B harness for the substring-dedup hot-key aggregation (r13 verdict
  * task 3 — the one remaining shuffle-budget watch item): does a TWO-LEVEL
  * count (narrow per-partition run-length over locally sorted keys, counts
  * capped at minCount, then a global sum over the pre-reduced rows) beat
  * the plain `groupBy(key).count()` whose partial-agg combiner already
  * dedups per partition?
  *
  * The two-level variant's theory: stride-1 window keys are mostly unique,
  * so the plain plan's exchange carries ~(8B key + 8B partial count) per
  * corpus character; capping local counts at minCount shrinks the count to
  * an int and `sortWithinPartitions` + run-length is O(1)-memory (scale-
  * safe where a per-partition HashMap is not). Exactness: global count >=
  * minCount  iff  sum of per-partition min(count, minCount) >= minCount.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 tools/graft_java.sh -Xmx24g graft.tools.SpanAb
  * Prints per-variant hot-key counts (must match) and best-of-3 seconds.
  */
object SpanAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val minLen = 40
    val minCount = 2
    val spark = GraftSession.local()
    import spark.implicits._

    def wins = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(window_hash_keys(col("text"), minLen)).as("__key"))

    def hotPlain() = wins
      .groupBy(col("__key")).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .count()

    def hotTwoLevel() = {
      val local = wins.select(col("__key")).as[Long]
        .sortWithinPartitions("__key")
        .mapPartitions { it =>
          // run-length over the locally sorted stream: O(1) memory
          new Iterator[(Long, Int)] {
            private var cur = 0L
            private var cnt = 0
            private var primed = false
            private var pending: Option[(Long, Int)] = None
            private def advance(): Unit = {
              while (pending.isEmpty && it.hasNext) {
                val k = it.next()
                if (!primed) { cur = k; cnt = 1; primed = true }
                else if (k == cur) { if (cnt < minCount) cnt += 1 }
                else { pending = Some((cur, cnt)); cur = k; cnt = 1 }
              }
              if (pending.isEmpty && primed) { pending = Some((cur, cnt)); primed = false }
            }
            def hasNext: Boolean = { advance(); pending.nonEmpty }
            def next(): (Long, Int) = { advance(); val r = pending.get; pending = None; r }
          }
        }.toDF("__key", "__c")
      local.groupBy(col("__key")).agg(sum(col("__c")).as("__cnt"))
        .filter(col("__cnt") >= minCount)
        .count()
    }

    def time(label: String, f: () => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[spanab] $label hot=${runs.head._2} best=${runs.map(_._1).min}%.2f s " +
        s"all=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    time("plain    ", () => hotPlain())
    time("two-level", () => hotTwoLevel())
    spark.stop()
  }
}
