package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Builds the declared-scale fixtures used by SURVEY §6's sf1 tables:
  * a 10×-replicated, key-shifted copy of the sf0.1 bench data in
  * `/tmp/sf1`, plus the `sf1p` population variant (customer ×10) in
  * `/tmp/sf1p`. Committed so the recipe is reproducible instead of the
  * ad-hoc per-round DuckDB COPY used through r12.
  *
  * The r12 verdict flagged that DuckDB COPY writes ONE row group per
  * table, which serializes Spark's scan stage and contaminates the sf1
  * points of scan-bound queries (q_stupid_backoff measured 15.3 s on the
  * single-row-group file vs 5.5 s split). This generator writes every
  * fact through Spark at `repartition(32)` — 32 parquet files per table,
  * the multi-file layout a real 100 TB corpus ships — so sf1 points
  * measure plans, not fixture files.
  *
  * Replication recipe (r9, SURVEY §6): facts ×10 with bigint keys shifted
  * by `r*KEY_SHIFT` so each replica joins its own replica (lineitem 6M,
  * orders 1.5M, events 1M, documents 500k, embeddings 20k); dims kept 1×,
  * so fact-dim joins fan out 10× on the fact side. Documents get a
  * per-replica text suffix (exact dedup must not collapse replicas);
  * embeddings get a per-replica perturbation of the first component (ANN
  * neighborhoods must not degenerate to 10-way ties). `sf1p` re-links sf1
  * and replaces customer with a ×10 key-shifted copy (hashed-coord
  * consumers then see a point set that truly grows 10×).
  */
object MakeSf1 {
  private val KeyShift = 100000000L

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val outP = if (args.length > 1) args(1) else "/tmp/sf1p"
    val spark = GraftSession.local()

    def read(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")
    def write(df: DataFrame, dir: String, t: String): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$dir/$t.parquet")

    // Each replica r = 0..9 key-shifts every bigint key by the SAME
    // r*KeyShift, so replica-local joins stay 1:1 and global cardinality
    // is exactly 10×.
    def replicate(df: DataFrame, shiftCols: Seq[String])(
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until 10)
        .map { r =>
          val shifted = shiftCols.foldLeft(df)((d, c) =>
            d.withColumn(c, col(c) + lit(r * KeyShift)))
          perReplica(shifted, r)
        }
        .reduce(_.unionByName(_))

    write(replicate(read("lineitem"), Seq("l_orderkey"))(), out, "lineitem")
    write(replicate(read("orders"), Seq("o_orderkey"))(), out, "orders")
    write(replicate(read("events"), Seq("event_id"))(), out, "events")
    write(
      replicate(read("documents"), Seq("doc_id")) { (d, r) =>
        d.withColumn("text", concat(col("text"), lit(s" replica$r")))
          .withColumn("n_chars", length(col("text")).cast("long"))
      },
      out, "documents")
    write(
      replicate(read("embeddings"), Seq("vec_id")) { (d, r) =>
        d.withColumn(
          "embedding",
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + lit(r * 0.001f)).otherwise(x)))
      },
      out, "embeddings")
    // Dims stay 1× — rewritten through Spark so every table in the fixture
    // has the multi-file layout.
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      read(t).repartition(4).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    // sf1p: the population variant — customer ×10 key-shifted, everything
    // else symlinked to sf1.
    val pDir = Paths.get(outP)
    if (!Files.exists(pDir)) Files.createDirectories(pDir)
    write(replicate(read("customer"), Seq("c_custkey"))(), outP, "customer")
    Seq("region", "nation", "supplier", "part", "lineitem", "orders",
      "events", "documents", "embeddings").foreach { t =>
      val link = pDir.resolve(s"$t.parquet")
      if (!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        Files.createSymbolicLink(link, Paths.get(out, s"$t.parquet").toAbsolutePath)
    }
    println(s"[makesf1] wrote $out and $outP from $base")
    spark.stop()
  }
}
