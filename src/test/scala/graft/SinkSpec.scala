package graft

import java.nio.file.Files

import graft.operators.Sink

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitionedCsv creates one directory per partition value") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = Seq(("202401", 1.0), ("202401", 2.0), ("202402", 3.0)).toDF("period", "v")
    Sink.writePartitionedCsv(df, "period", dir)
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("period=202401", "period=202402"))
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 3)
  }

  test("writePartitionedParquet round-trips with partition pruning") {
    val dir = Files.createTempDirectory("graft-sinkp").toString
    val df = Seq(("202401", 1.0), ("202402", 3.0)).toDF("period", "v")
    Sink.writePartitionedParquet(df, "period", dir)
    val pruned = spark.read.parquet(dir).filter($"period" === "202402")
    assert(pruned.count() == 1)
    assert(pruned.head.getAs[Double]("v") == 3.0)
  }
}
