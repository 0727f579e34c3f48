package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv source round-trips typed rows with header + schema inference") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0)).toDF("id", "name", "score")
    df.write.option("header", "true").csv(dir)
    val back = Tables.csv(spark, dir).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("name") == "alpha")
    assert(back(1).getAs[Double]("score") == -2.0)
  }

  test("jsonLines source reads nested records") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/out"
    Seq("""{"id":1,"meta":{"lang":"en","tags":["a","b"]}}""",
      """{"id":2,"meta":{"lang":"fr","tags":[]}}""").toDF("value")
      .write.text(dir)
    val back = Tables.jsonLines(spark, dir).orderBy("id")
    assert(back.count() == 2)
    assert(back.select(col("meta.lang")).collect().map(_.getString(0)).toSeq == Seq("en", "fr"))
    assert(back.select(size(col("meta.tags"))).head.getInt(0) == 2)
  }

  test("csvGrid skips leading decoration rows before the real header") {
    val dir = Files.createTempDirectory("graft-grid").toString + "/sheet"
    Seq("Rapport PNLS — T4", "Region: Centre", "site,indicateur,valeur",
      "s1,tx_new,10", "s2,tx_new,12").toDF("value").coalesce(1).write.text(dir)
    val back = Tables.csvGrid(spark, dir, skipLines = 2).orderBy("site").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("site") == "s1")
    assert(back(0).getAs[Int]("valeur") == 10)
  }

  test("parquet named accessors expose the full star schema") {
    assert(Tables.lineitem(spark, sf).count() > 0)
    assert(Tables.nation(spark, sf).count() == 25)
    assert(Tables.region(spark, sf).count() == 5)
    // events ns-timestamp handling: ts must surface as a real timestamp
    assert(Tables.events(spark, sf).schema("ts").dataType.typeName == "timestamp")
  }
}
