package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Http

/** HTTP source spec against an in-process stub server (no real network):
  * the reference's paginated API pull (extract_naomi_data.py:72-75) as a
  * URL-fanout DataFrame + partition-wise fetch. */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(routes: Map[String, HttpExchange => (Int, String)])(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => {
        val (code, body) = handler(ex)
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("fetch executes the combination fan-out and rows parse declaratively") {
    val served = (ind: String, per: String) =>
      s"""{"indicator":"$ind","period":"$per","values":[1,2,3]}"""
    withServer(Map("/api" -> { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val kv = q.split("&").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
      (200, served(kv("indicator"), kv("period")))
    })) { port =>
      // the reference's nested indicator x period loops, declared as a plan
      val urls = Seq("tx_new", "tx_curr").toDF("indicator")
        .crossJoin(Seq("2024Q1", "2024Q2").toDF("period"))
        .withColumn("url",
          concat(lit(s"http://127.0.0.1:$port/api?indicator="), col("indicator"),
            lit("&period="), col("period")))
      val fetched = Http.fetch(urls, "url")
      val schema = StructType(Seq(
        StructField("indicator", StringType), StructField("period", StringType),
        StructField("values", ArrayType(LongType))))
      val parsed = fetched
        .filter(col("status") === 200)
        .select(from_json(col("body"), schema).as("r"))
        .select(col("r.indicator"), col("r.period"), explode(col("r.values")).as("v"))
      assert(parsed.count() == 12)
      assert(parsed.groupBy("indicator").count().collect().forall(_.getLong(1) == 6))
    }
  }

  test("fetch retries 5xx with backoff until the endpoint recovers") {
    val hits = new AtomicInteger(0)
    withServer(Map("/flaky" -> { _ =>
      if (hits.incrementAndGet() <= 2) (500, "boom") else (200, """{"ok":true}""")
    })) { port =>
      val out = Http.fetch(
        Seq(s"http://127.0.0.1:$port/flaky").toDF("url"),
        "url", retries = 5, backoffMs = 1L).collect()
      assert(out.head.getAs[Int]("status") == 200)
      assert(hits.get() == 3)
    }
  }

  test("fetch does not retry 4xx (the server's final answer)") {
    val hits = new AtomicInteger(0)
    withServer(Map("/gone" -> { _ => hits.incrementAndGet(); (404, "not here") })) { port =>
      val out = Http.fetch(
        Seq(s"http://127.0.0.1:$port/gone").toDF("url"),
        "url", retries = 3, backoffMs = 1L).collect()
      assert(out.head.getAs[Int]("status") == 404)
      assert(hits.get() == 1)
    }
  }

  test("fetch survives a dead endpoint with status=-1 rows (failFast=false)") {
    // unroutable port: connection refused, retried, then surfaced as a row
    val out = Http.fetch(
      Seq("http://127.0.0.1:1/dead").toDF("url"),
      "url", retries = 2, backoffMs = 1L, timeoutMs = 500).collect()
    assert(out.head.getAs[Int]("status") == -1)
    assert(out.head.getAs[String]("body") != null)
  }

  test("fetch follows redirects to the final body like the reference's requests.get") {
    withServer(Map(
      "/moved" -> { ex =>
        ex.getResponseHeaders.add("Location", "/final")
        (302, "")
      },
      "/final" -> { _ => (200, "landed") })) { port =>
      val out = Http.fetch(
        Seq(s"http://127.0.0.1:$port/moved").toDF("url"), "url").collect()
      assert(out.head.getAs[Int]("status") == 200)
      assert(out.head.getAs[String]("body") == "landed")
    }
  }

  test("fetch carries the input columns through to the output rows") {
    withServer(Map("/ok" -> { _ => (200, "body") })) { port =>
      val out = Http.fetch(
        Seq((7L, s"http://127.0.0.1:$port/ok")).toDF("id", "url"), "url").collect()
      assert(out.head.getAs[Long]("id") == 7L)
      assert(out.head.getAs[String]("body") == "body")
    }
  }
}
