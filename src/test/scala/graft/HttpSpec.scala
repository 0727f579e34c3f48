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

  test("fetchPaged follows a 3-page cursor chain to exhaustion") {
    val hits = new AtomicInteger(0)
    withServer(Map("/pages" -> { ex =>
      hits.incrementAndGet()
      val page = Option(ex.getRequestURI.getQuery).getOrElse("page=0")
        .stripPrefix("page=").toInt
      val host = ex.getRequestHeaders.getFirst("Host")
      val next =
        if (page < 2) s""","next":"http://$host/pages?page=${page + 1}"""" else ""
      (200, s"""{"page":$page,"items":[${page * 10}, ${page * 10 + 1}]$next}""")
    })) { port =>
      val out = Http.fetchPaged(
        Seq(s"http://127.0.0.1:$port/pages").toDF("url"), "url",
        nextUrl = get_json_object(col("body"), "$.next"))
      // 3 pages x 1 chain, page column records the chain position
      val rows = out.select(col("page"), col("body")).orderBy("page").collect()
      assert(rows.length == 3)
      assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
      assert(hits.get() == 3, "each page must be fetched exactly once")
      val items = out
        .select(explode(from_json(get_json_object(col("body"), "$.items"),
          ArrayType(LongType))).as("v"))
        .collect().map(_.getLong(0)).sorted
      assert(items.toSeq == Seq(0L, 1L, 10L, 11L, 20L, 21L))
    }
  }

  test("fetchPaged runs chains of different depths as waves, not per-URL loops") {
    // chain a: 1 page, chain b: 3 pages — b keeps paging after a stops
    withServer(Map("/c" -> { ex =>
      val kv = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
      val (chain, page) = (kv("chain"), kv.getOrElse("page", "0").toInt)
      val depth = if (chain == "a") 1 else 3
      val host = ex.getRequestHeaders.getFirst("Host")
      val next =
        if (page + 1 < depth) s""","next":"http://$host/c?chain=$chain&page=${page + 1}""""
        else ""
      (200, s"""{"chain":"$chain","page":$page$next}""")
    })) { port =>
      val seeds = Seq("a", "b").toDF("chain")
        .withColumn("url", concat(lit(s"http://127.0.0.1:$port/c?chain="), col("chain")))
      val out = Http.fetchPaged(seeds, "url",
        nextUrl = get_json_object(col("body"), "$.next"))
      val byChain = out.groupBy("chain").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byChain == Map("a" -> 1L, "b" -> 3L))
      // input columns carry through every wave
      assert(out.columns.toSeq == Seq("chain", "url", "status", "body", "page"))
    }
  }

  test("fetchPaged maxPages bounds a runaway cursor chain") {
    withServer(Map("/loop" -> { ex =>
      val host = ex.getRequestHeaders.getFirst("Host")
      (200, s"""{"next":"http://$host/loop"}""")  // never terminates
    })) { port =>
      val out = Http.fetchPaged(
        Seq(s"http://127.0.0.1:$port/loop").toDF("url"), "url",
        nextUrl = get_json_object(col("body"), "$.next"), maxPages = 4)
      assert(out.count() == 4)
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
