package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** HTTP row source — the reference pulls NAOMI rows from a paginated REST
  * API, one `requests.get` per (indicator, age, sex, period) combination
  * (extract_naomi_data.py:37,72-75).
  *
  * graft shape: the caller declares the request fan-out as DATA — a
  * DataFrame with a URL column, typically built by cross-joining the
  * combination dimensions (exactly the reference's nested loops, as a plan)
  * — and [[fetch]] executes the requests partition-wise on the executors:
  * each partition shares one keep-alive client, so a million-URL crawl
  * spreads over the cluster with per-task connection reuse and no driver
  * bottleneck. Responses come back as rows (status, body) to be parsed
  * declaratively (`from_json` + explode), keeping the only imperative part
  * — the socket I/O Spark has no operator for — inside one narrow
  * `mapPartitions`.
  *
  * Retries with exponential backoff happen per request inside the task
  * (5xx and connect errors; 4xx is the server's final answer). With
  * `failFast=false` (default) exhausted retries yield a row with
  * status = -1 and the error message as body, so one dead endpoint can't
  * kill a million-row crawl — filter `status = 200` downstream.
  */
object Http {

  /** Fetch every URL in `df(urlCol)`, appending `status: int` and
    * `body: string` columns.
    *
    * @param timeoutMs  per-request timeout
    * @param retries    attempts per URL (>=1); 5xx / transport errors retry
    * @param backoffMs  base backoff, doubled per attempt
    * @param failFast   true = throw on an exhausted URL (fails the task);
    *                   false = emit status=-1 with the error as body
    */
  def fetch(
      df: DataFrame,
      urlCol: String,
      timeoutMs: Int = 10000,
      retries: Int = 3,
      backoffMs: Long = 100L,
      failFast: Boolean = false): DataFrame = {
    val urlIdx = df.schema.fieldIndex(urlCol)
    val outSchema = StructType(
      df.schema.fields ++ Seq(
        StructField("status", IntegerType, nullable = false),
        StructField("body", StringType, nullable = true)))
    df.mapPartitions { rows =>
      // one keep-alive client per task: connection reuse across the
      // partition's URLs, the amortization the reference gets from a
      // requests.Session
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(timeoutMs.toLong))
        // follow 301/302 like the reference's requests.get; without this a
        // redirect is the "final" answer with an empty body and gets silently
        // dropped by the documented `filter status = 200` pattern
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build()
      rows.map { row =>
        val url = row.getString(urlIdx)
        var attempt = 0
        var status = -1
        var body: String = null
        var done = false
        while (!done) {
          attempt += 1
          try {
            val req = HttpRequest.newBuilder(URI.create(url))
              .timeout(Duration.ofMillis(timeoutMs.toLong))
              .GET()
              .build()
            val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
            status = resp.statusCode()
            body = resp.body()
            // 5xx is retryable; anything else is the server's final answer
            done = status < 500 || attempt >= retries
          } catch {
            case e: InterruptedException => throw e
            case e: Exception =>
              status = -1
              body = s"${e.getClass.getSimpleName}: ${e.getMessage}"
              done = attempt >= retries
          }
          if (!done) Thread.sleep(backoffMs << (attempt - 1))
        }
        if (failFast && (status < 200 || status >= 300)) {
          throw new RuntimeException(s"HTTP fetch failed after $attempt attempts: $url -> $status $body")
        }
        Row.fromSeq(row.toSeq :+ status :+ body)
      }
    }(Encoders.row(outSchema))
  }
}
