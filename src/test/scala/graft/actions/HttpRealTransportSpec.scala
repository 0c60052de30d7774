package graft.actions

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec

/** REAL-TRANSPORT smoke for S17 — the HTTP action fan-out
  * (/root/reference/adf/pipeline.json:416-438). `HttpSinkSpec` pins the
  * protocol logic against an in-JVM recorder; this spec closes the last
  * transport gap the README documents by running [[HttpBatchSink]]
  * through an ACTUAL `java.net.http.HttpClient` POST to an actual HTTP
  * server (JDK built-in `com.sun.net.httpserver`, bound to loopback — no
  * network egress), exactly the production wiring the README prescribes:
  * a `payload => status` function built on java.net.http, initialized on
  * the executor side.
  */
class HttpRealTransportSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(handler: (String, AtomicInteger) => Int)
                        (body: (Int, ConcurrentLinkedQueue[String], AtomicInteger) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[String]()
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", exchange => {
      val payload = new String(exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val status = handler(payload, hits)
      if (status == 200) received.add(payload)
      exchange.sendResponseHeaders(status, -1)
      exchange.close()
    })
    server.start()
    try body(server.getAddress.getPort, received, hits)
    finally server.stop(0)
  }

  /** The production transport from the README: one HttpClient per call
    * keeps the closure trivially serializable for executor-side use (a
    * real deployment hoists it into a per-partition lazy val). */
  private def realPost(port: Int): String => Int = { payload =>
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:$port/hook"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(payload))
      .build()
    client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  test("HttpBatchSink delivers JSON batches over a real loopback socket; " +
    "payloads parse and cover every record exactly once") {
    withServer((_, _) => 200) { (port, received, _) =>
      val records = Seq(("ada", "a@x.io"), ("grace", "g@x.io"),
        ("edsger", "e@x.io"), ("barbara", "b@x.io"), ("alan", "t@x.io"))
        .toDF("name", "email")
      new HttpBatchSink(realPost(port), batchSize = 2, maxRetries = 2,
        backoffMs = 1).deliver(records)
      val names = scala.jdk.CollectionConverters.CollectionHasAsScala(received)
        .asScala.toSeq
        .flatMap(p => """"name":"([a-z]+)"""".r.findAllMatchIn(p).map(_.group(1)))
      names.sorted shouldBe Seq("ada", "alan", "barbara", "edsger", "grace")
      // batchSize 2 over 5 rows → every payload is a JSON array of ≤ 2
      scala.jdk.CollectionConverters.CollectionHasAsScala(received).asScala
        .foreach { p =>
          p should startWith("[")
          """"name"""".r.findAllIn(p).size should be <= 2
        }
    }
  }

  test("transient 5xx over the real socket retries the SAME payload and " +
    "succeeds; permanent 4xx fails the job fast") {
    // first hit 503, second 200: the retry re-POSTs the identical batch
    withServer((_, hits) => if (hits.incrementAndGet() == 1) 503 else 200) {
      (port, received, hits) =>
        val one = Seq(("retry", "r@x.io")).toDF("name", "email")
        new HttpBatchSink(realPost(port), batchSize = 10, maxRetries = 3,
          backoffMs = 1).deliver(one)
        hits.get() shouldBe 2
        received.size() shouldBe 1
        received.peek() should include(""""name":"retry"""")
    }
    withServer((_, _) => 400) { (port, _, _) =>
      val one = Seq(("nope", "n@x.io")).toDF("name", "email")
      val ex = intercept[org.apache.spark.SparkException] {
        new HttpBatchSink(realPost(port), batchSize = 10, maxRetries = 5,
          backoffMs = 1).deliver(one)
      }
      ex.getMessage should include("400")
    }
  }
}
