package graft.actions

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** In-JVM transport recorder: local-mode executors share the JVM, so a
  * static object observes executor-side POSTs. */
object HttpSinkSpecState {
  val posts = new ConcurrentLinkedQueue[String]
  val failuresLeft = new AtomicInteger(0)
  val attempts = new AtomicInteger(0)
}

class HttpSinkSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import spark.implicits._

  private val transport: String => Int = payload =>
    if (HttpSinkSpecState.failuresLeft.getAndDecrement() > 0) 503
    else { HttpSinkSpecState.posts.add(payload); 200 }

  test("delivers every record in bounded JSON-array batches, retrying failures") {
    HttpSinkSpecState.posts.clear()
    HttpSinkSpecState.failuresLeft.set(2) // first two attempts 503 -> retried
    val sink = new HttpBatchSink(transport, batchSize = 2, maxRetries = 3, backoffMs = 1)
    sink.deliver(
      Seq(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4"), ("e", "5"))
        .toDF("Name", "Email").repartition(2))
    val payloads = HttpSinkSpecState.posts.asScala.toSeq
    // every batch is a JSON array of at most batchSize objects
    all(payloads.map(p => "\"Name\"".r.findAllIn(p).size)) should be <= 2
    payloads.foreach { p => p should (startWith("[") and endWith("]")) }
    // at-least-once: every record arrives despite the transient 503s
    val names = payloads.flatMap("\"Name\":\"(\\w+)\"".r.findAllMatchIn(_).map(_.group(1)))
    names.toSet shouldBe Set("a", "b", "c", "d", "e")
  }

  test("a persistently failing batch fails the delivery after maxRetries") {
    HttpSinkSpecState.posts.clear()
    HttpSinkSpecState.failuresLeft.set(Int.MaxValue)
    val sink = new HttpBatchSink(transport, batchSize = 10, maxRetries = 2, backoffMs = 1)
    val e = intercept[Exception] {
      sink.deliver(Seq(("a", "1")).toDF("Name", "Email").coalesce(1))
    }
    e.getMessage should include("retries")
  }

  test("a 4xx client error fails immediately instead of burning retries") {
    HttpSinkSpecState.attempts.set(0)
    val reject400: String => Int = _ => {
      HttpSinkSpecState.attempts.incrementAndGet(); 400
    }
    val sink = new HttpBatchSink(reject400, batchSize = 10, maxRetries = 5, backoffMs = 1)
    val e = intercept[Exception] {
      sink.deliver(Seq(("a", "1")).toDF("Name", "Email").coalesce(1))
    }
    e.getMessage should include("400")
    HttpSinkSpecState.attempts.get() shouldBe 1 // no retry on permanent failure
  }

  test("408 and 429 stay retryable (timeout/throttle are transient)") {
    HttpSinkSpecState.posts.clear()
    HttpSinkSpecState.attempts.set(0)
    val throttleOnce: String => Int = payload => {
      if (HttpSinkSpecState.attempts.incrementAndGet() <= 2) {
        if (HttpSinkSpecState.attempts.get() == 1) 429 else 408
      } else { HttpSinkSpecState.posts.add(payload); 200 }
    }
    val sink = new HttpBatchSink(throttleOnce, batchSize = 10, maxRetries = 3, backoffMs = 1)
    sink.deliver(Seq(("a", "1")).toDF("Name", "Email").coalesce(1))
    HttpSinkSpecState.posts.size shouldBe 1 // delivered after the transients
  }
}
