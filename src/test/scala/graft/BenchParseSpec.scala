package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The orchestrator's child-line merge is the driver's whole perf gate —
  * if the parse drops or invents a (query, seconds) pair, the round's
  * bench is wrong. No Spark needed. */
class BenchParseSpec extends AnyFunSuite with Matchers {

  test("parseQueryTimes extracts every query pair; never value/sf/queries keys") {
    val line =
      """{"metric":"total","value":12.69,"unit":"sec","queries":{""" +
        """"q100_quantile_filter":0.206405619,"q10_watermark_filter":-1.0,""" +
        """"q318_permutation_test":4.7E-1},"sf":"/root/testdata/sf0.1"}"""
    Bench.parseQueryTimes(line) shouldBe Seq(
      ("q100_quantile_filter", 0.206405619),
      ("q10_watermark_filter", -1.0),
      ("q318_permutation_test", 0.47))
  }

  test("compact final line (n_queries present) parses the same pairs") {
    val line =
      """{"metric":"total","value":8.0,"unit":"sec","sf":"/x","n_queries":2,""" +
        """"queries":{"q44_embed_neardup_lsh":1.42,"q38_ivf_topk":2.29}}"""
    Bench.parseQueryTimes(line).toMap shouldBe Map(
      "q44_embed_neardup_lsh" -> 1.42, "q38_ivf_topk" -> 2.29)
  }

  test("non-JSON noise and empty query maps yield nothing") {
    Bench.parseQueryTimes("[bench] shard 1/4: 84 queries (a..b)") shouldBe empty
    Bench.parseQueryTimes("""{"metric":"total","value":0.0,"unit":"sec","queries":{},"sf":"d"}""") shouldBe empty
  }

  test("parseWarmSec reads the warm_sec field and ignores lines without one") {
    val line =
      """{"metric":"total","value":12.69,"unit":"sec","warm_sec":3.25,""" +
        """"queries":{"q100_quantile_filter":0.2},"sf":"/d"}"""
    Bench.parseWarmSec(line) shouldBe Some(3.25)
    // warm_sec never matches a query pair, and legacy lines parse as before
    Bench.parseQueryTimes(line) shouldBe Seq(("q100_quantile_filter", 0.2))
    Bench.parseWarmSec("""{"metric":"total","value":1.0,"queries":{}}""") shouldBe None
  }

  test("a round-trip through the emitted format is lossless") {
    val in = Seq(("q01_pricing_summary", 0.52), ("q336_perceptual_neardup", 2.08),
      ("q90_stream_sessionize", -1.0))
    val qs = in.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":2.6,"unit":"sec","queries":$qs,"sf":"/d"}"""
    Bench.parseQueryTimes(line) shouldBe in
  }
}
