package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper
import java.util.concurrent.atomic.AtomicInteger

/** Planted-failure gate for Bench's output contract (round-9 verdict: the
  * round-7 "record failure reasons" advice landed without a test). Drives
  * Bench.run — the extracted measurement core — with a planted inventory:
  *   - a throwing query whose message carries a quote, a backslash and a
  *     newline (the characters jstr must escape or flatten),
  *   - a succeed-then-throw query (success in the suite pass, crash in the
  *     isolated re-time → the `isolated:` prefixed error and the -1
  *     sentinel),
  *   - a success whose NAME needs escaping.
  * Asserts both the stdout line and bench_detail.json parse as JSON
  * (Jackson, from Spark's own classpath) and that every failure reason
  * lands where the contract says.
  */
class BenchFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  private val mapper = new ObjectMapper()

  test("planted failures reach the stdout line and bench_detail errors, as valid JSON") {
    val calls = new AtomicInteger(0)
    val ok: (SparkSession, String) => DataFrame =
      (s, dir) => graft.core.Tables.region(s, dir)
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("planted \"quote\" \\slash\nsecond line ignored")
    // suite pass succeeds, isolated re-time throws — exercises the
    // `isolated:` error prefix and the -1 crash sentinel
    val flaky: (SparkSession, String) => DataFrame = (s, dir) =>
      if (calls.incrementAndGet() == 1) graft.core.Tables.nation(s, dir)
      else throw new IllegalStateException("isolated-only crash")
    val queries = Seq[(String, (SparkSession, String) => DataFrame)](
      "q_ok" -> ok,
      "q_we\"ird\\name" -> ok,
      "q_boom" -> boom,
      "q_flaky" -> flaky)

    val (line, detailLine) = Bench.run(spark, sf, queries)

    // both documents must PARSE — the whole point of jstr everywhere
    val stdout = mapper.readTree(line)
    val detail = mapper.readTree(detailLine)

    assert(stdout.get("n_queries").asInt() === 4)
    assert(stdout.get("n_failed").asInt() === 1)
    val failedNames = (0 until stdout.get("failed").size())
      .map(stdout.get("failed").get(_).asText())
    assert(failedNames === Seq("q_boom"))
    // the escaped name survives a JSON round-trip intact
    assert(stdout.get("queries").has("q_we\"ird\\name"))
    // isolated crash ships -1, never a plausible duration
    assert(stdout.get("isolated").get("q_flaky").asDouble() === -1.0)

    // detail: full per-query map, failure reasons for suite AND isolated
    assert(detail.get("queries").size() === 4)
    val errs = detail.get("errors")
    assert(errs.get("q_boom").asText().startsWith("RuntimeException: "),
      errs.get("q_boom").asText())
    // the reason keeps only the FIRST message line; quote/backslash survive
    val boomReason = errs.get("q_boom").asText()
    assert(boomReason.contains("planted \"quote\" \\slash"))
    assert(!boomReason.contains("second line"))
    assert(errs.get("isolated:q_flaky").asText()
      .startsWith("IllegalStateException: isolated-only crash"))
    val detailFailed = (0 until detail.get("failed").size())
      .map(detail.get("failed").get(_).asText())
    assert(detailFailed === Seq("q_boom"))
  }

  test("clean inventory emits no failed field on stdout and empty errors in detail") {
    val ok: (SparkSession, String) => DataFrame =
      (s, dir) => graft.core.Tables.region(s, dir)
    val (line, detailLine) = Bench.run(spark, sf, Seq("q_ok" -> ok))
    val stdout = mapper.readTree(line)
    val detail = mapper.readTree(detailLine)
    assert(stdout.get("n_failed").asInt() === 0)
    assert(!stdout.has("failed"))
    assert(detail.get("errors").size() === 0)
    assert(stdout.get("isolated").get("q_ok").asDouble() > 0.0)
  }
}
