package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's failure-honesty contract: BENCH_r07 recorded 21
  * failed queries as phantom ~0.05 s wall-times, which read as 20x
  * speedups. A failed query must surface as an err object, never a
  * number, and must not pollute the total.
  */
class BenchJsonSpec extends AnyFunSuite {

  test("failures render as err objects, successes as numbers, total sums successes only") {
    val json = Bench.renderJson(
      Seq(
        "fast_query" -> Right(0.25),
        "broken_query" -> Left("org.apache.spark.SparkException: boom"),
        "slow_query" -> Right(1.75)),
      "/data/sf0.1")
    assert(json.contains(""""fast_query":0.25"""))
    assert(json.contains(""""slow_query":1.75"""))
    assert(json.contains(""""broken_query":{"err":"org.apache.spark.SparkException: boom"}"""))
    assert(json.contains(""""value":2.0"""), json)
    assert(json.contains(""""failed":1"""))
    assert(json.contains(""""sf":"/data/sf0.1""""))
  }

  test("err messages are JSON-escaped and truncated") {
    val nasty = "quote\" backslash\\ newline\n tab\t" + ("x" * 500)
    val json = Bench.renderJson(Seq("q" -> Left(nasty)), "sf")
    // control chars render as \u00XX literals (the string is split so the
    // Scala lexer does not itself consume the \u escape)
    assert(json.contains("""quote\" backslash\\ newline\""" + """u000a tab\""" + "u0009"))
    // truncation to 300 chars of source message
    assert(!json.contains("x" * 300))
    // the whole line must remain machine-parseable: balanced quotes,
    // no raw control characters
    assert(!json.exists(_ < ' '))
  }

  test("an all-success record carries failed:0 and no err objects") {
    val json = Bench.renderJson(Seq("a" -> Right(0.5), "b" -> Right(0.5)), "sf")
    assert(json.contains(""""failed":0"""))
    assert(!json.contains("err"))
    assert(json.contains(""""value":1.0"""))
  }
}
