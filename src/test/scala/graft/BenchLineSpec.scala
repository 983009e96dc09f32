package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-output contract that shipped broken for three
  * rounds before it had a test: the single line Bench prints must be
  * strict-parseable JSON AND fit the harness's bounded output tail at
  * the CURRENT declared-query count (the harness does per-line
  * json.loads over the last 2000 chars; our budget is 1800 to leave
  * room for sbt's [success] trailer). */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def check(line: String): Unit = {
    assert(line.length <= 1800, s"line too long: ${line.length}")
    val node = mapper.readTree(line) // throws on invalid JSON
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").isNumber)
    assert(node.get("queries").isObject)
    assert(node.get("sf").asText() == "sf0.1")
    assert(node.get("failures").isNumber)
  }

  test("the line fits and parses at the current query count") {
    // worst realistic shape: every declared query at a 2-digit seconds
    // value (xx.xx), the regime where per-entry strings are longest
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 12.34)
    check(Bench.formatLine(results, "sf0.1"))
  }

  test("the line still fits at 3x the current surface") {
    val results = (1 to SparkEntry.queries.size * 3)
      .map(i => f"some_long_query_name_$i%03d" -> 123.456)
    check(Bench.formatLine(results, "sf0.1"))
  }

  test("total keeps full precision when entries collapse into _others") {
    val results = (1 to 400).map(i => s"q$i" -> 0.25)
    val line = Bench.formatLine(results, "sf0.1")
    check(line)
    val node = mapper.readTree(line)
    assert(math.abs(node.get("value").asDouble - 100.0) < 1e-9)
    assert(node.get("queries").has("_others"))
  }

  test("failure count survives into the line") {
    val results = (1 to 5).map(i => s"q$i" -> 0.25)
    val node = mapper.readTree(Bench.formatLine(results, "sf0.1", 2))
    assert(node.get("failures").asInt == 2)
  }

  test("contention-retry count survives into the line") {
    val results = (1 to 5).map(i => s"q$i" -> 0.25)
    val node = mapper.readTree(Bench.formatLine(results, "sf0.1", 0, 3))
    assert(node.get("retried").asInt == 3)
  }
}
