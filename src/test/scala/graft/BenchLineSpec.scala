package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench stdout contract: the driver's log collector keeps a
  * 2000-char tail (BENCH_r01-r04 all failed to parse — first from log
  * noise, then because the full per-query map outgrew the window), so
  * the compact line must stay complete-JSON and comfortably inside the
  * tail for EVERY battery size, including the all-queries-failing
  * worst case. */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def results(err: Option[String]): Seq[(String, Double, Option[String])] =
    SparkEntry.queries.keys.toSeq.sorted.map(k => (k, 1.23456789, err))

  test("compact stdout line parses as complete JSON and fits the tail window") {
    val (full, line) = Bench.renderLines(results(None), "/root/testdata/sf0.1",
      loadStart = 31.25, loadEnd = 2.5, cpuSec = 1234.5,
      sentinels = Seq((1.234, 0.12), (1.301, 0.15), (5.678, 9.81), (1.25, 0.2)))
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("nq").asInt() == SparkEntry.queries.size)
    assert(node.get("queries").size() > 10)
    assert(node.get("errors").size() == 0)
    // contention telemetry rides both lines so a loaded-VM round (see
    // BENCH_r07's 10-20x swings) is distinguishable from a regression
    assert(node.get("load_start").asDouble() == 31.25)
    assert(node.get("load_end").asDouble() == 2.5)
    assert(node.get("cpu_sec").asDouble() == 1234.5)
    // in-run noise sentinel (VERDICT r10 #1): 4 fixed-work probe timings +
    // the loadavg observed at each, so a mid-battery contention burst is
    // visible inside the artifact itself
    assert(node.get("sentinel").size() == 4)
    assert(node.get("sentinel").get(2).asDouble() == 5.678)
    assert(node.get("sentinel_load").get(2).asDouble() == 9.81)
    // 2000-char collector tail minus sbt's trailing success line (~80)
    assert(line.length <= 1800, s"stdout line too long: ${line.length}")
    // the file line carries EVERY query at full precision
    val fullNode = mapper.readTree(full)
    assert(fullNode.get("queries").size() == SparkEntry.queries.size)
    assert(fullNode.get("cpu_sec").asDouble() == 1234.5)
  }

  test("failures surface on stdout even for non-headline queries") {
    val rs = results(None).zipWithIndex.map { case ((k, v, _), i) =>
      if (i == 0) (k, v, Some("boom: it broke")) else (k, v, None)
    }
    val failing = rs.head._1
    val (_, line) = Bench.renderLines(rs, "/root/testdata/sf0.1")
    val node = mapper.readTree(line)
    assert(node.get("errors").has(failing))
    assert(node.get("nerr").asInt() == 1)
    // failed queries report negated time so they can't read as fast wins
    assert(node.get("queries").get(failing).asDouble() < 0)
  }

  test("worst case — every query failing — still fits the tail window") {
    val rs = results(Some("x" * 300))
    val (full, line) = Bench.renderLines(rs, "/root/testdata/sf0.1")
    val node = mapper.readTree(line)
    // stdout caps the error payload (3 messages @ 80 chars + a count) so
    // the line STILL fits the collector tail when everything fails — the
    // full errors object lives only in the file copy
    assert(node.get("errors").size() == 3)
    assert(node.get("nerr").asInt() == SparkEntry.queries.size)
    assert(line.length <= 1800, s"stdout line too long: ${line.length}")
    assert(!line.contains("\n"))
    assert(mapper.readTree(full).get("errors").size() == SparkEntry.queries.size)
  }
}
