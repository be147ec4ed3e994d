package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-facing bench contract: the ONE stdout JSON line must
  * survive the driver harness, which keeps only the last ~2000 characters
  * of the run's output (including sbt's ~80-char trailing "[success]"
  * line) before json-parsing. Rounds 1/3/4 lost their bench numbers to a
  * too-long line (BENCH_r0{1,3,4}.json: `"parsed": null`).
  */
class BenchFormatSpec extends AnyFunSuite {

  private def fakeResults: Seq[(String, Seq[Double])] =
    SparkEntry.queries.keys.toSeq.sorted.map { n =>
      // worst-case realistic widths: two-digit integer part, 4dp samples
      n -> Seq(13.3713, 9.0401, 10.5512, 8.4477, 12.0009)
    }

  test("compact stdout line fits the driver's 2000-char tail window") {
    val line = Bench.compactJson(fakeResults, Nil, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    // 2000-char tail minus ~120 chars of sbt trailing decoration
    assert(line.length <= 1880,
      s"compact bench line is ${line.length} chars; the driver tail " +
        "window will truncate it and the round's bench numbers are lost. " +
        "Trim the format (or the query-name budget) before adding queries.")
  }

  test("compact line survives growth margin past the live query count") {
    // derived from SparkEntry.queries.size so the margin cannot drift
    // (round-11 advice: a hardcoded count went stale the round after it
    // was written). The qNN keys hit the ceiling at 153 queries
    // (round 12), so the compact keys are now bare numbers — with
    // NN keys and 1-decimal seconds the format holds to ~170 queries;
    // when THIS test starts failing again, shrink further (e.g.
    // integer seconds past 10s) BEFORE adding more queries, not after
    // a round's numbers are lost.
    val n = SparkEntry.queries.size + 3
    val many = (1 to n).map(i => s"q${i}_some_realistic_query_name" ->
      Seq(13.3713, 9.0401, 10.5512, 8.4477, 12.0009))
    // worst case: several failures render as null AND fill the failed array
    val failed = Seq(34, 36, 107, 114, n).map(i => s"q${i}_some_realistic_query_name")
    val line = Bench.compactJson(
      many.map { case (k, ss) => if (failed.contains(k)) k -> Seq.empty[Double] else k -> ss },
      failed, "/root/testdata/sf0.1")
    assert(line.length <= 1880,
      s"line is ${line.length} chars at $n queries + 5 failed; the driver " +
        "tail window holds ~1880 — shrink the compact format now.")
  }

  test("compact line is valid JSON shape with per-query numbers") {
    val line = Bench.compactJson(fakeResults, Seq("q99_dead"), "/root/testdata/sf0.1")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""""unit":"sec""""))
    // bare-number keys on the stdout line; full names live in bench_out.json
    assert(line.contains(""""1":8.4"""))
    assert(!line.contains(""""q1_pricing_summary""""))
    assert(line.contains(""""failed":["99"]"""))
    assert(line.endsWith(""""sf":"sf0.1"}"""))
  }

  test("shortName maps qNN_suffix to NN and leaves other names intact") {
    assert(Bench.shortName("q7_dedup_rank") == "7")
    assert(Bench.shortName("q104_foo") == "104")
    assert(Bench.shortName("warmup") == "warmup")
    assert(Bench.shortName("qx_notdigits") == "qx_notdigits")
  }

  test("failed query renders as null in compact and full lines") {
    val rs = Seq("q_ok" -> Seq(1.0), "q_bad" -> Seq.empty[Double])
    val c = Bench.compactJson(rs, Seq("q_bad"), "/x/sf0.01")
    assert(c.contains(""""q_bad":null"""))
    val full = Bench.fullJson(rs, Seq("q_bad"), 5, "/x/sf0.01")
    assert(full.contains(""""q_bad":null""") && full.contains(""""q_bad":[]"""))
    assert(full.contains(""""samples""""))
  }
}
