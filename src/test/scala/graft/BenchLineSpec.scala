package graft

/** The compact final Bench line's tail-window contract (r19): the driver
  * captures only the LAST 2,000 characters of output, and PERF_r{N}'s
  * per-query comparison needs a complete JSON object with per-query data
  * inside that window. These pins keep the qmed encoding honest: short
  * keys must stay unique (else the mapping to query names is ambiguous)
  * and the whole line must stay comfortably under the window even with
  * every field populated.
  */
class BenchLineSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("headline short keys (prefix before first underscore) are unique") {
    val pref = Bench.headline.map(_.takeWhile(_ != '_'))
    val dup = pref.groupBy(identity).filter(_._2.length > 1).keys.toSeq
    assert(dup.isEmpty, s"colliding short keys: $dup — qmed would fall back to full names and overflow the tail window")
  }

  test("simulated compact line fits the 2,000-char driver tail with margin") {
    // worst realistic sf0.1 shape: every median printed as two digits
    // before the point (99.99) — far above any observed per-query median
    val qmed = Bench.headline.map(n =>
      "\"" + n.takeWhile(_ != '_') + "\":99.99").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":999.999,"unit":"sec","sf":"/root/testdata/sf0.1",""" +
      s""""n_queries":${Bench.headline.length},"queries_artifact":"BENCH_LOCAL.json"""" +
      s""","climate":{"geomean":1.543},"qmed":$qmed}"""
    // leave ≥150 chars of headroom for sbt's trailing [success] line
    assert(line.length <= 1850, s"compact line ${line.length} chars — tail window overflow risk")
  }
}
