package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-defending bench recheck (r16 verdict #1): prior-artifact
  * parse tolerance, calib normalization, the 3× trigger, the sub-second
  * floor, and the slowest-first cap. The recheck exists because three
  * rounds running burned a judge adjudication cycle on one anomalous
  * driver-window number (r14 asof, r15 events_stream_join 5.92 s, r16
  * dedup_clusters_star 20.3 s vs 1.09 s isolated) — the artifact now
  * carries its own isolated re-measurement. */
class BenchRecheckSpec extends AnyFunSuite {

  private val priorLine =
    """{"metric":"total","value":120,"unit":"sec","calib":0.50,""" +
      """"failed":[],"queries":{"fast_q":0.40,"slow_q":1.10,""" +
      """"heavy_q":2.00,"_rest":30.0},"sf":"/root/testdata/sf0.1"}"""

  test("parsePrior extracts calib, the per-query map, and the sf tag") {
    val p = Bench.parsePrior(priorLine)
    assert(p.calib.contains(0.50))
    assert(p.queries("slow_q") == 1.10 && p.queries("heavy_q") == 2.00)
    assert(p.queries.contains("_rest")) // harmless: no live query is _rest
    assert(p.sf.contains("/root/testdata/sf0.1"))
  }

  test("parsePrior tolerates garbage, empty, and missing-key input") {
    val empty = Bench.PriorBench(None, Map.empty, None)
    assert(Bench.parsePrior("") == empty)
    assert(Bench.parsePrior("not json {") == empty)
    assert(Bench.parsePrior("""{"metric":"total"}""") == empty)
  }

  test("3x trigger fires only above the calib-scaled prior and the floor") {
    val prior = Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.2, "d" -> 1.0)
    val mins = Map(
      "a" -> 4.0, // 4× prior → recheck
      "b" -> 2.5, // 2.5× prior → no
      "c" -> 0.7, // 3.5× prior but under the 1 s floor → no
      "e" -> 9.0) // no prior (new query) → no
    assert(Bench.outliers(mins, prior, scale = 1.0) == Seq("a"))
    // a slower host this window (calib 0.6 vs prior 0.5 → scale 1.2)
    // raises the bar: 3.5 s is no longer >3× the scaled prior of 1.2
    assert(Bench.outliers(Map("a" -> 3.5), prior, scale = 1.2).isEmpty)
    assert(Bench.outliers(Map("a" -> 3.7), prior, scale = 1.2) == Seq("a"))
  }

  test("cap keeps the slowest offenders, slowest first") {
    val prior = (1 to 12).map(i => s"q$i" -> 1.0).toMap
    val mins = (1 to 12).map(i => s"q$i" -> (3.0 + i)).toMap
    val picked = Bench.outliers(mins, prior, scale = 1.0)
    assert(picked.size == 8)
    assert(picked.head == "q12") // slowest first
    assert(!picked.contains("q1") && !picked.contains("q4"))
  }
}
