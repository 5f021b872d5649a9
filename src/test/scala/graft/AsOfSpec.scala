package graft

import graft.operators.AsOf

/** As-of join semantics: greatest right ts <= left ts per key, inclusive
  * on ties, inner on no-prior-match.
  */
class AsOfSpec extends SparkSuite {

  test("asof picks latest right row at-or-before left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "e1"), // after r@5  -> v5
      (1L, 20L, "e2"), // ties r@20  -> v20 (inclusive)
      (1L, 4L, "e3"),  // before all -> dropped (inner)
      (2L, 99L, "e4")  // key 2 after r@50 -> w50
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 5L, "v5"), (1L, 20L, "v20"), (1L, 30L, "v30"),
      (2L, 50L, "w50")
    ).toDF("k", "t", "payload")
    val got = AsOf.asofJoin(left, right, "k", "t", Seq("payload"))
      .select("ev", "payload").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("e1" -> "v5", "e2" -> "v20", "e4" -> "w50"))
  }
}
