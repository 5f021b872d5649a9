package graft

import graft.Materialize.Ops
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The scaled near-dup path (sampled training + hierarchical assignment)
  * is approximate ONLY in candidate coverage — every emitted pair is
  * exact-cosine verified. This spec turns that approximation into a
  * CONTRACT: a measured recall floor against the exact flat path's pair
  * set, with both approximations engaged (perCell forced low so the
  * training sample is a strict subset even on the small fixture, and
  * C ≥ flatBelow so assignment goes through the two-hop). The smoke's
  * `sim_recall@scaledC` row measures the same quantity at sf0.1/10×
  * production geometry; this pins it in CI at fixture scale.
  */
class ScaledRecallSpec extends SparkSuite {

  test("scaled path recall vs exact flat path has a floor; every scaled " +
      "pair is a true near-dup") {
    // sf0.01, not sf0.001: the floor must be pinned at a meaningful cell
    // occupancy. 500 rows / 192 cells = 2.6 vectors per cell — a regime
    // where every pair sits on a cell boundary and recall measures the
    // degenerate geometry, not the operator (measured 0.64 there, vs 312
    // per cell in the production tuning).  5 000 rows / 192 cells = 26
    // per cell is the smallest fixture that resembles the real regime.
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet").materialize()
    val n = emb.count()
    val c = 192 // ≥ flatBelow=128 → hier assignment engaged
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val flat = pairs(Similarity.nearDupPairs(emb, c, 0.4))
    assert(flat.nonEmpty, "fixture must produce flat near-dup pairs")
    // perCell=16 → sample target 3 072 < 5 000 rows: the training sample
    // is a strict subset, so BOTH approximations are engaged
    val scaled = pairs(
      Similarity.nearDupPairsScaled(emb, c, 0.4, perCell = 16, nRows = n))
    // attribution: each approximation alone. perCell=64 → full training
    // (target ≥ n) isolates the hier assignment; flatBelow above c forces
    // exact flat assignment and isolates the sampled training.
    val hierOnly = pairs(
      Similarity.nearDupPairsScaled(emb, c, 0.4, perCell = 64, nRows = n))
    val sampleOnly = pairs(Similarity.nearDupPairsScaled(
      emb, c, 0.4, perCell = 16, flatBelow = Int.MaxValue, nRows = n))
    // precision-as-correctness: the verify stage makes every scaled pair
    // a genuine cosine ≥ threshold pair, approximation or not
    assert(scaled.values.forall(_ >= 0.4))
    def recallOf(s: Map[(Long, Long), Double]): Double =
      (flat.keySet & s.keySet).size.toDouble / flat.size
    info(f"recall both=${recallOf(scaled)}%.3f " +
      f"hierOnly=${recallOf(hierOnly)}%.3f " +
      f"sampleOnly=${recallOf(sampleOnly)}%.3f " +
      s"(flat=${flat.size}, scaled=${scaled.size})")
    assert(recallOf(scaled) >= 0.75,
      f"scaled-path recall ${recallOf(scaled)}%.3f fell below the floor")
    assert(recallOf(hierOnly) >= 0.75)
    assert(recallOf(sampleOnly) >= 0.75)
  }
}
