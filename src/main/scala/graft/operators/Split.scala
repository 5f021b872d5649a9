package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting for training-data pipelines
  * ([EXT]) — the property that matters at every scale is REPRODUCIBILITY
  * WITHOUT COORDINATION: the split of a row is a pure function of its
  * key (salted md5), so any cluster size, any partitioning, any re-run
  * produces the same assignment, and adding documents never reshuffles
  * existing ones between splits (the classic eval-contamination accident
  * of `ORDER BY rand()` splits).
  *
  * Three shapes, by what the caller can afford:
  *
  *  - [[threshold]]: pure map — split by hash range, proportions
  *    approximate (exact in expectation). Zero shuffles; the production
  *    default at 100 TB.
  *  - [[stratified]]: exact per-stratum quotas (ceil semantics) via one
  *    rank per stratum — a per-stratum sort, the honest price of
  *    exactness; use when stratum sizes are small enough to sort or
  *    quotas must be audit-exact.
  *  - [[byGroup]]: leak-free grouped split — every member of a group
  *    (near-dup cluster, domain, author) lands in the SAME split, so
  *    near-duplicates can never straddle train/test. Proportions are
  *    approximate (groups are atoms); a pure map over a (row, group)
  *    frame.
  */
object Split {

  /** The deterministic 60-bit order/assignment key: numeric md5 prefix
    * (15 hex chars < 2^60 — fits a BIGINT in Spark and DuckDB alike),
    * salted so independent splits of the same corpus decorrelate.
    */
  def hashKey(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Hash-range split: `split` ∈ train/val/test by `pctTrain`/`pctVal`
    * percent buckets of the key hash. Pure projection — no shuffle, no
    * state; proportions are exact in expectation only.
    */
  def threshold(df: DataFrame, key: Column, pctTrain: Int, pctVal: Int,
      salt: String = "split"): DataFrame = {
    require(pctTrain > 0 && pctVal >= 0 && pctTrain + pctVal < 100,
      s"percent buckets must partition 0..99: train=$pctTrain val=$pctVal")
    val b = pmod(hashKey(salt, key), lit(100L))
    df.withColumn("split",
      when(b < pctTrain, "train")
        .when(b < pctTrain + pctVal, "val")
        .otherwise("test"))
  }

  /** Exact-quota stratified split: within each stratum, rows in salted
    * hash order fill train up to ceil(fTrain·n), then val up to
    * ceil((fTrain+fVal)·n), then test. One rank + one count window per
    * stratum (a per-stratum sort — the price of exact quotas; see
    * [[threshold]] for the O(1) production shape).
    */
  def stratified(df: DataFrame, strata: Seq[String], key: Column,
      fTrain: Double, fVal: Double, salt: String = "split"): DataFrame = {
    require(fTrain > 0 && fVal >= 0 && fTrain + fVal < 1.0,
      s"fractions must partition [0,1): train=$fTrain val=$fVal")
    val ord = Window.partitionBy(strata.map(col): _*).orderBy(col("_graft_k"))
    val all = Window.partitionBy(strata.map(col): _*)
    df.withColumn("_graft_k", hashKey(salt, key))
      .withColumn("_graft_rn", row_number().over(ord))
      .withColumn("_graft_n", count(lit(1)).over(all))
      .withColumn("split",
        when(col("_graft_rn") <= ceil(col("_graft_n") * fTrain), "train")
          .when(col("_graft_rn") <=
            ceil(col("_graft_n") * (fTrain + fVal)), "val")
          .otherwise("test"))
      .drop("_graft_k", "_graft_rn", "_graft_n")
  }

  /** Leak-free grouped split: the assignment hashes the GROUP id, so
    * every row of a group shares a split by construction — the guard a
    * dedup pipeline needs between near-dup clustering and train/test
    * separation. Same pure-map shape as [[threshold]].
    */
  def byGroup(df: DataFrame, groupCol: String, pctTrain: Int, pctVal: Int,
      salt: String = "split"): DataFrame =
    threshold(df, col(groupCol), pctTrain, pctVal, salt)

  /** Deterministic mixture resampling — re-weight strata (domains,
    * languages, sources) to target rates, the data-mixing step every
    * LLM pretraining pipeline runs after curation. `rates` maps a
    * stratum to its sampling rate: `0.25` keeps a deterministic quarter
    * of the stratum; `2.5` emits every row twice plus a deterministic
    * half again (fractional EPOCHS — upweighting without materializing
    * copies upstream). Rows of unlisted strata pass at `defaultRate`.
    * Output rows carry `mix_copy` (0-based repetition index, for
    * downstream shuffling/packing to decorrelate the copies).
    *
    * Pure map + explode — no shuffle, no state: the decision for a row
    * is a function of (salt, key, stratum rate), so the same corpus and
    * rates reproduce the same mixture on any cluster, and growing the
    * corpus never flips earlier keep/drop decisions (stable mixtures
    * across incremental re-curations).
    */
  def mixture(df: DataFrame, strataCol: String, rates: Map[String, Double],
      key: Column, defaultRate: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0),
      "sampling rates must be non-negative")
    val rate = coalesce(
      element_at(typedLit(rates), col(strataCol)), lit(defaultRate))
    // copies = floor(rate) + one more iff the row's hash bucket falls
    // under the fractional remainder — exact in expectation per stratum,
    // deterministic per row
    val b = pmod(hashKey(salt, key), lit(1000000L)).cast("double") / 1000000.0
    val copies = floor(rate).cast("long") +
      when(b < (rate - floor(rate)), 1L).otherwise(0L)
    df.withColumn("_graft_copies", copies)
      .filter(col("_graft_copies") > 0)
      .withColumn("mix_copy",
        explode(sequence(lit(0L), col("_graft_copies") - 1)))
      .drop("_graft_copies")
  }
}
