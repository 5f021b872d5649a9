package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at cluster scale.
  *
  * A single groupBy on a skewed key funnels the hot key's entire volume
  * through one reducer. Salting splits each key into `salts` sub-keys for a
  * parallel partial aggregate, then re-aggregates the partials — the hot
  * key's work spreads over `salts` reducers at the cost of a second (tiny)
  * shuffle. AQE's skew-join handling covers joins; this covers aggregates
  * whose skew AQE cannot split (single-key hash agg).
  *
  * Only algebraic aggregates survive two-phase re-aggregation; the helpers
  * here cover the count/sum family the engine uses.
  */
object Skew {

  /** Deterministic salt from a stable hash of spread columns (NOT rand():
    * retries and speculative tasks must agree on the salt).
    */
  def salt(salts: Int, spreadCols: Column*): Column =
    pmod(hash(spreadCols: _*), lit(salts))

  /** Salt factor chosen from OBSERVED key-group cardinalities — replaces
    * the guess-a-constant default at the self-join entry points. One
    * aggregation pass (count per key with map-side combine, then a
    * single max — no data collected to the driver beyond one long)
    * measures the hottest group; the salt is sized so each (saltL,
    * saltR) shard of that group's pair space stays near
    * `targetPerShard²` pairs:
    *
    *   salts = clamp(ceil(maxGroup / targetPerShard), 1, maxSalts)
    *
    * Uniform data costs nothing (salts = 1 → the plain join, zero
    * replication); a degenerate group (boilerplate bucket, dominant IVF
    * cell) fans its pair space over salts² reducers. The pre-pass is
    * priced for call sites whose keyed frame is already materialized —
    * both LSH-shaped entry points materialize the frame for the join's
    * two sides anyway, so the count pass re-reads checkpointed blocks.
    * Caveat: under `spark.graft.materialize=none` (the measurement mode)
    * materialize() is a pass-through, so this pass re-executes the
    * keyed frame's lineage eagerly at plan-construction time — pass an
    * explicit `salts` there if that cost matters.
    * `maxSalts` bounds the replication cost (shuffle grows salts×):
    * beyond it a group is so degenerate that capping/df-filtering
    * upstream (the containment join's defense) beats more fan-out.
    */
  def adaptiveSalts(
      df: DataFrame,
      keyCols: Seq[String],
      targetPerShard: Long = 2048L,
      maxSalts: Int = 16): Int = {
    require(targetPerShard >= 1 && maxSalts >= 1)
    val r = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(max("n")).head()
    if (r.isNullAt(0)) 1 // empty input: nothing to shard
    else {
      val hottest = r.getLong(0)
      val s = math.ceil(hottest.toDouble / targetPerShard).toInt
      math.max(1, math.min(maxSalts, s))
    }
  }

  /** Salted within-group pair generation (self-join on `keyCols` with
    * `l.idCol < r.idCol`). A hot group of B rows produces B² pairs through
    * ONE reducer in the naive self-join; here each side is sharded by a
    * deterministic salt of its id and replicated `salts`× against the other
    * side's shards, so the join keys become (keyCols, saltL, saltR) and the
    * hot group's pair space spreads over salts² reducers at the cost of a
    * salts× larger (but narrow) shuffle. Every qualifying pair lands in
    * exactly one (saltL, saltR) shard — no dedup needed beyond the caller's.
    *
    * Output: the joined frame under aliases `l` and `r` — select with
    * qualified columns, e.g. `col("l.doc_id")`.
    */
  def saltedSelfJoin(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val keyEq = keyCols.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val ordered = col(s"l.$idCol") < col(s"r.$idCol")
    if (salts == 1) {
      df.alias("l").join(df.alias("r"), keyEq && ordered)
    } else {
      val own = salt(salts, col(idCol))
      val shards = explode(array((0 until salts).map(lit): _*))
      val l = df.withColumn("__sl", own).withColumn("__sr", shards).alias("l")
      val r = df.withColumn("__sr", own).withColumn("__sl", shards).alias("r")
      l.join(r, keyEq && col("l.__sl") === col("r.__sl") &&
        col("l.__sr") === col("r.__sr") && ordered)
    }
  }

  /** Two-phase salted count+sum per key group.
    *
    * @param df        input
    * @param keyCols   group keys (potentially skewed)
    * @param sumCol    column to sum
    * @param salts     fan-out factor for phase 1
    * @param spreadCol a high-cardinality column to derive the salt from
    * @return keyCols + n (count) + total (sum), equal to the unsalted agg
    */
  def saltedCountSum(
      df: DataFrame,
      keyCols: Seq[String],
      sumCol: String,
      salts: Int,
      spreadCol: String): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(salts, col(spreadCol)))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__sum"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__n").as("n"), sum("__sum").as("total"))
  }

  /** Salted shuffle equi-join for a skewed fact side: the fact gets a
    * deterministic salt from `spreadCol`, the (small-but-not-broadcastable)
    * build side is replicated across all `salts` shards, and the join key
    * becomes (keyCols, salt) — a hot key's probe volume spreads over
    * `salts` reducers at the cost of a salts× build-side replication.
    * `shuffle_hash` pins the shuffled path: with a broadcastable build
    * side Spark would broadcast (no skew to fix) and the salt would be
    * inert. Result rows equal the plain equi-join's.
    */
  def saltedEquiJoin(
      fact: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      salts: Int,
      spreadCol: String): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val f = fact.withColumn("__salt", salt(salts, col(spreadCol)))
    val b = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    f.join(b.hint("shuffle_hash"), keyCols :+ "__salt").drop("__salt")
  }
}
