package graft.operators

import graft.Materialize.Ops
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.10 X3).
  *
  * Cosine is a sequential left-fold in double precision (`aggregate` over
  * `zip_with`) so the arithmetic order is fixed and reproducible by the
  * oracle engine.
  *
  * 100 TB design: brute-force top-k is the correctness baseline (broadcast
  * the query set — a few rows — against the candidate table: narrow map +
  * per-query top-k, no all-pairs shuffle). The scale path is IVF: a coarse
  * quantizer assigns every vector to its nearest centroid (broadcast of C
  * centroids, one narrow pass), and searches touch only the query's cell —
  * candidate volume drops by ~C×. Centroids are trained by a seeded
  * deterministic Lloyd's loop ([[kmeansCentroids]]): first-C seed, then
  * `iters` rounds of assign + mean. Centroid means use integer-quantized
  * per-dimension sums (round(x·10⁶) as bigint), which are summation-ORDER-
  * INDEPENDENT — so the distributed Spark aggregation and the single-node
  * DuckDB oracle produce bitwise-identical centroids, while keeping the
  * scale-friendly partial-aggregate shape (k×dim longs per partition).
  */
object Similarity {

  /** Sequential-fold dot product — codegen'd Catalyst expression (see
    * graft.functions.DotProduct); bitwise-equal to the HOF fold
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` but runs inside
    * whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass codegen'd cosine (see graft CosineSim expression) —
    * bitwise-equal to `dot(a,b) / (norm(a) * norm(b))`.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.cosine(a, b)

  private[operators] def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Per-key top-k WITH the rank column — the heap form of
    * `row_number().over(w).filter(rk <= k)` for call sites that KEEP the
    * rank in their output (the WindowToTopK optimizer rule only rewrites
    * drop-rank shapes, so these sites were paying a full exchange + sort
    * of the whole candidate table; optimization guide §2.3/§2.4). The
    * TopKPerKey partial pass prunes every map partition to ≤ keys × k
    * rows BEFORE the exchange, the final pass keeps the true top-k, and
    * the rank is recomputed by the SAME ordering over the ≤ k survivors
    * per key — one in-partition sort of k-row groups, no second exchange
    * (TopKPerKeyExec preserves the key-clustered distribution).
    *
    * REQUIRES a total per-key ordering (unique tiebreak column, which
    * every caller has): under ties the heap keeps an arbitrary k-subset
    * and the re-rank could disagree with the one-window form.
    */
  private[operators] def rankedTopKPerKey(df: DataFrame, keys: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val pruned = org.apache.spark.sql.graft.TopK.perKey(df, keys, orderBy, k)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderBy.map { case (n, desc) =>
        if (desc) col(n).desc else col(n).asc }: _*)
    pruned.withColumn("rk", row_number().over(w))
  }

  /** Brute-force top-k cosine neighbors for each query vector. */
  def topK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val v = vecs(emb)
    val q = v.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val cand = v.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
    // heap top-k (ordering total: vec_id unique per qid) — the n × q
    // similarity table is pruned map-side instead of fully sorted
    rankedTopKPerKey(cand, Seq("qid"), Seq(("sim", true), ("vec_id", false)), k)
      .select(col("qid"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rk"))
  }

  /** Centroid ranking per vector (cosine desc, ties → lowest cid):
    * (vec_id, v, cid, rk) with rk = 1 the nearest cell. Broadcast join +
    * per-vector window — used only on small (query-side) inputs where the
    * full ranking is needed for multi-probe.
    */
  private[operators] def rankedAssign(v: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
    v.join(broadcast(cent))
      .select(col("vec_id"), col("v"), col("cid"),
        cosine(col("v"), col("cv")).as("csim"))
      .withColumn("rk", row_number().over(w))
  }

  /** Nearest-centroid assignment against an explicit (cid, cv) table as
    * a k=1 BOUNDED HEAP (TopKPerKey): argmax-with-lowest-cid-tiebreak,
    * identical output to the rank-1 window and to the historical
    * `min(struct(-cosine, cid))` aggregate, but with a map-side partial
    * pass that cuts each partition to one row per vec_id before the
    * exchange and NO sort anywhere (r18: the struct-min form physically
    * planned as SortAggregate — struct agg buffers cannot hash-aggregate
    * — sorting the n × C similarity rows twice per assignment).
    */
  private[operators] def assignTo(v: DataFrame, cent: DataFrame): DataFrame =
    // argmax-with-lowest-cid-tiebreak as a k=1 HEAP, not min(struct(-sim,
    // cid)): Spark plans a struct-valued min as SortAggregate (struct agg
    // buffers cannot hash-aggregate), which SORTS the n × C similarity
    // rows in both the partial and final phases — the r18 plan audit
    // caught the "hash aggregate" comment this code used to carry being
    // physically false. The heap keeps the identical winner ((msim desc,
    // cid asc), exactly min(-sim, cid)'s order) in one O(n·C) pass inside
    // whole-stage codegen, and the partial pass cuts each map partition
    // to one row per vec_id before the exchange (guide §2.3/§2.4).
    org.apache.spark.sql.graft.TopK.perKey(
      v.join(broadcast(cent))
        .select(col("vec_id"), col("v"), col("cid"),
          cosine(col("v"), col("cv")).as("msim")),
      Seq("vec_id"), Seq(("msim", true), ("cid", false)), 1)
      .select(col("vec_id"), col("v"), col("cid"))

  /** Deterministic training sample for a C-cell coarse quantizer: the
    * first `c` vectors (Lloyd's seeding contract) plus a hash-selected
    * slice sized ~`perCell`·c. Quantizer quality needs samples-PER-CELL,
    * not the corpus, so training cost becomes O(iters · perCell · c²) —
    * independent of n. This is one half of the scaled-C production
    * tuning: with C ∝ n, FULL-corpus Lloyd's assignment is O(n·C) =
    * O(n²/occupancy) per round — the 100× scale smoke measured the flat
    * form at 408 s of a 559 s run (73%), the quadratic term to the
    * bottom. (The other half is [[assignToHier]] for the one full-corpus
    * final assignment.)
    *
    * Precondition (inherited from [[kmeansCentroids]], which enforces it
    * loudly): vec_ids are dense from 0, so `vec_id < c` keeps exactly the
    * trainer's seed rows. With offset/sparse ids the sample would carry
    * fewer than c seeds and the sample-trained quantizer would silently
    * degenerate — re-key ids before training, same as for the trainer.
    */
  def trainSample(emb: DataFrame, c: Int, perCell: Int = 64,
      nRows: Long = -1L): DataFrame = {
    val n = if (nRows >= 0) nRows else emb.count()
    val target = perCell.toLong * c
    if (n <= target) emb
    else {
      val keep = (Long.MaxValue.toDouble * (target.toDouble / n)).toLong
      emb.filter(col("vec_id") < c || abs(xxhash64(col("vec_id"))) < keep)
    }
  }

  /** Two-level nearest-centroid assignment: O(n·(√C + occupancy·√C/C))
    * ≈ O(n·2√C) cosines instead of the flat O(n·C). The C centroids are
    * themselves quantized into ~√C super-cells (a k-means over the
    * CENTROID table — C rows, driver-scale); each vector finds its
    * nearest super-cell, then argmins only that super-cell's member
    * centroids. Approximate at super-cell boundaries — near-identical
    * vectors follow the same two hops and land together, which is what
    * candidate generation needs; the oracle-pinned gate queries keep the
    * exact flat [[assignTo]]. Falls back to flat below `flatBelow`
    * centroids, where the hierarchy would cost more than it saves.
    */
  private[graft] def assignToHier(v: DataFrame, cent: DataFrame,
      flatBelow: Int = 128, superProbe: Int = 2): DataFrame = {
    val centRows = cent.count() // driver action — cent is C rows, tiny
    if (centRows < flatBelow) return assignTo(v, cent)
    // hop 2: argmin over the probed supers' member centroids, as the
    // same k=1 heap as [[assignTo]] (duplicate (vec_id, cid) candidate
    // rows across probes carry identical msim, so the heap's winner is
    // the dedup'd argmin).
    org.apache.spark.sql.graft.TopK.perKey(
      hierProbedMembers(v, cent, centRows, superProbe)
        .select(col("vec_id"), col("v"), col("cid"),
          cosine(col("v"), col("cv")).as("msim")),
      Seq("vec_id"), Seq(("msim", true), ("cid", false)), 1)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** Multi-probe twin of [[assignToHier]]: top-`probes` cells per vector
    * instead of the argmin — the hop-2 TopK runs over exactly the same
    * probed-super member candidates, so the result always CONTAINS the
    * single-probe assignment. Below `flatBelow` the flat multi-probe
    * (TopK over all centroids) applies, mirroring
    * [[nearDupPairsMultiProbe]]'s assignment.
    */
  private[graft] def assignToHierMulti(v: DataFrame, cent: DataFrame,
      flatBelow: Int = 128, superProbe: Int = 2,
      probes: Int = 2): DataFrame = {
    val centRows = cent.count() // driver action — cent is C rows, tiny
    val scoredMembers =
      if (centRows < flatBelow)
        v.join(broadcast(cent))
          .select(col("vec_id"), col("v"), col("cid"),
            cosine(col("v"), col("cv")).as("msim"))
      else
        hierProbedMembers(v, cent, centRows, superProbe)
          .select(col("vec_id"), col("v"), col("cid"),
            cosine(col("v"), col("cv")).as("msim"))
    org.apache.spark.sql.graft.TopK.perKey(
      scoredMembers, Seq("vec_id"), Seq(("msim", true), ("cid", false)),
      probes)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** Hop 1 of the two-level assignment, shared by the argmin and
    * multi-probe forms: score the √C super-cells, keep the top
    * `superProbe` per vector through the bounded-heap TopK operator (no
    * sort shuffle — one-probe measured only 74% cell agreement at small
    * C; probing 2 super-cells covers the boundary cases), and join the
    * probed supers' member centroids. Returns (vec_id, v, cid, cv, …).
    */
  private def hierProbedMembers(v: DataFrame, cent: DataFrame,
      centRows: Long, superProbe: Int): DataFrame = {
    val nSuper = math.max(4, math.round(math.sqrt(centRows.toDouble)).toInt)
    val (superCent, centSuper) = trainSupers(cent, nSuper)
    val members = broadcast(cent.join(centSuper, "cid")) // (cid, cv, scid)
    // a super-centroid can end MEMBERLESS (kmeans drops empty cells on
    // the PREVIOUS round's assignment, but centSuper re-assigns against
    // the final means) — probing one would silently drop the vector at
    // the inner member join, so memberless supers are removed from the
    // probe set up front: every probed super then has ≥1 member and
    // every vector survives to the argmin/TopK
    val liveSuper = superCent.join(
      centSuper.select("scid").distinct(), Seq("scid"), "left_semi")
    val scored = v.join(broadcast(liveSuper))
      .select(col("vec_id"), col("v"), col("scid"),
        cosine(col("v"), col("scv")).as("ssim"))
    val topSupers = org.apache.spark.sql.graft.TopK.perKey(
      scored, Seq("vec_id"), Seq(("ssim", true), ("scid", false)), superProbe)
    topSupers.join(members, "scid")
  }

  /** Train the ~√C super-quantizer over a CENTROID table and assign each
    * centroid to its super-cell — (superCent: (scid, scv), centSuper:
    * (cid, scid)). Shared by the batch two-hop ([[assignToHier]]) and the
    * streaming per-row fold (`StreamSim.cellRowsHier`) so both sides
    * probe the IDENTICAL super geometry. The centroid table's cids may
    * be SPARSE (Lloyd's drops memberless cells), so seeds are re-keyed
    * by cid rank before training — the dense-id contract
    * [[kmeansCentroids]] enforces; with no drops rank ≡ cid and the
    * geometry is unchanged. The single-partition rank window is C rows —
    * driver-scale, never the corpus.
    */
  private[graft] def trainSupers(cent: DataFrame, nSuper: Int)
      : (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("cid")
    val centDense = cent.select(
      (row_number().over(w) - 1).cast("long").as("vec_id"),
      col("cv").as("embedding"))
    val superCent = kmeansCentroids(centDense, nSuper, 2)
      .select(col("cid").as("scid"), col("cv").as("scv"))
    // each centroid's super-cell (C × √C — tiny, computed once)
    val centSuper = assignTo(
      cent.select(col("cid").as("vec_id"), col("cv").as("v")),
      superCent.select(col("scid").as("cid"), col("scv").as("cv")))
      .select(col("vec_id").as("cid"), col("cid").as("scid"))
    (superCent, centSuper)
  }

  /** Seeded deterministic Lloyd's k-means: seed = first `c` vectors by
    * vec_id, then `iters` rounds of (assign, recompute means). The mean is
    * sum(round(x·10⁶)::long) / (n·10⁶) per dimension — integer sums commute,
    * so the result is independent of partitioning AND reproducible by the
    * DuckDB oracle; the 10⁻⁶ quantization error is irrelevant for a coarse
    * quantizer. Cells that lose all members drop out (both engines agree).
    */
  def kmeansCentroids(emb: DataFrame, c: Int, iters: Int): DataFrame = {
    val v = vecs(emb)
    var cent = v.filter(col("vec_id") < c)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // dense-id seeding contract, enforced loudly: ids 0..c-1 must exist
    // whenever the corpus has ≥ c rows. With offset/sparse ids the seed
    // filter silently yields < c cells and the quantizer degenerates —
    // the failure ADVICE r10 flagged on trainSample, whose `vec_id < c`
    // slice inherits exactly this contract. The check costs one count of
    // a ≤ c-row frame; the corpus count runs only on the failure path.
    val seeded = cent.count()
    if (seeded < c) {
      val n = v.count()
      require(n < c, s"kmeansCentroids: found $seeded of $c seed rows in a " +
        s"$n-row corpus — vec_ids must be dense from 0 (ids 0..${c - 1} " +
        "present); re-key the ids (e.g. row_number() - 1) before training")
    }
    for (_ <- 0 until iters) {
      val sums = assignTo(v, cent)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .select(col("cid"), col("pos"),
          round(col("x") * 1e6, 0).cast("long").as("xi"))
        .groupBy("cid", "pos")
        .agg(sum("xi").as("sx"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          (col("sx").cast("double") / (col("n") * lit(1e6))).as("cx"))
      // c×dim rows — checkpointing keeps the next round's plan shallow
      // instead of re-planning the whole assign+mean chain per iteration
      cent = sums.groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          s => s("cx")).as("cv"))
        .materialize()
    }
    cent
  }

  /** IVF cell assignment: nearest of the k-means centroids (ties → lowest
    * centroid id). One broadcast + narrow pass per Lloyd's round; the
    * shuffle is only the per-vector argmax window.
    */
  def ivfAssign(emb: DataFrame, c: Int, kmeansIters: Int = 2): DataFrame =
    assignTo(vecs(emb), kmeansCentroids(emb, c, kmeansIters))

  /** Assignment against precomputed centroids — lets a caller train the
    * quantizer once and reuse it for both assignment and any
    * centroid-relative metric (see `emb_cluster_stats`).
    */
  def ivfAssignTo(emb: DataFrame, cent: DataFrame): DataFrame =
    assignTo(vecs(emb), cent)

  /** IVF top-k with multi-probe: each query searches its `nprobe` nearest
    * cells (data vectors live in exactly one cell, so candidate pairs are
    * already distinct — no dedup shuffle). nprobe trades candidate volume
    * for recall; on the fixture recall@5 rises ~0.42 → 0.52 → 0.58 for
    * nprobe 1 → 2 → 3 with 2 k-means rounds.
    */
  def ivfTopK(
      emb: DataFrame, c: Int, queryPred: Column, k: Int,
      kmeansIters: Int = 2, nprobe: Int = 2): DataFrame =
    ivfTopKWith(emb, kmeansCentroids(emb, c, kmeansIters), queryPred, k,
      nprobe)

  /** [[ivfTopK]] against a caller-supplied (typically session-shared)
    * trained quantizer — the amortized-probe form production runs:
    * training is an occasional batch artifact, not a per-query cost.
    */
  def ivfTopKWith(
      emb: DataFrame, cent: DataFrame, queryPred: Column, k: Int,
      nprobe: Int = 2): DataFrame =
    ivfTopKImpl(emb, cent, queryPred, lit(true), k, nprobe)

  /** FILTERED ANN — [[ivfTopKWith]] with a candidate-side metadata
    * predicate: top-k nearest among ONLY the vectors satisfying
    * `candPred` (the production shape "nearest English docs", "nearest
    * within this snapshot's survivors"). The filter applies BEFORE the
    * cell assignment/join, so it reaches the candidate scan (predicate
    * pushdown, fewer rows shuffled into cells) rather than discarding
    * candidates after the distance pass; per-vector nearest-centroid
    * assignment is independent of other vectors, so pre-filter
    * assignment ≡ post-filter assignment. Recall caveat at 100 TB: a
    * highly selective filter empties probed cells — raise nprobe with
    * filter selectivity (the standard filtered-ANN trade).
    *
    * MEASURED guidance (ScaledRecallSpec curve, C=16, k=5, sf0.01):
    * recall@k by (selectivity × nprobe) —
    * sel=0.50: np1 .66, np2 .71, np4 .82, np8 .94;
    * sel=0.20: .49 / .58 / .75 / .86;
    * sel=0.05: .22 / .31 / .49 / .72; nprobe=C is exact at every
    * selectivity. Recommendation: `nprobe = min(C, ceil(4/selectivity))`
    * — scale the unfiltered default (4) by 1/selectivity; once that
    * reaches C the probe IS the exhaustive scan of the filtered subset,
    * which at high selectivity is both exact and CHEAP (the subset is
    * small — sel·n rows — so filter-first brute force beats IVF there;
    * the spec pins the rule to the unfiltered default's 0.80 floor at
    * every measured selectivity).
    */
  def ivfTopKFilteredWith(
      emb: DataFrame, cent: DataFrame, queryPred: Column, candPred: Column,
      k: Int, nprobe: Int = 2): DataFrame =
    ivfTopKImpl(emb, cent, queryPred, candPred, k, nprobe)

  private def ivfTopKImpl(
      emb: DataFrame, cent: DataFrame, queryPred: Column, candPred: Column,
      k: Int, nprobe: Int): DataFrame = {
    val v = vecs(emb)
    // data side: hash-aggregate argmax (no sort) over the candidate
    // subset; query side: the full centroid ranking, but only over the
    // (tiny) filtered query set — multi-probe needs ranks 1..nprobe there
    val asn = assignTo(v.filter(candPred), cent)
    val q = rankedAssign(v.filter(queryPred), cent)
      .filter(col("rk") <= nprobe)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cid"))
    val cand = asn.join(q, Seq("cid"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
    // heap top-k (total ordering: a candidate lives in ONE cell, so each
    // (qid, vec_id) appears once even under multi-probe) — prunes the
    // Σ probed-cell candidate table map-side instead of sorting it
    rankedTopKPerKey(cand, Seq("qid"), Seq(("sim", true), ("vec_id", false)), k)
      .select(col("qid"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rk"))
  }

  /** Squared L2 composed from three sequential-fold dots — the exact
    * arithmetic shape (`(a·a − 2(a·b)) + b·b`) the oracle mirrors with
    * `list_dot_product`.
    */
  private[operators] def l2sq(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Product quantization + asymmetric-distance top-k (the embedding-lake
    * compression companion to int8 scalar quantization: 64 floats → mSub
    * codes of ≤ 8 bits each — 16× smaller at mSub=16, kCode ≤ 256 —
    * searched without decompression).
    *
    * Train: split each vector into `mSub` subvectors; per subspace,
    * `trainRounds` seeded Lloyd's rounds over `kCode` codes (first-kCode
    * seed, integer-quantized means — same determinism contract as
    * [[kmeansCentroids]]; round 7 raised the default from 1 to 2, which
    * lifts recall@5 on the fixture, see `SimilaritySpec`).
    * Encode: nearest code per (vector, subspace). Query (ADC): per query,
    * a (subspace × code) lookup table of squared-L2 distances; a vector's
    * approximate distance is the sum of its codes' table entries. Distance
    * sums are accumulated as round(d·10⁶) longs so the grouped sum is
    * summation-order-independent.
    *
    * Scale shape: codebooks/LUTs are tiny broadcasts; the ADC scan is a
    * narrow map over the codes table with map-side partial sums — no
    * full-vector data moves at query time. Each extra training round is
    * one more broadcast-join + hash-aggregate pass over the subvector
    * table — linear, and training can run on a sample at 100 TB.
    */
  /** Subvector explode: (vec_id, [extra...], m, sv) with sv the mth
    * `64/mSub`-dim slice. The shared first step of every PQ path.
    */
  private[operators] def pqSub(v: DataFrame, mSub: Int, extra: String*): DataFrame = {
    val subDim = 64 / mSub
    v.select(col("vec_id") +: extra.map(col) :+
      posexplode(array((0 until mSub).map(m =>
        slice(col("v"), m * subDim + 1, subDim)): _*)).as(Seq("m", "sv")): _*)
  }

  /** Nearest-code assignment as a narrow pass over a PACKED codebook:
    * each subspace's kCode codes are collected into one broadcast row
    * (m → code-sorted ids + flattened subvectors), and the argmin runs
    * inside the codegen'd [[org.apache.spark.sql.graft.NearestCode]]
    * expression — a tight primitive loop with the identical
    * `(dot(sv,sv) − 2·dot(sv,cv)) + dot(cv,cv)` IEEE tree and
    * first-on-tie (= lowest code) semantics the oracle's
    * `row_number ORDER BY dist, code` reproduces.
    *
    * At kCode = 256 this replaces a 256×-row broadcast-join blowup +
    * hash-aggregate argmin (×3 passes: two training rounds + encode —
    * measured 7.7 s at sf0.1; an `aggregate` HOF fold is interpreted
    * per element and slower still at 11 s) with one codegen'd loop at
    * constant row count.
    */
  private[operators] def pqAssign(sub: DataFrame, cb: DataFrame): DataFrame = {
    val packed = cb.groupBy("m").agg(
      array_sort(collect_list(struct(col("code"), col("cv")))).as("cbs"))
      .select(col("m"),
        transform(col("cbs"), e => e("code")).as("codes"),
        flatten(transform(col("cbs"), e => e("cv"))).as("flat"))
    sub.join(broadcast(packed), Seq("m"))
      .select(col("vec_id"), col("m"), col("sv"),
        org.apache.spark.sql.graft.VectorFunctions
          .nearestCode(col("sv"), col("codes"), col("flat")).as("code"))
  }

  /** Integer-quantized per-code means of an assignment — one Lloyd's
    * update step (codes that lose every member drop out, both engines).
    */
  private def pqMeanCodebook(assigned: DataFrame): DataFrame = assigned
    .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
    .select(col("m"), col("code"), col("pos"),
      round(col("x") * 1e6, 0).cast("long").as("xi"))
    .groupBy("m", "code", "pos")
    .agg(sum("xi").as("sx"), count(lit(1)).as("n"))
    .select(col("m"), col("code"), col("pos"),
      (col("sx").cast("double") / (col("n") * lit(1e6))).as("cx"))
    .groupBy("m", "code")
    .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
      s => s("cx")).as("cv"))
    .materialize() // mSub×kCode rows, feeds the next round + encode + LUT

  /** Seeded Lloyd's codebook training over a subvector table: first-kCode
    * seed, then `trainRounds` (assign, mean) steps. `trainSample` caps the
    * TRAINING set to the first-N vectors by vec_id (deterministic, so the
    * sampled codebook is still oracle-reproducible) — at 100 TB codebook
    * quality saturates at ~100k training vectors, so the Lloyd's passes
    * run over the sample while the (unavoidable, narrow) encode pass
    * still covers every vector. `SimilaritySpec` pins that sample-trained
    * recall holds the production floor.
    */
  private[operators] def pqTrain(
      sub: DataFrame, kCode: Int, trainRounds: Int,
      trainSample: Option[Int] = None): DataFrame = {
    require(trainSample.forall(_ >= kCode),
      s"trainSample must be >= kCode=$kCode, got $trainSample")
    val train = trainSample
      .map(n => sub.filter(col("vec_id") < n).materialize())
      .getOrElse(sub)
    val cb0 = train.filter(col("vec_id") < kCode)
      .select(col("m"), col("vec_id").as("code"), col("sv").as("cv"))
    (1 to trainRounds).foldLeft(cb0) {
      case (prev, _) => pqMeanCodebook(pqAssign(train, prev))
    }
  }

  /** The raw-subvector PQ codebook [[pqAdcTopK]] trains inline — exposed
    * so a session can train it once and pass it back via `cbOpt`.
    */
  def pqRawCodebook(
      emb: DataFrame, mSub: Int, kCode: Int, trainRounds: Int = 2,
      trainSample: Option[Int] = None): DataFrame =
    pqTrain(pqSub(vecs(emb), mSub).materialize(), kCode, trainRounds,
      trainSample)

  def pqAdcTopK(
      emb: DataFrame, mSub: Int, kCode: Int, queryPred: Column,
      k: Int, trainRounds: Int = 2,
      trainSample: Option[Int] = None,
      cbOpt: Option[DataFrame] = None): DataFrame = {
    require(trainRounds >= 1, s"trainRounds must be >= 1, got $trainRounds")
    val v = vecs(emb)
    // sub feeds three consumers (train assign, encode, query LUT) —
    // materialize once instead of re-running the scan + explode per branch
    val sub = pqSub(v, mSub).materialize()
    val cb = cbOpt.getOrElse(pqTrain(sub, kCode, trainRounds, trainSample))
    val codes = pqAssign(sub, cb).select("vec_id", "m", "code")
    val qsub = sub.filter(queryPred)
      .select(col("vec_id").as("qid"), col("m"), col("sv").as("qv"))
    val lut = qsub.join(broadcast(cb), Seq("m"))
      .select(col("qid"), col("m"), col("code"),
        round(l2sq(col("qv"), col("cv")) * 1e6, 0).cast("long").as("di"))
    val cand = codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy("qid", "vec_id").agg(sum("di").as("adcl"))
      .select(col("qid"), col("vec_id"),
        (col("adcl").cast("double") / 1e6).as("adc"))
    // heap top-k (total ordering: (qid, vec_id) unique after the agg)
    rankedTopKPerKey(cand, Seq("qid"), Seq(("adc", false), ("vec_id", false)), k)
      .select(col("qid"), col("vec_id"), round(col("adc"), 6).as("adc_dist"),
        col("rk"))
  }

  /** IVF-PQ: the composition production ANN engines deploy at scale —
    * a coarse IVF quantizer prunes the search to each query's `nprobe`
    * nearest cells, and within cells distances come from PQ codes over
    * RESIDUALS (v − centroid), searched by per-(query, cell) ADC lookup
    * tables. Encoding residuals rather than raw vectors centers every
    * cell's distribution at the origin, so one shared codebook covers all
    * cells (the IVFADC layout of Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011).
    *
    * Everything reuses the spec-pinned deterministic pieces: cosine-based
    * cell assignment ([[kmeansCentroids]]/assignTo — bitwise
    * oracle-reproducible centroids), seeded residual codebooks
    * ([[pqTrain]]), hash-aggregate argmin encode, and order-independent
    * integer ADC sums. Residuals are elementwise v[i] − cv[i] in both
    * engines — identical IEEE trees, so codes and distances hash-match.
    *
    * Scale shape: centroids and codebooks are tiny broadcasts; residual
    * computation and encode are narrow passes over the data (one
    * mSub-way explode + one hash aggregate); the LUT is
    * queries × nprobe × mSub × kCode rows — broadcast; the ADC probe
    * joins codes on (cid, m, code) so only PROBED cells' codes
    * participate (cell pruning happens in the join, not a filter after
    * it). Nothing full-width moves at query time, and the per-query cost
    * is O(nprobe/c) of the corpus — the IVF promise — at 16× compressed
    * reads — the PQ promise.
    */
  /** Residual subvector table (vec_id, cid, m, sv): assign to nearest
    * cell, subtract the cell centroid, slice into subspaces — the shared
    * first step of IVF-PQ training, encoding, and [[VecIndex]]'s
    * build/append paths.
    */
  private[operators] def residualSub(
      v: DataFrame, cent: DataFrame, mSub: Int): DataFrame = {
    val resid = assignTo(v, cent)
      .join(broadcast(cent), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    pqSub(resid, mSub, "cid")
  }

  /** The residual PQ codebook [[ivfPqTopK]] trains inline — exposed so a
    * session can train it once (against the same shared `cent`) and pass
    * it back via `cbOpt`. Residuals derive deterministically from the
    * centroids, so a codebook is reusable by exactly the callers that
    * share its quantizer.
    */
  def ivfPqCodebook(
      emb: DataFrame, cent: DataFrame, mSub: Int, kCode: Int,
      trainRounds: Int = 2, trainSample: Option[Int] = None): DataFrame =
    pqTrain(residualSub(vecs(emb), cent, mSub).materialize(), kCode,
      trainRounds, trainSample)

  def ivfPqTopK(
      emb: DataFrame, c: Int, mSub: Int, kCode: Int, queryPred: Column,
      k: Int, nprobe: Int = 2, kmeansIters: Int = 2,
      trainRounds: Int = 2, trainSample: Option[Int] = None,
      centOpt: Option[DataFrame] = None,
      cbOpt: Option[DataFrame] = None): DataFrame = {
    val v = vecs(emb)
    val cent = centOpt.getOrElse(kmeansCentroids(emb, c, kmeansIters))
    val asn = assignTo(v, cent)
    // residuals feed train + encode; cid rides along so codes stay
    // cell-addressable without a second join
    val resid = asn.join(broadcast(cent), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    val rsub = pqSub(resid, mSub, "cid").materialize()
    val cb = cbOpt.getOrElse(pqTrain(rsub, kCode, trainRounds, trainSample))
    val codes = pqAssign(rsub, cb)
      .join(asn.select("vec_id", "cid"), "vec_id")
      .select("vec_id", "cid", "m", "code")
    // query side: residual vs EACH probed cell's centroid — the LUT is
    // per (query, cell), which is what makes shared-codebook residual
    // ADC exact w.r.t. the cell geometry
    val q = rankedAssign(v.filter(queryPred), cent)
      .filter(col("rk") <= nprobe)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cid"))
    val qrsub = pqSub(
      q.join(broadcast(cent), "cid")
        .select(col("qid").as("vec_id"), col("cid"),
          zip_with(col("qv"), col("cv"), (a, b) => a - b).as("v")),
      mSub, "cid")
      .select(col("vec_id").as("qid"), col("cid"), col("m"),
        col("sv").as("qv"))
    val lut = qrsub.join(broadcast(cb), Seq("m"))
      .select(col("qid"), col("cid"), col("m"), col("code"),
        round(l2sq(col("qv"), col("cv")) * 1e6, 0).cast("long").as("di"))
    val cand = codes.join(broadcast(lut), Seq("cid", "m", "code"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy("qid", "vec_id").agg(sum("di").as("adcl"))
      .select(col("qid"), col("vec_id"),
        (col("adcl").cast("double") / 1e6).as("adc"))
    // heap top-k (total ordering: (qid, vec_id) unique after the agg)
    rankedTopKPerKey(cand, Seq("qid"), Seq(("adc", false), ("vec_id", false)), k)
      .select(col("qid"), col("vec_id"), round(col("adc"), 6).as("adc_dist"),
        col("rk"))
  }

  /** Deterministic hyperplane weight for signed-random-projection LSH:
    * md5("rp:j:d") → first 15 hex digits → bigint, mapped to [-1, 1] in
    * steps of 10⁻³. Both engines derive the identical double from the
    * identical md5, so bucket assignment is reproducible by the oracle.
    */
  def rpWeight(j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$j:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001L) - 1000L) / 1000.0
  }

  /** Signed-random-projection (hyperplane) LSH near-dup pairs — the
    * angular-distance counterpart to [[nearDupPairs]]'s IVF cells: bit j
    * of a vector's sketch is the sign of its dot product with a fixed
    * pseudo-random hyperplane, so vectors at small angle collide with
    * probability (1 − θ/π) per bit. Banded like MinHash-LSH: `bands`
    * independent `bitsPerBand`-bit sketches, candidates from any band's
    * bucket join, exact cosine verified on candidates only.
    *
    * Scale shape: the sketch pass is a narrow map (bands × bitsPerBand
    * codegen'd dot products against literal hyperplanes — no data joins);
    * the candidate join shuffles bands×n (band, sketch) keys, never the
    * n² pair space; `salts` shards degenerate buckets — `salts = 0`
    * (the default) sizes the shard factor from the OBSERVED hottest
    * (band, sketch) bucket via [[Skew.adaptiveSalts]], so uniform data
    * pays no replication and a degenerate bucket is sharded without
    * anyone having guessed a constant.
    */
  def rpLshPairs(
      emb: DataFrame, bands: Int, bitsPerBand: Int, threshold: Double,
      salts: Int = 0, dim: Int = 64): DataFrame = {
    // fail fast on a dimension mismatch: DotProduct truncates to the
    // shorter operand, which would silently sketch only a prefix
    val v = vecs(emb)
      .select(col("vec_id"),
        when(size(col("v")) === dim, col("v"))
          .otherwise(raise_error(concat(lit(s"rpLshPairs: expected $dim-dim"
            + " embedding, got "), size(col("v")).cast("string")))).as("v"))
      .materialize() // feeds the sketch pass and both verify branches
    def bit(j: Int): Column = {
      val wj = array((0 until dim).map(d => lit(rpWeight(j, d))): _*)
      when(dot(col("v"), wj) >= 0, lit("1")).otherwise(lit("0"))
    }
    val withSk = v.select(col("vec_id") +:
      (0 until bands).map(b =>
        concat((0 until bitsPerBand).map(i =>
          bit(b * bitsPerBand + i)): _*).as(s"sk$b")): _*)
    val stackArgs = (0 until bands).map(b => s"$b, sk$b").mkString(", ")
    val sk = withSk
      .selectExpr("vec_id", s"stack($bands, $stackArgs) as (b, sketch)")
      .materialize() // feeds the salt-sizing pass and the join's 2 sides
    val s =
      if (salts == 0) Skew.adaptiveSalts(sk, Seq("b", "sketch")) else salts
    // cand-then-verify (the minhashLshPairs shape, and the oracle's):
    // dedup (va, vb) BEFORE the cosine so a pair colliding in several
    // bands is verified once, and the band join shuffles only ids +
    // sketches — vectors never ride through the stack or the distinct
    val cand = Skew.saltedSelfJoin(sk, Seq("b", "sketch"), "vec_id", s)
      .select(col("l.vec_id").as("va"), col("r.vec_id").as("vb"))
      .distinct()
    cand
      .join(v.select(col("vec_id").as("va"), col("v").as("av")), "va")
      .join(v.select(col("vec_id").as("vb"), col("v").as("bv")), "vb")
      .select(col("va"), col("vb"), cosine(col("av"), col("bv")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("va"), col("vb"), round(col("sim"), 6).as("sim"))
  }

  /** Embedding near-dup pairs: same IVF cell, cosine above threshold.
    * `salts > 1` shards a hot cell's pair space over salts² reducers
    * ([[Skew.saltedSelfJoin]]) — the defense for a degenerate quantizer
    * cell holding a large fraction of the corpus.
    */
  /** Cosine RANGE search: every corpus vector within `threshold` of any
    * query vector — the radius-query complement of [[topK]] (retrieval
    * wants the k best; curation filters want *everything* similar enough,
    * e.g. "all vectors near a known-bad cluster"). Same scale shape as
    * topK: broadcast the small query side, one narrow codegen'd cosine
    * pass over the corpus, no shuffle at all (not even a window — the
    * threshold filter needs no per-query ordering).
    */
  def rangeSearch(emb: DataFrame, queryPred: Column, threshold: Double): DataFrame = {
    val v = vecs(emb)
    val q = v.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    v.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("qid"), col("vec_id"), round(col("sim"), 6).as("sim"))
  }

  /** Approximate kNN graph over the WHOLE corpus: every vector's top-k
    * cosine neighbors within its IVF cell — the neighborhood structure
    * SemDeDup-style pruning, diversity sampling, and graph clustering
    * consume. Where [[topK]]/[[ivfTopK]] serve a small query set, this is
    * the all-vectors build: candidate volume is Σ cell² ≈ n²/C (not n²),
    * and the per-vector top-k is a window inside each cell's partition.
    * At 100 TB: more cells (C scales with n) keeps cell² bounded; hot
    * cells shard via the same salting as [[nearDupPairs]]. The C-tuning
    * rule is measured, not argued: graft.ScaleSmoke's fixed-C=16 row is
    * 26.9× time / 85× shuffle at 10× data (the n²/C space growing n²),
    * while its constant-occupancy `@scaledC` variants of the same
    * operators return to ~linear shuffle and sublinear time.
    */
  def knnGraph(emb: DataFrame, c: Int, k: Int): DataFrame =
    knnGraphWith(emb, kmeansCentroids(emb, c, 2), k)

  /** [[knnGraph]] against a caller-supplied trained quantizer. */
  def knnGraphWith(emb: DataFrame, cent: DataFrame, k: Int): DataFrame = {
    val asn = ivfAssignTo(emb, cent).materialize() // both join sides read it
    val nbr = asn.select(col("cid"), col("vec_id").as("nbr"),
      col("v").as("nv"))
    val cand = asn.join(nbr, Seq("cid"))
      .filter(col("vec_id") =!= col("nbr"))
      .select(col("vec_id"), col("nbr"), cosine(col("v"), col("nv")).as("sim"))
    // heap top-k over the Σ cell² candidate table (total ordering: nbr
    // unique per vec_id) — map-side prune replaces the full sort
    rankedTopKPerKey(cand, Seq("vec_id"), Seq(("sim", true), ("nbr", false)), k)
      .select(col("vec_id"), col("rk"), col("nbr"),
        round(col("sim"), 6).as("sim"))
  }

  /** PageRank over an explicit edge list — the VALUE-iteration complement
    * to [[graft.operators.TextDedup]]'s connected-components LABELS: a node
    * whose neighbors' neighbors keep pointing back at it is a hub of a
    * near-duplicate / template region; the low-rank periphery is the
    * diverse tail a data-selection pass wants to keep (Page et al. 1999).
    *
    * `nodes` carries one `vec_id` per vertex (isolated vertices allowed);
    * `edges` is (src, dst). Ranks live in integer MICRO-UNITS (Σ ≈ 10¹²)
    * and every contribution is a floor division of non-negative longs, so
    * the per-dst sum is an order-independent long sum — bitwise identical
    * at any parallelism and reproducible by a single-node oracle, with no
    * FP anywhere in the loop. Dangling mass (out-degree-0 nodes)
    * redistributes uniformly each step; damping is the classic 0.15/0.85
    * as integer 15/85 `div` 100.
    *
    * 100 TB: per iteration ONE edge⋈ranks join + ONE dst-keyed sum + a
    * left join back to nodes — two shuffles over edge/node-sized tables,
    * iterated state [[graft.Materialize]]d so lineage stays flat. The
    * edge and degree tables materialize once and are reused every
    * iteration.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.materialize() // reused every iteration + the degree table
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).materialize()
    val nn = nodes.agg(count(lit(1)).as("nn"))
    var ranks = nodes.select(col("vec_id")).crossJoin(broadcast(nn))
      .select(col("vec_id"), expr("1000000000000 div nn").as("r"), col("nn"))
      .materialize()
    for (_ <- 0 until iters) {
      val dm = ranks.join(deg, col("vec_id") === col("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dm"))
      val inflow = e
        .join(ranks.select(col("vec_id").as("src"), col("r")), "src")
        .join(deg, "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
        .withColumnRenamed("dst", "vec_id")
      ranks = ranks.select(col("vec_id"), col("nn"))
        .join(inflow, Seq("vec_id"), "left")
        .crossJoin(broadcast(dm))
        .select(col("vec_id"),
          expr("(15 * (1000000000000 div nn)) div 100 + " +
            "(85 * (coalesce(inflow, 0L) + dm div nn)) div 100").as("r"),
          col("nn"))
        .materialize()
    }
    ranks.select(col("vec_id"), col("r"))
  }

  /** The measured cell-count tuning rule for the all-pairs/all-vectors
    * operators ([[nearDupPairs]], [[knnGraph]], the streaming cell
    * index): keep cell OCCUPANCY constant rather than the cell count.
    * In-cell candidate volume is Σ n_c² ≈ n²/C, so a FIXED C is
    * quadratic in the corpus — graft.ScaleSmoke measured the pinned
    * C=16 gate geometry at 26.9× time / 85× shuffle for 10× data, and
    * this rule's configuration of the same operators at ~linear shuffle
    * and sublinear time. The floor keeps tiny corpora at the gate
    * geometry (the oracle-pinned C=16 at every fixture SF); the default
    * occupancy reproduces it exactly at sf0.1 (5 000/312 → 16). Costs
    * one count() action; at real scale feed the count from table stats
    * and train the quantizer on a sample (see [[kmeansCentroids]]).
    */
  def autoCells(emb: DataFrame, targetOccupancy: Int = 312): Int =
    autoCellsFor(emb.count(), targetOccupancy)

  /** [[autoCells]] from a precomputed row count — callers that already
    * counted (or read table stats) skip the second full scan.
    */
  def autoCellsFor(nRows: Long, targetOccupancy: Int = 312): Int =
    math.max(16L, nRows / targetOccupancy).toInt

  def nearDupPairs(
      emb: DataFrame, c: Int, threshold: Double, salts: Int = 0): DataFrame =
    nearDupPairsWith(emb, kmeansCentroids(emb, c, 2), threshold, salts)

  /** The scaled-C (C ∝ n) production form of [[nearDupPairs]]: the
    * quantizer trains on a [[trainSample]] (O(c²), not O(n·c) per round)
    * and the one full-corpus assignment runs [[assignToHier]] (O(n·√C)).
    * Both are approximate only at cell boundaries; candidate generation
    * and exact-cosine verification are unchanged. The 100× smoke
    * measures the difference — the flat form's training was 73% of its
    * 559 s run and quadratic in n at constant occupancy.
    */
  def nearDupPairsScaled(
      emb: DataFrame, c: Int, threshold: Double, salts: Int = 0,
      perCell: Int = 64, flatBelow: Int = 128,
      nRows: Long = -1L): DataFrame = {
    val cent = kmeansCentroids(trainSample(emb, c, perCell, nRows), c, 2)
    val asn = assignToHier(vecs(emb), cent, flatBelow).materialize()
    pairsFromAssignment(asn, threshold, salts)
  }

  /** [[nearDupPairsScaled]] with the multi-probe recall knob: the same
    * sampled training and two-level assignment, but each vector lands in
    * its top-`probes` cells (hop-2 TopK over the identical probed-member
    * candidates) — so the pair set always CONTAINS the single-probe
    * scaled result, recovering boundary-split pairs. Candidate mass
    * (Σ n_c(n_c−1)/2, the verify bill) grows ~probes²: p probes raise
    * every cell's occupancy ~p×, so mass ≈ p²·n·occupancy/2 — measured
    * EXACTLY 4.0× / 16.0× / 64.2× at p = 2/4/8 on the r13 curve, still
    * linear in n at C ∝ n. The 100 TB configuration when recall matters:
    * training stays O(C²), assignment O(n·√C), candidates
    * O(probes² · n · occupancy). See [[nearDupPairsMultiProbe]] for the
    * measured recall curve and the production default.
    */
  def nearDupPairsScaledMultiProbe(
      emb: DataFrame, c: Int, threshold: Double, probes: Int = 2,
      salts: Int = 0, perCell: Int = 64, flatBelow: Int = 128,
      nRows: Long = -1L): DataFrame = {
    val cent = kmeansCentroids(trainSample(emb, c, perCell, nRows), c, 2)
    val asn = assignToHierMulti(vecs(emb), cent, flatBelow,
      probes = probes).materialize()
    pairsFromAssignment(asn, threshold, salts).distinct()
  }

  /** Multi-probe near-dup: each vector joins its top-`probes` cells
    * (bounded-heap TopK over the broadcast centroid scores — no sort
    * shuffle) instead of only its argmax cell, so pairs whose members
    * fall JUST across a cell boundary are recovered. The round-11
    * recall measurement motivated this knob: single-probe IVF recalls
    * only 0.11–0.25 of brute-force threshold-0.4 pairs on the fixture
    * (flat and scaled alike — the loss is the boundary, not the
    * approximation). Duplicate pairs (vectors sharing several probed
    * cells) collapse through the final distinct. Superset property: any
    * pair sharing an argmax cell also shares it in the top-`probes`
    * sets, so p < p' pair sets nest — spec-pinned.
    *
    * The r13 measured curve (sf0.1 occupancy-312 geometry / 10×, vs
    * brute-force threshold-0.4 truth; `sim_recall@probes` smoke):
    * recall 0.25/0.11 at p=1 → 0.60/0.30 at p=2 → 0.95/0.67 at p=4 →
    * 1.00/0.97 at p=8, at candidate mass EXACTLY p²× the single-probe
    * mass (4.0× / 16.0× / 64.2×) — each probe multiplies every cell's
    * occupancy, so the verify bill is quadratic in `probes` (not the
    * naive "≤ probes×"), though still linear in n at C ∝ n.
    * PRODUCTION DEFAULT: probes = 4 when recall matters (the knee of
    * the curve — ~0.95 recall at production occupancy for 16× mass);
    * probes = 2 (the code default, kept for the oracle-pinned gate
    * geometry) when the boundary band is tolerable; probes = 8 only for
    * recall-critical audits (64× mass buys the last few points).
    * `ScaledRecallSpec` pins the containment chain and the p=4 recall
    * floor.
    */
  def nearDupPairsMultiProbe(emb: DataFrame, cent: DataFrame,
      threshold: Double, probes: Int = 2, salts: Int = 0): DataFrame =
    pairsFromAssignment(
      assignMultiProbe(vecs(emb), cent, probes), threshold, salts).distinct()

  /** The flat multi-probe assignment (top-`probes` cells per vector via
    * the bounded-heap TopK — no sort shuffle), exposed so the recall
    * smoke can weigh CANDIDATE MASS (Σ over cells of n_c·(n_c−1)/2, the
    * verify bill the probe count buys) from the same assignment the pair
    * path uses.
    */
  private[graft] def assignMultiProbe(
      v: DataFrame, cent: DataFrame, probes: Int): DataFrame = {
    val scored = v.join(broadcast(cent))
      .select(col("vec_id"), col("v"), col("cid"),
        cosine(col("v"), col("cv")).as("csim"))
    org.apache.spark.sql.graft.TopK.perKey(
      scored, Seq("vec_id"), Seq(("csim", true), ("cid", false)), probes)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** Shared candidate/verify tail of the near-dup family: salted in-cell
    * self-join + exact-cosine threshold — one definition so the flat gate
    * path and the scaled throughput path cannot silently diverge.
    */
  private def pairsFromAssignment(
      asn: DataFrame, threshold: Double, salts: Int): DataFrame = {
    val s = if (salts == 0) Skew.adaptiveSalts(asn, Seq("cid")) else salts
    Skew.saltedSelfJoin(asn, Seq("cid"), "vec_id", s)
      .select(col("l.vec_id").as("va"), col("r.vec_id").as("vb"),
        cosine(col("l.v"), col("r.v")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("va"), col("vb"), round(col("sim"), 6).as("sim"))
  }

  /** [[nearDupPairs]] against a caller-supplied trained quantizer. */
  def nearDupPairsWith(
      emb: DataFrame, cent: DataFrame, threshold: Double,
      salts: Int = 0): DataFrame = {
    // both sides of the self-join read the assignment — materialize once
    // (the salt-sizing pass reads the same checkpointed blocks)
    val asn = ivfAssignTo(emb, cent).materialize()
    pairsFromAssignment(asn, threshold, salts)
  }
}
