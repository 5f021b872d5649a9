package graft.operators

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
  * candidate volume drops by ~C×. Centroids here are a deterministic sample
  * (first C vectors), standing in for k-means iterations which would just
  * re-run the same assignment pass.
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

  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Brute-force top-k cosine neighbors for each query vector. */
  def topK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val v = vecs(emb)
    val q = v.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    v.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rk"))
  }

  /** IVF cell assignment: nearest of the first `c` vectors (ties → lowest
    * centroid id). One broadcast + narrow pass; the shuffle is only the
    * per-vector argmax window (at scale: replace with a map-side argmax
    * fold over the broadcast centroid list — same result, zero shuffle).
    */
  def ivfAssign(emb: DataFrame, c: Int): DataFrame = {
    val v = vecs(emb)
    val cent = v.filter(col("vec_id") < c)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
    v.join(broadcast(cent))
      .select(col("vec_id"), col("v"), col("cid"),
        cosine(col("v"), col("cv")).as("csim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** IVF top-k: search only the query's cell. */
  def ivfTopK(emb: DataFrame, c: Int, queryPred: Column, k: Int): DataFrame = {
    val asn = ivfAssign(emb, c)
    val q = asn.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cid"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    asn.join(q, Seq("cid"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rk"))
  }

  /** Embedding near-dup pairs: same IVF cell, cosine above threshold. */
  def nearDupPairs(emb: DataFrame, c: Int, threshold: Double): DataFrame = {
    val asn = ivfAssign(emb, c)
    val a = asn.select(col("cid"), col("vec_id").as("va"), col("v").as("xa"))
    val b = asn.select(col("cid"), col("vec_id").as("vb"), col("v").as("xb"))
    a.join(b, Seq("cid"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"), cosine(col("xa"), col("xb")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("va"), col("vb"), round(col("sim"), 6).as("sim"))
  }
}
