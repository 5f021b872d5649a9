package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY.md §2.10
  * X1/X2): exact (hash groupBy), MinHash+LSH, SimHash, and exact n-gram
  * Jaccard verification.
  *
  * All hashing is md5-based so the DuckDB oracle can reproduce bucket
  * assignments bit-for-bit (both engines emit identical lowercase-hex md5);
  * minhash components are the lexicographic minimum of fixed-width hex
  * prefixes, which is order-isomorphic to a numeric minhash.
  *
  * 100 TB design:
  * - signatures are computed per-row with array higher-order functions — a
  *   narrow map, no shuffle, no explode of the shingle set;
  * - the LSH candidate join shuffles only (band, bucket-key) pairs — b×n
  *   rows regardless of shingle count — and pairs form only within buckets
  *   (the classic band-bucket join). Hot buckets (boilerplate docs) would be
  *   salted by appending a shard id to the bucket key and unioning the
  *   shard-local pair sets; at fixture scale buckets are tiny;
  * - exact-Jaccard verification touches only LSH candidates, never the n²
  *   pair space.
  */
object TextDedup {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word-bigram shingle set (distinct). */
  def bigramShingles(text: Column): Column = {
    val t = tokens(text)
    array_distinct(
      zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
  }

  /** MinHash signature: k lexicographic-min md5-prefix components over the
    * shingle set. Pure per-row expression work (codegen-free HOFs but no
    * shuffle, no explode).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingles, s =>
        substring(md5(concat(i.cast("string"), lit(":"), s)), 1, 16))))

  /** 16-bit SimHash over the shingle set: bit j is the sign of the sum of
    * ±1 votes from the j-th hex digit's high bit of each shingle's md5.
    */
  def simhash16(shingles: Column): Column =
    array_join(
      transform(sequence(lit(1), lit(16)), j =>
        when(
          aggregate(shingles, lit(0), (acc, s) =>
            acc + when(substring(md5(s), j, lit(1)) >= "8", 1).otherwise(-1)) >= 0,
          lit("1")).otherwise(lit("0"))),
      "")

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param docs (idCol, textCol) DataFrame
    * @param k    signature length (must be bands * rowsPerBand)
    * @param bands band count; candidate pairs share at least one band bucket
    * @param threshold exact bigram-Jaccard cutoff applied to candidates
    * @return (doc_a, doc_b, jaccard) with doc_a < doc_b
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sh = docs.select(
      col(idCol).as("doc_id"),
      bigramShingles(col(textCol)).as("bg"))
    val mh = sh.select(col("doc_id"), col("bg"),
      minhashSignature(col("bg"), k).as("sig"))

    // band-bucket key: md5 of the band's signature slice
    val bandsDf = mh
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(bands - 1))).as("b"),
        col("sig"))
      .select(col("doc_id"), col("b"),
        md5(concat_ws("|", slice(col("sig"), col("b") * rows + 1, lit(rows))))
          .as("bkey"))

    // candidates = pairs sharing any (band, bucket); one shuffle on bkey
    val x = bandsDf.alias("x")
    val y = bandsDf.alias("y")
    val cand = x.join(y,
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // exact-Jaccard verification over candidates only
    val ex = sh.select(col("doc_id"), explode(col("bg")).as("s"))
    val sz = sh.select(col("doc_id"), size(col("bg")).as("n"))
    val inter = cand
      .join(ex.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
      .join(ex.select(col("doc_id").as("doc_b"), col("s").as("s2")),
        Seq("doc_b"))
      .filter(col("s") === col("s2"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
