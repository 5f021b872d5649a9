package graft

import org.apache.spark.sql.functions._

/** Property tests for the round-7 additions: power-iteration PCA
  * (mathematical convergence, not just oracle determinism), hybrid RRF
  * retrieval (fusion arithmetic + both modalities contributing), and
  * deterministic training shards (partitioning-invariance + totals).
  */
class Round7OperatorsSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("emb_pca converges: unit loading, positive eigenvalue, small residual") {
    val rows = q("emb_pca").orderBy("dim").collect()
    assert(rows.length === 8)
    val x = rows.map(_.getDouble(1))
    val lam = rows.head.getDouble(2)
    val share = rows.head.getDouble(3)
    assert(math.abs(math.sqrt(x.map(v => v * v).sum) - 1.0) < 1e-5,
      "loading vector is not unit norm")
    assert(lam > 0, s"leading eigenvalue not positive: $lam")
    assert(share > 0 && share <= 1, s"variance share out of range: $share")
    // rebuild the symmetric covariance from the (oracle-green) covariance
    // query and check the eigenpair residual ‖Cx − λx‖∞
    val cov = Array.ofDim[Double](8, 8)
    q("emb_covariance").collect().foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      cov(i)(j) = c; cov(j)(i) = c
    }
    val resid = (0 until 8).map { i =>
      val cx = (0 until 8).map(j => cov(i)(j) * x(j)).sum
      math.abs(cx - lam * x(i))
    }.max
    info(f"eigenpair residual: $resid%.2e, eigenvalue: $lam%.6f, share: $share%.4f")
    assert(resid < 1e-4, f"power iteration did not converge: residual $resid%.2e")
  }

  test("sim_hybrid_rrf: fusion arithmetic holds and both modalities contribute") {
    val rows = q("sim_hybrid_rrf").collect()
    assert(rows.map(_.getLong(0)).distinct.length === 10) // all 10 queries
    rows.foreach { r =>
      val rd = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val rs = if (r.isNullAt(5)) None else Some(r.getInt(5))
      assert(rd.isDefined || rs.isDefined)
      val want = BigDecimal(
        rd.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        rs.map(v => 1.0 / (60 + v)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === want, s"rrf mismatch on row $r")
    }
    // the fixture must exercise all three fusion cases, else the full
    // outer join could silently degrade to an inner/left join
    assert(rows.exists(r => !r.isNullAt(4) && !r.isNullAt(5)), "no doc in both lists")
    assert(rows.exists(r => r.isNullAt(4)), "no sparse-only doc")
    assert(rows.exists(r => r.isNullAt(5)), "no dense-only doc")
    // per-query ranks are 1..k with rrf non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs0) =>
      val sorted = rs0.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to sorted.length))
      assert(sorted.sliding(2).forall(p =>
        p.length < 2 || p(0).getDouble(2) >= p(1).getDouble(2)))
    }
  }

  test("text_pack_bpe conserves the tokenizer's total token mass") {
    // the pack manifest's token total must equal what the tokenizer
    // application reports — same merge table, same word filter, so a
    // drift here means the two queries segmented differently
    val packed = q("text_pack_bpe")
      .agg(sum("n_tokens")).head().getLong(0)
    val reported = q("text_bpe_tokenize")
      .agg(sum("n_tokens")).head().getLong(0)
    assert(packed === reported, s"pack total $packed != tokenizer $reported")
  }

  test("train_shards: totals conserved and partitioning-invariant") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val base = q("train_shards").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(base.keySet.subsetOf((0L until 8L).toSet))
    assert(base.values.map(_._1).sum === docs.count())
    val totTok = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    assert(base.values.map(_._2).sum === totTok)
    // deterministic: the same corpus arriving in any partitioning lands
    // every doc in the same shard with the same order head
    val reparted = SparkEntry.queries("train_shards")(
      spark, sf0001) // rebuilt plan
    val again = reparted.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(base === again)
    // head_doc is genuinely the min-key doc of its shard
    import spark.implicits._
    val keyed = docs.select(col("doc_id"),
        conv(substring(md5(concat(lit("shard:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("k"))
      .withColumn("shard", pmod(col("k"), lit(8L)))
      .groupBy("shard").agg(min("k").as("mk"))
      .as[(Long, Long)].collect().toMap
    base.foreach { case (sh, (_, _, _, hk)) =>
      assert(keyed(sh) === hk, s"shard $sh head key mismatch") }
  }
}
