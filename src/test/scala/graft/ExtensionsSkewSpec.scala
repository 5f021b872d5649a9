package graft

import graft.functions.GraftExtensions
import graft.operators.Skew
import org.apache.spark.sql.functions._

class ExtensionsSkewSpec extends SparkSuite {

  test("graft_dot is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("graft_merge SQL aggregate == Merge.foldActions, shuffle-invariant") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // three keys: plain upsert chain, annihilation, delete+insert revival
    val changes = Seq(
      ("a", 1L, "insert"), ("a", 2L, "update"),
      ("b", 3L, "insert"), ("b", 4L, "delete"),
      ("c", 5L, "delete"), ("c", 6L, "insert"))
    val expected = changes.groupBy(_._1).map { case (k, es) =>
      k -> Merge.foldActions(es.sortBy(_._2).map(_._3)).getOrElse(Types.None_)
    }
    // adversarial partitioning: reversed insertion order, many partitions —
    // partial buffers merge in arbitrary order, finish must still sort
    changes.reverse.toDF("rid", "seq", "cdc_action").repartition(7)
      .createOrReplaceTempView("merge_udaf_v")
    val got = spark.sql(
      "SELECT rid, graft_merge(seq, cdc_action) AS a FROM merge_udaf_v GROUP BY rid")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === expected)
    assert(got("b") === Types.None_) // insert+delete annihilated
    assert(got("c") === "update")    // delete+insert → update
  }

  test("salted two-phase aggregate equals plain aggregate") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val salted = Skew.saltedCountSum(
        li, Seq("l_returnflag"), "l_quantity", salts = 8,
        spreadCol = "l_orderkey")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100))))
      .toMap
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("total"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100))))
      .toMap
    assert(salted === plain)
  }

  test("salted self-join pairs == unsalted pairs (LSH and IVF-cell shapes)") {
    import graft.operators.{Similarity, TextDedup}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(200)
    def lshPairs(salts: Int): Set[(Long, Long)] =
      TextDedup.minhashLshPairs(docs, "doc_id", "text", salts = salts)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshPairs(3) === lshPairs(1))
    assert(lshPairs(1).nonEmpty)

    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def cellPairs(salts: Int): Set[(Long, Long, Double)] =
      Similarity.nearDupPairs(emb, 16, 0.3, salts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cellPairs(4) === cellPairs(1))
  }

  test("adaptiveSalts sizes the shard factor from the observed hottest key") {
    import spark.implicits._
    // uniform: every key under the shard target → plain join, no salting
    val uniform = (1 to 1000).map(i => (i % 10, i)).toDF("k", "v")
    assert(Skew.adaptiveSalts(uniform, Seq("k")) === 1)
    // skewed: one key holds 5000 rows → ceil(5000 / 2048) = 3 shards
    val skewed = ((1 to 5000).map(_ => (0, 0)) ++
      (1 to 100).map(i => (i, i))).toDF("k", "v")
    assert(Skew.adaptiveSalts(skewed, Seq("k")) === 3)
    // degenerate: the cap bounds replication no matter how hot the key
    val degenerate = (1 to 60000).map(_ => (0, 0)).toDF("k", "v")
    assert(Skew.adaptiveSalts(degenerate, Seq("k"), maxSalts = 16) === 16)
    // empty: nothing to shard
    assert(Skew.adaptiveSalts(uniform.filter(col("k") < -1), Seq("k")) === 1)
    // explicit target overrides the default shard sizing
    assert(Skew.adaptiveSalts(skewed, Seq("k"), targetPerShard = 500L) === 10)
  }

  test("adaptive default (salts = 0) equals the explicit unsalted result") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def cellPairs(salts: Int): Set[(Long, Long, Double)] =
      Similarity.nearDupPairs(emb, 16, 0.3, salts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cellPairs(0) === cellPairs(1)) // 0 = adaptive, the new default
    def rpPairs(salts: Int): Set[(Long, Long, Double)] =
      Similarity.rpLshPairs(emb, bands = 4, bitsPerBand = 8, threshold = 0.5,
          salts = salts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rpPairs(0) === rpPairs(1))
  }

  test("salt is deterministic and bounded") {
    import spark.implicits._
    val df = (1 to 1000).toDF("k")
    val s1 = df.select(Skew.salt(8, col("k")).as("s")).collect().map(_.getInt(0))
    val s2 = df.select(Skew.salt(8, col("k")).as("s")).collect().map(_.getInt(0))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
    assert(s1.distinct.length === 8) // actually spreads
  }
}
