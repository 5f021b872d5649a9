package graft

import graft.operators.{Packing, Similarity, Skew}
import org.apache.spark.sql.functions._

/** Round-4 operators: distributed prefix-sum packing, overlapping token
  * windows, SemDeDup decisions, salted equi-join, cohort retention.
  */
class Round4OperatorsSpec extends SparkSuite {

  test("tokenOffsets: two-phase prefix sum equals the single-window form") {
    import spark.implicits._
    val docs = (0L until 37L).map(i =>
      (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" "))).toDF("doc_id", "text")
    // bucketSize 4 → 10 buckets: the cross-bucket offset path is exercised
    val got = Packing.tokenOffsets(docs, bucketSize = 4)
      .orderBy("doc_id").select("doc_id", "n", "tok_start").as[(Long, Long, Long)]
      .collect()
    var cum = 0L
    got.foreach { case (id, n, start) =>
      assert(start === cum, s"doc $id")
      assert(n === (id % 7) + 1)
      cum += n
    }
  }

  test("packStats: documents land in the pack holding their first token") {
    import spark.implicits._
    // 4 docs of 3 tokens each, packSize 4: starts 0,3,6,9 → packs 0,0,1,2
    val docs = (0L until 4L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val got = Packing.packStats(docs, packSize = 4, bucketSize = 2)
      .orderBy("pack_id")
      .select("pack_id", "n_docs", "n_tokens", "first_doc", "last_doc")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got === Array((0L, 2L, 6L, 0L, 1L), (1L, 1L, 3L, 2L, 2L),
      (2L, 1L, 3L, 3L, 3L)))
  }

  test("chunk: full coverage, stride overlap, remainder tail, short doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b")                                     // short: one chunk
    ).toDF("doc_id", "text")
    val got = Packing.chunk(docs, chunkLen = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_len")
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L),
      (2L, 0L, 0L, 2L)))
    // chunk 1 of doc 1 is tokens 4..7 — the md5 is of exactly that slice
    val h = Packing.chunk(docs, 4, 3)
      .filter(col("doc_id") === 1 && col("chunk_idx") === 1)
      .select("chunk_md5").as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("t4 t5 t6 t7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h === expected)
  }

  test("dedup_semantic: drops are exactly the pair targets, keepers survive") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pairs = Similarity.nearDupPairs(e, 16, 0.4)
    val expectedDrops = pairs.select(col("vb")).distinct().collect()
      .map(_.getLong(0)).toSet
    val got = SparkEntry.queries("dedup_semantic")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    val drops = got.filter(_._2 == "drop")
    assert(drops.map(_._1).toSet === expectedDrops)
    // every drop records a smaller-id keeper candidate; keeps record none
    drops.foreach { case (id, _, dupOf) => assert(dupOf >= 0 && dupOf < id) }
    got.filter(_._2 == "keep").foreach { case (_, _, d) => assert(d === -1L) }
    assert(got.length === e.count())
  }

  test("saltedEquiJoin equals the plain join on skewed input") {
    import spark.implicits._
    // hot key 1 carries 80% of the fact side
    val fact = ((1 to 80).map(i => (1L, i.toLong)) ++
      (1 to 20).map(i => ((i % 5 + 2).toLong, 100L + i))).toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
      (6L, "f")).toDF("k", "attr")
    val salted = Skew.saltedEquiJoin(fact, dim, Seq("k"), salts = 4,
        spreadCol = "payload")
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().sorted
    val plain = fact.join(dim, "k")
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
  }

  test("knnGraph: ranks dense from 1, sims non-increasing per vector") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val g = Similarity.knnGraph(e, 8, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1)
    g.values.foreach { rows =>
      val byRk = rows.sortBy(_._2)
      assert(byRk.map(_._2).toSeq === (1 to byRk.length))
      byRk.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
      rows.foreach { case (v, _, nbr, _) => assert(v !== nbr) }
    }
  }

  test("dup-ngram score: synthesized copies score 1.0, ratios in [0,1]") {
    val rows = SparkEntry.queries("text_dup_ngrams")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val dupIds = rows.map(_._1).filter(id =>
      id % 50 == 0 && id < 1000000L || id >= 1000000L).toSet
    rows.foreach { case (id, ratio) =>
      assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id")
      if (dupIds(id)) assert(ratio === 1.0, s"copied doc $id must be fully dup")
    }
    assert(dupIds.nonEmpty)
  }

  test("streaming dedup: doubled source equals single-copy batch aggregate") {
    val got = SparkEntry.queries("cdc_stream_dedup")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val batch = CdcBatch.readEvents(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("ni"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._1) === batch.sortBy(_._1))
    got.foreach { case (_, n, ni) => assert(n === ni) }
  }

  test("events_retention: offset-0 cell is the cohort size") {
    val ret = SparkEntry.queries("events_retention")(spark, sf0001)
      .filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cohorts = CdcBatch.readEvents(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000000000 div 604800").as("week"))
      .groupBy("user_id").agg(min("week").as("cohort_week"))
      .groupBy("cohort_week").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ret === cohorts)
  }
}
