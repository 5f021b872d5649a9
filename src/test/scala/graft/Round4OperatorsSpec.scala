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

  test("rangeSearch: exactly the brute-force pairs above the threshold") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val vecs = e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val expected = (for {
      (qid, qv) <- vecs if qid < 10
      (vid, v) <- vecs if vid != qid
      s = cos(qv, v) if s >= 0.3
    } yield (qid, vid, BigDecimal(s).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val got = Similarity.rangeSearch(e, col("vec_id") < 10, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("emb_covariance: matches the direct quantized computation, 36 cells") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val rows = e.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = rows.length.toDouble
    def q(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val s = (0 until 8).map(i => rows.map(r => q(r(i))).sum)
    val got = SparkEntry.queries("emb_covariance")(spark, sf0001)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got.size === 36)
    for { i <- 0 until 8; j <- i until 8 } {
      val p = rows.map(r => q(r(i) * r(j))).sum
      val cov = p / (n * 1e6) -
        (s(i) / (n * 1e6)) * (s(j) / (n * 1e6))
      // r8: outputs quantize tie-free via Quant.floorAt, not HALF_UP
      val exp = math.floor(cov * 1e6) / 1e6
      assert(got((i, j)) === exp, s"cov($i,$j)")
    }
    // diagonal entries are variances — strictly positive on real data
    (0 until 8).foreach(i => assert(got((i, i)) > 0.0))
  }

  test("events_anomaly: outlier accounting matches a direct computation") {
    val ev = CdcBatch.readEvents(spark, sf0001)
      .select("event_type", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def q(x: Double): Long = BigDecimal(x * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val got = SparkEntry.queries("events_anomaly")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    val types = ev.map(_._1).distinct
    assert(got.keySet === types.toSet)
    types.foreach { ty =>
      val g = ev.filter(_._1 == ty)
      val n = g.length.toDouble
      val sv = g.map(e => q(e._3)).sum
      val svv = g.map(e => { val c = q(e._3); c * c }).sum
      val mean = sv / (n * 100.0)
      val std = math.sqrt(svv / (n * 10000.0) - mean * mean)
      val out = g.filter(e => math.abs(e._3 - mean) > 3.0 * std)
      assert(got(ty) === ((g.length.toLong, out.length.toLong,
        out.map(_._2).sum)), ty)
    }
  }

  test("bucketed join: no exchange below the join; result = plain join") {
    val tmp = java.nio.file.Files.createTempDirectory("bkt_spec").toString
    try {
      spark.read.parquet(s"$sf0001/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").option("path", s"$tmp/o")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bkt_spec_o")
      spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite").option("path", s"$tmp/l")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bkt_spec_l")
      val j = spark.table("bkt_spec_l")
        .join(spark.table("bkt_spec_o").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // bucketed scans satisfy the join's distribution — no Exchange of
      // any kind (shuffle or broadcast) anywhere in the join plan
      assert(!plan.contains("Exchange"), plan.take(2000))
      // and the full driver-gate query equals the plain join aggregate
      val got = SparkEntry.queries("q30_bucket_join")(spark, sf0001)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      val plain = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .join(spark.read.parquet(s"$sf0001/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(got === plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_spec_o")
      spark.sql("DROP TABLE IF EXISTS bkt_spec_l")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  test("text_length_hist: bucket bounds hold and doc counts total") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = SparkEntry.queries("text_length_hist")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    got.foreach { case (lang, lo, _, mn, mx) =>
      assert(lo % 200 === 0, s"$lang/$lo")
      assert(mn >= lo && mx < lo + 200, s"$lang/$lo")
    }
    assert(got.map(_._3).sum === d.count())
  }

  test("curation_manifest: synthesized copies all dropped, accounting adds up") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val nCopies = d.filter(col("doc_id") % 50 === 0).count()
    val rows = SparkEntry.queries("curation_manifest")(spark, sf0001)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.map(_._2).sum === nCopies) // every copy is non-canonical
    assert(rows.map(_._1).sum === d.count() + nCopies)
    rows.foreach { case (cand, dup, qual, kept, toks) =>
      assert(dup + qual + kept === cand)
      assert(toks >= kept) // every kept doc has ≥ 1 token
    }
    assert(rows.map(_._4).sum > 0)
  }

  test("dedup_containment: every synthesized excerpt is contained at 1.0") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val sources = d.filter(col("doc_id") % 40 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("dedup_containment")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every excerpt (id + 2e6) appears fully contained in its source doc
    sources.foreach { src =>
      val hit = got.find(p => p._1 == src + 2000000L && p._2 == src)
      assert(hit.isDefined, s"excerpt of $src not flagged")
      assert(hit.get._3 === 1.0, s"excerpt of $src containment != 1")
    }
    // the fixture contains genuine near-dup texts (the LSH targets), so
    // originals may legitimately be contained in their near-dups — only
    // range and non-reflexivity are invariant
    got.foreach { case (a, b, c) =>
      assert(a !== b)
      assert(c >= 0.9 && c <= 1.0)
    }
  }

  test("cdc_stream_enrich: streamed left join equals the batch left join") {
    val got = SparkEntry.queries("cdc_stream_enrich")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val dim = spark.read.parquet(s"$sf0001/customer.parquet")
      .filter(col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = CdcBatch.readEvents(spark, sf0001)
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("(none)")).as("segment"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got === batch)
    // the synthesized dim gaps produce a real unmatched bucket
    assert(got.exists(_._1 == "(none)"))
  }

  test("q31_range_window: value frame matches direct trailing-30d count") {
    val rows = SparkEntry.queries("q31_range_window")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))
    rows.groupBy(_._1).values.foreach { g =>
      g.foreach { case (_, ok, ts, n30, q) =>
        val expect = g.count(x => x._3 >= ts - 30L * 86400 && x._3 <= ts)
        assert(n30 === expect, s"order $ok")
        assert(q >= 1 && q <= 4)
      }
      // ntile(4) bucket sizes differ by at most 1
      val sizes = g.groupBy(_._5).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("mm_shard_manifest: contiguous shards, disjoint id ranges, exact totals") {
    val rows = SparkEntry.queries("mm_shard_manifest")(spark, sf0001)
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    // media = container header (jpeg 39 B / png 33 B / webp 30 B since
    // r18 — MediaDims parses real headers) + the text payload
    val total = d.select(sum(
      (length(col("text").cast("binary")) +
        when(col("doc_id") % 3 === 0, 39)
          .when(col("doc_id") % 3 === 1, 33)
          .otherwise(30)).cast("long")))
      .head().getLong(0)
    assert(rows.map(_._1).toSeq === (0L until rows.length))
    assert(rows.map(_._2).sum === d.count())
    assert(rows.map(_._3).sum === total)
    // id ranges are disjoint and increasing shard to shard
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4, s"shards ${a._1}/${b._1}")
      case _ =>
    }
  }

  test("cdc_stream_sessions: streamed session windows equal the batch form") {
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("cdc_stream_sessions")(spark, sf0001)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    val w = Window.partitionBy("user_id").orderBy("tus")
    val batch = CdcBatch.readEvents(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("tus"))
      .withColumn("new_s", when(lag("tus", 1).over(w).isNull, 1)
        .when(col("tus") - lag("tus", 1).over(w) >= 3600000000L, 1)
        .otherwise(0))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("tus").as("st"), (max("tus") + 3600000000L).as("en"),
        count(lit(1)).as("n"))
      .select("user_id", "st", "en", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    assert(got === batch)
    assert(got.nonEmpty)
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
