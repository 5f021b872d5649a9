package graft

import graft.Materialize.Ops
import graft.operators.Similarity
import graft.streaming.StreamSim
import graft.streaming.StreamSim.EmbIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming embedding near-dup must converge to the batch nearDupPairs
  * result once the corpus has streamed through: cell assignment against
  * the offline-trained quantizer is bitwise-identical to the batch hash
  * aggregate, candidates accumulate in keyed cell state, and the
  * foreachBatch verify joins back to the embedding store.
  */
class StreamSimSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").materialize()

  test("fold assignment == batch ivfAssignTo (same winner, same tie-break)") {
    val cent = Similarity.kmeansCentroids(emb, 16, 2)
    val batch = Similarity.ivfAssignTo(emb, cent)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fold = StreamSim.cellRows(emb, cent)
      .collect().map(r => r.vec_id -> r.cid).toMap
    assert(fold.size === batch.size)
    for ((id, cid) <- batch)
      assert(fold(id) === cid, s"vec $id: fold=${fold(id)} batch=$cid")
  }

  test("hier fold assignment == batch assignToHier at production C " +
      "(same winner, same tie-breaks, no drops)") {
    val cent = Similarity.kmeansCentroids(emb, 192, 2).materialize()
    assert(cent.count() >= 128,
      "fixture must keep enough cells to engage the hier path")
    val v = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val batch = Similarity.assignToHier(v, cent)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fold = StreamSim.cellRowsHier(emb, cent)
      .collect().map(r => r.vec_id -> r.cid).toMap
    assert(fold.size === batch.size, "hier fold dropped or duplicated rows")
    for ((id, cid) <- batch)
      assert(fold(id) === cid, s"vec $id: fold=${fold(id)} batch=$cid")
  }

  test("cellRowsHier below flatBelow falls back to the exact flat fold — " +
      "the C = 16 gate geometry is untouched") {
    val cent = Similarity.kmeansCentroids(emb, 16, 2).materialize()
    val flat = StreamSim.cellRows(emb, cent)
      .collect().map(r => r.vec_id -> r.cid).toMap
    val hier = StreamSim.cellRowsHier(emb, cent)
      .collect().map(r => r.vec_id -> r.cid).toMap
    assert(hier === flat)
  }

  test("multi-probe fold assignment == batch assignToHierMulti, flat " +
      "(C=16) and hier (C=192) regimes") {
    for (c <- Seq(16, 192)) {
      val cent = Similarity.kmeansCentroids(emb, c, 2).materialize()
      val v = emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val batch = Similarity.assignToHierMulti(v, cent)
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val fold = StreamSim.cellRowsHierMulti(emb, cent)
        .collect().map(r => (r.vec_id, r.cid)).toSet
      assert(fold === batch, s"C=$c: stream multi-probe diverged " +
        s"(missing=${(batch -- fold).size}, extra=${(fold -- batch).size})")
      // and it contains the single-probe assignment (the recall-knob
      // superset property, streamed)
      val single = StreamSim.cellRowsHier(emb, cent)
        .collect().map(r => (r.vec_id, r.cid)).toSet
      assert(single.subsetOf(fold))
    }
  }

  test("streamed cell candidates + verify == batch nearDupPairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the quantizer is the OFFLINE artifact both sides share
    val cent = Similarity.kmeansCentroids(emb, 16, 2).materialize()

    val mem = MemoryStream[EmbIn]
    val cand = StreamSim.candidates(StreamSim.cellRows(mem.toDF(), cent))
    val verified = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = cand.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamSim.CandPair], _: Long) =>
        StreamSim.verifyPairs(batch.toDF(), emb, 0.4)
          .collect().foreach(r =>
            verified += ((r.getLong(0), r.getLong(1), r.getDouble(2))))
        ()
      }
      .start()

    // stream the corpus in 3 micro-batches so cross-batch pairs must come
    // from the accumulated cell state
    val rows = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[EmbIn].collect().sortBy(_.vec_id)
    val waves = rows.grouped((rows.length + 2) / 3).toSeq
    waves.foreach { w => mem.addData(w.toSeq); q.processAllAvailable() }
    q.stop()

    val batchPairs = Similarity.nearDupPairs(emb, 16, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchPairs.nonEmpty, "fixture must produce near-dup pairs")
    assert(verified.toSet === batchPairs)
  }

  test("nearDupStreamed: temp fallback leaks no work dirs; explicit " +
      "workDir keeps the pairs sink, drops the staging dir, and matches " +
      "the default result") {
    def tmpDirs(): Set[String] =
      new java.io.File(sys.props("java.io.tmpdir")).listFiles()
        .filter(_.getName.startsWith("graft_ss")).map(_.getName).toSet
    val before = tmpDirs()
    val viaTmp = StreamSim.nearDupStreamed(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the fallback materialized its result and removed BOTH temp dirs —
    // and the returned frame stays collectable after their deletion
    assert(tmpDirs() === before, "temp-dir fallback leaked work dirs")
    assert(viaTmp.nonEmpty, "fixture must produce near-dup pairs")
    val root = java.nio.file.Files.createTempDirectory("graft_wd").toString
    try {
      val viaWd = StreamSim.nearDupStreamed(spark, sf0001,
          workDir = Some(s"$root/run1"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(viaWd === viaTmp,
        "workDir run diverged from the temp-fallback run")
      // the pairs dir is the run's durable output and stays; the staged
      // stream source is scratch and goes
      val pairs = new java.io.File(s"$root/run1/pairs")
      assert(pairs.exists() &&
        pairs.listFiles().exists(_.getName.endsWith(".parquet")),
        "pairs sink missing under workDir")
      assert(!new java.io.File(s"$root/run1/stream").exists(),
        "staging dir left under workDir")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("cell cap bounds fan-out and counts drops into the accumulator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cent = Similarity.kmeansCentroids(emb, 16, 2).materialize()
    val dropped = spark.sparkContext.longAccumulator("sim_dropped")
    val mem = MemoryStream[EmbIn]
    val cand = StreamSim.candidates(
      StreamSim.cellRows(mem.toDF(), cent), maxCell = 3,
      droppedVecs = Some(dropped))
    val q = cand.writeStream.format("memory").queryName("ss_cap")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val rows = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[EmbIn].collect().sortBy(_.vec_id)
    mem.addData(rows.toSeq); q.processAllAvailable(); q.stop()
    // expected from the batch-side cell histogram: each cell admits at
    // most 3 occupants -> C(min(n,3), 2) pairs, n-3 drops
    val cellSizes = StreamSim.cellRows(emb, cent)
      .groupBy("cid").count().collect().map(_.getLong(1))
    val expPairs = cellSizes.map(n => { val k = math.min(n, 3L); k * (k - 1) / 2 }).sum
    val expDrops = cellSizes.map(n => math.max(0L, n - 3L)).sum
    assert(spark.table("ss_cap").count() === expPairs)
    assert(dropped.value === expDrops,
      s"expected $expDrops drops, got ${dropped.value}")
  }
}
