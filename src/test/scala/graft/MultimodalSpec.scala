package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}
import org.apache.spark.sql.functions._

/** X5 plumbing: binary columns, typed metadata, batched feature extraction,
  * frame sampling. The decode itself is a documented deterministic stub.
  */
class MultimodalSpec extends SparkSuite {

  test("media table schema: binary payload + typed metadata struct") {
    val mt = Multimodal.mediaTable(spark, sf0001)
    val f = mt.schema("media")
    assert(f.dataType.typeName === "binary")
    val meta = mt.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("format", "width", "height"))
    assert(mt.count() === 500)
  }

  test("decode stub: 16-bin normalized histogram, deterministic") {
    val bytes = "hello world".getBytes("UTF-8")
    val h1 = Multimodal.decodeStub(bytes)
    val h2 = Multimodal.decodeStub(bytes)
    assert(h1.toSeq === h2.toSeq)
    assert(h1.length === 16)
    assert(math.abs(h1.sum - 1.0f) < 1e-5f)
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq === Seq.fill(16)(0f))
  }

  test("extractFeatures: mapPartitions batch shape, typed output") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "abcabc".getBytes, MediaMeta("jpeg", 64, 64)),
      MediaRecord(2L, "zzzz".getBytes, MediaMeta("png", 96, 96))).toDS()
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.doc_id).sorted.toSeq === Seq(1L, 2L))
    assert(feats.forall(_.features.length == 16))
    assert(feats.find(_.doc_id == 1L).get.n_bytes === 6L)
  }

  test("frame sampling explodes one media row into deterministic frames") {
    val mt = Multimodal.mediaTable(spark, sf0001).limit(3)
    val frames = Multimodal.sampleFrames(mt, frameBytes = 16, stride = 32)
    val cols = frames.columns.toSeq
    assert(cols === Seq("doc_id", "format", "frame_no", "frame"))
    val n = frames.groupBy("doc_id").count().collect()
    assert(n.forall(_.getLong(1) > 1)) // multiple frames per doc
    // frame payloads are 16-byte windows
    val lens = frames.select(length(col("frame"))).distinct().collect().map(_.getInt(0))
    assert(lens.forall(_ <= 16))
  }
}
