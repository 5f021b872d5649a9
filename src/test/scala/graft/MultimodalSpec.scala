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

  test("MediaDims parses the container headers the fixture synthesizes: " +
      "every row's parsed meta equals the dimensions that were " +
      "byte-encoded, across all three formats") {
    val mt = Multimodal.mediaTable(spark, sf0001)
    val mismatches = mt.filter(
      !(col("meta.format") ===
        when(col("doc_id") % 3 === 0, "jpeg")
          .when(col("doc_id") % 3 === 1, "png").otherwise("webp")) ||
      col("meta.width") =!= (lit(64) + (col("doc_id") % 8) * 32) ||
      col("meta.height") =!= (lit(64) + (col("doc_id") % 5) * 48) ||
      col("meta").isNull).count()
    assert(mismatches === 0L)
    // every format is actually present
    assert(mt.select(col("meta.format")).distinct().count() === 3L)
  }

  test("MediaDims on adversarial bytes: SOF after multiple APPn segments " +
      "parses, truncated/foreign payloads yield null, not garbage") {
    import org.apache.spark.sql.graft.MediaHeader
    def hex(s: String): Array[Byte] = s.replaceAll("\\s", "")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // JPEG with COM + APP1 before SOF0 (frame header is NOT the first
    // segment — the walk, not a fixed offset, must find it): h=257 w=300
    val jpeg = hex("FFD8" + "FFFE0004ABCD" + "FFE10008457869660000" +
      "FFC0001108" + "0101" + "012C" + "03012200021101031101")
    val j = MediaHeader.parse(jpeg)
    assert(j != null && j.getUTF8String(0).toString == "jpeg" &&
      j.getInt(1) == 300 && j.getInt(2) == 257)
    // PNG round-trip at a non-fixture dimension
    val png = hex("89504E470D0A1A0A0000000D49484452" + "00000640" +
      "00000001" + "080600000000000000")
    val p = MediaHeader.parse(png)
    assert(p != null && p.getUTF8String(0).toString == "png" &&
      p.getInt(1) == 1600 && p.getInt(2) == 1)
    // WebP VP8X LE24-minus-one
    val webp = hex("52494646" + "16000000" + "5745425056503858" +
      "0A00000000000000" + "FFFF00" + "000100")
    val w = MediaHeader.parse(webp)
    assert(w != null && w.getUTF8String(0).toString == "webp" &&
      w.getInt(1) == 0x10000 && w.getInt(2) == 257)
    // JPEG fill bytes: runs of 0xFF padding before a marker are legal
    // (ITU T.81 B.1.1.2) — the walk must skip them, not desynchronize
    val jpegFill = hex("FFD8" + "FFFF" + "FFFE0004ABCD" + "FFFFFF" +
      "FFC0001108" + "0040" + "0060" + "03012200021101031101")
    val jf = MediaHeader.parse(jpegFill)
    assert(jf != null && jf.getUTF8String(0).toString == "jpeg" &&
      jf.getInt(1) == 96 && jf.getInt(2) == 64)
    // reaching SOS without a frame header yields null (dims must
    // precede the entropy-coded data; scanning past SOS would read
    // compressed bytes as markers)
    assert(MediaHeader.parse(hex("FFD8" + "FFDA0008" + "0011223344")) == null)
    // truncated PNG (signature only), bare text, truncated JPEG scan,
    // and a JPEG whose segment lengths run past the buffer: all null
    assert(MediaHeader.parse(hex("89504E470D0A1A0A")) == null)
    assert(MediaHeader.parse("just some text".getBytes("UTF-8")) == null)
    assert(MediaHeader.parse(hex("FFD8FFFE0400")) == null)
    assert(MediaHeader.parse(hex("FFD8FFFEFFFF00112233445566778899")) == null)
    assert(MediaHeader.parse(Array.emptyByteArray) == null)
    assert(MediaHeader.parse(null) == null)
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
