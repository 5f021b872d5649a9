package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.10 X5): media payloads are
  * opaque `binary` columns with a typed metadata struct riding alongside —
  * the layout a 100 TB training-data lake uses (parquet binary + stats).
  *
  * The codec step (image/audio decode) is STUBBED — the container has no
  * media libraries — with a clearly-marked deterministic fake. Everything
  * Spark-side is real: the schema, the per-partition batched processing
  * (`mapPartitions`, the Scala analog of `mapInPandas` batch shape), the
  * feature-vector output type, and the partitioning behavior.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int)
  final case class MediaRecord(doc_id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long, features: Array[Float])

  /** Fixture media table: each payload carries a REAL container header —
    * PNG signature+IHDR, JPEG SOI+APP0(JFIF)+SOF0, or WebP RIFF/VP8X —
    * with the row's dimensions byte-encoded into it (big-endian for
    * PNG/JPEG, the spec's LE24-minus-one for VP8X), followed by the
    * document text standing in for the compressed body. The `meta`
    * struct is then PARSED BACK from those bytes by the codegen'd
    * [[org.apache.spark.sql.graft.MediaDims]] expression (r17 verdict
    * #3: metadata from bytes, not from doc_id arithmetic — only PIXEL
    * decode remains stubbed). Headers are synthesized with built-in
    * expressions (hex/lpad/unhex/concat — all codegen'd); PNG's IHDR
    * CRC is zeroed (dimension parsers don't check it, and neither
    * engine has a SQL crc32 both sides could agree on).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    val w = (lit(64) + (col("doc_id") % 8) * 32).cast("int")
    val h = (lit(64) + (col("doc_id") % 5) * 48).cast("int")
    def be32(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
    def be16(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
    def leSwap(hexStr: org.apache.spark.sql.Column, nBytes: Int) =
      concat((nBytes to 1 by -1).map(i =>
        substring(hexStr, (i - 1) * 2 + 1, 2)): _*)
    def le24(c: org.apache.spark.sql.Column) = leSwap(lpad(hex(c), 6, "0"), 3)
    def le32(c: org.apache.spark.sql.Column) = leSwap(lpad(hex(c), 8, "0"), 4)
    val payload = col("text").cast("binary")
    val png = concat(
      lit("89504E470D0A1A0A0000000D49484452"), be32(w), be32(h),
      lit("080600000000000000")) // depth 8, RGBA, CRC zeroed
    val jpeg = concat(
      lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
      be16(h), be16(w), lit("03012200021101031101"))
    val webp = concat(
      lit("52494646"), le32(length(payload) + 22), lit("5745425056503858"),
      lit("0A00000000000000"), le24(w - 1), le24(h - 1))
    val headerHex =
      when(col("doc_id") % 3 === 0, jpeg)
        .when(col("doc_id") % 3 === 1, png)
        .otherwise(webp)
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(unhex(headerHex), payload).as("media"))
      .select(col("doc_id"), col("media"),
        org.apache.spark.sql.graft.MediaFunctions
          .mediaDims(col("media")).as("meta"))
  }

  /** STUB decode — PIXEL decode only, since r18: container metadata
    * (format/width/height) is genuinely parsed from the payload bytes by
    * [[org.apache.spark.sql.graft.MediaDims]]; what a codec would add is
    * the decompressed pixel planes, and the container has no media
    * libraries. The fake is a 16-bin byte histogram normalized to [0,1] —
    * deterministic, shaped like a feature extractor's output, and cheap.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    if (bytes.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= bytes.length.toFloat; j += 1 }
    }
    hist
  }

  /** Batched per-partition feature extraction — the Spark-side plumbing a
    * decode/resize/frame-sample stage needs: one codec context per
    * partition (not per row), rows streamed through it, typed output.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec init" would happen here (one per task)
      it.map { r =>
        MediaFeatures(r.doc_id, r.meta.format, r.media.length.toLong,
          decodeStub(r.media))
      }
    }
  }

  /** Frame sampling stub: every nth byte-window as a "frame" — exercises
    * the explode-to-frames shape (one media row → many frame rows).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    // payloads shorter than one frame yield no rows: without the guard,
    // sequence(0, negative) steps DOWN and negative substring positions
    // silently produce wrong frames (same hazard class as the short-doc
    // n-gram crashes)
    media.select(col("doc_id"), col("meta.format").as("format"),
      posexplode(
        when(length(col("media")) >= frameBytes,
          transform(
            sequence(lit(0),
              floor((length(col("media")) - frameBytes) / stride).cast("int")),
            i => substring(col("media"), (i * stride + 1).cast("int"),
              lit(frameBytes))))
          .otherwise(array().cast("array<binary>"))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")

  /** Lake INGESTION for raw media — the step before [[mediaTable]]'s
    * shape exists: media lands as one FILE per item (how cameras,
    * crawlers, and upload endpoints deliver it), and Spark's
    * `binaryFile` source turns the directory into the binary-column
    * table downstream operators consume. At 100 TB the read is one task
    * per file group (maxPartitionBytes governs grouping); the id is
    * carried in the file name, the payload in `content`, and no decode
    * happens on the scan — the opaque-binary contract every mm_*
    * operator keeps. `pathGlobFilter` guards against sidecar files.
    */
  def ingestMediaFiles(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        // md5 over the hex encoding (not the raw bytes): the oracle's
        // engine can only md5 strings, and hashing the same uppercase
        // hex on both sides proves byte equality just as well
        md5(hex(col("content"))).as("content_md5"))

  /** Stage each row's payload as one `<doc_id>.bin` file under `dir` —
    * executor-side, one file per row (the gate's stand-in for the
    * upstream system that delivers media as files). */
  def writeMediaFiles(media: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    media.select(col("doc_id"), col("media"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${r.getLong(0)}.bin"),
            r.getAs[Array[Byte]]("media"))
          ()
        }
      }
  }
}
