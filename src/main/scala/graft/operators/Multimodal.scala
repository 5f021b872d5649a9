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

  /** Fixture media table: text bytes stand in for encoded media; metadata
    * derived deterministically from doc_id.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        when(col("doc_id") % 3 === 0, "jpeg")
          .when(col("doc_id") % 3 === 1, "png")
          .otherwise("webp").as("format"),
        (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * 48).cast("int").as("height"))
        .as("meta"))

  /** STUB decode: a real pipeline would decode `media` with an image/audio
    * codec here. The fake is a 16-bin byte histogram normalized to [0,1] —
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
        md5(col("content")).as("content_md5"))

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
