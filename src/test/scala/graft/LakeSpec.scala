package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** The curated-corpus writer must deliver its layout contract: partition
  * dirs, per-file row cap, in-file ordering, and a manifest that accounts
  * for every input row.
  */
class LakeSpec extends SparkSuite {

  test("writeCurated: partition dirs, row cap, in-file order, manifest totals") {
    val out = java.nio.file.Files.createTempDirectory("graft_lake").toString
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val total = docs.count()
      val m = Lake.writeCurated(docs, out,
        partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
        maxRecordsPerFile = 40L)

      // manifest accounts for every row, grouped by partition
      val mRows = m.agg(sum("n_rows")).head().getLong(0)
      assert(mRows === total)
      assert(m.select("lang").distinct().count() === m.count())

      // partition dirs exist on disk
      val dirs = Option(new java.io.File(out).listFiles())
        .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.exists(_.startsWith("lang=")), dirs.toString)

      // every file respects the row cap, and rows are sorted in-file
      val perFile = spark.read.parquet(out)
        .select(col("doc_id"), input_file_name().as("f"))
      val caps = perFile.groupBy("f").agg(count(lit(1)).as("n"))
      assert(caps.filter(col("n") > 40).count() === 0,
        "a file exceeds maxRecordsPerFile")
      // in-file ordering: each parquet row group preserves write order, so
      // reading one FILE yields doc_id non-decreasing per file when it was
      // sorted at write; verify per file via a window
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("f")
        .orderBy(monotonically_increasing_id())
      val disorder = perFile
        .withColumn("prev", lag("doc_id", 1).over(w))
        .filter(col("prev").isNotNull && col("prev") > col("doc_id"))
      assert(disorder.count() === 0, "rows not sorted within a file")

      // byte accounting is real file sizes
      assert(m.filter(col("n_bytes") <= 0).count() === 0)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(out))
    }
  }

  test("snapshotDiff: change classes exact; NULL content is presence, " +
      "not absence") {
    import spark.implicits._
    val v1 = Seq(
      (1L, "same"), (2L, "edit me"), (3L, "drop me"),
      (4L, null.asInstanceOf[String]), // null content, unchanged
      (5L, null.asInstanceOf[String]), // null → value = changed
      (6L, "value")                    // value → null = changed
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "same"), (2L, "edited"),
      (4L, null.asInstanceOf[String]),
      (5L, "now set"),
      (6L, null.asInstanceOf[String]),
      (7L, "brand new")
    ).toDF("doc_id", "text")
    val got = sources.Lake.snapshotDiff(v1, v2, "doc_id", "text")
      .select("doc_id", "change").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged (excluded), 4 null-null unchanged (excluded — a null
    // hash must NOT read as added/removed)
    assert(got === Map(
      2L -> "changed", 3L -> "removed", 5L -> "changed",
      6L -> "changed", 7L -> "added"))
  }
}
