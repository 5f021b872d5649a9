package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Curated-corpus publishing — the write-side discipline of a 100 TB
  * pipeline (the read/analyze/dedup operators' output has to land
  * somewhere a training run can consume it efficiently):
  *
  *  - **partition layout**: one directory per `partitionCols` value
  *    (consumers prune whole partitions — the split/lang dirs a data
  *    loader filters on);
  *  - **bounded file sizes**: `maxRecordsPerFile` caps every file — no
  *    giant single-task file, no unsplittable hot spot;
  *  - **in-file ordering**: rows sorted by `sortCols` inside each file
  *    (zone-map/rowgroup pruning on the dominant read predicate — the
  *    same layout quality `q26_zorder` measures);
  *  - **one task per partition dir** (`repartition(partitionCols)`)
  *    so file count ≈ ceil(rows / maxRecordsPerFile) per partition, not
  *    × input tasks.
  *
  * Returns a per-partition manifest (file count, row count, byte volume)
  * read back from what actually landed — the accounting a downstream
  * loader checks before training. `LakeSpec` pins: row-cap respected per
  * file, in-file ordering, manifest totals ≡ input.
  */
object Lake {

  def writeCurated(
      df: DataFrame,
      outDir: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      maxRecordsPerFile: Long): DataFrame = {
    val spark = df.sparkSession
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
    manifest(spark, outDir, partitionCols)
  }

  /** Per-partition accounting of what landed: file/row/byte counts from
    * the written files themselves (not the writer's intent).
    */
  def manifest(
      spark: SparkSession, outDir: String,
      partitionCols: Seq[String]): DataFrame = {
    // normalize the scan's file URI (file:///abs/...) to the same absolute
    // path the filesystem listing yields, so the size join is a plain
    // equi join
    val files = spark.read.parquet(outDir)
      .select(partitionCols.map(col) :+
        regexp_replace(input_file_name(), "^[a-z]+:/+", "/").as("file"): _*)
      .groupBy((partitionCols :+ "file").map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val sizes = {
      import spark.implicits._
      listFilesRec(new java.io.File(outDir))
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.length()))
        .toDF("file", "n_bytes")
    }
    files
      .join(sizes, "file")
      .groupBy(partitionCols.map(col): _*)
      .agg(countDistinct("file").as("n_files"),
        sum("n_rows").as("n_rows"),
        sum("n_bytes").as("n_bytes"))
  }

  private def listFilesRec(d: java.io.File): Seq[java.io.File] = {
    val these = Option(d.listFiles()).getOrElse(Array.empty).toSeq
    these.filter(_.isFile) ++ these.filter(_.isDirectory).flatMap(listFilesRec)
  }
}
