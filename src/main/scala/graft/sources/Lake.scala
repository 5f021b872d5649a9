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
    * the written files themselves (not the writer's intent). File listing
    * goes through the Hadoop FileSystem API so the manifest is correct on
    * ANY store the write targeted (hdfs://, s3a://, file://) — a local-
    * only java.io listing would silently return an empty manifest on
    * object storage. Both join keys are normalized with the SAME
    * scheme-stripping rule, so they agree regardless of how each side
    * renders the URI.
    */
  def manifest(
      spark: SparkSession, outDir: String,
      partitionCols: Seq[String]): DataFrame = {
    // RFC 3986 scheme chars (ALPHA *(ALPHA/DIGIT/+/-/.)), case-insensitive
    // — the earlier [a-z0-9]+ missed legal schemes (e.g. "s3+custom",
    // uppercase), and a one-sided normalization miss silently dropped
    // files from the manifest via the inner join (now a left join that
    // fails loudly instead)
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "(?i)^[a-z][a-z0-9+.-]*:/+", "/")
    val files = spark.read.parquet(outDir)
      .select(partitionCols.map(col) :+
        norm(input_file_name()).as("file"): _*)
      .groupBy((partitionCols :+ "file").map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val sizes = {
      import spark.implicits._
      val path = new org.apache.hadoop.fs.Path(outDir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(path, /* recursive = */ true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          buf += ((st.getPath.toString, st.getLen))
      }
      buf.toSeq.toDF("file_uri", "n_bytes")
        .select(norm(col("file_uri")).as("file"), col("n_bytes"))
    }
    // left join + per-row null check: a normalization mismatch between
    // the two listings must FAIL the manifest, not shrink it — silent
    // file loss defeats the accounting this manifest exists to provide
    files
      .join(sizes, Seq("file"), "left")
      .select((partitionCols.map(col) :+ col("file") :+ col("n_rows") :+
        coalesce(col("n_bytes"), raise_error(concat(
          lit("Lake.manifest: no byte size for file "), col("file"),
          lit(" — scan/listing path normalization diverged"))))
          .as("n_bytes")): _*)
      .groupBy(partitionCols.map(col): _*)
      .agg(countDistinct("file").as("n_files"),
        sum("n_rows").as("n_rows"),
        sum("n_bytes").as("n_bytes"))
  }

  /** Snapshot diff between two corpus versions — the dataset-versioning
    * audit a training pipeline runs before switching its data dependency:
    * which documents were ADDED, REMOVED, or CHANGED between snapshot A
    * and snapshot B. Unchanged rows are excluded from the output — at
    * 100 TB they are the overwhelming majority, and the diff's value is
    * its smallness (the changed set is what re-enters dedup/decontam and
    * what a reproducibility report cites).
    *
    * Scale shape: content reduces to an md5 MAP-SIDE before the join, so
    * the single full-outer shuffle on the id carries (id, 32-char hash)
    * rows — document bodies never move. Snapshots already bucketed on the
    * id (the [[writeCurated]] layout sorted/partitioned by key) diff with
    * zero exchange; otherwise this is one minimal id-keyed join.
    */
  def snapshotDiff(oldV: DataFrame, newV: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    // presence is carried EXPLICITLY (not inferred from a null hash): a
    // document whose content is NULL hashes to NULL, and hash-null-means-
    // absent would misread it as added/removed; <=> (null-safe equality)
    // then treats null-vs-null content as unchanged and null-vs-value as
    // changed, matching SQL IS DISTINCT FROM
    val o = oldV.select(col(idCol), md5(col(contentCol)).as("old_hash"),
      lit(true).as("_in_old"))
    val n = newV.select(col(idCol), md5(col(contentCol)).as("new_hash"),
      lit(true).as("_in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(!(col("old_hash") <=> col("new_hash")), lit("changed"))
          .otherwise(lit("unchanged")).as("change"),
        col("old_hash"), col("new_hash"))
      .filter(col("change") =!= "unchanged")
  }
}
