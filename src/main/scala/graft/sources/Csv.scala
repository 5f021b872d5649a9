package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV sink/source parity with the reference dump/load tools.
  *
  * Sink (K2, dump2csv.py:62-103): date-partitioned, header-bearing,
  * row-capped CSV; alphabetically sorted field order (dump2csv.py:57-58);
  * schema-drift groups quarantined to a `.tmp` area instead of the main dump
  * (dump2csv.py:78-87 — upload glob only picks `*.csv`, so `.tmp` files
  * never leave the machine).
  *
  * Source (S8 + F8, loadcsv.py:83-94): header CSV back to rows, table name
  * recovered from the `db.table[.ts].csv` filename.
  *
  * Spark shape: `partitionBy(dt, table)` directories replace filename
  * conventions (a 1000-executor writer cannot share one file); row caps map
  * to `maxRecordsPerFile`; drift grouping is a fingerprint aggregation, not
  * a per-row dict-keys scan.
  */
object Csv {

  /** Alphabetical payload projection (header order parity). */
  private def sortedCols(df: DataFrame): Seq[Column] =
    df.columns.sorted.toSeq.map(col)

  /** K2: write `outDir/dt=YYYYMMDD/table=.../part*.csv` with header, at
    * most `maxRows` rows per file. `dtCol` is the dump-date column.
    */
  def dumpCsv(df: DataFrame, outDir: String, maxRows: Long): Unit =
    df.select(sortedCols(df): _*)
      .write
      .partitionBy("dt", "table")
      .option("header", "true")
      .option("maxRecordsPerFile", maxRows)
      .mode("overwrite")
      .csv(outDir)

  /** K2 drift quarantine: tables whose rows disagree on the present-field
    * fingerprint go entirely to `<outDir>.tmp` (suspected ALTER TABLE,
    * dump2csv.py:78-87); clean tables go to `outDir`.
    */
  def dumpCsvWithQuarantine(
      df: DataFrame,
      fingerprint: Column,
      outDir: String,
      maxRows: Long): Unit = {
    val fp = df.withColumn("__fp", fingerprint)
    val drifted = fp.groupBy("table")
      .agg(countDistinct(col("__fp")).as("nfp"))
      .filter(col("nfp") > 1)
      .select(col("table"))
    val flagged = fp.join(broadcast(drifted)
        .withColumn("__drift", lit(true)), Seq("table"), "left")
    val clean = flagged.filter(col("__drift").isNull)
      .drop("__fp", "__drift")
    val quarantine = flagged.filter(col("__drift") === true)
      .drop("__fp", "__drift")
    dumpCsv(clean, outDir, maxRows)
    if (!quarantine.isEmpty) dumpCsv(quarantine, outDir + ".tmp", maxRows)
  }

  /** A7 constructive half (beyond-reference — the reference TODOs ALTER
    * TABLE, README.md:55-58): like [[dumpCsvWithQuarantine]], but a table
    * whose distinct fingerprints form a CHAIN under field-set inclusion
    * (purely additive drift — a column added with no default) dumps CLEAN
    * in the wide schema, missing cells empty; only non-chain drift (type
    * conflicts, renames/removals) quarantines.
    *
    * The per-table fingerprint sets are collected driver-side: their
    * cardinality is (tables × live schema versions) — catalog-bounded,
    * never data-bounded — so the collect is a few rows at any corpus size.
    */
  def dumpCsvEvolved(
      df: DataFrame,
      fingerprint: Column,
      outDir: String,
      maxRows: Long): Unit = {
    val fp = df.withColumn("__fp", fingerprint)
    val perTable = fp.select("table", "__fp").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (t, fps) => t -> fps.map(_._2).toSeq }
    val conflicted = perTable.collect {
      case (t, fps) if fps.size > 1 && !graft.Evolve.isAdditiveChain(fps) => t
    }.toSeq
    val clean = fp.filter(!col("table").isin(conflicted: _*)).drop("__fp")
    dumpCsv(clean, outDir, maxRows)
    if (conflicted.nonEmpty)
      dumpCsv(fp.filter(col("table").isin(conflicted: _*)).drop("__fp"),
        outDir + ".tmp", maxRows)
  }

  /** F8: `/a/b/db.table.1465372800.csv` → `db.table` (loadcsv.py:83-89). */
  def tableFromFileName(fileCol: Column): Column =
    concat_ws(".",
      slice(split(regexp_extract(fileCol, "[^/]+$", 0), "\\."), 1, 2))

  /** F9: `gs://bucket/system/sid/date/db.table.ts.csv` →
    * (system, sid, dt, table) columns (dump2csv.py:236-238).
    */
  def parseGsUrl(urlCol: Column): Column = {
    val parts = split(regexp_replace(urlCol, "^gs://", ""), "/")
    val file = element_at(parts, -1)
    struct(
      element_at(parts, 2).as("system"),
      element_at(parts, 3).as("sid"),
      element_at(parts, 4).as("dt"),
      concat_ws(".", slice(split(file, "\\."), 1, 2)).as("table"))
  }

  /** S8: read a header CSV dump back; if the frame has no `table` column
    * (plain-file layout), recover it from the filename.
    */
  def loadCsv(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", "true").csv(path)
    if (df.columns.contains("table")) df
    else df.withColumn("table", tableFromFileName(input_file_name()))
  }

  /** Quarantine-to-recovery replay — the loop the reference leaves open.
    * dump2csv.py:78-87 quarantines a drift-suspected group to `.tmp` and
    * stops (the ALTER TABLE case is an explicit TODO, README.md:55-58);
    * loadcsv.py:42-71 replays only clean CSVs. This operator closes the
    * gap: the quarantined dump re-enters the pipeline through an
    * OPERATOR-SUPPLIED column mapping — the one decision no tool can
    * infer from the bytes (was the fork a rename, a retype, or two
    * different tables?) — typed against the merge core's target schema.
    *
    * Contract, enforced loudly (silent column loss is exactly the
    * failure quarantine exists to prevent):
    *  - every quarantined column must be accounted for: renamed by
    *    `mapping` (old-name → target-name), name-matched to `target`, or
    *    listed in `dropped`;
    *  - every `mapping` value must name a `target` column;
    *  - a target column fed by BOTH a name-match and mapped old names
    *    (the rename fork: v1 rows populate `value`, v2 rows `val2`)
    *    coalesces across them — per row at most one side is non-null,
    *    since the fingerprint fork that caused the quarantine means each
    *    row carried exactly one schema version;
    *  - target columns nothing feeds are typed NULLs (the additive
    *    case); all values cast to the target types (CSV carries
    *    strings).
    *
    * The result is a changelog frame ready for `Merge.compact` /
    * `CdcStream.foldBatch` — `SchemaEvolutionSpec` pins quarantine →
    * mapped replay → merged state ≡ a clean (never-drifted) run's.
    * Scale shape: one CSV scan + a per-row projection; the accounting
    * runs on column NAMES (catalog-bounded), never data.
    */
  def replayQuarantine(spark: SparkSession, quarantineDir: String,
      target: org.apache.spark.sql.types.StructType,
      mapping: Map[String, String] = Map.empty,
      dropped: Set[String] = Set.empty): DataFrame = {
    val raw = loadCsv(spark, quarantineDir)
    val targetNames = target.fields.map(_.name).toSet
    val badMap = mapping.collect {
      case (s, t) if !targetNames.contains(t) => s"$s->$t"
    }
    require(badMap.isEmpty,
      s"replayQuarantine: mapping targets ${badMap.mkString(", ")} are " +
        "not columns of the target schema")
    val unaccounted = raw.columns.filterNot(c =>
      mapping.contains(c) || targetNames.contains(c) || dropped.contains(c))
    require(unaccounted.isEmpty,
      s"replayQuarantine: quarantined columns ${unaccounted.mkString(", ")}" +
        " are neither mapped, target-named, nor explicitly dropped — " +
        "resolve the drift, don't lose it")
    val out = target.fields.toSeq.map { f =>
      val sources =
        (if (raw.columns.contains(f.name) && !dropped.contains(f.name) &&
          !mapping.contains(f.name)) Seq(f.name) else Nil) ++
          mapping.collect { case (s, t) if t == f.name => s }
      val v =
        if (sources.isEmpty) lit(null)
        else coalesce(sources.map(col): _*)
      v.cast(f.dataType).as(f.name)
    }
    raw.select(out: _*)
  }
}
