package graft

import graft.operators.ZOrder
import graft.sources.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout contracts: the z-value machinery (quantile buckets,
  * bit interleaving), content-neutrality of a z-published generation,
  * no persisted layout column, and the MEASURED point: a selective
  * filter on the second clustering column reads far fewer bytes from a
  * z-ordered layout than from a first-column-sorted one.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("bucket folds a value to its boundary rank; interleave places " +
      "bit i of column j at position i*n + j") {
    val df = Seq((0.5, 0L), (1.5, 0L), (2.5, 0L)).toDF("v", "z")
    val out = df.select(
      ZOrder.bucket(col("v"), Seq(1.0, 2.0)).as("b")).as[Long].collect()
    assert(out.toSeq === Seq(0L, 1L, 2L))
    // columns (b0=0b11, b1=0b01) at 2 bits: z = b0 bits at 0,2; b1 at 1,3
    val z = df.limit(1).select(ZOrder.interleave(
      Seq(lit(3L), lit(1L)), 2).as("z")).as[Long].head()
    assert(z === (1L | (1L << 1) | (1L << 2)))
  }

  test("date columns bucket through the timestamp cast (date->double " +
      "is not a legal Spark cast) and order by calendar position") {
    val df = spark.range(300).select(
      col("id"),
      date_add(lit(java.sql.Date.valueOf("2026-01-01")),
        (col("id") % 300).cast("int")).as("d"),
      (col("id") % 7L).as("x"))
    val z = ZOrder.withZ(df, Seq("d", "x"), bits = 4)
    // the z-value exists, is non-constant, and the date dimension's
    // bucket grows with the calendar (spot-check the extremes)
    val zs = z.select(col("d"), col("_graft_z")).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(zs.values.toSet.size > 1)
    val early = zs("2026-01-01")
    val late = zs(df.agg(max("d")).head().getDate(0).toString)
    // mask out x's interleaved bits (x bits sit at odd positions)
    def dBits(v: Long) = (0 until 4).map(i => (v >> (2 * i)) & 1L)
      .zipWithIndex.map { case (b, i) => b << i }.sum
    assert(dBits(early) < dBits(late), s"$early vs $late")
  }

  test("a z-published generation is content-identical, carries no " +
      "layout column, and skips row groups on the second dimension") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    try {
      // two independent-ish uniform dimensions; 200k rows, small files
      // (maxRecordsPerFile) so each row group's min/max is selective
      val n = 200000
      val d = spark.range(n.toLong).select(
        lit("all").as("k"),
        col("id"),
        // low digits vs high digits: genuinely independent dimensions
        // ((id*prime) % m is a BIJECTION of id % m — sorted by one, the
        // other's row-group stats would be selective too, hiding the
        // point of the test)
        (col("id") % 1000L).as("x"),
        ((col("id") / 1000L).cast("long") % 1000L).as("y"),
        // high-entropy payload: padded constants compress to nothing and
        // hide the skipping in footer noise — hashes measure real mass
        concat(md5(col("id").cast("string")),
          md5((col("id") * 31L + 7L).cast("string")),
          md5((col("id") * 17L + 3L).cast("string")),
          md5((col("id") * 13L + 1L).cast("string"))).as("text"))
      Lake.publishVersion(d, s"$work/plain", Seq("k"), Seq("x"), 8192L)
      Lake.publishVersion(d, s"$work/zed", Seq("k"), Nil, 8192L,
        zOrderCols = Seq("x", "y"))

      val plain = Lake.readVersion(spark, s"$work/plain")
      val zed = Lake.readVersion(spark, s"$work/zed")
      // layout changed, content didn't — and no _graft_z leaked
      assert(zed.columns.toSet === Set("k", "id", "x", "y", "text"))
      assert(zed.agg(count(lit(1)), sum("id"), sum("y")).collect().toSeq ===
        plain.agg(count(lit(1)), sum("id"), sum("y")).collect().toSeq)

      // the aggregate touches the HEAVY payload column, so bytes read
      // measure what skipping saves at scale: groups failing the
      // pushed y-filter never decode their text chunks
      def bytesFor(df: DataFrame): Long = bytesReadDuring {
        df.filter(col("y") < 10L).agg(sum(length(col("text")))).collect(): Unit
      }
      // same 1% filter on y: the x-sorted layout has y uniform in every
      // row group (reads ~everything); the z layout confines y ranges
      val bPlain = bytesFor(plain)
      val bZed = bytesFor(zed)
      info(f"y<10 filter read: x-sorted ${bPlain / 1e6}%.2f MB, " +
        f"z-ordered ${bZed / 1e6}%.2f MB (${bPlain * 1.0 / bZed}%.1fx less)")
      assert(bZed * 2 < bPlain,
        s"z-order skipped too little: $bZed vs $bPlain bytes")
      // and the filters agree, so skipping lost nothing
      assert(zed.filter(col("y") < 10L).count() ===
        plain.filter(col("y") < 10L).count())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(work))
  }

  test("compact(zOrderCols) re-clusters the touched rewrite: content " +
      "identical, no layout column persisted") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_zcompact").toString
    try {
      val n = 20000
      val d = spark.range(n.toLong).select(
        lit("all").as("k"), col("id"),
        (col("id") % 100L).as("x"),
        ((col("id") / 100L).cast("long") % 100L).as("y"))
      // fragment deliberately: tiny per-file cap forces many small files
      d.repartition(col("k")).write.mode("overwrite")
        .option("maxRecordsPerFile", 500L)
        .partitionBy("k").parquet(work + "/t")
      val before = spark.read.parquet(work + "/t")
        .agg(count(lit(1)), sum("id"), sum("y")).collect().toSeq
      val report = Lake.compact(spark, work + "/t", Seq("k"), Seq("x"),
        targetBytes = 512L * 1024, zOrderCols = Seq("x", "y"))
      assert(report.filter(col("action") === "compacted").count() === 1L)
      val out = spark.read.parquet(work + "/t")
      assert(out.columns.toSet === Set("k", "id", "x", "y"))
      assert(out.agg(count(lit(1)), sum("id"), sum("y")).collect().toSeq
        === before)
      // a re-run judges the z-compacted layout settled (idempotence)
      val again = Lake.compact(spark, work + "/t", Seq("k"), Seq("x"),
        targetBytes = 512L * 1024, zOrderCols = Seq("x", "y"))
      assert(again.filter(col("action") === "compacted").count() === 0L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(work))
  }

  test("bloom-filter columns skip row groups on point lookups over " +
      "hash-ordered ids that min/max stats cannot help with") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_bloom").toString
    try {
      // ids in HASH order: every row group spans the whole id range, so
      // min/max pruning is useless. The per-file row count is sized so
      // the doc_key dictionary OVERFLOWS its page (65536 x 32 B > the
      // 1 MB dictionary page cap): at toy chunk sizes parquet keeps the
      // column dictionary-encoded and DICTIONARY filtering already
      // answers absent keys — the bloom's regime is exactly the
      // production one, high-cardinality chunks whose dictionaries
      // cannot hold the key set
      val n = 400000
      val d = spark.range(n.toLong).select(
        lit("all").as("k"),
        md5(col("id").cast("string")).as("doc_key"),
        concat(md5((col("id") * 31L + 7L).cast("string")),
          md5((col("id") * 17L + 3L).cast("string"))).as("text"))
      Lake.publishVersion(d, s"$work/plain", Seq("k"), Nil, 65536L)
      Lake.publishVersion(d, s"$work/bloomed", Seq("k"), Nil, 65536L,
        bloomFilterCols = Seq("doc_key"))
      // positive lookups must still find their row through the bloom path
      val needle = d.filter(col("doc_key").startsWith("00"))
        .select("doc_key").head().getString(0)
      assert(Lake.readVersion(spark, s"$work/bloomed")
        .filter(col("doc_key") === needle)
        .agg(sum(length(col("text")))).head().getLong(0) === 64L)

      // bytes via /proc/self/io (local[*] executors are in-process):
      // taskMetrics.inputMetrics under-reports on the parquet
      // column-index read path — the OS-level rchar delta is exact
      def rchar(): Long = {
        val src = scala.io.Source.fromFile("/proc/self/io")
        try src.getLines().collectFirst {
          case ln if ln.startsWith("rchar") => ln.split("\\s+")(1).toLong
        }.get
        finally src.close()
      }
      // the bloom's defining win: a key that is NOT in the corpus (or
      // lives in one group of many — same skipping shape). min/max stats
      // of hash-ordered ids span the whole range in every group, so the
      // plain layout must decode id chunks everywhere; the bloom answers
      // "absent" from its bitset. Mid-range so min/max cannot prune it
      // (an extreme key like all-zeros sits below every group's min and
      // stats alone would skip)
      val absent = "8" + "0" * 31
      def bytesFor(dir: String): Long = {
        val df = Lake.readVersion(spark, dir).filter(col("doc_key") === absent)
        val b0 = rchar()
        assert(df.count() === 0L)
        rchar() - b0
      }
      val bPlain = bytesFor(s"$work/plain")
      val bBloom = bytesFor(s"$work/bloomed")
      info(f"absent-key lookup read: plain ${bPlain / 1e6}%.2f MB, " +
        f"bloomed ${bBloom / 1e6}%.2f MB (${bPlain * 1.0 / bBloom}%.1fx less)")
      assert(bBloom * 2 < bPlain,
        s"bloom skipped too little: $bBloom vs $bPlain bytes")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(work))
  }
}
