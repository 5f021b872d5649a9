package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Runtime proofs of the plan properties PLANS.md documents: predicate
  * pushdown and column pruning reach the parquet scan, dimension joins
  * broadcast, and custom codegen expressions stay inside whole-stage
  * codegen. These are the properties that decide 100 TB behavior — a scan
  * that reads every column, or a filter evaluated above the scan, is a
  * plan regression this spec catches.
  */
class PlanAuditSpec extends SparkSuite {

  test("filters are pushed down to the parquet scan") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_orderkey") === 1L && col("l_quantity") > 10.0)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(1500))
    assert(plan.contains("EqualTo(l_orderkey,1)"), plan.take(1500))
    assert(plan.contains("GreaterThan(l_quantity,10.0)"), plan.take(1500))
  }

  test("column pruning: a 2-column projection reads a 2-column schema") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"), scan.take(1500))
    assert(readSchema.contains("l_quantity"), scan.take(1500))
    // none of the other 14 lineitem columns may appear in the read schema
    assert(!readSchema.contains("l_extendedprice"), readSchema)
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  test("dimension join broadcasts — no shuffle of the fact side") {
    val plan = SparkEntry.queries("q2_join_broadcast")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("codegen'd cosine runs inside a whole-stage codegen span") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val v = col("embedding").cast("array<double>")
    // a pure projection — no join/AQE wrapping, so the codegen markers are
    // visible directly: the custom expression must NOT force the stage out
    // of whole-stage codegen
    val df = e.select(Similarity.cosine(v, v).as("self_sim"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a whole-stage-codegen stage;
    // an interpreted fallback would print a bare "Project"
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*(")), plan.take(3000))
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("bm25 query-term top-k is a bounded TakeOrdered, joined broadcast") {
    val plan = SparkEntry.queries("text_bm25")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the top-3 query-term selection must plan as TakeOrderedAndProject
    // (bounded per-partition heaps), never a global Sort + Limit over the
    // vocabulary table
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    // the 3-term query side joins the postings broadcast — the corpus-
    // sized tf histogram must not shuffle for a 3-row join side
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the per-term top-10 window must carry the group-limit optimization
    // (bounded heaps before the final sort), not rank-everything
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("domain cap is sort-free: bounded-heap top-k, no window over source") {
    val df = SparkEntry.queries("text_domain_cap")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the kept-set witness must come from the bounded-heap TopKPerKey
    // operator (map-side partial pass before the exchange), never from a
    // row_number window — a window sorts each source's ENTIRE doc set in
    // one reducer partition, which AQE cannot split for a hot source
    assert(plan.contains("TopKPerKeyPartial"), plan.take(3000))
    assert(!plan.contains("Window"), s"window rank crept back in:\n${plan.take(3000)}")
    assert(!plan.contains("Sort "), s"full-partition sort crept back in:\n${plan.take(3000)}")
    // counts branch + top-k branch: one source-keyed exchange each; the
    // final join of two per-source aggregates must not add a third
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n${plan.take(3000)}")
  }

  test("train_shards is one exchange, no window, no sort") {
    val plan = SparkEntry.queries("train_shards")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // shard assignment is a pure per-row expression; accounting is one
    // partial/final hash aggregate. The order key must stay numeric: a
    // string min/min_by buffer silently demotes the whole aggregate to
    // SortAggregate (per-partition sort by shard) — this pin caught
    // exactly that on the first draft
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 exchange, plan:\n${plan.take(3000)}")
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("SortAggregate"), s"string-buffer fallback:\n${plan.take(3000)}")
    assert(!plan.contains("Sort "), plan.take(3000))
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }

  test("sim_hybrid_rrf rank windows carry group limits") {
    val plan = SparkEntry.queries("sim_hybrid_rrf")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the sparse top-20, dense top-20, and fused top-10 all RETURN their
    // rank (so WindowToTopK correctly leaves the windows in place), but
    // each rank<=k filter must still plan map-side WindowGroupLimits —
    // without them a hot query's candidate set is fully sorted in one
    // reducer before the limit applies
    val limits = plan.linesIterator.count(_.contains("WindowGroupLimit"))
    assert(limits >= 2, s"expected >=2 WindowGroupLimit, got $limits:\n${plan.take(3000)}")
    // no unbroadcast cartesian anywhere (the 1-row scal crossJoin must
    // plan as a broadcast nested loop, never CartesianProduct)
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("PCA moment pass: one partial/final hash-aggregate pair, " +
    "plan size independent of dims") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def planOf(dims: Int) = graft.operators.SimilarityQueries
      .momentSums(e, dims).queryExecution.executedPlan.toString
    val p8 = planOf(8)
    // map-side partial aggregation before the exchange — the property
    // that makes the pass one bounded shuffle of d²-ish longs per
    // partition at 100 TB
    assert(p8.contains("HashAggregate"), p8.take(2000))
    assert(p8.linesIterator.count(_.contains("HashAggregate")) >= 2,
      p8.take(2000))
    assert(p8.linesIterator.count(_.contains("Exchange")) === 1,
      p8.take(2000))
    // the round-9 point: the plan TEXT is the same size at 128 dims as
    // at 8 — the d² blowup lives inside three HOF expressions per row,
    // not in d² aggregate columns (which stopped compiling ~a few
    // hundred dims)
    val p128 = planOf(128)
    assert(math.abs(p128.length - p8.length) < 200,
      s"plan grows with dims: ${p8.length} -> ${p128.length}")
  }

  test("additive evolution is plan surgery: the evolved compact keeps " +
    "cdc_compact's single exchange") {
    val plan = SparkEntry.queries("cdc_schema_evolve")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // additiveUnion is unionByName — missing columns become null literals
    // inside the projection, so the widened compact must still be ONE
    // (table, rid) hash-aggregate shuffle, no sort, no extra data motion
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 exchange, plan:\n${plan.take(3000)}")
    assert(plan.contains("Union"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("gate battery executes with zero codegen fallbacks (compile-or-die)") {
    // Plan-text "*(n)" markers cannot catch a RUNTIME fallback: a stage
    // that fails Janino compilation still PRINTS as codegen'd and then
    // silently executes interpreted behind a WARN (round 9 shipped exactly
    // that on TopKPerKeyPartial). These two configs turn both fallback
    // layers into thrown errors: `codegen.fallback=false` for whole-stage
    // compilation, `factoryMode=CODEGEN_ONLY` for generated projections /
    // orderings / predicates. Every gate query must execute clean.
    val fallbackWas = spark.conf.get("spark.sql.codegen.fallback")
    val factoryWas = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        try q(spark, sf0001).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            fail(s"query $name fell back or failed under compile-or-die codegen: $e")
        }
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", fallbackWas)
      spark.conf.set("spark.sql.codegen.factoryMode", factoryWas)
    }
  }

  test("versioned-lake read keeps partition pruning and sort-key " +
      "pushdown inside the generation") {
    val tmp = java.nio.file.Files.createTempDirectory("plan_lakev").toString
    try {
      import spark.implicits._
      val df = (0 until 200)
        .map(j => (j.toLong, s"g${j % 4}", s"doc $j")).toDF("id", "k", "text")
      graft.sources.Lake.publishVersion(df, s"$tmp/lake", Seq("k"),
        Seq("id"), 1000L)
      val rd = graft.sources.Lake.readVersion(spark, s"$tmp/lake")
        .filter(col("k") === "g1" && col("id") > 150L)
        .select("id", "text")
      val plan = rd.queryExecution.executedPlan.toString
      // the generation dir is a plain writeCurated layout, so the lake's
      // scan quality survives versioning: the partition predicate prunes
      // dirs at planning and the sort-key predicate reaches the parquet
      // footer (rowgroup min/max on the in-file ordering)
      assert(plan.contains("PartitionFilters"), plan.take(1500))
      assert(plan.contains("PushedFilters"), plan.take(1500))
      assert(rd.count() === (151 until 200).count(_ % 4 == 1))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  test("change feed scans read only (id, content) — wide payload columns " +
      "never leave the parquet footer") {
    val tmp = java.nio.file.Files.createTempDirectory("plan_cdf").toString
    try {
      import spark.implicits._
      // a wide row: the feed must not drag `extra`/`blob` through its
      // hash-join even though the generations store them
      val df = (0 until 200).map(j =>
        (s"d-$j", s"g${j % 3}", s"doc $j", j.toLong, s"blob $j"))
        .toDF("id", "k", "text", "extra", "blob")
      graft.sources.Lake.publishVersion(df, s"$tmp/lake", Seq("k"),
        Seq("id"), 1000L)
      graft.sources.Lake.publishDelta(
        df.filter(col("k") === "g0")
          .withColumn("text", concat(col("text"), lit("!"))),
        s"$tmp/lake", Seq("k"), Seq("id"), 1000L)
      val feed = graft.sources.Lake.changesBetween(spark, s"$tmp/lake",
        0L, 1L, "id", "text")
      val plan = feed.queryExecution.executedPlan.toString
      val schemas = plan.linesIterator
        .filter(_.contains("ReadSchema")).toSeq
      assert(schemas.nonEmpty, plan.take(1500))
      for (s <- schemas) {
        assert(s.contains("id") && s.contains("text"), s)
        assert(!s.contains("extra") && !s.contains("blob"), s)
      }
      // md5 reduces map-side: the hash appears below the join (in a
      // Project on the scan side), not above it
      assert(plan.contains("md5"), plan.take(2000))
      assert(feed.count() === df.filter(col("k") === "g0").count())
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  test("state partitioned by table prunes to one partition on filter") {
    val tmp = java.nio.file.Files.createTempDirectory("plan_state").toString
    try {
      val ch = CdcBatch.changeLog(spark, sf0001)
        .withColumn("table", lit("db_test.events"))
      ch.union(ch.withColumn("table", lit("db_test.other")))
        .write.mode("overwrite").partitionBy("table").parquet(tmp)
      val df = spark.read.parquet(tmp)
        .filter(col("table") === "db_test.events")
      val plan = df.queryExecution.executedPlan.toString
      // partition filter is applied at planning: the scan reports the
      // pruned partition predicate, not a post-scan Filter on `table`
      assert(plan.contains("PartitionFilters"), plan.take(1500))
      assert(df.count() === ch.count())
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }
}
