package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — local fast iteration
    // only; the driver always invokes with exactly (sfDir, outDir)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // materialization mode A/B (local | reliable | none) — the driver
      // never sets it, so the gate always measures the default
      .config(Materialize.ModeKey,
        sys.env.getOrElse("SPARK_GRAFT_MATERIALIZE", "local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic gate surface: the SQL functions AND the rank-limit →
    // top-k optimizer rule are on for EVERY query, not just those that
    // happen to run after a query that registers them lazily
    graft.functions.GraftExtensions.register(spark)
    // Fixture tripwire FIRST (round 7: a silent fixture regeneration cost 20
    // queries): any schema drift is named loudly in the gate log. Non-fatal —
    // the type-robust readers may still go green, and a gate run should
    // produce per-query evidence rather than die at the door.
    Fixtures.drift(spark, sfDir) match {
      case Seq() => ()
      case d =>
        System.err.println("[verify] FIXTURE DRIFT vs FIXTURES.md contract:")
        d.foreach(m => System.err.println(s"[verify]   $m"))
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free this query's storage residue before the next one runs
      Materialize.release(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // A subset run must not clobber oracle_sql.json: a full compare against
    // an outDir holding parquet from a prior full run plus a truncated
    // oracle map would silently skip queries. Subsets go to a side file.
    val oracleFile =
      if (only.isDefined) "oracle_sql.partial.json" else "oracle_sql.json"
    Files.writeString(Paths.get(s"$outDir/$oracleFile"), json)
    // A FULL run supersedes any stale partial dump: check.py picks the
    // newest of the two files, so a leftover partial from an earlier
    // filtered run must not be able to shadow this full oracle set on a
    // later re-check with a fresher mtime.
    if (only.isEmpty)
      Files.deleteIfExists(Paths.get(s"$outDir/oracle_sql.partial.json"))
    spark.stop()
  }
}
