package graft

import graft.operators.TrainedCache
import org.apache.spark.sql.functions._

/** Cross-JVM trained-artifact store — OPT-IN (off by default so every
  * bench/oracle run computes from the parquet inputs): a key first built
  * in any JVM persists under the store root and later JVMs LOAD it
  * instead of retraining. `TrainedCache.clear()` wipes only the
  * in-memory layer, so build → clear → rebuild is exactly the
  * fresh-JVM-warm-store path, minus process spawn. The suite enables the
  * store through the `graft.trained.store` system-property seam into its
  * own scratch root and restores the property (normally absent ⇒ store
  * off) when done.
  */
class TrainedStoreSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val storeScratch =
    java.nio.file.Files.createTempDirectory("graft_store_spec").toString
  private var priorProp: Option[String] = None

  // set in beforeAll, not the constructor: a suite instantiated but
  // filtered/aborted before running would otherwise leave the global
  // property mutated with afterAll never pairing it (r18 advice)
  override def beforeAll(): Unit = {
    super.beforeAll()
    priorProp = sys.props.get("graft.trained.store")
    sys.props("graft.trained.store") = storeScratch
  }

  override def afterAll(): Unit = {
    priorProp match {
      case Some(v) => sys.props("graft.trained.store") = v
      case None => sys.props -= "graft.trained.store"
    }
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(storeScratch)): Unit
    super.afterAll()
  }

  test("memoDf round-trips through the disk store bit-exactly: second " +
      "'JVM' loads instead of rebuilding, values and schema identical") {
    val key = spark.sparkContext.applicationId +
      s"|store-spec|${System.nanoTime()}"
    var builds = 0
    def artifact() = TrainedCache.memoDf(spark, key, name = "store_spec") {
      builds += 1
      Seq((0, Array(1.5, -2.5), "a"), (1, Array(0.0, 3.25), "b"))
        .toDF("cid", "cv", "tag")
    }
    val first = artifact().collect()
    assert(builds === 1)
    assert(TrainedCache.buildTimes.contains("store_spec"))
    // simulate the next JVM: in-memory gone, disk store intact
    TrainedCache.clear()
    val second = artifact().collect()
    assert(builds === 1, "second call retrained instead of loading")
    assert(TrainedCache.reuseTimes.contains("store_spec"),
      "load was not attributed to reuseTimes (Bench's prebuilt)")
    assert(second.map(_.toString).toSeq === first.map(_.toString).toSeq)
    assert(artifact().schema === first.headOption.map(_.schema).getOrElse(
      artifact().schema))
  }

  test("sharedPath publishes atomically to the store and a fresh " +
      "'JVM' is handed the SAME path with the payload intact") {
    val fixture = java.nio.file.Files
      .createTempFile("graft_store_fix", ".txt")
    java.nio.file.Files.writeString(fixture, "corpus bytes")
    var builds = 0
    def path() = TrainedCache.sharedPath(spark,
      "store_spec_path", Seq(fixture.toString)) { tmp =>
      builds += 1
      val p = s"$tmp/payload"
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
        .write.mode("overwrite").parquet(p)
      p
    }
    val p1 = path()
    assert(builds === 1)
    TrainedCache.clear()
    val p2 = path()
    assert(builds === 1, "second call rebuilt instead of reusing")
    assert(p1 === p2, s"store handed different paths: $p1 vs $p2")
    assert(spark.read.parquet(p2).count() === 2L)
    // a TOUCHED fixture (new mtime) re-keys: the stale artifact can
    // never serve a regenerated corpus
    java.nio.file.Files.writeString(fixture, "corpus bytes!")
    TrainedCache.clear()
    val p3 = path()
    assert(builds === 2, "regenerated fixture served a stale artifact")
    assert(p3 !== p1)
    java.nio.file.Files.deleteIfExists(fixture): Unit
  }

  test("a throwing builder leaves no dot-temp slot behind (r18 review-3 " +
      "#5): a repeating failure must not grow the store unboundedly, " +
      "and a later successful build still publishes") {
    val fixture = java.nio.file.Files
      .createTempFile("graft_store_leak", ".txt")
    java.nio.file.Files.writeString(fixture, "leak corpus")
    def dotTemps(): Seq[String] = {
      val root = new java.io.File(storeScratch)
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("."))
        .map(_.getName).toSeq
    }
    val before = dotTemps()
    val boom = intercept[RuntimeException] {
      TrainedCache.sharedPath(spark,
        "store_spec_leak", Seq(fixture.toString)) { _ =>
        throw new RuntimeException("builder died mid-train")
      }
    }
    assert(boom.getMessage.contains("builder died"))
    assert(dotTemps() === before,
      "a failed build left its dot-temp slot in the store")
    // the key is poisoned only in-memory; a fresh 'JVM' retries clean
    TrainedCache.clear()
    val ok = TrainedCache.sharedPath(spark,
      "store_spec_leak", Seq(fixture.toString)) { tmp =>
      val p = s"$tmp/payload"
      Seq((1L, "z")).toDF("id", "v").write.parquet(p)
      p
    }
    assert(spark.read.parquet(ok).count() === 1L)
    assert(dotTemps() === before)
    java.nio.file.Files.deleteIfExists(fixture): Unit
  }
}
