package graft

import graft.operators.TrainedCache
import org.apache.spark.sql.functions._

/** Cross-JVM trained-artifact store (r17 verdict #6): a key first built
  * in any JVM persists under the store root and later JVMs LOAD it
  * instead of retraining. `TrainedCache.clear()` wipes only the
  * in-memory layer, so build → clear → rebuild is exactly the
  * fresh-JVM-warm-store path, minus process spawn.
  */
class TrainedStoreSpec extends SparkSuite {
  import spark.implicits._

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
}
