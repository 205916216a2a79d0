package graft

import org.apache.spark.sql.functions._
import graft.core.BatchCommit

/** The object-store deployment story of the exactly-once append protocol:
  * on a rename-less FS (mockfs — renames outside a task committer THROW),
  * appendExactlyOnce must commit via the manifest path — batch dirs are
  * written once to their permanent home, the done mark is the commit point,
  * and readers resolve live + committed batch dirs through
  * BatchCommit.readData. Local rename adoption is pinned unchanged by
  * BatchCommitSpec; this spec pins the scheme switch.
  */
class ManifestCommitSpec extends SparkSpec {
  import spark.implicits._

  private def mockRoot(prefix: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.mockfs.impl", classOf[MockObjectStoreFs].getName)
    "mockfs:" + java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"
  }

  private def docs(ids: Long*) = ids.map(i => (i, s"doc $i")).toDF("id", "text")

  private def readIds(root: String): Seq[Long] =
    BatchCommit.readData(spark, root, "docs").select("id")
      .as[Long].collect().sorted.toSeq

  test("scheme routing: object stores and mockfs are rename-less, local/HDFS are not") {
    for (s <- Seq("s3", "s3a", "gs", "abfs", "abfss", "wasb", "oss", "mockfs"))
      assert(!BatchCommit.renameCapable(s), s)
    for (s <- Seq("file", "hdfs", "viewfs", null))
      assert(BatchCommit.renameCapable(s), String.valueOf(s))
  }

  test("manifest commit: append on mockfs moves no data file and readData unions it") {
    val root = mockRoot("graft_manifest")
    docs(1L, 2L).write.parquet(s"$root/docs")
    MockObjectStoreFs.clearLog()
    val did = BatchCommit.appendExactlyOnce(spark, root, "docs", "t1",
      sidecarState = Map("k" -> 1.0),
      writeStaged = staging => docs(3L, 4L).write.mode("overwrite").parquet(staging),
      updateSidecar = _ => ())
    assert(did)
    assert(readIds(root) == Seq(1L, 2L, 3L, 4L))
    // The batch landed in its permanent home; no staging dir, no adoption.
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "docs_batches/t1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "staging_t1")))
    // Audit manifest lists the batch's parquet files.
    val manifest = graft.core.MetaIo.read(spark, s"$root/manifest_t1.json")
    assert(manifest.contains("\"docs_batches/t1\"") && manifest.contains(".parquet"), manifest)
    // Every recorded rename was Spark's own task committer; none from
    // BatchCommit (staging adoption or mark tmp-swap would have THROWN).
    val nonCommitter = MockObjectStoreFs.renames.filterNot(_._1.contains("_temporary"))
    assert(nonCommitter.isEmpty, nonCommitter.toString)
    // Exactly-once: the same token replays as a no-op.
    assert(!BatchCommit.appendExactlyOnce(spark, root, "docs", "t1",
      sidecarState = Map.empty,
      writeStaged = _ => fail("committed batch must not rewrite"),
      updateSidecar = _ => ()))
    assert(readIds(root) == Seq(1L, 2L, 3L, 4L))
  }

  test("manifest commit: begin-crash window recovers by re-running the same batch") {
    val root = mockRoot("graft_manifest_crash")
    docs(1L).write.parquet(s"$root/docs")
    // Crash mid-writeStaged: begin mark down, batch dir partially written.
    intercept[RuntimeException] {
      BatchCommit.appendExactlyOnce(spark, root, "docs", "t2",
        sidecarState = Map.empty,
        writeStaged = staging => {
          docs(9L).write.mode("overwrite").parquet(staging) // partial adoption
          throw new RuntimeException("crash mid-append")
        },
        updateSidecar = _ => ())
    }
    // Readers refuse the dangling begin; dataPaths excludes its dir.
    intercept[IllegalStateException] {
      BatchCommit.requireClean(spark, root, "dedup index")
    }
    assert(BatchCommit.dataPaths(spark, root, "docs")
      .forall(!_.contains("docs_batches/t2")), "uncommitted batch dir must be invisible")
    assert(readIds(root) == Seq(1L))
    // Same-batch replay converges exactly-once (partial dir deleted, redone).
    assert(BatchCommit.appendExactlyOnce(spark, root, "docs", "t2",
      sidecarState = Map.empty,
      writeStaged = staging => docs(2L, 3L).write.mode("overwrite").parquet(staging),
      updateSidecar = _ => ()))
    assert(readIds(root) == Seq(1L, 2L, 3L))
    // A different batch over the dangling begin would have refused — pinned
    // by BatchCommitSpec on the local path; the mark logic is shared.
  }

  test("clearMark wipes manifest batch dirs so a rebuild cannot resurrect stale data") {
    val root = mockRoot("graft_manifest_clear")
    docs(1L).write.parquet(s"$root/docs")
    BatchCommit.appendExactlyOnce(spark, root, "docs", "t3",
      sidecarState = Map.empty,
      writeStaged = staging => docs(2L).write.mode("overwrite").parquet(staging),
      updateSidecar = _ => ())
    assert(readIds(root) == Seq(1L, 2L))
    // Rebuild: overwrite live, clear marks — batch dirs and manifests go too.
    docs(7L).write.mode("overwrite").parquet(s"$root/docs")
    BatchCommit.clearMark(spark, root)
    assert(readIds(root) == Seq(7L), "stale batch dirs must not re-union")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "docs_batches")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "manifest_t3.json")))
  }
}
