package graft

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A local filesystem masquerading as an object store (`mockfs:` scheme,
  * listed in BatchCommit's object-store set): any rename OUTSIDE a Spark
  * task committer's `_temporary` staging throws — on a real object store
  * that rename is a non-atomic byte copy, and the manifest-commit contract
  * is that BatchCommit never needs one. Committer-internal renames are
  * allowed (in production those are solved by the store's own committers,
  * e.g. the S3A magic committer) and every call is recorded for the spec
  * to audit.
  */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
  /** RawLocalFileSystem's lazy permission loader does `new File(uri)`,
    * which rejects any scheme but `file:` — return eager statuses with a
    * fixed permission instead (object stores have no POSIX permissions
    * anyway).
    */
  private def eager(st: FileStatus): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime, st.getAccessTime,
    FsPermission.createImmutable(Integer.parseInt("777", 8).toShort),
    "mock", "mock", st.getPath)

  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)

  override def rename(src: Path, dst: Path): Boolean = {
    MockObjectStoreFs.record(src.toString, dst.toString)
    if (!src.toString.contains("_temporary"))
      throw new UnsupportedOperationException(
        s"mockfs: rename is a byte copy on an object store — forbidden outside " +
          s"a task committer ($src -> $dst)")
    super.rename(src, dst)
  }
}

object MockObjectStoreFs {
  private val renameLog = scala.collection.mutable.ListBuffer[(String, String)]()
  def record(src: String, dst: String): Unit =
    renameLog.synchronized { renameLog += ((src, dst)) }
  def renames: Seq[(String, String)] = renameLog.synchronized { renameLog.toList }
  def clearLog(): Unit = renameLog.synchronized { renameLog.clear() }
}
