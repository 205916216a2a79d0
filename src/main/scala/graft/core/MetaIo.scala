package graft.core

import org.apache.spark.sql.SparkSession

/** Small JSON metadata sidecars next to saved indexes (IVF centroids, PQ
  * codebooks, dedup-index parameters): driver-side reads/writes through the
  * Hadoop FS API so the same code works on local disk, HDFS, or S3 — never
  * a Spark write job (these files are a few KB of model state).
  */
object MetaIo {

  /** Overwrite in place (single create, stream closed on error). A crash
    * mid-write can leave a truncated-but-PRESENT file — which [[parse]]
    * rejects loudly — never an ABSENT one: presence is what codec routing
    * keys on (e.g. `IvfVS.isPq`), so a delete-then-rename scheme would turn
    * a crash window into silent wrong-codec routing, strictly worse than a
    * loud parse error.
    */
  def write(spark: SparkSession, path: String, json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Delete a sidecar if present (e.g. the other codec's metadata when a
    * collection is re-indexed under a different format).
    */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Parse a sidecar, failing loudly on blank/truncated content (Jackson
    * would otherwise map an empty file to a missing node, which callers
    * could misread as an empty model).
    */
  def parse(json: String): com.fasterxml.jackson.databind.JsonNode = {
    require(json != null && json.trim.nonEmpty, "MetaIo: empty metadata sidecar")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(node != null && !node.isMissingNode, "MetaIo: unparseable metadata sidecar")
    node
  }

  /** Render a float matrix as a JSON array-of-arrays (exact shortest
    * round-trip decimal per component).
    */
  def floatMatrixJson(m: Array[Array[Float]]): String =
    m.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  def floatMatrix(node: com.fasterxml.jackson.databind.JsonNode): Array[Array[Float]] =
    (0 until node.size()).map { i =>
      val row = node.path(i)
      Array.tabulate(row.size())(j => row.path(j).floatValue())
    }.toArray
}
