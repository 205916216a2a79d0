package graft.core

import org.apache.spark.sql.SparkSession

/** Small JSON metadata sidecars next to saved indexes (IVF centroids, PQ
  * codebooks, dedup-index parameters): driver-side reads/writes through the
  * Hadoop FS API so the same code works on local disk, HDFS, or S3 — never
  * a Spark write job (these files are a few KB of model state).
  */
object MetaIo {

  /** Write-to-temp + rename so a failed write can never leave a truncated
    * sidecar behind (a half-written JSON would otherwise parse to an empty
    * model instead of erroring).
    */
  def write(spark: SparkSession, path: String, json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"MetaIo: rename $tmp -> $p failed")
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

  def parse(json: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)

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
