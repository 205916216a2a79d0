package graft.core

import org.apache.spark.sql.SparkSession

/** Small JSON metadata sidecars next to saved indexes (IVF centroids, PQ
  * codebooks, dedup-index parameters): driver-side reads/writes through the
  * Hadoop FS API so the same code works on local disk, HDFS, or S3 — never
  * a Spark write job (these files are a few KB of model state).
  */
object MetaIo {

  def write(spark: SparkSession, path: String, json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(json.getBytes("UTF-8"))
    out.close()
  }

  def read(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = new String(in.readAllBytes(), "UTF-8")
    in.close()
    json
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
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
