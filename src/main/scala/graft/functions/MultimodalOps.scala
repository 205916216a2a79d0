package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition in bounded
  * batches (the Spark-side shape a real decoder needs: schema, batch size,
  * partition-local library init). The decode itself is STUBBED with a
  * deterministic function of the bytes — image/audio libraries are not
  * available in this environment; swap `decodeOne` for a real codec call.
  */
object MultimodalOps {

  /** Column-metadata tag marking an image column — the Spark analogue of the
    * reference's ImageDtype (lotus/dtype_extensions/image.py:12-34). Semantic
    * operators exclude tagged columns from text serialization and ship them
    * as chat image parts instead.
    */
  val DtypeKey = "graft_dtype"

  def tagImage(df: DataFrame, c: String): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(df.schema(c).metadata).putString(DtypeKey, "image").build()
    df.withColumn(c, org.apache.spark.sql.functions.col(c).as(c, meta))
  }

  def isImageCol(schema: StructType, c: String): Boolean = {
    val f = schema(c)
    f.metadata.contains(DtypeKey) && f.metadata.getString(DtypeKey) == "image"
  }

  /** Resolve an image reference into a chat-API url (reference fetch_image
    * with "base64" output, lotus/utils.py:75-120): pass-through for http(s)
    * and data: URIs, base64 → data URI, file:// / hadoop-fs paths fetched on
    * the executor and inlined as data URIs.
    */
  def toImageUrl(ref: String, hadoopConf: org.apache.hadoop.conf.Configuration): String = {
    def dataUri(b64: String) = s"data:image/png;base64,$b64"
    if (ref == null || ref.isEmpty) dataUri("")
    else if (ref.startsWith("data:") || ref.startsWith("http://") || ref.startsWith("https://")) ref
    else if (ref.startsWith("base64:")) dataUri(ref.stripPrefix("base64:"))
    else if (ref.startsWith("file://"))
      dataUri(java.util.Base64.getEncoder.encodeToString(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(new java.net.URI(ref)))))
    else if (ref.contains("://") && hadoopConf != null) {
      val path = new org.apache.hadoop.fs.Path(ref)
      val fs = path.getFileSystem(hadoopConf)
      val in = fs.open(path)
      val bytes = try in.readAllBytes() finally in.close()
      dataUri(java.util.Base64.getEncoder.encodeToString(bytes))
    } else dataUri(ref) // bare base64
  }

  final case class MediaMeta(nBytes: Int, width: Int, height: Int, frames: Int)

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would decode the image/audio header here.
    */
  def decodeOne(bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    MediaMeta(n, n % 640, n % 480, n % 30 + 1)
  }

  /** Resolve an image/media *reference* column into bytes, on executors
    * (reference fetch_image, lotus/utils.py:75-120): supported refs are
    * `base64:`/raw base64, `file://` paths, and any hadoop-fs URL
    * (`s3a://`, `hdfs://`, `http(s)://` via the relevant FS). Never collects
    * media to the driver.
    */
  def resolveMediaRefs(df: DataFrame, refCol: String, outCol: String = "media_bytes_raw"): DataFrame = {
    val idx = df.schema.fieldIndex(refCol)
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.mapPartitions { iter =>
      iter.map { r =>
        val ref = Option(r.get(idx)).map(_.toString).getOrElse("")
        val bytes: Array[Byte] =
          try {
            if (ref.isEmpty) Array.emptyByteArray
            else if (ref.startsWith("base64:"))
              java.util.Base64.getDecoder.decode(ref.stripPrefix("base64:"))
            else if (ref.startsWith("file://"))
              java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(new java.net.URI(ref)))
            else if (ref.contains("://")) {
              val path = new org.apache.hadoop.fs.Path(ref)
              val fs = path.getFileSystem(hadoopConf.value)
              val in = fs.open(path)
              try in.readAllBytes() finally in.close()
            } else java.util.Base64.getDecoder.decode(ref) // bare base64
          } catch { case _: Exception => Array.emptyByteArray }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(Encoders.row(outSchema))
  }

  /** Append decoded metadata columns for a binary media column. Batched per
    * partition (grouped(32)) so a real decoder can amortize library setup /
    * vectorize, mirroring a Pandas-UDF `mapInPandas` batch shape.
    */
  def decodeMeta(df: DataFrame, binaryCol: String, prefix: String = "media_"): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(s"${prefix}bytes", IntegerType),
      StructField(s"${prefix}width", IntegerType),
      StructField(s"${prefix}height", IntegerType),
      StructField(s"${prefix}frames", IntegerType)))
    df.mapPartitions { iter =>
      iter.grouped(32).flatMap { batch =>
        batch.map { r =>
          val m = decodeOne(r.getAs[Array[Byte]](idx))
          Row.fromSeq(r.toSeq ++ Seq(m.nBytes, m.width, m.height, m.frames))
        }
      }
    }(Encoders.row(outSchema))
  }
}
