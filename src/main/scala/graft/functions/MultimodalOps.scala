package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition in bounded
  * batches (the Spark-side shape a real decoder needs: schema, batch size,
  * partition-local library init). Image decode is REAL for the formats the
  * JDK ships codecs for (PNG/JPEG/GIF/BMP via javax.imageio); non-image
  * payloads (audio/video containers, unknown bytes) fall back to
  * deterministic pseudo-metadata so pipelines stay total.
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

  /** Decode media metadata. Real image decode via ImageIO (JDK codecs:
    * PNG/JPEG/GIF/BMP/WBMP); anything undecodable falls back to a
    * deterministic function of the bytes (audio/video containers would slot
    * in here with their own libraries).
    */
  /** Cheap magic-byte sniff so non-image payloads never pay the ImageIO
    * reader-probe (which builds disk-cached streams per call).
    */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length > 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // png
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) || // jpeg
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') || // gif
      (b(0) == 'B' && b(1) == 'M')) // bmp

  def decodeOne(bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    if (n > 0 && looksLikeImage(bytes)) {
      try {
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img != null) return MediaMeta(n, img.getWidth, img.getHeight, 1)
      } catch { case _: Exception => }
    }
    MediaMeta(n, n % 640, n % 480, n % 30 + 1)
  }

  /** Real image resize (fit within maxW×maxH, preserving aspect), re-encoded
    * as PNG; undecodable payloads pass through unchanged.
    */
  def resizeOne(bytes: Array[Byte], maxW: Int, maxH: Int): Array[Byte] = {
    if (!looksLikeImage(bytes)) return bytes
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return bytes
      val scale = math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
      if (scale >= 1.0) return bytes
      val w = math.max(1, (img.getWidth * scale).toInt)
      val h = math.max(1, (img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", buf)
      buf.toByteArray
    } catch { case _: Exception => bytes }
  }

  /** Image feature vector: grid×grid mean-luma patches, L2-normalized — a
    * real, deterministic image embedding (downsampled luminance), so image
    * columns plug into the embedding operators (near-dup, clustering, ANN)
    * with no model download. Undecodable payloads → zero vector.
    */
  def lumaFeatures(bytes: Array[Byte], grid: Int = 8): Array[Float] = {
    val v = new Array[Float](grid * grid)
    if (!looksLikeImage(bytes)) return v
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return v
      val cw = math.max(1, img.getWidth / grid)
      val ch = math.max(1, img.getHeight / grid)
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          var sum = 0.0
          var n = 0
          var y = gy * ch
          val yEnd = math.min(img.getHeight, (gy + 1) * ch)
          while (y < yEnd) {
            var x = gx * cw
            val xEnd = math.min(img.getWidth, (gx + 1) * cw)
            while (x < xEnd) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
              n += 1; x += 1
            }
            y += 1
          }
          v(gy * grid + gx) = if (n == 0) 0f else (sum / n / 255.0).toFloat
          gx += 1
        }
        gy += 1
      }
      var norm = 0.0
      var i = 0
      while (i < v.length) { norm += v(i) * v(i); i += 1 }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        i = 0
        while (i < v.length) { v(i) *= inv; i += 1 }
      }
      v
    } catch { case _: Exception => v }
  }

  /** Append a resized copy of a binary image column (batched per partition). */
  def resizeColumn(df: DataFrame, binaryCol: String, maxW: Int, maxH: Int,
      outCol: String = "media_resized"): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    df.mapPartitions { iter =>
      iter.grouped(32).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ resizeOne(r.getAs[Array[Byte]](idx), maxW, maxH))
      })
    }(Encoders.row(outSchema))
  }

  /** Append the luma-grid embedding for a binary image column, named with
    * the engine's index-column convention so the embedding operators
    * (neardupPairs, semClusterBy, semSimJoin) consume it directly.
    */
  def imageEmbedColumn(df: DataFrame, binaryCol: String, grid: Int = 8): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val out = graft.operators.EmbedOps.vecCol(binaryCol)
    val outSchema = StructType(df.schema.fields :+
      StructField(out, ArrayType(FloatType, containsNull = false)))
    df.mapPartitions { iter =>
      iter.grouped(32).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ lumaFeatures(r.getAs[Array[Byte]](idx), grid).toIndexedSeq)
      })
    }(Encoders.row(outSchema))
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
