package graft

import org.apache.spark.sql.functions._
import graft.functions.MultimodalOps
import graft.operators.EmbedOps

/** Real image decode/resize/feature-extract through the JDK codecs —
  * distributed over binary columns, no external libraries.
  */
class ImageOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic test PNG: a two-tone gradient so features are non-trivial. */
  private def png(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7 + y * 13 + seed * 31) % 256)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("decodeMeta reads real PNG dimensions") {
    val df = Seq((1L, png(64, 48, 0)), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "img")
    val rows = MultimodalOps.decodeMeta(df, "img")
      .select("id", "media_width", "media_height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(rows(1L) == ((64, 48)))
    // non-image payload falls back to the deterministic pseudo-metadata
    val n = "not an image".length
    assert(rows(2L) == ((n % 640, n % 480)))
  }

  test("resizeColumn shrinks images within bounds, preserving aspect") {
    val df = Seq((1L, png(100, 50, 1))).toDF("id", "img")
    val resized = MultimodalOps.resizeColumn(df, "img", 40, 40)
      .select("media_resized").as[Array[Byte]].head()
    val meta = MultimodalOps.decodeOne(resized)
    assert(meta.width == 40 && meta.height == 20)
  }

  test("luma features embed images for near-dup detection") {
    val a = png(64, 64, 0)
    val aCopy = png(64, 64, 0)
    val b = png(64, 64, 100) // different gradient phase
    val df = Seq((1L, a), (2L, aCopy), (3L, b)).toDF("id", "img")
    val emb = MultimodalOps.imageEmbedColumn(df, "img")
    assert(emb.columns.contains(EmbedOps.vecCol("img")))
    // Identical images are exact near-dups through the standard kernel.
    val pairs = EmbedOps.neardupPairs(emb, "img", "id", threshold = 0.999)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    // The embedding column also feeds clustering directly.
    val clustered = EmbedOps.semClusterBy(emb, "img", nClusters = 2)
    assert(clustered.select("cluster_id").distinct().count() == 2)
  }
}
