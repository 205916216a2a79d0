package graft.connectors

import java.io.BufferedOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard sink and source — the standard container
  * for multimodal training corpora (image/audio/text pairs streamed
  * sequentially by the training loader; see webdataset.github.io). Each
  * sample is a group of files sharing a KEY with one extension per
  * modality (`000017.txt`, `000017.json`, `000017.bin`…); samples are
  * packed into fixed-count `.tar` shards a dataloader reads start to
  * finish — sequential IO, no per-sample object-store round trips.
  *
  * The writer emits POSIX ustar archives with all non-content header
  * fields PINNED (mode 0644, uid/gid 0, mtime 0): a rewritten corpus is
  * byte-identical, so shard-level checksums diff snapshots without
  * opening members — the determinism convention every graft sink follows.
  * Entries are written in (key, ext) order within a shard.
  *
  * Scale shape: one range partition per shard (`repartitionByRange` on
  * the key → each task streams ONE tar to storage, no driver
  * involvement, no shuffle beyond the range exchange); the reader is
  * `binaryFile` rows → per-file executor-side parse, the
  * [[DirectoryReaderLite]]/[[WarcLite]] shape. Tars are only
  * entry-splittable, so the FILE is the parallelism unit — shards are
  * sized (docs/shard) to make that the right granularity, exactly as
  * WebDataset prescribes for multi-GB corpora.
  */
object TarShards {

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(UTF_8)
  }

  /** One POSIX ustar header block (512 bytes) with pinned metadata. */
  private def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes(UTF_8).length <= 100,
      s"TarShards: entry name '$name' exceeds the ustar 100-byte name field")
    val b = new Array[Byte](512)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, b, off, bytes.length)
    put(0, name.getBytes(UTF_8))
    put(100, octal(420 /* 0644 */, 8)) // mode
    put(108, octal(0, 8)) // uid
    put(116, octal(0, 8)) // gid
    put(124, octal(size, 12))
    put(136, octal(0, 12)) // mtime PINNED to epoch: deterministic bytes
    put(148, "        ".getBytes(UTF_8)) // checksum field spaces for summing
    b(156) = '0' // regular file
    put(257, "ustar\u000000".getBytes(UTF_8)) // magic + version
    val sum = b.map(_ & 0xFF).sum
    put(148, (("%06o".format(sum)) + "\u0000 ").getBytes(UTF_8))
    b
  }

  /** Append one entry to an open stream (header + content + padding). */
  private def writeEntry(out: java.io.OutputStream, name: String,
      content: Array[Byte]): Unit = {
    out.write(header(name, content.length.toLong))
    out.write(content)
    val rem = content.length % 512
    if (rem != 0) out.write(new Array[Byte](512 - rem))
  }

  /** Serialize (name, bytes) entries as one complete tar. */
  def writeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (n, c) => writeEntry(bos, n, c) }
    bos.write(new Array[Byte](1024)) // two zero blocks: end of archive
    bos.toByteArray
  }

  /** Write `df` as WebDataset shards under `dir` — any Hadoop-visible
    * path (hdfs://, s3a://, file://…; each task opens the filesystem for
    * the path's scheme with executor-side configuration, so per-session
    * credential overrides must live in cluster conf): `payload` maps
    * extension → byte column (binary or string — strings are UTF-8
    * encoded); every sample key takes one file per extension. Samples
    * are range-partitioned by `keyCol` into `numShards` shards
    * (`shard-%06d.tar`, task-deterministic names), sorted by key within
    * each shard, each task STREAMING one tar straight to storage.
    */
  def writeShards(df: DataFrame, keyCol: String,
      payload: Map[String, Column], dir: String, numShards: Int): Unit = {
    require(numShards >= 1, s"TarShards: numShards $numShards must be >= 1")
    require(payload.nonEmpty, "TarShards: at least one payload extension")
    val exts = payload.keys.toSeq.sorted
    val cols = col(keyCol).cast("string").as("__key") +:
      exts.map(e => payload(e).cast("binary").as(s"__p_$e"))
    // Session Hadoop conf (s3a credentials, endpoints, timeouts) must
    // reach the EXECUTOR tasks too — a fresh Configuration() there would
    // silently drop session-level overrides and authenticate differently
    // from the driver on object stores.
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(serConf.value).mkdirs(root)
    df.select(cols: _*)
      .repartitionByRange(numShards, col("__key"))
      .sortWithinPartitions("__key")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(dir, f"shard-$pid%06d.tar")
        // Unwrap ChecksumFileSystem: the local FS otherwise drops a .crc
        // sidecar per shard (the training loader globs *.tar; sidecars are
        // clutter and the tar IS the integrity unit here).
        val fs = path.getFileSystem(serConf.value) match {
          case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
          case f => f
        }
        val out = new BufferedOutputStream(fs.create(path, true), 1 << 20)
        try {
          var any = false
          // Keys must be unique: readShards groups members by key, so a
          // duplicate would silently collapse to one sample. Rows arrive
          // range-partitioned AND sorted by key, so every duplicate is
          // adjacent within this task — the check is free.
          var prevKey: String = null
          rows.foreach { r =>
            val key = r.getString(0)
            require(key != null,
              "TarShards: null sample key — WebDataset member names are " +
                "'<key>.<ext>'; a null key has no name (and would collide " +
                "with every other null)")
            require(key != prevKey,
              s"TarShards: duplicate sample key '$key' — WebDataset keys " +
                "must be unique (readShards would silently drop one)")
            prevKey = key
            exts.zipWithIndex.foreach { case (e, i) =>
              val bytes = r.getAs[Array[Byte]](i + 1)
              if (bytes != null) { writeEntry(out, s"$key.$e", bytes); any = true }
            }
          }
          out.write(new Array[Byte](1024))
          out.close()
          if (!any) fs.delete(path, false)
          ()
        } finally try out.close() catch { case _: java.io.IOException => () }
      }
  }

  /** Parse a tar byte stream into (name, content) entries. Length-driven
    * like [[WarcLite.parse]]: malformed size fields or truncation fail
    * loudly; the two-zero-block trailer (or stream end) terminates.
    */
  def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var pos = 0
    var done = false
    while (!done && pos + 512 <= bytes.length) {
      if (bytes.slice(pos, pos + 512).forall(_ == 0)) done = true
      else {
        val name = new String(bytes, pos, 100, UTF_8).takeWhile(_ != '\u0000')
        val sizeTxt = new String(bytes, pos + 124, 12, UTF_8)
          .takeWhile(c => c != '\u0000' && c != ' ')
        val size = try java.lang.Long.parseLong(sizeTxt.trim, 8)
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"TarShards: unparsable size field '$sizeTxt' at offset $pos — " +
              "corrupt or non-tar input must fail, not resynchronize")
        }
        val start = pos + 512
        require(start + size <= bytes.length,
          s"TarShards: entry '$name' at offset $pos declares $size bytes " +
            s"past end of archive (${bytes.length - start} remain) — truncated")
        if (bytes(pos + 156) == '0' || bytes(pos + 156) == 0)
          out += ((name, java.util.Arrays.copyOfRange(
            bytes, start, (start + size).toInt)))
        val padded = ((size + 511) / 512) * 512
        pos = (start + padded).toInt
      }
    }
    out.result()
  }

  /** Read shards into one row per SAMPLE: (shard, key, ext → bytes map).
    * Keys split on the LAST dot (WebDataset: key may contain dots; the
    * extension is the final suffix).
    */
  def readShards(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    graft.core.LogLevels.quietFileStreamSinkProbe
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseTar(bytes)
          .map { case (n, c) =>
            val i = n.lastIndexOf('.')
            val (key, ext) = if (i < 0) (n, "") else (n.take(i), n.drop(i + 1))
            (path, key, ext, c)
          }
          .groupBy { case (_, key, _, _) => key }
          .map { case (key, es) =>
            // A (key, ext) appearing twice in one shard is a corrupt or
            // hand-built archive — .toMap would keep the LAST member and
            // silently drop data; fail loudly instead.
            val dup = es.groupBy(_._3).collectFirst {
              case (ext, ms) if ms.size > 1 => ext
            }
            require(dup.isEmpty,
              s"TarShards: key '$key' has duplicate member '.${dup.get}' " +
                s"in shard $path — refusing to silently drop one")
            (path, key, es.map { case (_, _, ext, c) => ext -> c }.toMap)
          }
      }
      .toDF("shard", "key", "parts")
  }
}
