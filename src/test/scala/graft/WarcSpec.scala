package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.connectors.WarcLite
import graft.connectors.WarcLite.WarcRecord

class WarcSpec extends SparkSpec {

  private def conv(uri: String, text: String) =
    WarcRecord("conversion", uri, "2026-01-01T00:00:00Z", "text/plain",
      text.getBytes(UTF_8))

  test("roundtrip: plain stream, gzip members, and record fields") {
    val recs = Seq(
      conv("http://a", "hello world"),
      WarcRecord("response", "http://b", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n" +
          "<html>body</html>").getBytes(UTF_8)),
      WarcRecord("resource", "http://c", "2026-01-01T00:00:00Z",
        "application/octet-stream", Array[Byte](0, 1, 2, 0x1f, -117)))
    for (bytes <- Seq(WarcLite.writeRecords(recs), WarcLite.writeGzipMembers(recs))) {
      val parsed = WarcLite.parse(bytes)
      assert(parsed.map(_._1("warc-type")) == Seq("conversion", "response", "resource"))
      assert(new String(parsed.head._2, UTF_8) == "hello world")
      assert(new String(WarcLite.httpBody(parsed(1)._2), UTF_8) == "<html>body</html>")
      assert(parsed(2)._2.toSeq == Seq[Byte](0, 1, 2, 0x1f, -117))
    }
  }

  test("length-driven framing: payloads containing the record delimiter " +
      "and fake version lines parse verbatim") {
    val evil = "x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\ny"
    val parsed = WarcLite.parse(WarcLite.writeRecords(Seq(conv("http://e", evil))))
    assert(parsed.size == 1)
    assert(new String(parsed.head._2, UTF_8) == evil)
  }

  test("malformed framing fails loudly, never resynchronizes") {
    val good = WarcLite.writeRecords(Seq(conv("http://a", "hello")))
    // Truncate mid-payload: declared Content-Length runs past the stream.
    val truncated = good.take(good.length - 9)
    val e1 = intercept[IllegalArgumentException](WarcLite.parse(truncated))
    assert(e1.getMessage.contains("Content-Length"))
    // Garbage prefix: no version line.
    val e2 = intercept[IllegalArgumentException](
      WarcLite.parse("NOT-A-WARC\r\nfoo: bar\r\n\r\n".getBytes(UTF_8)))
    assert(e2.getMessage.contains("WARC/"))
    // Missing Content-Length header.
    val e3 = intercept[IllegalArgumentException](WarcLite.parse(
      "WARC/1.0\r\nWARC-Type: conversion\r\n\r\n".getBytes(UTF_8)))
    assert(e3.getMessage.contains("Content-Length"))
  }

  test("quarantine mode salvages around a corrupt mid-segment record; " +
      "the loud default still fails the whole file") {
    val r1 = WarcLite.writeRecords(Seq(conv("http://a", "first record")))
    val r3 = WarcLite.writeRecords(Seq(conv("http://c", "third record")))
    // Corrupt middle record #1: unparsable Content-Length.
    val badLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://bad1\r\nContent-Length: xyz\r\n\r\n" +
      "payload\r\n\r\n").getBytes(UTF_8)
    val seg1 = r1 ++ badLen ++ r3
    intercept[IllegalArgumentException](WarcLite.parse(seg1))
    val (recs1, bad1) = WarcLite.parseQuarantine(seg1)
    assert(recs1.map(_._1("warc-target-uri")) == Seq("http://a", "http://c"))
    assert(bad1.size == 1 && bad1.head._1 == r1.length.toLong &&
      bad1.head._2.contains("unparsable Content-Length"), bad1.toString)
    // Corrupt middle record #2: UNDER-declared Content-Length (payload is
    // 20 bytes, header claims 5) — the delimiter check pins it to THIS
    // record; the next well-formed record still parses.
    val badShort = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://bad2\r\nContent-Length: 5\r\n\r\n" +
      "twenty byte payload!\r\n\r\n").getBytes(UTF_8)
    val seg2 = r1 ++ badShort ++ r3
    val (recs2, bad2) = WarcLite.parseQuarantine(seg2)
    assert(recs2.map(_._1("warc-target-uri")) == Seq("http://a", "http://c"))
    assert(bad2.size == 1 && bad2.head._2.contains("delimiter"), bad2.toString)
    // Truncated TAIL record: salvage keeps the prefix records.
    val seg3 = (r1 ++ r3).dropRight(9)
    val (recs3, bad3) = WarcLite.parseQuarantine(seg3)
    assert(recs3.map(_._1("warc-target-uri")) == Seq("http://a"))
    assert(bad3.size == 1 && bad3.head._2.contains("past end of stream"))
    // Clean input: salvage mode is a no-op pass-through.
    val (recsOk, badOk) = WarcLite.parseQuarantine(r1 ++ r3)
    assert(recsOk.size == 2 && badOk.isEmpty)
  }

  test("toDf quarantine mode: side-output columns carry (file, offset, " +
      "reason); default schema unchanged") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_q").toString
    val r1 = WarcLite.writeRecords(Seq(conv("http://a", "first record")))
    val r3 = WarcLite.writeRecords(Seq(conv("http://c", "third record")))
    val badLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: xyz\r\n\r\npayload\r\n\r\n").getBytes(UTF_8)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg-000000.warc"), r1 ++ badLen ++ r3)
    val q = WarcLite.toDf(spark, dir + "/*.warc", onMalformed = "quarantine")
    assert(q.columns.takeRight(2).toSeq ==
      Seq("quarantine_offset", "quarantine_reason"))
    val goodRows = q.filter(col("quarantine_reason").isNull)
    assert(goodRows.count() == 2)
    val badRows = q.filter(col("quarantine_reason").isNotNull)
      .select("record_idx", "quarantine_offset", "quarantine_reason")
      .collect()
    assert(badRows.length == 1 && badRows.head.getInt(0) == -1 &&
      badRows.head.getLong(1) == r1.length.toLong &&
      badRows.head.getString(2).contains("unparsable Content-Length"))
    // Default mode: schema unchanged, loud failure preserved.
    assert(WarcLite.toDf(spark, dir + "/*.warc").columns.length == 8)
    val e = intercept[org.apache.spark.SparkException](
      WarcLite.toDf(spark, dir + "/*.warc").count())
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("Content-Length"), msgs)
  }

  test("writeWetSegments: distributed export round-trips and re-exports " +
      "byte-identically") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (0 until 25).map(i => (f"$i%04d", s"http://d/$i", s"text body $i"))
      .toDF("key", "uri", "text")
    val tmp1 = java.nio.file.Files.createTempDirectory("graft_wet1").toString
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_wet2").toString
    WarcLite.writeWetSegments(docs, "key", "uri", "text", tmp1, 3,
      date = "2026-01-01T00:00:00Z")
    WarcLite.writeWetSegments(docs, "key", "uri", "text", tmp2, 3,
      date = "2026-01-01T00:00:00Z")
    val segs1 = new java.io.File(tmp1).listFiles().sortBy(_.getName)
    assert(segs1.length == 3 &&
      segs1.forall(_.getName.matches("seg-\\d{6}\\.warc\\.gz")))
    // Pinned date + pinned gzip header: re-export is byte-identical.
    segs1.foreach { f =>
      val other = java.nio.file.Paths.get(tmp2, f.getName)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.file.Files.readAllBytes(other)), s"${f.getName} differs")
    }
    val back = WarcLite.toDf(spark, tmp1 + "/*.warc.gz")
      .select("target_uri", "text").as[(String, String)].collect().toSet
    assert(back == (0 until 25).map(i => (s"http://d/$i", s"text body $i")).toSet)
    // Whole-segment single-member layout round-trips identically.
    val tmp3 = java.nio.file.Files.createTempDirectory("graft_wet3").toString
    WarcLite.writeWetSegments(docs, "key", "uri", "text", tmp3, 3,
      date = "2026-01-01T00:00:00Z", memberPerRecord = false)
    val back3 = WarcLite.toDf(spark, tmp3 + "/*.warc.gz")
      .select("target_uri", "text").as[(String, String)].collect().toSet
    assert(back3 == back)
  }

  test("toDf: distributed parse, text policy per record type") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_spec")
    java.nio.file.Files.write(tmp.resolve("a.warc"), WarcLite.writeRecords(Seq(
      conv("http://a", "alpha text"),
      WarcRecord("resource", "http://bin", "2026-01-01T00:00:00Z",
        "application/octet-stream", Array[Byte](1, 2, 3)))))
    java.nio.file.Files.write(tmp.resolve("b.warc.gz"), WarcLite.writeGzipMembers(Seq(
      WarcRecord("response", "http://h", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody here".getBytes(UTF_8)))))
    val rows = WarcLite.toDf(spark, tmp.toString + "/*")
      .select("warc_type", "target_uri", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("conversion", "http://a", "alpha text"),
      ("resource", "http://bin", null), // binary payload must NOT decode
      ("response", "http://h", "body here")))
  }
}
