package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.connectors.TarShards

class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  test("writeTar/parseTar roundtrip, padding and trailer handling") {
    val entries = Seq(
      "a.txt" -> "hello".getBytes(UTF_8),
      "a.bin" -> Array.tabulate(1024)(i => i.toByte), // exactly 2 blocks
      "b.txt" -> Array.emptyByteArray)
    val tar = TarShards.writeTar(entries)
    assert(tar.length % 512 == 0)
    val back = TarShards.parseTar(tar)
    assert(back.map(_._1) == entries.map(_._1))
    assert(back.zip(entries).forall { case ((_, g), (_, e)) => g.sameElements(e) })
  }

  test("pinned headers make rewrites byte-identical; corruption fails loudly") {
    val e = Seq("k.txt" -> "payload".getBytes(UTF_8))
    assert(TarShards.writeTar(e).sameElements(TarShards.writeTar(e)))
    val tar = TarShards.writeTar(e)
    val truncated = tar.take(515) // header promises more content than remains
    val ex = intercept[IllegalArgumentException](TarShards.parseTar(truncated))
    assert(ex.getMessage.contains("truncated"))
    val garbage = "this is not a tar header".getBytes(UTF_8) ++ new Array[Byte](600)
    intercept[IllegalArgumentException](TarShards.parseTar(garbage))
  }

  test("writeShards/readShards: distributed roundtrip, sample grouping, " +
      "GNU tar interop") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tar_spec").toString
    val df = (0 until 37).map(i => (f"$i%06d", s"text $i", s"""{"id":$i}"""))
      .toDF("key", "txt", "json")
    TarShards.writeShards(df, "key",
      Map("txt" -> col("txt"), "json" -> col("json")), tmp, numShards = 3)
    val shards = new java.io.File(tmp).listFiles().map(_.getName).sorted
    assert(shards.length == 3 && shards.forall(_.matches("shard-\\d{6}\\.tar")))
    val back = TarShards.readShards(spark, tmp + "/*.tar")
    assert(back.count() == 37)
    val row = back.filter(col("key") === "000017")
      .select("parts").as[Map[String, Array[Byte]]].head()
    assert(new String(row("txt"), UTF_8) == "text 17")
    assert(new String(row("json"), UTF_8) == """{"id":17}""")
    // Samples never straddle shards (range partition by key).
    val perShard = back.groupBy("shard").count().select("count")
      .as[Long].collect().sum
    assert(perShard == 37)
    // External-tool compatibility: system GNU tar must list the members.
    val first = new java.io.File(tmp).listFiles().map(_.getPath).min
    val p = new ProcessBuilder("tar", "-tf", first).redirectErrorStream(true).start()
    val names = scala.io.Source.fromInputStream(p.getInputStream).getLines().toSeq
    assert(p.waitFor() == 0, s"GNU tar rejected the shard: $names")
    assert(names.nonEmpty && names.forall(_.matches("\\d{6}\\.(txt|json)")))
  }

  test("duplicate sample keys fail loudly on write; duplicate members fail " +
      "loudly on read instead of silently collapsing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tar_dup").toString
    val df = Seq(("k1", "a"), ("k1", "b"), ("k2", "c")).toDF("key", "txt")
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.writeShards(df, "key", Map("txt" -> col("txt")), tmp, 1)
    }
    assert(e.getMessage.contains("duplicate sample key") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate sample key")))
    // A hand-built shard with a duplicated (key, ext) member must be
    // rejected by readShards, not last-wins merged.
    val bytes = TarShards.writeTar(Seq(
      ("k.txt", "one".getBytes(UTF_8)), ("k.txt", "two".getBytes(UTF_8))))
    val path = java.nio.file.Paths.get(tmp, "hand.tar")
    java.nio.file.Files.write(path, bytes)
    val e2 = intercept[org.apache.spark.SparkException] {
      TarShards.readShards(spark, path.toString).count()
    }
    val msgs = Iterator.iterate[Throwable](e2)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("duplicate member"), msgs)
    // A null key is its own loud error (member names are '<key>.<ext>'),
    // not a misleading "duplicate sample key 'null'" or a literal
    // "null.txt" member.
    val nk = Seq((null: String, "a"), ("k2", "b")).toDF("key", "txt")
    val e3 = intercept[org.apache.spark.SparkException] {
      TarShards.writeShards(nk, "key", Map("txt" -> col("txt")), tmp + "/nk", 1)
    }
    val msgs3 = Iterator.iterate[Throwable](e3)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs3.contains("null sample key"), msgs3)
  }

  test("null payload cells skip the entry instead of writing empty files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tar_null").toString
    val df = Seq(("a", Some("x")), ("b", None)).toDF("key", "txt")
    TarShards.writeShards(df, "key", Map("txt" -> col("txt")), tmp, 1)
    val back = TarShards.readShards(spark, tmp + "/*.tar")
    assert(back.select("key").as[String].collect().toSet == Set("a"))
  }
}
