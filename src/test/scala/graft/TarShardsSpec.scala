package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.operators.TrainingPrep
import graft.sources.TarShards
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard export/ingest: round-trip fidelity,
  * slot-order members, byte-determinism (re-exports content-address
  * equal), header checksum enforcement, and empty-shard handling. */
class TarShardsSpec extends GraftSpec {
  import spark.implicits._

  private def docsFixture = Seq(
    (1L, "hello world", "en", "web", 11L),
    (2L, "sæt pâté 日本語\nsecond line", "da", "web", 24L),
    (3L, "third doc with several words here", "en", "books", 33L),
    (4L, "", "en", "web", 0L), // empty payload: zero-length member
    (5L, "quoted \"json\" meta \\ backslash", "fr", "web", 30L),
    (6L, "the last document", "en", "books", 17L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private def sha(p: java.nio.file.Path): String =
    MessageDigest.getInstance("SHA-256").digest(Files.readAllBytes(p))
      .map("%02x".format(_)).mkString

  test("tar round-trip: every sample lands at its deterministic slot with exact bytes") {
    val dir = Files.createTempDirectory("tarshards-rt").toString
    val n = TarShards.exportTarShards(docsFixture, dir, 3, "tar1")
    assert(n == 6L)
    val mem = TarShards.members(spark, dir).collect()
    // two members per sample, json before txt, same basename
    assert(mem.length == 12)
    val slots = TrainingPrep.shardExport(docsFixture.select("doc_id"), 3, "tar1")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val texts = docsFixture.collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    mem.groupBy(_.file).foreach { case (file, ms) =>
      val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(file).get.group(1).toLong
      ms.sortBy(_.memberIdx).grouped(2).zipWithIndex.foreach {
        case (Array(j, t), i) =>
          val id = j.member.stripSuffix(".json").toLong
          assert(t.member == f"$id%09d.txt" && j.member == f"$id%09d.json")
          assert(slots(id) == (shard, i + 1L),
            s"doc $id must sit at its deterministic (shard, pos) slot")
          assert(new String(t.content, StandardCharsets.UTF_8) == texts(id))
          val meta = ujsonField(new String(j.content, StandardCharsets.UTF_8), "doc_id")
          assert(meta == id.toString)
        case other => fail(s"unpaired members: ${other._1.map(_.member).toSeq}")
      }
    }
  }

  /** Tiny field extractor so the spec has no JSON dependency. */
  private def ujsonField(json: String, field: String): String = {
    val m = ("\"" + field + "\"\\s*:\\s*([^,}]+)").r.findFirstMatchIn(json)
    m.get.group(1).trim.stripPrefix("\"").stripSuffix("\"")
  }

  test("re-export is byte-identical (content-addressable shards)") {
    val d1 = Files.createTempDirectory("tarshards-a").toString
    val d2 = Files.createTempDirectory("tarshards-b").toString
    TarShards.exportTarShards(docsFixture, d1, 3, "tar1")
    TarShards.exportTarShards(docsFixture, d2, 3, "tar1")
    val f1 = new java.io.File(d1).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    val f2 = new java.io.File(d2).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    assert(f1.map(_.getName).toSeq == f2.map(_.getName).toSeq && f1.nonEmpty)
    f1.zip(f2).foreach { case (a, b) =>
      assert(sha(a.toPath) == sha(b.toPath), s"${a.getName} must be deterministic")
    }
  }

  test("a corrupt header fails loudly (checksum verified)") {
    val dir = Files.createTempDirectory("tarshards-c").toString
    TarShards.exportTarShards(docsFixture, dir, 1, "tar1")
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head.toPath
    val bytes = Files.readAllBytes(f)
    bytes(4) = (bytes(4) ^ 0x7).toByte // flip bits inside the first name field
    Files.write(f, bytes)
    // drop the local-FS CRC sidecar so the TAR-level header checksum (not
    // Hadoop's transport checksum) is what catches the corruption
    Files.deleteIfExists(Paths.get(f.getParent.toString, s".${f.getFileName}.crc"))
    val err = intercept[org.apache.spark.SparkException] {
      TarShards.members(spark, dir).collect()
    }
    assert(err.getMessage.contains("checksum") ||
      Option(err.getCause).exists(_.getMessage.contains("checksum")))
  }

  test("binary members: per-sample multimodal payloads land adjacent, null cells skip") {
    val dir = Files.createTempDirectory("tarshards-m").toString
    // deterministic fake media bytes; doc 3's image is null -> no member
    val docs = docsFixture.withColumn("img",
        when(col("doc_id") =!= 3L,
          concat(lit(Array[Byte](0x50, 0x4e, 0x47, 0)),
            unhex(lpad(hex(col("doc_id")), 16, "0")))))
      .withColumn("wav", unhex(lpad(hex(col("doc_id")), 16, "0")))
    val n = TarShards.exportTarShards(docs, dir, 2, "tar1",
      binMembers = Seq("png" -> "img", "wav" -> "wav"))
    assert(n == 6L)
    val mem = TarShards.members(spark, dir).collect()
    // 6 samples x (json + txt + wav) + 5 png (doc 3 skipped)
    assert(mem.length == 6 * 3 + 5)
    mem.groupBy(_.file).foreach { case (_, ms) =>
      // members of one sample are adjacent and in declared order
      val keys = ms.sortBy(_.memberIdx).map(m => m.member.split('.')(0))
      assert(keys.sliding(2).forall { case Array(a, b) => a <= b || a == b
        case _ => true } || keys.distinct.length <= keys.length)
      ms.groupBy(_.member.split('.')(0)).foreach { case (k, sm) =>
        val id = k.toLong
        val order = sm.sortBy(_.memberIdx).map(_.member.split('.')(1)).toSeq
        val want = if (id == 3L) Seq("json", "txt", "wav")
          else Seq("json", "txt", "png", "wav")
        assert(order == want, s"doc $id member order: $order")
        // ordinals of one sample are consecutive: adjacency in the tar
        val idxs = sm.map(_.memberIdx).sorted
        assert(idxs.last - idxs.head == idxs.length - 1)
      }
    }
    // byte-exact payload round trip (8-byte big-endian cast of the id)
    val wav5 = mem.find(_.member == "000000005.wav").get.content
    assert(wav5.toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 0, 5))
    val png5 = mem.find(_.member == "000000005.png").get.content
    assert(png5.take(4).toSeq == Seq[Byte](0x50, 0x4e, 0x47, 0))
  }

  test("empty corpus exports zero shards and returns 0 (no matchless-glob throw)") {
    val dir = Files.createTempDirectory("tarshards-z").toString
    val n = TarShards.exportTarShards(docsFixture.limit(0), dir, 4, "tar1")
    assert(n == 0L)
    assert(new java.io.File(dir).listFiles() == null ||
      new java.io.File(dir).listFiles().forall(!_.getName.endsWith(".tar")))
  }

  test("streaming ingest: each shard exactly once; an empty wave adds nothing") {
    // three waves against ONE checkpoint: evens, odds, then nothing new.
    // exactly-once = no duplicate doc_ids; the empty third run must not
    // re-process the landed shards.
    val docs = docsFixture
    val got = graft.streaming.EventsStream.tarShardIngestDemo(spark,
      Seq(docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1),
        docs.limit(0)),
      nShards = 2, salt = "tar1")
    val rows = got.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("batch_id"))).toSeq
    assert(rows.size == 6, s"every doc exactly once, got ${rows.size}")
    assert(rows.toMap.forall { case (id, b) => b == id % 2 },
      "wave membership must land as the batch id")
  }

  test("more shards than documents: empty shards write no file, samples intact") {
    val dir = Files.createTempDirectory("tarshards-e").toString
    val two = docsFixture.where(col("doc_id") <= 2)
    val n = TarShards.exportTarShards(two, dir, 8, "tar1")
    assert(n == 2L)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(files.length <= 2 && files.nonEmpty)
    val mem = TarShards.members(spark, dir).collect()
    assert(mem.count(_.member.endsWith(".txt")) == 2)
  }
}
