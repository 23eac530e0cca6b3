package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream, IOException}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One WARC record with its parsed named headers (the ISO 28500 set the
  * engine consumes) plus the raw payload block. `recordIdx` is the
  * within-file ordinal so sample order is recoverable. */
case class WarcRecord(file: String, recordIdx: Int, warcType: String,
    recordId: String, targetUri: String, date: String,
    contentType: String, contentLength: Long, payload: Array[Byte])

/** WARC (ISO 28500) read/write — the landing format of CommonCrawl and
  * every public web-crawl corpus: the stage BEFORE
  * [[graft.operators.HtmlExtract]] in a crawl→training-data pipeline.
  *
  * Write side: the [[TarShards]] discipline — deterministic (shard, pos)
  * slotting via [[graft.operators.TrainingPrep.shardExport]], ONE ranged
  * exchange whose shuffle delivers within-shard order, then each task
  * streams its shard with O(one record) memory. Every volatile WARC
  * field is pinned (WARC-Date epoch, record IDs = md5-derived urn:uuid
  * of the salted doc id, gzip headers zeroed by the JDK), so re-exports
  * are byte-identical and shards content-address.
  *
  * Records are WARC-Type: response carrying a full HTTP/1.1 response
  * (status line + headers + body) as `application/http; msgtype=response`
  * — the CommonCrawl shape — preceded by one warcinfo record per shard.
  * With `gzip = true`, each record is its OWN gzip member and members
  * are concatenated: the CommonCrawl .warc.gz layout, which lets readers
  * split at member boundaries; `GZIPInputStream` reads the concatenation
  * transparently.
  *
  * Read side: Spark `binaryFile` scan (WARC, like tar/zip, has no native
  * Spark codec) + a strict record walker — version line, header block,
  * Content-Length framing, CRLF CRLF record boundary — that throws with
  * file+offset on any framing violation rather than resyncing silently.
  *
  * SCALE: parallelism = shard count on both sides (a 100-TB crawl at the
  * customary ~1 GB/shard is ~10^5 tasks); each read task buffers one
  * shard (the binaryFile envelope, same as the zip/tar paths). No state,
  * no shuffle beyond the writer's single ranged exchange.
  */
object WarcSource {

  private val CRLF = "\r\n"
  private val Epoch = "1970-01-01T00:00:00Z"

  private final class ShardPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int =
      key.asInstanceOf[(Long, Long)]._1.toInt
  }

  /** Deterministic urn:uuid from a seed string (md5 bytes in 8-4-4-4-12
    * layout): record IDs must be unique but the export must be
    * reproducible, so they derive from content identity, not randomness. */
  def urnUuid(seed: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"<urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-" +
      s"${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20, 32)}>"
  }

  private def record(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val head = (Seq("WARC/1.0") ++
      headers.map { case (k, v) => s"$k: $v" } ++
      Seq(s"Content-Length: ${payload.length}", "", ""))
      .mkString(CRLF).getBytes(StandardCharsets.US_ASCII)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head)
    out.write(payload)
    out.write(s"$CRLF$CRLF".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  /** One member per record (CommonCrawl layout). JDK gzip headers are
    * all-zero (mtime 0, OS 0), so this is deterministic. */
  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  private def httpResponse(body: Array[Byte], contentType: String): Array[Byte] = {
    val head = (s"HTTP/1.1 200 OK${CRLF}Content-Type: $contentType$CRLF" +
      s"Content-Length: ${body.length}$CRLF$CRLF")
      .getBytes(StandardCharsets.US_ASCII)
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head)
    out.write(body)
    out.toByteArray
  }

  /** Exports `docs` as `nShards` WARC files at
    * `path/shard-NNNNN.warc[.gz]`: per shard one warcinfo record, then
    * one response record per document in deterministic slot order, with
    * WARC-Target-URI `https://example.org/doc/<id>` and the `bodyCol`
    * string as the HTTP body (content type `text/html` by default).
    * Returns the response-record count read back from what landed.
    *
    * Task retries are safe (one shard per task, create-overwrite); for
    * an atomic multi-shard publish stage + rename at the caller (the
    * [[ManifestCommit]] discipline). */
  def exportWarc(docs: DataFrame, path: String, nShards: Int, salt: String,
      idCol: String = "doc_id", bodyCol: String = "text",
      bodyContentType: String = "text/html; charset=utf-8",
      gzip: Boolean = false): Long = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val spark = docs.sparkSession
    val nNull = docs.where(col(bodyCol).isNull).limit(1).count()
    require(nNull == 0L,
      s"exportWarc: column '$bodyCol' contains null cells; clean them first")
    val slots = graft.operators.TrainingPrep
      .shardExport(docs.select(idCol), nShards, salt, idCol)
    val payload = docs.join(slots, Seq(idCol)).select(
      col("shard"), col("pos"),
      col(idCol).cast("long").as("id"), col(bodyCol).as("body"))
    val sc = new TarShards.SerializableConf(spark.sessionState.newHadoopConf())
    val dir = path
    val ext = if (gzip) ".warc.gz" else ".warc"
    val ct = bodyContentType
    payload.rdd
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3))))
      .repartitionAndSortWithinPartitions(new ShardPartitioner(nShards))
      .foreachPartition { it =>
        if (it.hasNext) {
          val first = it.next()
          val shard = first._1._1
          val p = new Path(dir, f"shard-$shard%05d$ext")
          val fs = p.getFileSystem(sc.conf)
          val out = new DataOutputStream(fs.create(p, true))
          try {
            def emit(rec: Array[Byte]): Unit =
              out.write(if (gzip) gzMember(rec) else rec)
            val infoBody = (s"software: graft-warc/1.0${CRLF}format: " +
              s"WARC File Format 1.0$CRLF").getBytes(StandardCharsets.US_ASCII)
            emit(record(Seq(
              "WARC-Type" -> "warcinfo",
              "WARC-Record-ID" -> urnUuid(s"$salt:warcinfo:$shard"),
              "WARC-Date" -> Epoch,
              "WARC-Filename" -> f"shard-$shard%05d$ext",
              "Content-Type" -> "application/warc-fields"), infoBody))
            (Iterator(first) ++ it).foreach { case (_, (id, body)) =>
              val http = httpResponse(
                body.getBytes(StandardCharsets.UTF_8), ct)
              emit(record(Seq(
                "WARC-Type" -> "response",
                "WARC-Record-ID" -> urnUuid(s"$salt:response:$id"),
                "WARC-Date" -> Epoch,
                "WARC-Target-URI" -> s"https://example.org/doc/$id",
                "Content-Type" -> "application/http; msgtype=response"),
                http))
            }
          } finally out.close()
        }
      }
    val root = new Path(dir)
    val fs = root.getFileSystem(sc.conf)
    if (!fs.exists(root) ||
        Option(fs.globStatus(new Path(root, s"shard-*$ext"))).forall(_.isEmpty)) 0L
    else records(spark, dir).filter(_.warcType == "response").count()
  }

  /** All records of all `shard-*.warc[.gz]` files under `path`, in
    * record order with ordinals, every record strictly framed. */
  def records(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/shard-*.warc*")
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parse(file, inflate(file, bytes)) }
  }

  /** Streaming twin of [[records]]: a `binaryFile` file-source stream
    * over a LANDING directory — each WARC file ingests exactly once per
    * checkpoint (the source tracks seen paths), so a scheduled
    * `Trigger.AvailableNow` run picks up only newly-landed shards. Land
    * under unique names: the tracker keys by path. */
  def recordsStream(spark: SparkSession, landingDir: String): Dataset[WarcRecord] = {
    import spark.implicits._
    val binarySchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
    spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.warc*")
      .load(landingDir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parse(file, inflate(file, bytes)) }
  }

  /** Splits an `application/http` payload at the first CRLF CRLF into
    * (status line, body bytes); strict on the HTTP/ prefix. */
  def httpParts(payload: Array[Byte]): (String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(payload, 0)
    require(sep >= 0, "http payload has no header/body separator")
    val head = new String(payload, 0, sep, StandardCharsets.US_ASCII)
    require(head.startsWith("HTTP/"),
      s"payload is not an HTTP response: ${head.take(20)}")
    (head.split("\r\n", 2)(0),
      java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
  }

  /** Response records as (recordIdx, targetUri, UTF-8 body) rows — the
    * convenience frame a crawl pipeline starts from. */
  def responseBodies(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    records(spark, path).filter(_.warcType == "response")
      .map { r =>
        val (status, body) = httpParts(r.payload)
        (r.file, r.recordIdx, r.targetUri, status,
          new String(body, StandardCharsets.UTF_8))
      }
      .toDF("file", "record_idx", "uri", "status", "body")
  }

  private def inflate(file: String, bytes: Array[Byte]): Array[Byte] =
    if (!file.endsWith(".gz")) bytes
    else {
      // GZIPInputStream consumes concatenated members (the per-record
      // CommonCrawl layout) as one stream
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
      val out = new ByteArrayOutputStream(bytes.length * 3)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n); n = in.read(buf)
      }
      in.close()
      out.toByteArray
    }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Strict ISO 28500 walker: version line, header block, Content-Length
    * framing, CRLF CRLF boundary. Throws with file+offset on violations. */
  private def parse(file: String, bytes: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var off = 0
      private var idx = 0
      def hasNext: Boolean = off < bytes.length
      def next(): WarcRecord = {
        val headEnd = indexOfCrlfCrlf(bytes, off)
        if (headEnd < 0) throw new IOException(
          s"$file: unterminated WARC header block at offset $off")
        val head = new String(bytes, off, headEnd - off, StandardCharsets.US_ASCII)
        val lines = head.split("\r\n")
        if (!lines(0).startsWith("WARC/")) throw new IOException(
          s"$file: expected WARC version line at offset $off, got '${lines(0).take(20)}'")
        val hdrs = lines.drop(1).map { l =>
          val c = l.indexOf(':')
          if (c < 0) throw new IOException(
            s"$file: malformed WARC header '$l' at offset $off")
          l.substring(0, c).toLowerCase -> l.substring(c + 1).trim
        }.toMap
        val len = hdrs.getOrElse("content-length", throw new IOException(
          s"$file: record at offset $off has no Content-Length")).toLong
        val dataOff = headEnd + 4
        if (dataOff + len + 4 > bytes.length) throw new IOException(
          s"$file: record at offset $off overruns the file " +
            s"(payload $len bytes at $dataOff, file ${bytes.length})")
        val payload = java.util.Arrays.copyOfRange(
          bytes, dataOff, (dataOff + len).toInt)
        val boundary = (dataOff + len).toInt
        if (indexOfCrlfCrlf(bytes, boundary) != boundary) throw new IOException(
          s"$file: record at offset $off missing CRLF CRLF boundary at $boundary")
        val rec = WarcRecord(file, idx,
          hdrs.getOrElse("warc-type", ""),
          hdrs.getOrElse("warc-record-id", ""),
          hdrs.getOrElse("warc-target-uri", ""),
          hdrs.getOrElse("warc-date", ""),
          hdrs.getOrElse("content-type", ""), len, payload)
        off = boundary + 4
        idx += 1
        rec
      }
    }
}
