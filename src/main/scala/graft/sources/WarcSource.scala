package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum, when}

import graft.model.{ExtractionResult, WebPage}

/** WARC (ISO 28500) source: the container format Common Crawl ships web
  * pages in, and the natural ingest format for the extraction pipeline
  * (reference analog: the repo ingests one uploaded file per request,
  * /root/reference/server.py:36-88 — a crawl-scale engine ingests WARC
  * segments instead). This module is both directions:
  *
  *  - a deterministic WRITER (`buildFile` / `buildBinaryFile`) producing
  *    spec-shaped WARC/1.1 bytes — warcinfo header record + one response
  *    record per page, CRLF framing, exact Content-Length, optionally
  *    gzip'd one-member-PER-RECORD exactly as the .warc.gz convention
  *    requires;
  *  - a streaming PARSER (`parseStream`) that walks records one at a time
  *    off an InputStream (through multi-member gzip transparently),
  *    validates framing — header terminator, numeric Content-Length, the
  *    CRLFCRLF record trailer — with NAMED errors, and surfaces HTTP
  *    response payloads with status / Content-Type.
  *
  * Scale shape: in production each task reads ONE ~1 GB .warc.gz object
  * (spark.read.format("binaryFile") or a manifest of ranges) and streams
  * records out of it — file-per-task is the right granularity because
  * record-gzip members are not independently seekable without an index.
  * `parseStream` holds only the CURRENT record in memory (one record body
  * at a time, never the inflated file), so a multi-GB segment costs one
  * record's worth of heap per task; a single record larger than ~2 GiB is
  * a named error (the JVM cannot hold one byte array past that, and real
  * crawls cap records far below it). Here `roundTrip` / `extractionRollup`
  * synthesize file groups from the documents table so the oracle can
  * recompute every parsed field from SQL.
  */
object WarcSource {

  private val CRLF = "\r\n"

  /** Frozen synthetic-corpus conventions (oracle SQL depends on them). */
  val warcDate = "2024-01-01T00:00:00Z"
  def targetUri(id: Long): String = s"https://example.com/doc$id"
  val responseContentType = "text/plain; charset=utf-8"
  /** Documents per synthesized WARC file. */
  val docsPerFile = 50

  /** Framing guards: WARC named headers are small (64 KiB is far past any
    * spec'd field), and one record body must fit a JVM byte array. */
  private val maxHeaderBytes = 64 * 1024
  private val maxRecordBytes: Long = Int.MaxValue.toLong - 16

  private def httpResponse(payload: Array[Byte], contentType: String): Array[Byte] = {
    val head = "HTTP/1.1 200 OK" + CRLF +
      s"Content-Type: $contentType" + CRLF +
      s"Content-Length: ${payload.length}" + CRLF + CRLF
    head.getBytes(ISO_8859_1) ++ payload
  }

  private def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val head = ("WARC/1.1" + CRLF) +
      (headers :+ ("Content-Length" -> body.length.toString))
        .map { case (k, v) => s"$k: $v$CRLF" }.mkString + CRLF
    head.getBytes(ISO_8859_1) ++ body ++ (CRLF + CRLF).getBytes(ISO_8859_1)
  }

  private def responseRecord(uri: String, payload: Array[Byte],
                             contentType: String): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:$uri>",
      "WARC-Date" -> warcDate,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse(payload, contentType))

  private def warcinfoRecord(fileId: Long): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:file$fileId>",
      "WARC-Date" -> warcDate,
      "Content-Type" -> "application/warc-fields"),
      s"software: graft$CRLF".getBytes(ISO_8859_1))

  /** One gzip member per record — the .warc.gz convention (a reader can
    * resync on member boundaries; a whole-file gzip could not be split). */
  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private def frame(recs: Seq[Array[Byte]], gzipPerRecord: Boolean): Array[Byte] = {
    val framed = if (gzipPerRecord) recs.map(gzipMember) else recs
    val out = new ByteArrayOutputStream()
    framed.foreach(out.write)
    out.toByteArray
  }

  /** Deterministic WARC file over (doc_id, text) pages: warcinfo + one
    * response record per page, optionally gzip'd per record. */
  def buildFile(fileId: Long, pages: Seq[(Long, String)], gzipPerRecord: Boolean): Array[Byte] =
    frame(warcinfoRecord(fileId) +: pages.map { case (id, t) =>
      responseRecord(targetUri(id), t.getBytes(UTF_8), responseContentType)
    }, gzipPerRecord)

  /** Deterministic WARC file over (url, payload-bytes) pages — the crawl
    * ingest shape: arbitrary binary payloads under their real target URIs. */
  def buildBinaryFile(fileId: Long, pages: Seq[(String, Array[Byte])],
                      gzipPerRecord: Boolean): Array[Byte] =
    frame(warcinfoRecord(fileId) +: pages.map { case (uri, payload) =>
      responseRecord(uri, payload, "application/octet-stream")
    }, gzipPerRecord)

  final case class ParsedResponse(url: String, date: String, status: Int,
                                  contentType: String, payload: Array[Byte])

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def parseHeaders(block: String): Map[String, String] =
    block.split(CRLF).drop(1).iterator.map { line =>
      val c = line.indexOf(':')
      require(c > 0, s"malformed WARC header line: $line")
      line.substring(0, c).trim -> line.substring(c + 1).trim
    }.toMap

  private def readFully(in: InputStream, n: Int, what: String): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      require(r >= 0, s"WARC stream truncated reading $what (${n - off} bytes short)")
      off += r
    }
    buf
  }

  /** Bytes up to (excluding) the first CRLFCRLF, or null at a clean EOF on
    * a record boundary. Reads byte-at-a-time off the (buffered gzip/
    * pushback) stream — the header block is tiny and capped. */
  private def readHeaderBlock(in: InputStream): Array[Byte] = {
    var c = in.read()
    if (c < 0) return null
    val out = new ByteArrayOutputStream(256)
    var matched = 0 // prefix of \r\n\r\n seen
    while (matched < 4) {
      require(c >= 0, "WARC stream truncated inside a record header")
      require(out.size < maxHeaderBytes, s"WARC header block exceeds $maxHeaderBytes bytes")
      out.write(c)
      matched = c match {
        case '\r' => if (matched == 2) 3 else 1
        case '\n' => if (matched == 1) 2 else if (matched == 3) 4 else 0
        case _ => 0
      }
      if (matched < 4) c = in.read()
    }
    val b = out.toByteArray
    java.util.Arrays.copyOf(b, b.length - 4) // strip the CRLFCRLF terminator
  }

  /** Stream records off `raw` one at a time (plain or .warc.gz — sniffed;
    * GZIPInputStream walks concatenated members transparently), yielding
    * the HTTP response records (warcinfo/request records are framing).
    * Memory is O(one record); malformed framing — bad version line, missing
    * or non-numeric Content-Length, truncation, a trailer that is not
    * CRLFCRLF, a malformed HTTP status line — throws a NAMED error,
    * contained per-file upstream. */
  def parseStream(raw: InputStream): Iterator[ParsedResponse] = {
    val pb = new PushbackInputStream(raw, 2)
    val b0 = pb.read()
    val b1 = if (b0 < 0) -1 else pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    val in: InputStream =
      if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(pb, 64 * 1024) else pb

    new Iterator[ParsedResponse] {
      private var pending: Option[ParsedResponse] = None
      private var eof = b0 < 0

      private def advance(): Unit =
        while (pending.isEmpty && !eof) {
          val head = readHeaderBlock(in)
          if (head == null) { eof = true }
          else {
            val headStr = new String(head, ISO_8859_1)
            require(headStr.startsWith("WARC/"),
              s"not a WARC record (version line reads '${headStr.take(16)}')")
            val headers = parseHeaders(headStr)
            val lenStr = headers.getOrElse("Content-Length",
              throw new IllegalArgumentException("WARC record lacks Content-Length"))
            require(lenStr.nonEmpty && lenStr.forall(_.isDigit),
              s"malformed WARC Content-Length '$lenStr'")
            val len = lenStr.toLong
            require(len <= maxRecordBytes,
              s"WARC record of $len bytes exceeds the $maxRecordBytes-byte per-record limit")
            val body = readFully(in, len.toInt, "record body")
            val t = readFully(in, 4, "record trailer")
            require(t(0) == '\r' && t(1) == '\n' && t(2) == '\r' && t(3) == '\n',
              "WARC record trailer is not CRLFCRLF")
            if (headers.get("WARC-Type").contains("response"))
              pending = Some(parseHttpResponse(headers, body))
          }
        }

      def hasNext: Boolean = { advance(); pending.isDefined }
      def next(): ParsedResponse = {
        advance()
        val r = pending.getOrElse(throw new NoSuchElementException("past WARC EOF"))
        pending = None
        r
      }
    }
  }

  private def parseHttpResponse(warcHeaders: Map[String, String],
                                body: Array[Byte]): ParsedResponse = {
    val httpHdrEnd = indexOfCrlfCrlf(body, 0)
    require(httpHdrEnd >= 0, "HTTP response block has no header terminator")
    val httpHead = new String(body, 0, httpHdrEnd, ISO_8859_1)
    val statusLine = httpHead.split(CRLF).head
    val parts = statusLine.split(" ")
    require(parts.length >= 2 && parts(0).startsWith("HTTP/") &&
      parts(1).nonEmpty && parts(1).forall(_.isDigit),
      s"malformed HTTP status line '$statusLine'")
    val httpHeaders = parseHeaders(httpHead)
    ParsedResponse(
      url = warcHeaders.getOrElse("WARC-Target-URI", ""),
      date = warcHeaders.getOrElse("WARC-Date", ""),
      status = parts(1).toInt,
      contentType = httpHeaders.getOrElse("Content-Type", ""),
      payload = java.util.Arrays.copyOfRange(body, httpHdrEnd + 4, body.length))
  }

  /** Whole-buffer convenience over [[parseStream]] (fixtures / tests). */
  def parse(bytes: Array[Byte]): Seq[ParsedResponse] =
    parseStream(new ByteArrayInputStream(bytes)).toSeq

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** Write-then-parse round trip over the documents table: pages are
    * grouped `docsPerFile` per synthetic WARC file (odd file ids gzip'd
    * per record), each file is built and re-parsed executor-locally, and
    * every parsed field is surfaced for the oracle to recompute. The
    * group-by-file shuffle stands in for production's file-per-task read. */
  def roundTrip(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey { case (id, _) => id / docsPerFile }
      .flatMapGroups { (fileId, it) =>
        val pages = it.toSeq.sortBy(_._1)
        val bytes = buildFile(fileId, pages, gzipPerRecord = fileId % 2 == 1)
        parse(bytes).map { r =>
          val id = r.url.substring(r.url.lastIndexOf("doc") + 3).toLong
          (id, r.url, r.status, r.contentType,
            r.payload.length.toLong, md5Hex(r.payload))
        }.iterator
      }
      .toDF("doc_id", "url", "status", "mime", "payload_octets", "payload_md5")
  }

  /** Write the documents table as deterministic .warc(.gz) segment FILES
    * under a fresh temp dir (`docsPerFile` per segment, odd file ids gzip'd
    * per record) and return the dir — the on-disk fixture for the
    * DataSource V2 read path ([[WarcDataSource]]). Segment writes happen
    * executor-side (local-mode shared FS); the O(numFiles) collect() only
    * barriers the writes before a load() can plan over them. */
  def segmentsToDisk(docs: DataFrame): String = {
    val s = docs.sparkSession
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_segments").toString
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / docsPerFile)
      .mapGroups { (fileId, it) =>
        val pages = it.toSeq.sortBy(_._1)
        val gz = fileId % 2 == 1
        val bytes = buildFile(fileId, pages, gzipPerRecord = gz)
        val name = f"seg$fileId%05d.warc" + (if (gz) ".gz" else "")
        java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
        fileId
      }.collect()
    dir
  }

  /** The crawl ingest shape END-TO-END: corpus pages → .warc(.gz) segments
    * → parse → sniff/dispatch → extract → per-format metrics rollup. Each
    * group of `docsPerFile` pages becomes one synthetic WARC segment (odd
    * file ids gzip'd per record) holding the REAL format-wheel payloads;
    * the segment is re-parsed and every payload runs the full extraction
    * kernel. The WARC leg is byte-transparent, so the rollup must equal the
    * batch pipeline's (`extract_metrics` shares the oracle). */
  def extractionRollup(pages: Dataset[WebPage]): DataFrame = {
    val s = pages.sparkSession
    import s.implicits._
    val results = pages
      .map(p => (p.url.substring(p.url.lastIndexOf("doc") + 3).toLong, p.url, p.html))
      .groupByKey(_._1 / docsPerFile)
      .flatMapGroups { (fileId, it) =>
        val recs = it.toSeq.sortBy(_._1)
        val bytes = buildBinaryFile(fileId,
          recs.map(r => (r._2, r._3)), gzipPerRecord = fileId % 2 == 1)
        parseStream(new ByteArrayInputStream(bytes)).map { r =>
          graft.extract.Extractor.extractOne(
            WebPage(r.url, new java.sql.Timestamp(0), r.payload, "", ""), fileId.toInt)
        }
      }
    results.toDF()
      .groupBy(col("format_from"))
      .agg(count(lit(1)).cast("bigint").as("docs"),
        sum(col("new_size")).cast("bigint").as("bytes_out"),
        sum(when(!col("success"), 1L).otherwise(0L)).cast("bigint").as("failures"))
      .orderBy("format_from")
  }

  /** Hadoop Configuration is not Serializable; the standard write/readFields
    * envelope ships the driver's conf (fs.* credentials etc.) to executors. */
  private[sources] class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** PRODUCTION ingest entry: stream-extract every HTTP response record of
    * every listed .warc(.gz) object. One task per file — the right
    * granularity because per-record gzip members are not independently
    * seekable — with O(one record) heap: each object is consumed as a
    * Hadoop FS stream through [[parseStream]] (works on HDFS/S3A, not just
    * file://), NEVER materialized as one byte array, so multi-GB segments
    * cost one record's worth of memory. A malformed segment — unreadable
    * path, framing error, truncated gzip member, bad HTTP block — is
    * CONTAINED as one failure row naming the file: one rotten object in a
    * 100k-segment crawl must not kill the job. */
  def extractFromWarcFiles(spark: SparkSession, paths: Seq[String]): Dataset[ExtractionResult] = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    spark.createDataset(paths)
      .repartition(math.max(paths.size, 1))
      .mapPartitions { files =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        files.flatMap(p => containedFileRecords(p, pid, conf.value))
      }
  }

  /** Extraction iterator over one WARC object with per-FILE containment:
    * any throw — opening, a record's framing, mid-stream truncation —
    * yields one failure row for the file and ends it. (Per-RECORD payload
    * errors are already contained inside Extractor.extractOne as ordinary
    * failure rows.) */
  private def containedFileRecords(p: String, pid: Int,
      conf: org.apache.hadoop.conf.Configuration): Iterator[ExtractionResult] = {
    import scala.util.control.NonFatal
    def failRow(e: Throwable) = ExtractionResult(
      url = s"warc:$p", success = false, text = "", format_from = "warc",
      original_size = 0L, new_size = 0L,
      error = s"WARC segment unreadable: ${e.getMessage}", partition_id = pid)
    var stream: java.io.InputStream = null
    // a task that stops pulling early (limit/take, kill, downstream throw)
    // never drains the iterator, so hasNext's close-on-exhaustion path
    // would leak the fd/S3A connection — close at task end regardless
    // (the DSV2 path gets this from Spark calling PartitionReader.close())
    Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
      _ => try { if (stream != null) stream.close() } catch { case NonFatal(_) => () }
    })
    val underlying: Iterator[ExtractionResult] =
      try {
        val path = new org.apache.hadoop.fs.Path(p)
        stream = new java.io.BufferedInputStream(
          path.getFileSystem(conf).open(path), 64 * 1024)
        parseStream(stream).map { r =>
          graft.extract.Extractor.extractOne(
            WebPage(r.url, new java.sql.Timestamp(0L), r.payload, "", ""), pid)
        }
      } catch {
        case NonFatal(e) =>
          if (stream != null) stream.close()
          return Iterator.single(failRow(e))
      }
    new Iterator[ExtractionResult] {
      private var pendingFail: Option[ExtractionResult] = None
      private var done = false
      private def closeQuietly(): Unit =
        try { if (stream != null) stream.close() } catch { case NonFatal(_) => () }
      def hasNext: Boolean = pendingFail.isDefined || (!done && {
        val h = try underlying.hasNext catch {
          case NonFatal(e) => pendingFail = Some(failRow(e)); true
        }
        if (!h) { done = true; closeQuietly() }
        h
      })
      def next(): ExtractionResult = pendingFail match {
        case Some(f) => pendingFail = None; done = true; closeQuietly(); f
        case None =>
          try underlying.next() catch {
            case NonFatal(e) => done = true; closeQuietly(); failRow(e)
          }
      }
    }
  }
}
