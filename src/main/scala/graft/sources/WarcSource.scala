package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** WARC (ISO 28500) source: the container format Common Crawl ships web
  * pages in, and the natural ingest format for the extraction pipeline
  * (reference analog: the repo ingests one uploaded file per request,
  * /root/reference/src/api/routes.py — a crawl-scale engine ingests WARC
  * segments instead). This module is both directions:
  *
  *  - a deterministic WRITER (`buildFile`) producing spec-shaped WARC/1.1
  *    bytes — warcinfo header record + one response record per page, CRLF
  *    framing, exact Content-Length, optionally gzip'd one-member-PER-RECORD
  *    exactly as the .warc.gz convention requires;
  *  - a PARSER (`parse`) that walks records (through multi-member gzip
  *    transparently), validates framing, and surfaces HTTP response
  *    payloads with status / Content-Type.
  *
  * Scale shape: in production each task reads ONE ~1 GB .warc.gz object
  * (spark.read.format("binaryFile") or a manifest of ranges) and streams
  * records out of it — file-per-task is the right granularity because
  * record-gzip members are not independently seekable without an index.
  * Here `roundTrip` synthesizes file groups from the documents table so the
  * oracle can recompute every parsed field from SQL.
  */
object WarcSource {

  private val CRLF = "\r\n"

  /** Frozen synthetic-corpus conventions (oracle SQL depends on them). */
  val warcDate = "2024-01-01T00:00:00Z"
  def targetUri(id: Long): String = s"https://example.com/doc$id"
  val responseContentType = "text/plain; charset=utf-8"
  /** Documents per synthesized WARC file. */
  val docsPerFile = 50

  private def httpResponse(payload: Array[Byte]): Array[Byte] = {
    val head = "HTTP/1.1 200 OK" + CRLF +
      s"Content-Type: $responseContentType" + CRLF +
      s"Content-Length: ${payload.length}" + CRLF + CRLF
    head.getBytes(ISO_8859_1) ++ payload
  }

  private def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val head = ("WARC/1.1" + CRLF) +
      (headers :+ ("Content-Length" -> body.length.toString))
        .map { case (k, v) => s"$k: $v$CRLF" }.mkString + CRLF
    head.getBytes(ISO_8859_1) ++ body ++ (CRLF + CRLF).getBytes(ISO_8859_1)
  }

  private def responseRecord(id: Long, text: String): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:doc$id>",
      "WARC-Date" -> warcDate,
      "WARC-Target-URI" -> targetUri(id),
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse(text.getBytes(UTF_8)))

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

  /** Deterministic WARC file over (doc_id, text) pages: warcinfo + one
    * response record per page, optionally gzip'd per record. */
  def buildFile(fileId: Long, pages: Seq[(Long, String)], gzipPerRecord: Boolean): Array[Byte] = {
    val recs = warcinfoRecord(fileId) +: pages.map { case (id, t) => responseRecord(id, t) }
    val framed = if (gzipPerRecord) recs.map(gzipMember) else recs
    val out = new ByteArrayOutputStream()
    framed.foreach(out.write)
    out.toByteArray
  }

  final case class ParsedResponse(url: String, date: String, status: Int,
                                  contentType: String, payload: Array[Byte])

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    // GZIPInputStream reads concatenated members transparently — exactly
    // the multi-member .warc.gz framing.
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

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

  /** Walk all records in a WARC file (plain or per-record-gzip'd); returns
    * the HTTP response records only (warcinfo/request records are framing).
    * Malformed framing throws a named error — contained per-file upstream. */
  def parse(bytes: Array[Byte]): Seq[ParsedResponse] = {
    val plain =
      if (bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte)
        gunzipAll(bytes)
      else bytes
    val out = Seq.newBuilder[ParsedResponse]
    var pos = 0
    while (pos < plain.length) {
      val hdrEnd = indexOfCrlfCrlf(plain, pos)
      require(hdrEnd >= 0, s"WARC record at offset $pos has no header terminator")
      val head = new String(plain, pos, hdrEnd - pos, ISO_8859_1)
      require(head.startsWith("WARC/"), s"not a WARC record at offset $pos")
      val headers = parseHeaders(head)
      val len = headers.getOrElse("Content-Length",
        sys.error(s"WARC record at offset $pos lacks Content-Length")).toInt
      val bodyStart = hdrEnd + 4
      require(bodyStart + len + 4 <= plain.length,
        s"WARC record at offset $pos truncated (need $len body bytes)")
      if (headers.get("WARC-Type").contains("response")) {
        val body = java.util.Arrays.copyOfRange(plain, bodyStart, bodyStart + len)
        val httpHdrEnd = indexOfCrlfCrlf(body, 0)
        require(httpHdrEnd >= 0, "HTTP response block has no header terminator")
        val httpHead = new String(body, 0, httpHdrEnd, ISO_8859_1)
        val statusLine = httpHead.split(CRLF).head
        val status = statusLine.split(" ")(1).toInt
        val httpHeaders = parseHeaders(httpHead)
        out += ParsedResponse(
          url = headers.getOrElse("WARC-Target-URI", ""),
          date = headers.getOrElse("WARC-Date", ""),
          status = status,
          contentType = httpHeaders.getOrElse("Content-Type", ""),
          payload = java.util.Arrays.copyOfRange(body, httpHdrEnd + 4, body.length))
      }
      pos = bodyStart + len + 4
    }
    out.result()
  }

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
}
