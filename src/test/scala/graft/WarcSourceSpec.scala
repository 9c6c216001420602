package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcSource

/** WARC writer/parser contract: framing, per-record gzip, containment. */
class WarcSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val pages = Seq(3L -> "hello warc", 4L -> "second page with more text",
    5L -> "unicode éè€ payload")

  test("plain WARC round trip: responses only, in order, exact payload bytes") {
    val bytes = WarcSource.buildFile(0L, pages, gzipPerRecord = false)
    val parsed = WarcSource.parse(bytes)
    assert(parsed.length === 3) // warcinfo record is framing, not surfaced
    parsed.zip(pages).foreach { case (r, (id, text)) =>
      assert(r.url === s"https://example.com/doc$id")
      assert(r.status === 200)
      assert(r.contentType === WarcSource.responseContentType)
      assert(r.date === WarcSource.warcDate)
      assert(r.payload.toSeq === text.getBytes(UTF_8).toSeq)
    }
  }

  test("per-record gzip framing parses identically (multi-member stream)") {
    val plain = WarcSource.parse(WarcSource.buildFile(1L, pages, gzipPerRecord = false))
    val gz = WarcSource.parse(WarcSource.buildFile(1L, pages, gzipPerRecord = true))
    assert(gz.map(r => (r.url, r.status, r.payload.toSeq)) ===
      plain.map(r => (r.url, r.status, r.payload.toSeq)))
  }

  test("truncated and malformed files fail with named errors, never wrong output") {
    val bytes = WarcSource.buildFile(0L, pages, gzipPerRecord = false)
    val e1 = intercept[IllegalArgumentException] {
      WarcSource.parse(bytes.take(bytes.length - 10))
    }
    assert(e1.getMessage.contains("truncated"))
    val e2 = intercept[IllegalArgumentException] {
      WarcSource.parse("GARBAGE\r\nnot: warc\r\n\r\nbody".getBytes(UTF_8))
    }
    assert(e2.getMessage.contains("not a WARC record"))
  }

  test("malformed HTTP status line / Content-Length / trailer are NAMED errors") {
    def respond(statusLine: String, contentLength: String): Array[Byte] = {
      val http = statusLine + "\r\nContent-Type: text/plain\r\n\r\nbody"
      val head = "WARC/1.1\r\nWARC-Type: response\r\n" +
        s"Content-Length: ${if (contentLength == null) http.length.toString else contentLength}\r\n\r\n"
      (head + http + "\r\n\r\n").getBytes(UTF_8)
    }
    val e1 = intercept[IllegalArgumentException] {
      WarcSource.parse(respond("HTTP/1.1", null)) // no status code token
    }
    assert(e1.getMessage.contains("malformed HTTP status line"))
    val e2 = intercept[IllegalArgumentException] {
      WarcSource.parse(respond("HTTP/1.1 OK 200", null)) // non-numeric code
    }
    assert(e2.getMessage.contains("malformed HTTP status line"))
    val e3 = intercept[IllegalArgumentException] {
      WarcSource.parse(
        "WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 12abc\r\n\r\n".getBytes(UTF_8))
    }
    assert(e3.getMessage.contains("malformed WARC Content-Length"))
    // a record whose 4 trailer bytes are not CRLFCRLF (next record's data
    // would silently misalign): body 'abcd' followed by 'XXXX'
    val e4 = intercept[IllegalArgumentException] {
      WarcSource.parse(
        "WARC/1.1\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcdXXXX".getBytes(UTF_8))
    }
    assert(e4.getMessage.contains("trailer is not CRLFCRLF"))
  }

  test("parseStream walks records incrementally — one record of memory, not the file") {
    // build 200 records, stream them off a one-byte-at-a-time InputStream
    // (the adversarial read() shape), and confirm lazy per-record iteration
    val many = (0L until 200L).map(i => i -> s"payload $i")
    val bytes = WarcSource.buildFile(9L, many, gzipPerRecord = true)
    val trickle = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(bytes)
      override def read(): Int = in.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        in.read(b, off, math.min(len, 7)) // tiny reads force refill paths
    }
    val it = WarcSource.parseStream(trickle)
    val first = it.next() // records surface before the stream is consumed
    assert(first.url === "https://example.com/doc0")
    assert(it.toSeq.length === 199)
  }

  test("extractFromWarcFiles streams segments; a rotten file is ONE failure row, not a dead job") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warcfiles").toFile
    val paras = Vector("alpha bravo charlie delta echo", "foxtrot golf hotel india juliet")
    val pages = (0 until 20).map { i =>
      (s"https://ex.com/d$i", graft.serialize.DocxWriter.generate(paras, 0))
    }
    val good = new java.io.File(dir, "seg1.warc.gz")
    java.nio.file.Files.write(good.toPath,
      WarcSource.buildBinaryFile(1, pages, gzipPerRecord = true))
    // same content, last gzip member truncated mid-trailer: records BEFORE
    // the cut must still extract, then exactly one contained failure row
    val full = WarcSource.buildBinaryFile(2, pages, gzipPerRecord = true)
    val bad = new java.io.File(dir, "seg2.warc.gz")
    java.nio.file.Files.write(bad.toPath, full.take(full.length - 7))
    val out = WarcSource.extractFromWarcFiles(
      spark, Seq(good, bad).map(_.getAbsolutePath)).collect()
    val (ok, failed) = out.partition(_.success)
    assert(ok.length >= 20, s"good-segment records missing: ${ok.length}")
    assert(ok.forall(r => r.format_from == "docx" && r.text == paras.mkString("\n")),
      ok.map(r => (r.format_from, r.text)).take(2).mkString)
    assert(failed.length === 1, failed.mkString("\n"))
    assert(failed.head.url.endsWith("seg2.warc.gz") && failed.head.format_from == "warc" &&
      failed.head.error.contains("WARC segment unreadable"), failed.head.toString)
  }

  test("roundTrip surfaces every doc once with the parsed fields recomputable from text") {
    import spark.implicits._
    val docs = (0L until 120L).map(i => (i, s"document $i body " + ("x" * (i % 7).toInt)))
      .toDF("doc_id", "text")
    val out = WarcSource.roundTrip(docs)
      .as[(Long, String, Int, String, Long, String)].collect().sortBy(_._1)
    assert(out.length === 120)
    out.foreach { case (id, url, status, mime, octets, md5) =>
      val text = s"document $id body " + ("x" * (id % 7).toInt)
      assert(url === s"https://example.com/doc$id")
      assert(status === 200 && mime === WarcSource.responseContentType)
      assert(octets === text.getBytes(UTF_8).length.toLong)
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes(UTF_8)).map(b => f"$b%02x").mkString
      assert(md5 === expect)
    }
  }
}
