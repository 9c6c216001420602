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
