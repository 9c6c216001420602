package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Extractor
import graft.serialize.Serialize

/** The production serialize surface: text → bytes for every format in the
  * reference's output whitelist, with extract(serialize(text, fmt)) == text
  * (for .csv via the csvToText inverse — quoting is format, not content). */
class SerializeSpec extends AnyFunSuite {

  private val samples = Seq(
    "A single short paragraph.",
    // paragraphs at realistic prose length (>= 17 words): the html arm
    // re-extracts through the published Boilerpipe rules, which classify
    // ultra-short fragments as boilerplate by design (see Serialize scaladoc)
    "First paragraph with, commas and \"quotes\" inside it, padded to the " +
      "length an actual written paragraph of prose reaches.\n" +
      "Second one has ampersands & angle fragments x > y woven through " +
      "enough words that the block classifier keeps it as body text.\n" +
      "Third: accented café naïve résumé characters stay inside the pdf " +
      "writer's Latin-1 scope while the words keep this block long enough.",
    Array.tabulate(40)(i =>
      s"Paragraph number $i of a longer document, long enough that page " +
        "and slide grouping kicks in across the serializers.").mkString("\n")
  )

  private def roundtrip(text: String, fmt: String): String = {
    val bytes = Serialize.serialize(text, fmt)
    val extracted = Extractor.extractByFormat(Extractor.sniffFormat(bytes), bytes)._2
    if (fmt == "csv") Serialize.csvToText(extracted) else extracted
  }

  test("every whitelist format round-trips byte-identically") {
    for (fmt <- Serialize.outputFormats; (text, i) <- samples.zipWithIndex) {
      val got = roundtrip(text, fmt)
      assert(got == text,
        s"round-trip failed for .$fmt on sample $i:\n--- got ---\n$got\n--- want ---\n$text")
    }
  }

  test("serialized container formats sniff as their own format") {
    val text = samples(1)
    val expect = Map(
      "pdf" -> "pdf", "rtf" -> "rtf", "doc" -> "doc", "xls" -> "xls",
      "ppt" -> "ppt", "xml" -> "fodf", "html" -> "html", "txt" -> "txt",
      "csv" -> "txt")
    for ((fmt, want) <- expect)
      assert(Extractor.sniffFormat(Serialize.serialize(text, fmt)) == want,
        s"sniff of .$fmt")
    // zip containers all sniff as the OOXML token and refine on extract
    for (fmt <- Seq("docx", "pptx", "xlsx", "odt", "odp", "ods", "epub")) {
      val bytes = Serialize.serialize(text, fmt)
      assert(Extractor.sniffFormat(bytes) == "docx", s"sniff of .$fmt")
      assert(Extractor.extractByFormat("docx", bytes)._1 == fmt, s"refined kind of .$fmt")
    }
  }

  test("empty paragraphs (trailing/blank newlines) fail named, except .txt") {
    // silently dropping the trailing empty segment would break the
    // documented byte-identical round-trip; .txt is the raw-bytes escape
    for (bad <- Seq("a\n", "a\n\nb")) {
      val e = intercept[IllegalArgumentException](Serialize.serialize(bad, "pdf"))
      assert(e.getMessage.contains("empty paragraphs"), e.getMessage)
    }
    assert(new String(Serialize.serialize("a\n", "txt"), "UTF-8") == "a\n")
  }

  test("unknown output format fails named") {
    val e = intercept[IllegalArgumentException](Serialize.serialize("x", "wpd"))
    assert(e.getMessage.contains("unsupported output format"))
  }
}
