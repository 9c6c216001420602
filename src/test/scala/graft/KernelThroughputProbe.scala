package graft

import graft.extract.Extractor
import graft.fixtures._
import graft.serialize._

/** Single-threaded per-format kernel throughput probe (no Spark): feeds
  * BENCH/BASELINE.md §2's per-format table. Run with
  * `sbt -batch "Test/runMain graft.KernelThroughputProbe"`. */
object KernelThroughputProbe {
  def main(args: Array[String]): Unit = {
    val texts = (0 until 500).map { i =>
      (0 until (30 + i % 60)).map(j => s"word${(i * 131 + j * 7) % 997}").mkString(" ")
    }
    val parasOf = texts.map(HtmlTemplates.paragraphize)

    def probe(name: String, gen: Int => Array[Byte]): Unit = {
      val payloads = (0 until 500).map(gen)
      payloads.foreach(Extractor.extractTextOrEmpty) // JIT warmup
      val reps = 4
      val t0 = System.nanoTime()
      var bytes = 0L
      for (_ <- 0 until reps; p <- payloads) {
        Extractor.extractTextOrEmpty(p); bytes += p.length
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-5s ${500.0 * reps / sec}%8.0f docs/s ${bytes / 1e6 / sec}%6.1f MB/s")
    }

    import LegacyOfficeWriters.{DocWriter, PptWriter, XlsWriter}
    probe("html", i => HtmlTemplates.encode(0, (m, e) => HtmlTemplates.render(i % 7, i, parasOf(i), m, e)))
    probe("pdf", i => PdfWriter.generate(parasOf(i), i % PdfWriter.numVariants))
    probe("docx", i => DocxWriter.generate(parasOf(i), i % DocxWriter.numVariants))
    probe("pptx", i => PptxWriter.generate(parasOf(i), i % PptxWriter.numVariants))
    probe("xlsx", i => XlsxWriter.generate(parasOf(i), (i % 2) * 2))
    probe("odt", i => OdfWriter.generate("odt", parasOf(i), i % 3))
    probe("ods", i => OdfWriter.generate("ods", parasOf(i), i % 3))
    probe("rtf", i => RtfWriter.generate(parasOf(i), i % RtfWriter.numVariants))
    probe("epub", i => EpubWriter.generate(parasOf(i), i % EpubWriter.numVariants))
    probe("fodt", i => OdfWriter.generateFlat("odt", parasOf(i), i % 3))
    probe("doc", i => DocWriter.generate(parasOf(i), i % DocWriter.numVariants))
    probe("xls", i => XlsWriter.generate(parasOf(i),
      XlsWriter.verbatimVariants(i % XlsWriter.verbatimVariants.length)))
    probe("ppt", i => PptWriter.generate(parasOf(i), i % PptWriter.numVariants))
    probe("pub", i => LegacyOfficeWriters.PubWriter.generate(
      parasOf(i), i % LegacyOfficeWriters.PubWriter.numVariants))
  }
}
