package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.{LangId, TextAnalysis}
import graft.multimodal.Multimodal

/** Pure-kernel tests for text analysis, language ID, and multimodal stubs. */
class TextOpsSpec extends AnyFunSuite {

  test("langid detects real-language samples") {
    assert(LangId.detect("the quick brown fox jumped over the lazy dog and it was fine")._1 == "en")
    assert(LangId.detect("le chat est dans la maison et il mange pas avec les autres")._1 == "fr")
    assert(LangId.detect("el perro está en la casa pero no come con los otros animales")._1 == "es")
    assert(LangId.detect("der Hund ist nicht mit der Katze und sie sind im Garten")._1 == "de")
    assert(LangId.detect("这是一个中文句子，用来测试语言识别。")._1 == "zh")
    assert(LangId.detect("")._1 == "und")
    assert(LangId.detect("12345 67890 !!!")._1 == "und")
  }

  test("rolling fingerprint is deterministic and insensitive to distant edits") {
    val base = Array.tabulate(200)(i => s"w${i % 37}q${(i * 7) % 11}").mkString(" ")
    val fp1 = TextAnalysis.rollingFingerprint(base)
    val fp2 = TextAnalysis.rollingFingerprint(base)
    assert(fp1 == fp2 && fp1 != 0L)
    // appending junk far from the minimizing window usually keeps the min;
    // at minimum the function stays total and deterministic
    val edited = base + " zzz zzz zzz"
    assert(TextAnalysis.rollingFingerprint(edited) == TextAnalysis.rollingFingerprint(edited))
    // different docs get different fingerprints
    assert(TextAnalysis.rollingFingerprint("alpha beta gamma delta epsilon zeta eta theta iota") != fp1)
  }

  test("simhash: near-duplicates land within hamming 3, unrelated far apart") {
    import graft.dedup.Dedup.simhash64
    val doc = Array.tabulate(120)(i => s"tok${(i * 13) % 53}").mkString(" ")
    val nearDup = doc.split(' ').zipWithIndex.collect { case (w, i) if i != 60 => w }.mkString(" ")
    val other = Array.tabulate(120)(i => s"else${(i * 17) % 47}").mkString(" ")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(simhash64(doc), simhash64(doc)) == 0)
    assert(hamming(simhash64(doc), simhash64(nearDup)) <= 3)
    assert(hamming(simhash64(doc), simhash64(other)) > 10)
  }

  test("minhash signature estimates jaccard within 0.15") {
    import graft.dedup.Dedup.{minhashSignature, minhashPerms}
    val a = (0 until 200).map(i => s"sh$i").toSet
    val b = (50 until 250).map(i => s"sh$i").toSet // true jaccard = 150/250 = 0.6
    val sa = minhashSignature(a)
    val sb = minhashSignature(b)
    val est = (0 until minhashPerms).count(i => sa(i) == sb(i)).toDouble / minhashPerms
    assert(math.abs(est - 0.6) < 0.15, s"estimate $est")
  }

  test("media sniffing by magic bytes") {
    assert(Multimodal.sniffMedia(Array(0x89.toByte, 'P', 'N', 'G')) == "image/png")
    assert(Multimodal.sniffMedia(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)) == "image/jpeg")
    assert(Multimodal.sniffMedia("GIF89a".getBytes) == "image/gif")
    assert(Multimodal.sniffMedia("RIFFxxxxWAVE".getBytes) == "audio/wav")
    assert(Multimodal.sniffMedia("RIFFxxxxAVI ".getBytes) == "audio/riff")
    assert(Multimodal.sniffMedia("BMxxxx".getBytes) == "image/bmp")
    assert(Multimodal.sniffMedia("P6\n2 2\n255\n".getBytes) == "image/x-portable-pixmap")
    assert(Multimodal.sniffMedia("%PDF-1.4".getBytes) == "application/pdf")
    assert(Multimodal.sniffMedia("<!DOCTYPE html>".getBytes) == "text/html")
    assert(Multimodal.sniffMedia(Array[Byte](0, 1, 2, 3)) == "application/octet-stream")
  }

  test("fake decode is deterministic and total on empty payloads") {
    val (w1, h1, f1, feat1) = Multimodal.fakeDecode("payload".getBytes)
    val (w2, h2, f2, feat2) = Multimodal.fakeDecode("payload".getBytes)
    assert((w1, h1, f1) == ((w2, h2, f2)) && feat1.sameElements(feat2))
    val (we, he, fe, _) = Multimodal.fakeDecode(Array.emptyByteArray)
    assert(we >= 64 && he >= 64 && fe >= 1)
  }
}
