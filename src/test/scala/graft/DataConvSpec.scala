package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dataconv.{FormatCodecs, VersionMappers}

/** Structured-data conversion semantics vs the reference
  * (/root/reference/versionMappers.js, /root/reference/formatParsers.js,
  * authoritative server copy /root/reference/server.py:91-219). */
class DataConvSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("normalizeBoolean matrix matches the reference truth table") {
    // versionMappers.js:1-11 — '1'/'true'/'yes'/'active' (trim+lower) are
    // true; everything else false
    val in = Seq("1", "true", "yes", "active", " TRUE ", " Active", "0",
      "false", "no", "inactive", "", "maybe", "2")
    val out = in.toDF("s").select(VersionMappers.normalizeBoolean(col("s")).as("b"))
      .as[Boolean].collect().toSeq
    assert(out == Seq(true, true, true, true, true, true, false, false,
      false, false, false, false, false))
  }

  test("splitFullName semantics: multi-space, single-token, empty") {
    val in = Seq("Ada Lovelace", "Grace  Brewster   Murray Hopper", "Plato", "  ", "")
    val out = in.toDF("n").select(
      VersionMappers.splitFirst(col("n")).as("f"),
      VersionMappers.splitLast(col("n")).as("l"))
      .as[(String, String)].collect().toSeq
    assert(out == Seq(
      ("Ada", "Lovelace"),
      ("Grace", "Brewster Murray Hopper"), // \s+ split, re-joined single-space
      ("Plato", ""),
      ("", ""), ("", "")))
  }

  test("v1 -> canonical -> v1 is the identity on well-formed records") {
    val v1 = Seq(("Ada", "Lovelace", "ada@example.com", "1843-12-10", "true"))
      .toDF("first_name", "last_name", "email", "created_at", "active")
    val back = VersionMappers.mapVersion(
      VersionMappers.mapVersion(v1, "v1", "v3"), "v3", "v1")
    val r = back.as[(String, String, String, String, Boolean)].head()
    assert(r == (("Ada", "Lovelace", "ada@example.com", "1843-12-10", true)))
  }

  test("v2 mapping is documented-lossy: name re-split and status re-encode") {
    // A middle name survives v1->v2->v1 only as part of last_name
    val v1 = Seq(("Grace", "Brewster Murray Hopper", "g@x.com", "1906-12-09", "yes"))
      .toDF("first_name", "last_name", "email", "created_at", "active")
    val round = VersionMappers.mapVersion(
      VersionMappers.mapVersion(v1, "v1", "v2"), "v2", "v1")
    val r = round.as[(String, String, String, String, Boolean)].head()
    assert(r._1 == "Grace" && r._2 == "Brewster Murray Hopper" && r._5)
  }

  test("keyvalue parse: first-= split, comment/blank/bare-line skip, trims") {
    // formatParsers.js:93-113 semantics
    val doc = "# comment\n\n key = a=b=c \nbare line\nx=1\n  # indented comment\ny =  spaced  "
    val m = Seq(doc).toDF("d").select(FormatCodecs.parseKeyValue(col("d")).as("m"))
      .select(map_entries(col("m")).as("e"))
      .as[Seq[(String, String)]].head()
    assert(m == Seq("key" -> "a=b=c", "x" -> "1", "y" -> "spaced"))
  }

  test("csv escape/parse round-trip preserves quotes, commas, doubled quotes") {
    val vals = Seq(("""plain""", """with,comma""", """say "hi", ok"""))
      .toDF("a", "b", "c")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a STRING, b STRING, c STRING")
    val r = vals.select(FormatCodecs.parseCsvLine(
        FormatCodecs.toCsvLine(col("a"), col("b"), col("c")), schema).as("r"))
      .select("r.a", "r.b", "r.c").as[(String, String, String)].head()
    assert(r == (("plain", "with,comma", """say "hi", ok""")))
  }

  test("csv serialize quotes exactly the reference's char class") {
    // csvEscape (formatParsers.js:33-39): quote iff value has " , or \n
    val line = Seq(("a b", "c,d", "e\"f", "g\nh")).toDF("w", "x", "y", "z")
      .select(FormatCodecs.toCsvLine(col("w"), col("x"), col("y"), col("z")).as("l"))
      .as[String].head()
    assert(line == "a b,\"c,d\",\"e\"\"f\",\"g\nh\"")
  }

  test("headerUnion is sorted (server.py:132 authority over JS first-seen)") {
    val df = Seq(Map("b" -> "1", "a" -> "2"), Map("c" -> "3", "a" -> "4"))
      .toDF("m")
    assert(FormatCodecs.headerUnion(df, "m") == Seq("a", "b", "c"))
  }

  test("keyvalue stringify round-trips through parse") {
    val m = Map("host" -> "a.example.org", "port" -> "8080", "path" -> "/x=y")
    val doc = Seq(m).toDF("m")
      .select(FormatCodecs.stringifyKeyValue(col("m")).as("d")).as[String].head()
    val back = Seq(doc).toDF("d")
      .select(FormatCodecs.parseKeyValue(col("d")).as("m"))
      .select(map_entries(col("m")).as("e")).as[Seq[(String, String)]].head()
    assert(back.toMap == m)
  }

  test("binary split/merge round-trips payloads including multi-byte UTF-8 and empty") {
    val rows = Seq(
      (1L, "x" * 1000),          // 4 parts at 256
      (2L, "中文字符" * 200),     // multi-byte: chunk at byte boundaries, merge restores
      (3L, ""),                  // empty -> one empty part
      (4L, "short"))
      .toDF("doc_id", "text").select(col("doc_id"), col("text").cast("binary").as("payload"))
    val merged = graft.dataconv.FileChunks.merge(
        graft.dataconv.FileChunks.split(rows, "doc_id", "payload", 256))
      .select(col("id"), col("n_parts"), col("merged").cast("string").as("t"))
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(merged.map(_._2) == Seq(4, 10, 1, 1)) // 中文字符 = 12 bytes * 200 = 2400 -> 10
    assert(merged.map(_._3) == Seq("x" * 1000, "中文字符" * 200, "", "short"))
  }

  test("K7 sample maps to the reference's v2 output") {
    val v2 = VersionMappers.mapVersion(FormatCodecs.sampleV1(spark), "v1", "v2")
      .as[(String, String, String, String)].collect().toSeq.sorted
    assert(v2 == Seq(
      ("Ada Lovelace", "ada@example.com", "1843-12-10", "active"),
      ("Alan Turing", "alan@example.com", "1936-06-01", "inactive")))
  }
}
