package graft

import org.apache.spark.sql.functions.{col, lit, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.WebCuration

/** Hand-computed semantics for the web-curation tier (the oracle compare
  * proves Spark==DuckDB at corpus scale; these pin the intended meaning on
  * inputs small enough to verify by eye). */
class WebCurationSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("lineCorpus chunks 10 words per line and injects header/footer/dups by id") {
    val words12 = (1 to 12).map(i => s"w$i").mkString(" ")
    // id 0: even -> header, %3==0 -> footer, %7==0 -> first two lines repeated
    val out = WebCuration.lineCorpus(Seq((0L, words12)).toDF("doc_id", "text"))
      .as[(Long, Seq[String])].collect().head._2
    val l1 = (1 to 10).map(i => s"w$i").mkString(" ")
    val l2 = "w11 w12"
    assert(out === Seq(WebCuration.headerLine, l1, l2, WebCuration.footerLine,
      WebCuration.headerLine, l1))
    // id 1: odd, %3!=0, %7!=0 -> content lines only
    val plain = WebCuration.lineCorpus(Seq((1L, words12)).toDF("doc_id", "text"))
      .as[(Long, Seq[String])].collect().head._2
    assert(plain === Seq(l1, l2))
  }

  test("lineCorpus chunk boundaries: 1, 9, 10, 11 and 20 words (regex pass edges)") {
    def linesOf(n: Int): Seq[String] = {
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      WebCuration.lineCorpus(Seq((1L, text)).toDF("doc_id", "text"))
        .as[(Long, Seq[String])].collect().head._2
    }
    assert(linesOf(1) === Seq("w1"))
    assert(linesOf(9) === Seq((1 to 9).map(i => s"w$i").mkString(" ")))
    assert(linesOf(10) === Seq((1 to 10).map(i => s"w$i").mkString(" ")))
    assert(linesOf(11) === Seq((1 to 10).map(i => s"w$i").mkString(" "), "w11"))
    assert(linesOf(20) === Seq((1 to 10).map(i => s"w$i").mkString(" "),
      (11 to 20).map(i => s"w$i").mkString(" ")))
    // empty text stays a single empty line (matches the oracle's ceil(1/10))
    val empty = WebCuration.lineCorpus(Seq((1L, "")).toDF("doc_id", "text"))
      .as[(Long, Seq[String])].collect().head._2
    assert(empty === Seq(""))
  }

  test("c4Filter keeps terminal-punct lines of >=5 words sans javascript; drops lorem/brace docs") {
    val df = Seq(
      (1L, Seq("one two three four five.", "has javascript one two three.",
        "short line.", "no terminal punct here at all")),
      (2L, Seq("contains lorem ipsum one two three.", "fine line one two three.")),
      (3L, Seq("open brace one two { three.", "fine line one two three.")),
      (4L, Seq("nothing survives here"))
    ).toDF("doc_id", "ls")
    val out = WebCuration.c4Filter(df)
      .as[(Long, Int, Int, Boolean, Option[String])].collect().sortBy(_._1)
    assert(out(0) === ((1L, 4, 1, true, Some(md5Hex("one two three four five.")))))
    assert(out(1)._4 === false && out(1)._5.isEmpty) // lorem ipsum doc dropped
    assert(out(2)._4 === false)                      // brace doc dropped
    assert(out(3)._4 === false)                      // zero survivors -> dropped
  }

  test("gopherQuality integer rules: word count, mean word length, stopwords, alpha ratio") {
    // 25 words, all 4-char alpha, two stopwords -> passes everything
    val good = (("this that" +: Seq.fill(23)("word")).mkString(" "), 1L)
    // 24 words -> fails rule_wordcount only
    val short = (("this that" +: Seq.fill(22)("word")).mkString(" "), 2L)
    // numeric words -> fails alpha (0 alpha words) and stopwords
    val nums = (Seq.fill(30)("1234").mkString(" "), 3L)
    val df = Seq(good, short, nums).map(_.swap).toDF("doc_id", "text")
    val out = WebCuration.gopherQuality(df)
      .as[(Long, Int, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) === ((1L, 25, true, true, true, true, true)))
    assert(out(1) === ((2L, 24, false, true, true, true, false)))
    assert(out(2) === ((3L, 30, true, true, false, false, false)))
  }

  test("repetitionStats counts duplicate lines/chars and the hottest 2-gram") {
    // doc_id 7 (%7==0): lineCorpus appends the first two lines again; with a
    // single 5-word line the appended slice is that one line -> 2 lines, 1
    // distinct. text "a b a b a": 2-grams [a b, b a, a b, b a] -> top 2.
    val docs = Seq((7L, "a b a b a")).toDF("doc_id", "text")
    val out = WebCuration.repetitionStats(docs)
      .as[(Long, Int, Int, Int, Int)].collect().head
    assert(out === ((7L, 2, 1, 9, 2)))
    // doc_id 1 (no injections): 1 line, nothing duplicated, every gram once
    val plain = WebCuration.repetitionStats(
      Seq((1L, "one two three four")).toDF("doc_id", "text"))
      .as[(Long, Int, Int, Int, Int)].collect().head
    assert(plain === ((1L, 1, 0, 0, 1)))
    // single word: no 2-gram exists -> 0 (the n >= 2 guard)
    val single = WebCuration.repetitionStats(Seq((1L, "solo")).toDF("doc_id", "text"))
      .as[(Long, Int, Int, Int, Int)].collect().head
    assert(single._5 === 0)
  }

  test("top-2-gram run-length fold equals the quadratic form and survives 100k words") {
    // equality vs the O(n²) distinct×filter definition on a mixed sample
    val texts = Seq(
      "a b a b a", "x x x x x x", "one two three two three two",
      "a a b b a a", "p q r s t u v w")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong * 2 + 1, t) }
      .toDF("doc_id", "text")
    val got = WebCuration.repetitionStats(docs)
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1).map(_._5).toSeq
    def naiveTop2(t: String): Int = {
      val ws = t.split(" ")
      if (ws.length < 2) 0
      else ws.sliding(2).map(_.mkString(" ")).toSeq.groupBy(identity).values.map(_.size).max
    }
    assert(got === texts.map(naiveTop2))
    // scale guard: a 100k-word document with ~all-distinct 2-grams is the
    // adversarial input for the quadratic form (~10^10 comparisons); the
    // sorted fold completes in seconds. Gopher's wordcount rule ADMITS such
    // documents, so the funnel must too.
    val big = (1 to 100000).map(i => s"w$i").mkString(" ")
    val bigOut = WebCuration.repetitionStats(Seq((1L, big)).toDF("doc_id", "text"))
      .as[(Long, Int, Int, Int, Int)].collect().head
    assert(bigOut._5 === 1) // every 2-gram distinct
    // and through the FUNNEL, on a 100k-word doc that passes gopher+c4 so
    // the repetition stage (the previously-quadratic expression) really runs
    val bigKept = (1 to 100000)
      .map(i => if (i % 50 == 0) "this" else if (i % 50 == 25) "that" else s"w$i")
      .mkString(" ")
    val funnelBig = WebCuration.funnel(Seq((1L, bigKept)).toDF("doc_id", "text"))
      .select("doc_id", "stage").as[(Long, String)].collect().head
    assert(funnelBig._2 === "kept")
  }

  test("corpusLineDedup removes lines with global df > max and drops hollowed docs") {
    val hot = "boilerplate everywhere"
    val rows = (1L to 6L).map(i => (i, Seq(hot, s"unique $i"))) :+ (7L, Seq(hot))
    val out = WebCuration.corpusLineDedup(rows.toDF("doc_id", "ls"), maxGlobal = 4)
      .as[(Long, Int, Int, String, Int)].collect().sortBy(_._1)
    assert(out.map(_._1) === (1L to 6L)) // doc 7 lost every line -> dropped
    out.foreach { case (id, nLines, keptCt, keptMd5, removedCt) =>
      assert(nLines === 2 && keptCt === 1 && removedCt === 1)
      assert(keptMd5 === md5Hex(s"unique $id"))
    }
  }

  test("corpusLineDedup keeps lines at exactly the df threshold") {
    val rows = (1L to 4L).map(i => (i, Seq("shared", s"unique $i")))
    val out = WebCuration.corpusLineDedup(rows.toDF("doc_id", "ls"), maxGlobal = 4)
      .as[(Long, Int, Int, String, Int)].collect()
    assert(out.forall(r => r._3 == 2 && r._5 == 0)) // df=4 <= max -> kept
  }

  test("piiScrub counts on the original text and replaces email -> ip -> phone") {
    val t = "mail a@b.com and c.d@e.org ip 10.0.0.1 call 555-123-4567 end"
    val out = WebCuration.piiScrub(Seq((1L, t)).toDF("doc_id", "text"))
      .as[(Long, Int, Int, Int, String)].collect().head
    val expected = "mail <EMAIL> and <EMAIL> ip <IP> call <PHONE> end"
    assert(out === ((1L, 2, 1, 1, md5Hex(expected))))
  }

  test("canonicalizeUrl lowercases, strips fragment, default port, trailing slash") {
    val df = Seq("HTTP://Host.Example.COM:80/p/1#frag", "http://host.example.com/p/1/")
      .toDF("u").select(WebCuration.canonicalizeUrl(col("u")).as("c"))
    assert(df.as[String].collect().toSeq ===
      Seq("http://host.example.com/p/1", "http://host.example.com/p/1"))
  }

  test("canonicalizeUrl strips :80 only at the authority, never inside path/query") {
    val df = Seq(
      "http://h.com/redirect?to=evil.com:80/x", // ':80/' in the query survives
      "http://h.com:80",                        // port at end-of-authority, no path
      "https://h.com:8080/a"                    // different port survives
    ).toDF("u").select(WebCuration.canonicalizeUrl(col("u")).as("c"))
    assert(df.as[String].collect().toSeq === Seq(
      "http://h.com/redirect?to=evil.com:80/x",
      "http://h.com",
      "https://h.com:8080/a"))
  }

  test("urlDedupLatest folds canonical variants and keeps the newest snapshot") {
    val raws = Seq(
      ("HTTP://A.COM:80/x#f", 10L), ("http://a.com/x/", 20L), ("http://a.com/x", 15L),
      ("http://b.com/y", 1L)
    ).toDF("url", "ts")
    val out = WebCuration.urlDedupLatest(raws)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out === Seq(("http://a.com/x", 3L, 20L), ("http://b.com/y", 1L, 1L)))
  }

  test("tokenBudgetMix keeps docs while the pre-doc cumulative stays under budget") {
    // All same lang, ONE shard; md5-content order is deterministic but
    // opaque — use equal-length texts and check the budget boundary.
    val docs = Seq(
      (1L, "en", Seq.fill(10)("aaa").mkString(" ")),
      (2L, "en", Seq.fill(10)("bbb").mkString(" ")),
      (3L, "en", Seq.fill(10)("ccc").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val out = WebCuration.tokenBudgetMix(docs, budget = 15L, shards = 1)
      .as[(String, Int, Long, Int, Long)].collect()
    // budget 15: first doc (cum_before=0) and second (cum_before=10) kept,
    // third (cum_before=20) dropped — regardless of md5 order.
    assert(out.length === 2)
    assert(out.map(_._5).sorted === Seq(10L, 20L))
  }

  test("tokenBudgetMix shards the per-language window and resets the budget per shard") {
    // 64 one-word docs spread across md5-prefix shards; per-shard budget is
    // 16/4 = 4 tokens, so each (lang, shard) group keeps exactly 4 docs.
    val docs = (1L to 64L).map(i => (i, "en", s"tok$i")).toDF("doc_id", "lang", "text")
    val out = WebCuration.tokenBudgetMix(docs, budget = 16L, shards = 4)
      .as[(String, Int, Long, Int, Long)].collect()
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.size > 1, s"expected >1 shard, got ${byShard.keySet}")
    // expected per-shard keeps, computed independently: the first md5 hex
    // DIGIT'S VALUE mod 4 (not its ASCII code — 'a' is 10, not 97), each
    // kept doc contributes 1 token to a 4-token per-shard budget
    val shardSizes = (1L to 64L)
      .groupBy(i => Integer.parseInt(md5Hex(s"tok$i").head.toString, 16) % 4)
      .map { case (s, g) => s -> math.min(4, g.size) }
    byShard.foreach { case (shard, rows) =>
      assert(rows.length === shardSizes(shard), s"shard $shard kept ${rows.length}")
      // cumulative restarts inside each shard
      assert(rows.map(_._5).max === rows.length.toLong,
        s"shard $shard cum ${rows.map(_._5).toSeq}")
    }
    // the window partitions on (lang, shard) — no single task owns a language
    val plan = WebCuration.tokenBudgetMix(docs, budget = 16L, shards = 4)
      .queryExecution.optimizedPlan.toString
    val windowLine = plan.linesIterator.find(_.contains("windowspecdefinition")).getOrElse("")
    assert(windowLine.contains("lang") && windowLine.contains("shard"), windowLine)
    // at shards = 16 every hex digit maps to its OWN shard — the ASCII-code
    // form this replaced left shards 10-15 permanently empty (budget
    // silently forfeited) because hex ASCII residues only cover 0-9 ∪ 1-6
    val out16 = WebCuration.tokenBudgetMix(docs, budget = 1600L, shards = 16)
      .as[(String, Int, Long, Int, Long)].collect()
    val hit = out16.map(_._2).toSet
    val expected = (1L to 64L)
      .map(i => Integer.parseInt(md5Hex(s"tok$i").head.toString, 16)).toSet
    assert(hit == expected, s"shards hit $hit vs hex digits present $expected")
    assert(hit.exists(_ > 9), "high shards (hex a-f) must be reachable")
  }

  test("funnel attributes each doc to its first failing stage and digests survivors") {
    // 30 words: two stopwords + 28 distinct 4-char words -> passes gopher
    // exactly (word_chars = 4n) with every 2-gram unique (top2 = 1).
    val text30 = ("this that" +: (1 to 28).map(i => f"wd$i%02d")).mkString(" ")
    val docs = Seq(
      (1L, (1 to 10).map(i => f"wd$i%02d").mkString(" ")), // 10 words -> gopher
      (13L, text30), // %13 -> lorem-ipsum decoration -> c4
      (7L, text30),  // %7 -> duplicated lines -> repetition
      (11L, text30)  // survives all stages
    ).toDF("doc_id", "text")
    val out = WebCuration.funnel(docs)
      .as[(Long, String, Int, Int, Option[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 === "gopher" && out(1L)._3 === 10 && out(1L)._5.isEmpty)
    assert(out(13L)._2 === "c4" && out(13L)._5.isEmpty)
    assert(out(7L)._2 === "repetition" && out(7L)._5.isEmpty)
    // doc 11: line 1 gets the javascript decoration ((11*3+1) % 17 == 0)
    // and is filtered; lines 0 and 2 survive with terminal dots.
    val l0 = ("this that" +: (1 to 8).map(i => f"wd$i%02d")).mkString(" ") + "."
    val l2 = (19 to 28).map(i => f"wd$i%02d").mkString(" ") + "."
    assert(out(11L) === ((11L, "kept", 30, 2, Some(md5Hex(l0 + "\n" + l2)))))
  }

  test("hashSampleByLang is a deterministic per-lang content-hash census") {
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "en" else "fr", s"text $i"))
      .toDF("doc_id", "lang", "text")
    val thr = when(col("lang") === "en", "80").otherwise("40")
    val out = WebCuration.hashSampleByLang(docs, thr)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._2) === Seq(50L, 50L))
    out.foreach { case (_, total, kept) => assert(kept >= 0 && kept <= total) }
    // rerun is bit-identical (content-hash, not random)
    val again = WebCuration.hashSampleByLang(docs, thr)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again === out)
  }
}
