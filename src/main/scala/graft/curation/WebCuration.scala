package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.textops.TextAnalysis

/** Web-corpus curation tier: the operations a Common-Crawl-scale
  * training-data pipeline runs AFTER extraction (reference analog: the
  * repo's pipeline stops at converted text,
  * /root/reference/src/converters/document_converters.py:84-129 — curation
  * is the downstream stage its output feeds). Every operator is a pure
  * column expression or a declared-shuffle DataFrame transform, each with
  * an exactly-mirrorable ANSI-SQL semantic so the DuckDB oracle can
  * reproduce it bit-for-bit:
  *
  *  - Gopher-style quality rules (integer cross-multiplied — no float
  *    division anywhere, so the oracle matches exactly),
  *  - C4-style line filters (terminal punctuation, min words, word
  *    blocklist; doc-level lorem-ipsum / brace drops),
  *  - within-document repetition signals (duplicate lines, top 2-gram),
  *  - corpus-level boilerplate line dedup (global line frequency),
  *  - PII scrubbing (email / IPv4 / phone — RE2-and-Java-compatible
  *    patterns only, so Spark and DuckDB agree),
  *  - deterministic hash sampling and per-language token-budget mixing.
  *
  * Scale notes (10^12 docs): everything except `corpusLineDedup` and the
  * sharded window in `tokenBudgetMix` is shuffle-free per-row work inside
  * whole-stage codegen. `corpusLineDedup` shuffles the exploded lines once
  * to count global frequencies (map-side partial agg) and once to
  * reassemble documents; the hot-line anti-join strategy is left to AQE
  * (see the method doc — the repeated-line tail of a real crawl is NOT
  * broadcast-sized). Per-document stats are O(words log words) worst case
  * (the 2-gram repetition signal sorts, then folds one run-length pass —
  * never the O(words²) distinct×filter shape).
  */
object WebCuration {

  /** Boilerplate lines the fixture layer injects (and real crawls carry):
    * frozen — oracle SQL and goldens depend on the exact strings. */
  val headerLine = "subscribe to our newsletter for updates today"
  val footerLine = "all rights reserved copyright notice applies here"

  /** Words per synthetic line when re-chunking single-spaced document text
    * into a line-structured web page. */
  val wordsPerLine = 10

  private def emptyStrArray: Column = array().cast("array<string>")

  /** Re-chunk `textCol` into lines of `wordsPerLine` words, then inject the
    * deterministic boilerplate the curation operators exist to remove:
    * header on even ids, footer on ids % 3 == 0, and (ids % 7 == 0) the
    * first two lines appended again as within-doc duplicates.
    * Output: (doc_id, ls: array<string>). Mirrored 1:1 by the oracle's
    * `linesSql` CTE in SparkEntry. */
  def lineCorpus(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      lineCorpusCol(col(idCol), col(textCol)).as("ls"))

  /** Column-level body of [[lineCorpus]] — exposed so composites (the
    * funnel) can build the line array inside a wider single-scan projection
    * instead of chaining DataFrame passes.
    *
    * Scale note: the line array is built by ONE linear regex pass (insert a
    *  sentinel after every 10th word) + one split — NOT by slicing
    * the words array per line. Higher-order functions run interpreted (no
    * whole-stage codegen for lambdas), so a per-line `slice(split(text))`
    * re-splits the WHOLE text for every line = O(words²) per document; a
    * 100k-word page (admitted by the Gopher wordcount rule) would cost
    * ~10⁹ split steps in one row. A "word" is a single-space-delimited
    * token — `[^ ]+`, NOT `\S+`, so a token carrying a tab or newline
    * counts as ONE word exactly like `split(text, " ")` and the oracle's
    * `string_split` do (`\S+` would refuse to match across the tab and
    * silently merge neighbouring groups). Precondition: text contains no
    * U+0001 (the sentinel; the corpus contract already excludes control
    * chars). */
  def lineCorpusCol(id: Column, text: Column): Column = {
    val base = split(regexp_replace(text, "((?:[^ ]+ ){9}[^ ]+) ", "$1\u0001"), "\u0001")
    val hdr = when(id % 2 === 0, array(lit(headerLine))).otherwise(emptyStrArray)
    val ftr = when(id % 3 === 0, array(lit(footerLine))).otherwise(emptyStrArray)
    val withHf = concat(hdr, base, ftr)
    when(id % 7 === 0, concat(withHf, slice(withHf, 1, 2))).otherwise(withHf)
  }

  /** C4-style per-line decorations over a `lineCorpus` output — the
    * deterministic stand-ins for the web's real noise (script fragments,
    * missing terminal punctuation, template braces, filler text). Applied
    * per (doc_id, 0-based line index i):
    *   - "javascript " prefix when (doc_id*3 + i) % 17 == 0,
    *   - " lorem ipsum" suffix on line 0 when doc_id % 13 == 0,
    *   - " {" suffix on line 1 when doc_id % 19 == 0,
    *   - terminal "." unless (doc_id + i) % 5 == 4.
    */
  def c4Decorate(lineDf: DataFrame): DataFrame =
    lineDf.select(col("doc_id"),
      c4DecorateCol(col("doc_id"), col("ls")).as("ls"))

  /** Column-level body of [[c4Decorate]] (see [[lineCorpusCol]]). */
  def c4DecorateCol(id: Column, ls: Column): Column =
    transform(ls, (line0, i) => {
      val withJs = when((id * 3 + i) % 17 === 0,
        concat(lit("javascript "), line0)).otherwise(line0)
      val withLorem = when(id % 13 === 0 && i === 0,
        concat(withJs, lit(" lorem ipsum"))).otherwise(withJs)
      val withBrace = when(id % 19 === 0 && i === 1,
        concat(withLorem, lit(" {"))).otherwise(withLorem)
      when((id + i) % 5 =!= 4, concat(withBrace, lit("."))).otherwise(withBrace)
    })

  /** The C4 line+document filter battery: a line survives iff it ends with
    * a terminal '.', has >= 5 words, and does not contain "javascript"; the
    * whole document is dropped if any line contains "lorem ipsum" or "{",
    * or if no line survives. Output per doc: n_lines, kept_lines,
    * doc_keep, kept_md5 (md5 of '\n'-joined kept lines; null when the doc
    * is dropped). Shuffle-free. */
  def c4Filter(decorated: DataFrame): DataFrame = {
    val kept = filter(col("ls"), l =>
      l.endsWith(".") && size(split(l, " ")) >= 5 && !l.contains("javascript"))
    val dropped = exists(col("ls"), l => l.contains("lorem ipsum")) ||
      exists(col("ls"), l => l.contains("{"))
    decorated.select(
      col("doc_id"),
      size(col("ls")).cast("int").as("n_lines"),
      size(kept).cast("int").as("kept_lines"),
      (!dropped && size(kept) > 0).as("doc_keep"),
      when(!dropped && size(kept) > 0,
        md5(array_join(kept, "\n").cast("binary"))).as("kept_md5"))
  }

  /** Gopher-style quality rule battery over raw document text. All rules
    * are integer cross-multiplied (mean-word-length bounds become
    * word_chars >= 4*n && word_chars <= 10*n) so the oracle reproduces
    * them exactly. Output: per-rule booleans + overall keep. */
  def gopherQuality(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val words = split(t, " ")
    val n = size(words)
    val wordChars = length(t) - (n - 1)
    val alphaCt = size(filter(words, w => w.rlike("[a-z]")))
    val stopHits = size(array_intersect(words,
      array(TextAnalysis.stopwords.map(lit): _*)))
    val ruleWc = n >= 25 && n <= 100000
    val ruleMwl = wordChars >= n * 4 && wordChars <= n * 10
    val ruleStop = stopHits >= 2
    val ruleAlpha = alphaCt * 5 >= n * 4
    docs.select(
      col(idCol).as("doc_id"),
      n.cast("int").as("n_words"),
      ruleWc.as("rule_wordcount"),
      ruleMwl.as("rule_meanwordlen"),
      ruleStop.as("rule_stopwords"),
      ruleAlpha.as("rule_alpha"),
      (ruleWc && ruleMwl && ruleStop && ruleAlpha).as("keep"))
  }

  /** Multiplicity of the most frequent word 2-gram: the grams are sorted
    * and the longest equal RUN is counted with one `aggregate` fold —
    * O(n log n) per document. (The obvious distinct×filter form is
    * O(words²): a 100k-word document — allowed by the Gopher wordcount
    * rule — would cost ~10^10 string comparisons in ONE row.) Still a pure
    * expression; the oracle's quadratic list form computes the same value
    * at oracle scale. */
  private def top2GramCount(words: Column, n: Column): Column = {
    // Grams via zip_with of the words array against its own 1-shifted
    // slice: both arrays are evaluated ONCE and the lambda touches only its
    // arguments. (The transform(sequence(…), i => element_at(words, i))
    // form re-evaluates `words` — a split of the WHOLE text — per element,
    // because higher-order functions run interpreted without
    // common-subexpression elimination: O(words²) per document.)
    val shifted = slice(words, lit(2), greatest(n - 1, lit(1)))
    val pairs = zip_with(words, shifted, (a, b) => concat(a, lit(" "), b))
    val grams = slice(pairs, lit(1), greatest(n - 1, lit(1)))
    val best = aggregate(array_sort(grams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(n >= 2, best).otherwise(lit(0))
  }

  /** Within-document repetition signals: duplicate-line count and
    * duplicated characters (occurrences past the first) over the line
    * corpus, and the multiplicity of the most frequent word 2-gram
    * ([[top2GramCount]]). The line array is built INLINE from the text
    * (same projection, like [[funnel]]) — per-document stats are
    * shuffle-free and join-free. */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val sumChars = (l: Column) => aggregate(l, lit(0), (a, x) => a + length(x))
    val id = col(idCol)
    val t = col(textCol)
    val ls = lineCorpusCol(id, t)
    val distinctLs = array_distinct(ls)
    val words = split(t, " ")
    docs.select(
      id.as("doc_id"),
      size(ls).cast("int").as("n_lines"),
      (size(ls) - size(distinctLs)).cast("int").as("dup_line_ct"),
      (sumChars(ls) - sumChars(distinctLs)).cast("int").as("dup_line_chars"),
      top2GramCount(words, size(words)).cast("int").as("top2gram_ct"))
  }

  /** Corpus-level boilerplate line dedup (the FineWeb-style pass): a line
    * occurring more than `maxGlobal` times ACROSS the corpus is boilerplate
    * and is removed from every document; documents keep their surviving
    * lines in order. Docs whose every line is boilerplate are dropped
    * (standard curation semantics).
    *
    * Shape at scale: one shuffle of the exploded lines to count global
    * frequency (map-side partial agg first), an anti-join against the hot
    * set (df > maxGlobal), then one shuffle to reassemble documents. The
    * anti-join strategy is deliberately left to AQE/size estimation: with
    * the default maxGlobal on a clean corpus the hot set is
    * boilerplate-sized and AQE broadcasts it, but a real web crawl has a
    * heavy repeated-line tail (a large fraction of crawl lines repeat ≥5
    * times at 10^12 docs), so FORCING a broadcast would OOM — callers
    * should raise `maxGlobal` with corpus size instead. No driver-side
    * state. */
  def corpusLineDedup(lineDf: DataFrame, maxGlobal: Int = 4): DataFrame = {
    val exploded = lineDf.select(col("doc_id"), size(col("ls")).as("n_lines"),
        posexplode(col("ls")).as(Seq("idx", "line")))
    val hot = exploded.groupBy("line")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxGlobal)
      .select("line")
    val kept = exploded.join(hot, Seq("line"), "left_anti")
    kept.groupBy("doc_id")
      .agg(
        first(col("n_lines")).cast("int").as("n_lines"),
        count(lit(1)).cast("int").as("kept_ct"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("line")))),
            s => s.getField("line")), "\n").cast("binary")).as("kept_md5"))
      .withColumn("removed_ct", (col("n_lines") - col("kept_ct")).cast("int"))
  }

  // RE2-and-Java-compatible PII patterns (no lookarounds, no \p classes —
  // the oracle runs them under DuckDB's RE2). Frozen.
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** The PII replacement chain (email -> ip -> phone, order is contract). */
  def scrubCol(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** PII scrub: count then replace emails, IPv4s and phone numbers with
    * typed placeholder tokens (counts are taken on the ORIGINAL text;
    * replacement order email -> ip -> phone is [[scrubCol]]'s contract).
    * Shuffle-free codegen'd regexes. */
  def piiScrub(df: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val scrubbed = scrubCol(t)
    df.select(
      col(idCol).as("doc_id"),
      regexp_count(t, lit(emailPattern)).cast("int").as("n_emails"),
      regexp_count(t, lit(ipv4Pattern)).cast("int").as("n_ips"),
      regexp_count(t, lit(phonePattern)).cast("int").as("n_phones"),
      md5(scrubbed.cast("binary")).as("scrubbed_md5"))
  }

  /** Deterministic content-hash sampling, stratified by language: a doc is
    * kept iff the first byte of md5(text) is below the per-language
    * threshold (two lowercase hex chars compare lexically == numerically).
    * Content-hash (not id-hash) sampling is reproducible across recrawls
    * of the same page. Output: per-lang total/kept counts. */
  def hashSampleByLang(docs: DataFrame, thresholdFor: Column): DataFrame = {
    val bucket = substring(md5(col("text").cast("binary")), 1, 2)
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).cast("bigint").as("total"),
        sum(when(bucket < thresholdFor, 1L).otherwise(0L)).cast("bigint").as("kept"))
  }

  /** Token-budget mixing, SHARDED for scale: documents are assigned to
    * (lang, shard) groups — shard = first md5(text) hex digit's VALUE
    * (conv base16→10) mod `shards`, deterministic and content-addressed —
    * and within each group ordered by (md5(text), doc_id); a doc is kept
    * iff the tokens accumulated BEFORE it in its shard are under the
    * per-shard budget (budget / shards). The digit's value, NOT its ASCII
    * code: hex ASCII codes are 48-57 ∪ 97-102, whose residues collide
    * ('1' and 'a' share `% 16`) and leave shards 10-15 permanently EMPTY
    * at shards=16 — an empty shard forfeits its budget slice silently.
    * The value form is uniform for any shards ≤ 16 (use two digits for
    * 256). The running-sum window partitions on (lang, shard), never on
    * lang alone: at 10^12 docs the dominant language is ~half the corpus,
    * which a lang-only window would serialize into ONE straggler task —
    * raise `shards` with corpus size. */
  def tokenBudgetMix(docs: DataFrame, budget: Long, shards: Int = 4): DataFrame = {
    require(shards >= 1 && shards <= 16 && budget % shards == 0,
      s"budget $budget must split evenly across $shards shards (1..16)")
    val n = TextAnalysis.tokenCount(col("text"))
    val h = md5(col("text").cast("binary"))
    val w = Window.partitionBy("lang", "shard")
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("lang"), col("doc_id"), n.cast("int").as("n_tokens"),
        h.as("h"),
        (conv(substring(h, 1, 1), 16, 10).cast("int") % shards).cast("int").as("shard"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast("bigint"))
      .filter(col("cum_tokens") - col("n_tokens") < budget / shards)
      .select("lang", "shard", "doc_id", "n_tokens", "cum_tokens")
  }

  /** URL canonicalization for recrawl dedup: lowercase, strip the fragment,
    * drop an explicit default port — ANCHORED to the authority
    * (scheme://host:80/ only), so a path or query segment containing
    * 'host:80/…' is untouched — and drop one trailing slash. (Simplified
    * contract: paths in this engine's corpora are lowercase-safe; a full
    * implementation lowercases only scheme+host.) Patterns are RE2-and-Java
    * compatible; the port strip is the one place a capture group is needed —
    * Spark substitutes `$1`, the DuckDB oracle mirrors with RE2's `\1`. */
  def canonicalizeUrl(u: Column): Column = {
    val lowered = lower(u)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noPort = regexp_replace(noFrag, "^([a-z][a-z0-9+.-]*://[^/]*):80(/|$)", "$1$2")
    regexp_replace(noPort, "/$", "")
  }

  /** Recrawl dedup over raw (url, ts) rows: canonicalize, keep the LATEST
    * snapshot per canonical url, and report how many raw variants folded
    * into it. One shuffle on the canonical key. */
  def urlDedupLatest(raws: DataFrame, urlCol: String = "url",
                     tsCol: String = "ts"): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol)).as("canon_url")
    val w = Window.partitionBy("canon_url").orderBy(col(tsCol).desc)
    raws.select(canon, col(tsCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_raw", count(lit(1)).over(Window.partitionBy("canon_url")))
      .filter(col("rn") === 1)
      .select(col("canon_url"), col("n_raw").cast("bigint"),
        col(tsCol).cast("bigint").as("kept_ts"))
  }

  /** The FineWeb-style curation FUNNEL as one single-scan, shuffle-free
    * query: every per-document pass composed with first-failing-stage
    * attribution, the shape a production curation run has (one pass over
    * the crawl, one verdict per doc, survivors carry their scrubbed
    * payload digest).
    *
    * Stage order (first failure names the stage):
    *   1. `gopher`     — the four Gopher quality rules on the raw text;
    *   2. `c4`         — line battery + doc drops on the decorated lines;
    *   3. `repetition` — duplicate lines on the UNdecorated line corpus or
    *                     a word 2-gram repeated more than 4 times;
    *   4. `kept`       — survivors; `kept_md5` = md5 of the PII-scrubbed
    *                     '\n'-joined C4-surviving lines.
    *
    * Everything is computed in ONE projection over the documents scan —
    * no joins, no shuffles, fully inside whole-stage codegen — which is
    * the point: at 10^12 docs the funnel costs exactly one read of the
    * corpus. (The corpus-LEVEL passes — [[corpusLineDedup]],
    * [[urlDedupLatest]], [[tokenBudgetMix]] — stay separate queries
    * because they genuinely need their shuffle.) */
  def funnel(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val t = col(textCol)
    // Stage 1: Gopher rules (same integer cross-multiplied forms as
    // gopherQuality, inlined so the funnel stays one projection).
    val words = split(t, " ")
    val n = size(words)
    val wordChars = length(t) - (n - 1)
    val alphaCt = size(filter(words, w => w.rlike("[a-z]")))
    val stopHits = size(array_intersect(words,
      array(TextAnalysis.stopwords.map(lit): _*)))
    val gopherKeep = n >= 25 && n <= 100000 &&
      wordChars >= n * 4 && wordChars <= n * 10 &&
      stopHits >= 2 && alphaCt * 5 >= n * 4
    // Stage 2: C4 battery over the decorated line corpus.
    val ls0 = lineCorpusCol(id, t)
    val dec = c4DecorateCol(id, ls0)
    val kept = filter(dec, l =>
      l.endsWith(".") && size(split(l, " ")) >= 5 && !l.contains("javascript"))
    val c4Keep = !exists(dec, l => l.contains("lorem ipsum")) &&
      !exists(dec, l => l.contains("{")) && size(kept) > 0
    // Stage 3: repetition — dup lines on the undecorated corpus, top
    // 2-gram multiplicity on the raw words (sorted run-length fold,
    // O(n log n) — see top2GramCount).
    val top2 = top2GramCount(words, n)
    val repKeep = size(ls0) === size(array_distinct(ls0)) && top2 <= 4
    val stage = when(!gopherKeep, "gopher")
      .when(!c4Keep, "c4")
      .when(!repKeep, "repetition")
      .otherwise("kept")
    docs.select(
      id.as("doc_id"),
      stage.as("stage"),
      n.cast("int").as("n_words"),
      size(kept).cast("int").as("kept_ct"),
      when(stage === "kept",
        md5(scrubCol(array_join(kept, "\n")).cast("binary"))).as("kept_md5"))
  }
}
