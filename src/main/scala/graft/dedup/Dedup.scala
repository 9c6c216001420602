package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline tier.
  *
  * Scale design (10^12 docs): every variant avoids the O(n²) cross join —
  *  - exact: hash groupBy (one shuffle on the digest);
  *  - n-gram Jaccard: inverted-index self-join on shingles (shuffle on
  *    shingle; hot shingles are capped by distinct-per-doc and, at real
  *    scale, a document-frequency cutoff);
  *  - MinHash+LSH: candidates from band-bucket joins (shuffle on band hash,
  *    candidate count ≪ n²), then exact-Jaccard verification of candidates;
  *  - SimHash: 64-bit signature, banded into 4×16-bit chunks; pairs within
  *    hamming distance ≤ 3 must collide on ≥1 chunk (pigeonhole), so the
  *    join is on chunk values, never all-pairs.
  *
  * Jaccard thresholding uses integer cross-multiplication
  * (`den*inter >= num*union`) — bit-exact, reproducible by the DuckDB
  * oracle, no float boundary flakes.
  */
object Dedup {

  /** Word n-gram shingle set (distinct, order-insensitive) as a column
    * expression over single-spaced text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(text, " ")
    array_distinct(
      when(size(words) < n, array(array_join(words, " ")))
        .otherwise(transform(
          sequence(lit(0), size(words) - n),
          i => array_join(slice(words, i + 1, lit(n)), " "))))
  }

  /** Same shingle set as [[shingles]], computed in Scala (hot paths: the
    * codegen'd HOF chain allocates per element; a kernel loop doesn't). */
  def shingleSet(text: String, n: Int = 3): scala.collection.immutable.Set[String] = {
    // limit -1 keeps trailing empty tokens, matching Spark's split() in
    // [[shingles]] — "a b " must shingle identically on both paths
    val words = text.split(" ", -1)
    if (words.length < n) Set(words.mkString(" "))
    else {
      val b = scala.collection.immutable.Set.newBuilder[String]
      var i = 0
      while (i + n <= words.length) {
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(words(i + k)); k += 1 }
        b += sb.toString
        i += 1
      }
      b.result()
    }
  }

  /** Exact integer-threshold Jaccard test on two texts' shingle sets. */
  def jaccardAtLeast(a: String, b: String, n: Int, num: Int, den: Int): Boolean = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    val inter = sa.count(sb.contains)
    den * inter >= num * (sa.size + sb.size - inter)
  }

  /** Exact duplicate groups: digest -> count (>1 only).
    * One shuffle, map-side combined. */
  def exactDupGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Exact repeated-substring detection at fixed window size k tokens —
    * the Spark shape of Lee et al.'s ExactSubstr dedup ("Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499,
    * which finds substrings of >= k tokens occurring more than once in
    * the corpus via a suffix array). A k-token sliding window marks
    * exactly the same spans: a duplicated substring of length m >= k
    * duplicates its m-k+1 windows, so per-doc MAXIMAL RUNS of duplicated
    * windows recover the spans (max_run_tokens = longest run + k - 1).
    * Duplication counts repeats across docs AND within one doc, like the
    * paper's suffix array.
    *
    * Shape at scale (the suffix array is the single-node shape; this is
    * the distributed one): tokens explode to ~n_tokens window-hash rows
    * — ONE shuffle to count window df with map-side partial aggregation
    * (hashes are near-uniform, no skew), the duplicated-window set joins
    * back with the strategy left to AQE (a real crawl's dup set is too
    * big to force-broadcast), and runs reduce per doc (bounded by one
    * document, never one task per key class). No driver state, no
    * all-pairs join anywhere.
    *
    * Output per input row: doc_id, n_windows, dup_windows,
    * max_run_tokens (0s when nothing repeats or the doc is shorter than
    * k tokens). */
  def substringDupSpans(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8): DataFrame = {
    require(k >= 2, s"window size k=$k must be >= 2 tokens")
    val toks = split(col(textCol), " ")
    val base = df.select(
      col(idCol).cast("long").as("doc_id"),
      toks.as("toks"),
      greatest(size(toks) - (k - 1), lit(0)).cast("int").as("n_windows"))
    // guard sequence() against n_windows = 0 (Spark yields a DESCENDING
    // [1,0] there, not an empty array)
    val winHashes = when(col("n_windows") >= 1,
      transform(sequence(lit(1), col("n_windows")),
        i => md5(concat_ws(" ", slice(col("toks"), i, lit(k))).cast("binary"))))
      .otherwise(array().cast("array<string>"))
    val wins = base.select(col("doc_id"),
      posexplode(winHashes).as(Seq("idx", "h")))
    val dupHashes = wins.groupBy("h")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > 1)
      .select("h")
    val dupWins = wins.join(dupHashes, Seq("h")).select("doc_id", "idx")
    // gaps-and-islands: consecutive duplicated idx values share one grp
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("idx")
    val runs = dupWins
      .withColumn("grp", col("idx") - row_number().over(w))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("doc_id").agg(
        sum(col("run")).cast("int").as("dup_windows"),
        (max(col("run")) + (k - 1)).cast("int").as("max_run_tokens"))
    base.select("doc_id", "n_windows")
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("dup_windows"), lit(0)).as("dup_windows"),
        coalesce(col("max_run_tokens"), lit(0)).as("max_run_tokens"))
  }

  /** Default document-frequency cutoff for [[ngramJaccardPairs]] candidate
    * generation: a shingle seen in more docs than this ("of the and"-class
    * stop phrases) is excluded from the inverted-index join, whose pair
    * group would otherwise be O(df²). Verification stays exact, so output
    * only changes for pairs whose EVERY shared shingle is that hot —
    * vanishingly unlikely at a 0.8 Jaccard threshold. */
  val defaultMaxShingleDf: Long = 1000L

  /** All pairs (a_id < b_id) with word-n-gram Jaccard >= num/den.
    *
    * Inverted-index self-join on shingles (kernel flatMap: only
    * (id, shingle) rows shuffle, no array columns), with shingles of
    * document frequency > maxDf dropped before the join — the standard
    * hot-key cap that keeps one stop-phrase shingle from creating a
    * quadratic join group at 10^12 docs.
    *
    * Correctness: hot shingles never enter the join, but their possible
    * contribution to a pair's intersection is bounded — at most
    * min(hotCount(a), hotCount(b)). Jaccard is monotone in the
    * intersection, so integer cross-multiplication on [inter_kept,
    * inter_kept + min(ha, hb)] decides almost every pair outright (hot
    * counts are tiny — a handful of stop phrases per doc); only the
    * narrow band where the bounds straddle the threshold falls back to
    * exact Jaccard recomputed from the two texts. No false positives
    * ever; recall is only lost for pairs sharing EXCLUSIVELY ultra-hot
    * shingles (see [[defaultMaxShingleDf]]). Exhaustive vs the DuckDB
    * oracle on the verification corpus. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, num: Int = 4, den: Int = 5,
                        maxDf: Long = defaultMaxShingleDf): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val texts = df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    val sh = texts.as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        shingleSet(t, n).iterator.map(s => (id, s))
      }).toDF("id", "sh")
    // hot-shingle cutoff: the hot set is tiny (stop phrases), broadcast anti-join
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("sh")
    val kept = sh.join(hot.hint("broadcast"), Seq("sh"), "left_anti")
    // per-doc totals: n_all over every shingle, n_kept over surviving ones;
    // n_all == n_kept marks docs untouched by the cutoff
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_all"))
      .join(kept.groupBy("id").agg(count(lit(1)).as("n_kept")), Seq("id"), "left")
      .select(col("id"), col("n_all"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    val inter = kept.as("a").join(kept.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    val joined = inter
      .join(counts.select(col("id").as("a_id"), col("n_all").as("na"), col("n_kept").as("ka")), "a_id")
      .join(counts.select(col("id").as("b_id"), col("n_all").as("nb"), col("n_kept").as("kb")), "b_id")
    // the true intersection lies in [inter, inter + min(hot_a, hot_b)]
    val upper = col("inter") + least(col("na") - col("ka"), col("nb") - col("kb"))
    val lowerPasses =
      lit(den) * col("inter") >= lit(num) * (col("na") + col("nb") - col("inter"))
    val upperPasses =
      lit(den) * upper >= lit(num) * (col("na") + col("nb") - upper)
    // lower bound already clears the threshold -> pass without recomputation
    val exact = joined.filter(lowerPasses).select(col("a_id"), col("b_id"))
    // bounds straddle the threshold -> recompute from text (narrow band)
    val fuzzy = verifyJaccard(
      joined.filter(!lowerPasses && upperPasses).select(col("a_id"), col("b_id")),
      texts, n, num, den)
    exact.unionByName(fuzzy)
  }

  /** Exact-Jaccard verification of candidate pairs against the texts —
    * shared by the inverted-index and LSH candidate generators. */
  private def verifyJaccard(cands: DataFrame, texts: DataFrame,
                            n: Int, num: Int, den: Int): DataFrame = {
    val jacc = udf((a: String, b: String) => jaccardAtLeast(a, b, n, num, den))
    cands
      .join(texts.select(col("id").as("a_id"), col("t").as("ta")), "a_id")
      .join(texts.select(col("id").as("b_id"), col("t").as("tb")), "b_id")
      .filter(jacc(col("ta"), col("tb")))
      .select(col("a_id"), col("b_id"))
  }

  /** Keep-first exact dedup: the surviving corpus — one row (the minimum
    * id) per distinct text. One shuffle on the digest. */
  def exactDupSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as("id"))
      .select("id")

  /** Connected-component cluster labels over a near-dup pair set: every id
    * maps to the MINIMUM id reachable through pairs (its cluster
    * representative); singletons label themselves.
    *
    * Iterative min-label propagation: each round joins labels across edges
    * and keeps the per-node minimum; converges in O(cluster diameter)
    * rounds — near-dup clusters are shallow (dupes of a common source), so
    * a few rounds suffice at any corpus size. Each round is one shuffle;
    * lineage is truncated per round (localCheckpoint) so the plan does not
    * grow with iterations — the standard Spark iterative-algorithm shape.
    * maxIters is a diameter backstop, not a tuning knob. */
  /** One min-label propagation round: per node, min of its own label and
    * all neighbor labels. Equi-joins + one hash aggregate only — the plan
    * shape PlanSpec pins (no cartesian, partial agg before the exchange). */
  private[graft] def propagationRound(edges: DataFrame, labels: DataFrame): DataFrame = {
    val nbr = edges
      .join(labels.select(col("id").as("dst"), col("label").as("dlabel")), "dst")
      .groupBy(col("src").as("id")).agg(min("dlabel").as("nlabel"))
    labels.join(nbr, Seq("id"), "left")
      .select(col("id"),
        least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
  }

  def nearDupClusters(ids: DataFrame, pairs: DataFrame,
                      maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true)
    var labels = ids.select(col("id").cast("long").as("id"))
      .withColumn("label", col("id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val updated = propagationRound(edges, labels).localCheckpoint(true)
      changed = updated.join(labels.select(col("id"), col("label").as("old")), "id")
        .filter(col("label") =!= col("old")).count()
      labels = updated
      iter += 1
    }
    // truncated propagation would return labels that are NOT the minimum
    // reachable id — fail loudly instead of handing back wrong clusters
    require(changed == 0,
      s"nearDupClusters did not converge in $maxIters rounds (cluster diameter exceeds " +
        s"the backstop); raise maxIters")
    labels
  }

  // ---- MinHash + LSH -------------------------------------------------------

  val minhashPerms = 64
  val lshBands = 16 // 16 bands x 4 rows

  private val mersenne = (1L << 61) - 1

  /** Deterministic per-permutation coefficients (no RNG at runtime): a_i, b_i
    * from a splitmix-style integer mix of the permutation index. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val permA: Array[Long] =
    Array.tabulate(minhashPerms)(p => (mix(2 * p + 1) & Long.MaxValue) % (mersenne - 1) + 1)
  private val permB: Array[Long] =
    Array.tabulate(minhashPerms)(p => (mix(2 * p + 2) & Long.MaxValue) % mersenne)

  /** 64-permutation MinHash signature of a shingle set (Scala kernel). */
  def minhashSignature(shingleSet: Iterable[String]): Array[Long] = {
    val sig = Array.fill(minhashPerms)(Long.MaxValue)
    shingleSet.foreach { s =>
      // base hash of the shingle (FNV-1a 64)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      val x = (h & Long.MaxValue) % mersenne
      var p = 0
      while (p < minhashPerms) {
        val hp = (mulmod61(permA(p), x) + permB(p)) % mersenne
        if (hp < sig(p)) sig(p) = hp
        p += 1
      }
    }
    sig
  }

  /** Band hashes of a signature: lshBands values, each hashing
    * minhashPerms/lshBands consecutive signature slots. */
  def bandHashes(sig: Array[Long]): Array[Long] = {
    val rows = minhashPerms / lshBands
    Array.tabulate(lshBands) { b =>
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rows) { h ^= sig(b * rows + r); h *= 0x100000001b3L; r += 1 }
      h
    }
  }

  private def mulmod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (hi << 3) + (lo >>> 61) + (lo & mersenne)
    while (r >= mersenne) r -= mersenne
    r
  }

  /** Candidate pairs from MinHash-LSH banding, verified by exact n-gram
    * Jaccard (integer threshold). Output equals ngramJaccardPairs whenever
    * LSH recall is 1 at the chosen threshold (16x4 bands: P(miss) < 1e-7 at
    * j >= 0.8); the verification step removes all false positives. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, num: Int = 4, den: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val texts = df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    // kernel: shingles -> signature -> band hashes per doc (one pass; only
    // (id, band, bh) rows shuffle — never the shingle arrays)
    val banded = texts.as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val bands = bandHashes(minhashSignature(shingleSet(t, n)))
        bands.iterator.zipWithIndex.map { case (h, b) => (id, b, h) }
      }).toDF("id", "band", "bh")
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()
    // verify the (few) candidates with exact Jaccard recomputed from text
    verifyJaccard(cands, texts, n, num, den)
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash over word features (FNV-1a word hashes, unit weights). */
  def simhash64(text: String): Long = {
    val v = new Array[Int](64)
    var start = 0
    val s = text
    while (start <= s.length) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = s.length
      if (end > start) {
        var h = 0xcbf29ce484222325L
        var i = start
        while (i < end) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) v(bit) += 1 else v(bit) -= 1
          bit += 1
        }
      }
      start = end + 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (v(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  /** Pairs within hamming distance <= maxDist of the 64-bit SimHash,
    * found by banding into 4 16-bit chunks (pigeonhole: d<=3 implies an
    * identical chunk) and verifying candidates. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(maxDist <= 3, "4-chunk banding guarantees recall only for d<=3")
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("t")).as[(Long, String)]
      .map { case (id, t) => (id, simhash64(t)) }.toDF("id", "sig")
    val chunked = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("ck"))): _*)).as("e"))
      .select(col("id"), col("sig"), col("e.chunk"), col("e.ck"))
    val cands = chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("x.sig").as("siga"),
        col("y.id").as("b_id"), col("y.sig").as("sigb"))
      .distinct()
    cands
      .withColumn("dist", bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist").cast("int").as("hamming"))
  }

  // ---- Embedding cosine near-dup -------------------------------------------

  /** Cosine similarity of two float-array columns, accumulated in double
    * left-to-right (deterministic, matches the DuckDB oracle's
    * list_cosine_similarity on double-cast lists). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    dot / sqrt(na * nb)
  }

  /** Broadcast-side chunk cap: above this many vectors the comparison side
    * is broadcast in id-hash chunks (multiple passes over the corpus), so
    * the DRIVER never materializes more than one chunk — the full-corpus
    * collect was the 10^12-scale anti-pattern. */
  val maxBroadcastVectors: Int = 1 << 20

  /** Brute-force near-duplicate pairs with cosine >= threshold.
    *
    * Broadcast-kernel design: the comparison side is broadcast and each
    * partition streams its rows against it with a tight primitive-double
    * dot loop — no pair-row materialization, no shuffle. Cosine is
    * evaluated EXACTLY like the DuckDB oracle's list_cosine_similarity:
    * dot / (|a| * |b|) with divide-then-compare (not cross-multiplied —
    * rounding of the product can flip boundary pairs), and zero-norm
    * vectors never pair (the oracle's 0/0 = NaN excludes them).
    *
    * Scale path: when the corpus exceeds [[maxBroadcastVectors]], the
    * comparison side is split into id-hash chunks; each pass collects ONE
    * chunk (driver memory = chunk, never corpus), broadcasts it, streams
    * the full corpus against it, eagerly materializes that pass's pairs,
    * and destroys the broadcast before the next pass. A pair (a, b),
    * a.id < b.id, is found exactly once: in the pass owning b's chunk. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double,
                            maxChunk: Int = maxBroadcastVectors): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]

    def pairsVsSide(side: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Double])]]) =
      vecs.mapPartitions { it =>
        val all = side.value
        it.flatMap { case (aId, va) =>
          val na = normOf(va)
          if (na == 0.0) Iterator.empty
          else all.iterator
            .filter(_._1 > aId)
            .filter { case (_, vb) =>
              val nb = normOf(vb)
              nb > 0.0 && dot(va, vb) / (na * nb) >= threshold
            }
            .map { case (bId, _) => (aId, bId) }
        }
      }.toDF("a_id", "b_id")

    val n = vecs.count()
    if (n <= maxChunk) {
      val side = spark.sparkContext.broadcast(vecs.collect().sortBy(_._1))
      pairsVsSide(side)
    } else {
      val numChunks = ((n + maxChunk - 1) / maxChunk).toInt
      (0 until numChunks).map { c =>
        val chunk = vecs.filter(pmod(xxhash64(col(idCol)), lit(numChunks)) === c)
          .collect().sortBy(_._1) // driver holds ONE chunk
        val side = spark.sparkContext.broadcast(chunk)
        // eager: pairs for this pass are materialized before the broadcast
        // is dropped, so passes never stack broadcasts in executor memory
        val part = pairsVsSide(side).localCheckpoint(true)
        side.destroy()
        part
      }.reduce(_ unionByName _)
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def normOf(a: Array[Double]): Double = math.sqrt(dot(a, a))
}
