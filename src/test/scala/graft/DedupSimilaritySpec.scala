package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Similarity

/** Spark-level behavior of the dedup and similarity operators on small,
  * fully-understood corpora. */
class DedupSimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus() = {
    // distinct per-doc vocabularies: unrelated docs share zero shingles
    def doc(seed: Int, n: Int) =
      Array.tabulate(n)(i => s"d${seed}w${(i * 7) % 97}").mkString(" ")
    val a = doc(1, 120)
    val aNear = a.split(' ').zipWithIndex.collect { case (w, i) if i % 50 != 49 => w }.mkString(" ")
    val b = doc(2, 80)
    val c = doc(3, 100)
    Seq((1L, a), (2L, b), (3L, c), (101L, aNear), (102L, b))
      .toDF("id", "text")
  }

  test("exact dedup finds only the exact pair") {
    val groups = Dedup.exactDupGroups(corpus(), "text").collect()
    assert(groups.length == 1 && groups.head.getLong(1) == 2) // ids 2 and 102
  }

  test("substring dedup recovers the planted duplicated spans") {
    // doc 1 and doc 2 share one 12-token span (plus disjoint vocabularies
    // around it); doc 3 repeats a 9-token phrase WITHIN itself; doc 4 is
    // all-unique; doc 5 is shorter than the window
    val span = (0 until 12).map(i => s"shared$i").mkString(" ")
    val inner = (0 until 9).map(i => s"twice$i").mkString(" ")
    def uniq(seed: Int, n: Int) = (0 until n).map(i => s"u${seed}x$i").mkString(" ")
    val df = Seq(
      (1L, s"${uniq(1, 20)} $span ${uniq(11, 20)}"),
      (2L, s"${uniq(2, 30)} $span ${uniq(12, 10)}"),
      (3L, s"${uniq(3, 15)} $inner ${uniq(13, 5)} $inner ${uniq(23, 15)}"),
      (4L, uniq(4, 40)),
      (5L, "a b c")).toDF("id", "text")
    val out = Dedup.substringDupSpans(df, "id", "text", k = 8)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int)].collect()
    // a 12-token duplicated span at k=8 = 5 duplicated windows, run of 5
    // -> max_run_tokens = 5 + 7 = 12 (the span length, exactly)
    assert(out(0) == ((1L, 52 - 7, 5, 12)), out(0))
    assert(out(1) == ((2L, 52 - 7, 5, 12)), out(1))
    // the 9-token in-doc repeat: 2 duplicated windows per occurrence
    // (runs of 2 each) -> dup_windows = 4, max_run_tokens = 2 + 7 = 9
    assert(out(2) == ((3L, 53 - 7, 4, 9)), out(2))
    assert(out(3) == ((4L, 40 - 7, 0, 0)), out(3))
    assert(out(4) == ((5L, 0, 0, 0)), out(4))
  }

  test("ngram jaccard and minhash-lsh agree and find only the near pair + exact pair") {
    val exact = Dedup.ngramJaccardPairs(corpus(), "id", "text")
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(corpus(), "id", "text")
      .as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 101L), (2L, 102L)))
    assert(lsh == exact)
  }

  test("simhash pairs finds near-dup within hamming 3") {
    val pairs = Dedup.simhashPairs(corpus(), "id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 102L))) // identical -> distance 0
    assert(pairs.contains((1L, 101L)))
    assert(!pairs.contains((1L, 2L)))
  }

  test("brute-force topk: self is rank 1, ranks are 1..k, deterministic") {
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 16 + d).toFloat))
    }.toDF("vec_id", "v")
    val top = Similarity.topKBruteForce(vecs, vecs.filter(col("vec_id") < 3), "vec_id", "v", 5)
    val rows = top.select("qid", "rank", "vec_id").as[(Long, Int, Long)].collect()
    assert(rows.length == 15)
    (0L until 3L).foreach { q =>
      val mine = rows.filter(_._1 == q).sortBy(_._2)
      assert(mine.head == ((q, 1, q)), s"self not rank1 for $q: ${mine.head}")
      assert(mine.map(_._2).toSeq == (1 to 5))
    }
  }

  test("ann lsh achieves high recall vs brute force on clustered vectors") {
    // clustered data (ANN-friendly): 4 well-separated centers + small jitter
    val vecs = (0L until 80L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(16)(d =>
        (math.cos(c * 16 + d) * 10 + math.sin(i * 16 + d) * 0.3).toFloat))
    }.toDF("vec_id", "v")
    val q = vecs.filter(col("vec_id") < 4)
    val exact = Similarity.topKBruteForce(vecs, q, "vec_id", "v", 5)
    val approx = Similarity.annLsh(vecs, q, "vec_id", "v", 5, tables = 8, planes = 8)
    val rec = Similarity.recallAtK(exact, approx)
      .agg(avg("recall")).as[Double].head()
    assert(rec >= 0.8, s"recall $rec")
  }

  test("embedding near-dup pairs: only perturbed copies cross 0.9") {
    val base = (0L until 10L).map(i => (i, Array.tabulate(16)(d => math.sin(i * 16 + d)))).toDF("vec_id", "v")
    val pert = (0L until 10L).filter(_ % 5 == 0).map { i =>
      (i + 100L, Array.tabulate(16)(d => math.sin(i * 16 + d) * (1 + 0.001 * d)))
    }.toDF("vec_id", "v")
    val pairs = Dedup.embeddingNearDupPairs(base.unionByName(pert), "vec_id", "v", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 100L), (5L, 105L)))
  }

  test("chunked-broadcast embedding dedup equals the single-broadcast result") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // maxChunk far below the corpus size forces the multi-pass path whose
    // driver materialization is bounded by one chunk
    val chunked = Dedup.embeddingNearDupPairs(docs, "vec_id", "v", 0.8, maxChunk = 7)
      .as[(Long, Long)].collect().toSet
    val single = Dedup.embeddingNearDupPairs(docs, "vec_id", "v", 0.8)
      .as[(Long, Long)].collect().toSet
    assert(chunked == single)
  }

  test("near-dup clusters: labels are transitive min-ids, singletons self-label") {
    val ids = (1L to 8L).toDF("id")
    // chain 2-5-7 plus pair 3-8; 1,4,6 singletons
    val pairs = Seq((2L, 5L), (5L, 7L), (3L, 8L)).toDF("a_id", "b_id")
    val labels = Dedup.nearDupClusters(ids, pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 2L, 5L -> 2L, 7L -> 2L,
      3L -> 3L, 8L -> 3L, 4L -> 4L, 6L -> 6L))
  }

  test("hot-shingle DF cutoff leaves threshold-passing pairs intact") {
    // every doc shares one ultra-hot shingle; true near-dups still share
    // plenty of non-hot shingles, so the candidate pruning must not change
    // the verified output
    val mk = (i: Long) => (0 until 30).map(k => s"w${i}_$k").mkString(" ")
    val base = (0L until 20L).map(i => (i, s"hot stop phrase ${mk(i)}")).toDF("id", "text")
    val dup = Seq((100L, s"hot stop phrase ${mk(3L)}"), (101L, s"hot stop phrase ${mk(7L)}"))
      .toDF("id", "text")
    val corpus = base.unionByName(dup)
    val noCut = Dedup.ngramJaccardPairs(corpus, "id", "text", maxDf = Long.MaxValue)
      .as[(Long, Long)].collect().toSet
    val cut = Dedup.ngramJaccardPairs(corpus, "id", "text", maxDf = 3)
      .as[(Long, Long)].collect().toSet
    assert(noCut == Set((3L, 100L), (7L, 101L)))
    assert(cut == noCut)
  }
}
