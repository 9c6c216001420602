package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.cosine

/** Approximate-nearest-neighbor search over an embedding column
  * (training-data pipeline tier).
  *
  *  - [[topKBruteForce]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one pass, no shuffle of the corpus side.
  *    Correctness baseline + the per-bucket kernel of the ANN path.
  *  - [[annLsh]]: random-hyperplane LSH — each vector gets `tables`
  *    signatures of `planes` sign bits from deterministic pseudo-random
  *    hyperplanes; candidates share a (table, code) bucket. Scale path:
  *    shuffle is on bucket keys (corpus-size linear), never all-pairs.
  */
object Similarity {

  /** Exact top-k by cosine for each query row. queries must be small enough
    * to broadcast (driver-bounded; at scale chunk the query set). Rank ties
    * break by candidate id ascending (deterministic). */
  def topKBruteForce(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("vec_id"))
  }

  /** Deterministic hyperplane component for (table, plane, dim) — a fixed
    * pseudo-random ±1/value grid, no RNG at runtime. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Sign-bit code of a vector under `planes` hyperplanes of table `t`. */
  def lshCode(vec: Array[Float], t: Int, planes: Int): Int = {
    var code = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) {
        // component in [-1,1): mix to 53-bit mantissa
        val m = mix(((t * 131L + p) * 8191L + d))
        dot += vec(d) * ((m >>> 11).toDouble / (1L << 52).toDouble - 1.0)
        d += 1
      }
      if (dot >= 0) code |= (1 << p)
      p += 1
    }
    code
  }

  /** ANN top-k: bucket corpus and queries by (table, code); exact cosine
    * within shared buckets; global top-k per query across tables.
    * Recall < 1 by construction — gate it against topKBruteForce (see the
    * sim_ann_* recall queries).
    *
    * planes=0 (default) sizes the code length to the corpus: planes =
    * log2(n / 32), clamped to [2, 24] — expected bucket ≈ 32 vectors at ANY
    * corpus size, so per-bucket exact work stays constant as n grows
    * (10^9 vectors → 24-bit codes); a fixed code length would either
    * degenerate to brute force at scale or to empty buckets at test scale.
    * Auto-sizing needs the corpus count: pass corpusSize when the caller
    * already knows it (table stats), else ONE count job runs eagerly at
    * call time — callers that only want the plan should supply it. */
  def annLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, tables: Int = 16, planes: Int = 0,
             corpusSize: Long = -1L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val planes0 =
      if (planes > 0) planes
      else {
        val n = if (corpusSize >= 0) corpusSize else corpus.count()
        math.max(2, math.min(24, math.ceil(math.log(n / 32.0) / math.log(2)).toInt))
      }
    def bucketize(df: DataFrame, id: String, out: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(out)).as[(Long, Array[Float])]
        .flatMap { case (i, v) =>
          (0 until tables).iterator.map(t => (i, v, t, lshCode(v, t, planes0)))
        }.toDF(id, out, "table", "code")
    val c = bucketize(corpus, "vec_id", "cv")
    val q = bucketize(queries, "qid", "qv")
    val scored = c.join(broadcast(q), Seq("table", "code"))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("cv")).as("score"))
      .groupBy("qid", "vec_id").agg(first("score").as("score")) // dedup multi-table hits
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("vec_id"))
  }

  /** IVF (inverted-file) ANN: coarse-quantize every vector to its nearest
    * centroid, probe the `nProbe` nearest cells per query, exact cosine
    * inside probed cells only.
    *
    * Centroids are deterministic: seeded from the `nCentroids` lowest-id
    * corpus vectors, refined by one distributed Lloyd iteration (assign ->
    * per-cell mean — a single groupBy). Scale shape: the corpus shuffles
    * once on cell id; queries broadcast; a cell is ~corpus/nCentroids —
    * at 10^9 vectors raise nCentroids so cells stay executor-sized. */
  def annIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]

    def nearest(v: Array[Double], cents: Array[Array[Double]], top: Int): Seq[Int] =
      cents.indices.sortBy { i =>
        var d = 0.0; var j = 0
        val ct = cents(i)
        while (j < v.length) { val t = v(j) - ct(j); d += t * t; j += 1 }
        d
      }.take(top)

    val seed: Array[Array[Double]] =
      c.orderBy(col(idCol)).limit(nCentroids).collect().map(_._2)
    val bSeed = spark.sparkContext.broadcast(seed)
    // one Lloyd iteration: mean of assigned vectors per cell (empty cells
    // keep their seed). reduceGroups partially aggregates map-side, so only
    // nCentroids partial sums per partition cross the wire.
    val refined: Array[Array[Double]] = {
      val sums = c.map { case (_, v) => (nearest(v, bSeed.value, 1).head, v, 1L) }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val s = a._2.clone(); var j = 0
          while (j < s.length) { s(j) += b._2(j); j += 1 }
          (a._1, s, a._3 + b._3)
        }
        .map(_._2).collect().map(t => t._1 -> (t._2, t._3)).toMap
      seed.indices.map { i =>
        sums.get(i) match {
          case Some((s, n)) => s.map(_ / n)
          case None => seed(i)
        }
      }.toArray
    }
    val bCents = spark.sparkContext.broadcast(refined)

    val cells = c.map { case (id, v) => (nearest(v, bCents.value, 1).head, id, v) }
      .toDF("cell", "vec_id", "cv")
    val probes = queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .flatMap { case (qid, v) => nearest(v, bCents.value, nProbe).map(cell => (cell, qid, v)) }
      .toDF("cell", "qid", "qv")
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("vec_id"))
  }

  /** Recall@k of the ANN result against the exact result (same shape:
    * qid, rank, vec_id). */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.join(approx.select(col("qid"), col("vec_id"), lit(1).as("hit")),
        Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))).as("recall"))
}
