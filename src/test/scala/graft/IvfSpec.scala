package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity

/** IVF ANN on a corpus with three well-separated clusters: probing must
  * find the true neighbors (recall 1.0 when clusters align with cells). */
class IvfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vec(center: Int, i: Int): Array[Double] = {
    val v = new Array[Double](8)
    v(center) = 10.0
    v((center + 4) % 8) = 1.0 + (i % 5) * 0.1 // small within-cluster spread
    v
  }

  private def corpus() =
    (0 until 60).map(i => (i.toLong, vec(i % 3, i))).toDF("vec_id", "v")

  test("ivf top-k equals brute force on cluster-separated data") {
    val c = corpus()
    val q = c.filter(col("vec_id") < 3)
    val exact = Similarity.topKBruteForce(c, q, "vec_id", "v", 5)
    val ivf = Similarity.annIvf(c, q, "vec_id", "v", 5, nCentroids = 6, nProbe = 3)
    val recall = Similarity.recallAtK(exact, ivf)
      .agg(avg("recall")).head().getDouble(0)
    assert(recall == 1.0, s"recall $recall")
  }

  test("ivf is deterministic across runs") {
    val c = corpus()
    val q = c.filter(col("vec_id") < 2)
    def run() = Similarity.annIvf(c, q, "vec_id", "v", 5, nCentroids = 6, nProbe = 2)
      .orderBy("qid", "rank").as[(Long, Int, Long)].collect().toSeq
    assert(run() == run())
  }
}
