package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.Extractor
import graft.model.{ExtractionResult, ManifestEntry, WebPage}

/** Checkpoint/resumable extraction at partition granularity (north_rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Documents are assigned to stable buckets by an MD5-based hash of the url
  * (platform/JVM independent — NOT String.hashCode). A run writes:
  *   outDir/results/ partitioned by bucket (dynamic partition overwrite, so
  *     a re-run of a bucket is idempotent — rewrite-safe per SURVEY §7.3.4);
  *   outDir/manifest/ one row per completed bucket.
  * Resume = left-anti join of input buckets against the manifest: only
  * unfinished buckets are re-read, re-extracted, re-written. No driver-side
  * per-document state; the manifest is O(buckets).
  */
object ResumableRunner {

  /** Stable, platform-independent bucket of a url. */
  def bucketOf(url: String, numBuckets: Int): Int = {
    val d = MessageDigest.getInstance("MD5").digest(url.getBytes("UTF-8"))
    val v = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    math.floorMod(v, numBuckets)
  }

  final case class RunSummary(runId: String, bucketsTotal: Int, bucketsRun: Int, docs: Long, failures: Long)

  // public: Spark codegen instantiates encoders for this class
  final case class BucketedPage(
      bucket: Int, url: String, warc_ts: java.sql.Timestamp,
      html: Array[Byte], text: String, lang: String)

  def run(spark: SparkSession, pages: Dataset[WebPage], outDir: String,
          runId: String, numBuckets: Int): RunSummary = {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val manifestDir = s"$outDir/manifest"
    val resultsDir = s"$outDir/results"

    val bucketUdf = udf((url: String) => bucketOf(url, numBuckets))
    val bucketed = pages.withColumn("bucket", bucketUdf(col("url")))

    // Materialized eagerly: (a) it is O(numBuckets), never O(docs), so the
    // driver can hold it at any scale; (b) the manifest path is overwritten
    // below — a lazy plan would re-read deleted files.
    val doneBuckets: Array[Int] =
      if (new java.io.File(manifestDir, "_SUCCESS").exists() || parquetExists(manifestDir)) {
        spark.read.parquet(manifestDir)
          .filter(col("status") === "done")
          .select(col("partition_id").cast("int")).distinct().as[Int].collect()
      } else Array.empty[Int]

    val remaining =
      if (doneBuckets.isEmpty) bucketed
      else bucketed.join(
        doneBuckets.toSeq.toDF("bucket").hint("broadcast"), Seq("bucket"), "left_anti")

    val results: Dataset[ExtractionResult] = remaining
      .repartition(col("bucket"))
      .select(col("bucket"), col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
      .as[BucketedPage]
      .mapPartitions { it =>
        it.map { p =>
          Extractor.extractOne(WebPage(p.url, p.warc_ts, p.html, p.text, p.lang), p.bucket)
        }
      }

    results.write.mode(SaveMode.Overwrite).partitionBy("partition_id").parquet(resultsDir)

    // manifest: derive from what was just written (post-commit lineage)
    val written = spark.read.parquet(resultsDir)
    val newManifest = written
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("docs"))
      .select(lit(runId).as("run_id"), col("partition_id").cast("int"),
        lit("done").as("status"), col("docs"))
      .as[ManifestEntry]
    newManifest.write.mode(SaveMode.Overwrite).parquet(manifestDir)

    val stats = written.agg(
      count(lit(1)).as("docs"),
      sum(when(!col("success"), 1L).otherwise(0L)).as("failures")).head()
    val ranBuckets = numBuckets - doneBuckets.length
    RunSummary(runId, numBuckets, ranBuckets, stats.getLong(0), stats.getLong(1))
  }

  private def parquetExists(dir: String): Boolean = {
    val f = new java.io.File(dir)
    f.isDirectory && f.listFiles() != null && f.listFiles().exists(_.getName.endsWith(".parquet"))
  }
}
