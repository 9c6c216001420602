package graft.pipeline

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
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
  * unfinished buckets are re-read, re-extracted, re-written.
  *
  * Scale properties: no driver-side per-document state — the only driver
  * materialization is the manifest, O(numBuckets). All filesystem access
  * goes through the Hadoop FileSystem API (works on HDFS/S3A, not just
  * file://), and the post-commit manifest is derived by reading back ONLY
  * the buckets this run wrote, unioned with the prior manifest rows — a
  * resumed run never re-reads finished buckets' output (previously an
  * O(total output) re-scan per run).
  */
object ResumableRunner {

  /** Stable, platform-independent bucket of a url. */
  def bucketOf(url: String, numBuckets: Int): Int = {
    val d = MessageDigest.getInstance("MD5").digest(url.getBytes("UTF-8"))
    val v = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    math.floorMod(v, numBuckets)
  }

  /** [[bucketOf]] as a pure built-in column expression (codegen'd — no
    * ScalaUDF in the bucketing projection; PlanSpec pins this): the first 4
    * MD5 bytes read as a SIGNED 32-bit value, floorMod numBuckets. The
    * explicit sign fold keeps it byte-identical to bucketOf for EVERY
    * numBuckets (pmod of the unsigned value alone only agrees when
    * numBuckets is a power of two). */
  def bucketCol(url: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column = {
    val unsigned = conv(substring(md5(url.cast("binary")), 1, 8), 16, 10).cast("bigint")
    val signed = when(unsigned >= 2147483648L, unsigned - 4294967296L).otherwise(unsigned)
    pmod(signed, lit(numBuckets.toLong)).cast("int")
  }

  /** docs/failures cover the buckets THIS run processed; docsTotal adds the
    * prior manifest's docs (lineage carried forward, output not re-read). */
  final case class RunSummary(runId: String, bucketsTotal: Int, bucketsRun: Int,
                              docs: Long, failures: Long, docsTotal: Long)

  // public: Spark codegen instantiates encoders for this class
  final case class BucketedPage(
      bucket: Int, url: String, warc_ts: java.sql.Timestamp,
      html: Array[Byte], text: String, lang: String)

  /** The resume anti-join: drop every page whose bucket the manifest marks
    * done. The finished-bucket list is O(numBuckets) and BROADCAST — the
    * corpus side never shuffles for the resume decision (PlanSpec asserts
    * this shape). */
  def remainingAfterManifest(bucketed: org.apache.spark.sql.DataFrame,
                             doneBuckets: Set[Int]): org.apache.spark.sql.DataFrame = {
    if (doneBuckets.isEmpty) bucketed
    else {
      val spark = bucketed.sparkSession
      import spark.implicits._
      bucketed.join(
        doneBuckets.toSeq.toDF("bucket").hint("broadcast"), Seq("bucket"), "left_anti")
    }
  }

  def run(spark: SparkSession, pages: Dataset[WebPage], outDir: String,
          runId: String, numBuckets: Int): RunSummary = {
    import spark.implicits._

    val manifestDir = s"$outDir/manifest"
    val resultsDir = s"$outDir/results"
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(outDir).getFileSystem(hconf)

    // Prior manifest rows, collected eagerly: (a) O(numBuckets), never
    // O(docs), so the driver holds it at any scale; (b) the manifest path
    // is overwritten below — a lazy plan would re-read deleted files.
    val manifestPath = new Path(manifestDir)
    val prior: Array[ManifestEntry] =
      if (fs.exists(manifestPath) &&
          fs.listStatus(manifestPath).exists(_.getPath.getName.endsWith(".parquet"))) {
        spark.read.parquet(manifestDir)
          .filter(col("status") === "done").as[ManifestEntry].collect()
      } else Array.empty[ManifestEntry]
    val doneBuckets: Set[Int] = prior.map(_.partition_id).toSet

    val bucketed = pages.withColumn("bucket", bucketCol(col("url"), numBuckets))
    val remaining = remainingAfterManifest(bucketed, doneBuckets)

    // golden `text` is blanked before the shuffle — the kernel reads only
    // `html`; verification joins the source table by url afterwards
    val results: Dataset[ExtractionResult] = remaining
      .withColumn("text", lit(""))
      .repartition(col("bucket"))
      .select(col("bucket"), col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
      .as[BucketedPage]
      .mapPartitions { it =>
        it.map { p =>
          Extractor.extractOne(WebPage(p.url, p.warc_ts, p.html, p.text, p.lang), p.bucket)
        }
      }

    // per-WRITE dynamic overwrite (only the buckets this run produced are
    // replaced) — scoped to this writer, not a session-wide conf mutation
    // that would silently change overwrite semantics for caller code
    results.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("partition_id").parquet(resultsDir)

    // Post-commit lineage: read back ONLY the bucket dirs this run wrote
    // (incremental — finished buckets' output stays untouched on disk).
    val resultsPath = new Path(resultsDir)
    val ranDirs: Array[String] =
      if (!fs.exists(resultsPath)) Array.empty
      else fs.listStatus(resultsPath).iterator
        .map(_.getPath)
        .filter(_.getName.startsWith("partition_id="))
        .filter(p => !doneBuckets.contains(p.getName.stripPrefix("partition_id=").toInt))
        .map(_.toString).toArray

    val fresh: Array[(Int, Long, Long)] =
      if (ranDirs.isEmpty) Array.empty
      else spark.read.option("basePath", resultsDir).parquet(ranDirs.toIndexedSeq: _*)
        .groupBy(col("partition_id").cast("int").as("partition_id"))
        .agg(count(lit(1)).as("docs"),
          sum(when(!col("success"), 1L).otherwise(0L)).as("failures"))
        .as[(Int, Long, Long)].collect()

    val manifest: Seq[ManifestEntry] =
      prior.toSeq ++ fresh.map { case (b, docs, _) => ManifestEntry(runId, b, "done", docs) }
    manifest.toDS().write.mode(SaveMode.Overwrite).parquet(manifestDir)

    RunSummary(runId, numBuckets,
      bucketsRun = fresh.length,
      docs = fresh.map(_._2).sum,
      failures = fresh.map(_._3).sum,
      docsTotal = manifest.map(_.docs).sum)
  }
}
