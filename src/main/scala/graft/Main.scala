package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixtures.Corpus
import graft.pipeline.{ExtractionPipeline, ResumableRunner}

/** spark-submit entry point for the extraction job.
  *
  * Usage: graft.Main <sfDir> <outDir> [--resume-demo]
  *
  * Synthesizes the webpages corpus from <sfDir>/documents.parquet (stand-in
  * for reading the production Iceberg webpages table), runs the resumable
  * extraction, writes results + manifest + metrics under <outDir>, and
  * prints a per-format verification summary (byte-identity vs golden).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_run"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-extraction")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pages = Corpus.materialize(spark, sfDir)

    // resumable run (partition-granular manifest under outDir)
    val runId = s"run_${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    val summary = ResumableRunner.run(spark, pages, outDir, runId, numBuckets = 64)
    println(s"[main] $summary")

    // correctness: byte-identity per url vs golden
    val results = spark.read.parquet(s"$outDir/results")
    val golden = pages.select(col("url"), col("text").as("expected"))
    val check = results.join(golden, Seq("url"))
      .groupBy(col("format_from"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("success") && col("text") === col("expected"), 1L).otherwise(0L)).as("matches"),
        sum(when(!col("success"), 1L).otherwise(0L)).as("failures"))
      .orderBy("format_from")
    check.show(truncate = false)

    // metrics table (per-partition lineage)
    val metrics = ExtractionPipeline.metrics(
      results.as[graft.model.ExtractionResult], runId)
    metrics.write.mode("overwrite").parquet(s"$outDir/metrics")
    val m = spark.read.parquet(s"$outDir/metrics")
      .agg(sum("docs"), sum("bytes_in"), sum("failures")).head()
    println(s"[main] metrics total: docs=${m.get(0)} bytes_in=${m.get(1)} failures=${m.get(2)}")

    val bad = results.join(golden, Seq("url"))
      .filter(!col("success") || col("text") =!= col("expected"))
    val nbad = bad.count()
    println(s"[main] byte-identity violations: $nbad")
    if (nbad > 0) bad.select("url", "format_from", "success", "error").show(10, truncate = false)
    spark.stop()
    if (nbad > 0) sys.exit(1)
  }
}
