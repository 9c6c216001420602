package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.extract.Extractor
import graft.model.{ExtractionResult, WebPage}

/** Structured Streaming surface (SURVEY §2.8): the reference's watch-service
  * and pipeline processors are 0-byte stubs (/root/reference/src/processors/
  * watch_service.py, pipeline.py), so this is the from-scratch design — the
  * batch extraction kernel lifted unchanged onto a stream.
  *
  * Semantics at scale:
  *  - source: file-stream over the webpages table directory (new parquet
  *    files = new documents; an Iceberg/Kafka source drops in unchanged);
  *  - exactly-once: the checkpoint dir tracks processed files — the
  *    streaming analog of the batch partition manifest;
  *  - the kernel is stateless per document, so no state store is involved in
  *    extraction itself; windowed ingest metrics use a watermark so state is
  *    bounded (late pages beyond 1 hour are dropped from the rollup, not
  *    from extraction).
  */
object StreamingExtraction {

  /** The batch kernel, unchanged, on a (possibly streaming) Dataset —
    * identical per-document semantics in both modes. */
  def extractStream(pages: Dataset[WebPage]): Dataset[ExtractionResult] = {
    implicit val enc = Encoders.product[ExtractionResult]
    pages.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      it.map(p => Extractor.extractOne(p, pid))
    }
  }

  /** Continuous extraction job over a webpages directory. AvailableNow
    * drains everything present then stops — the batch-equivalent trigger;
    * pass ProcessingTime for a long-running tail. */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpointDir: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val pages = spark.readStream
      .schema(Encoders.product[WebPage].schema)
      .parquet(inDir)
      .as(Encoders.product[WebPage])
    extractStream(pages).writeStream
      .format("parquet")
      .option("path", s"$outDir/results")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Watermarked ingest metrics: docs/bytes per (1h event-time window, lang)
    * — bounded state, append output past the watermark. */
  def windowedIngestMetrics(pages: Dataset[WebPage]): Dataset[org.apache.spark.sql.Row] = {
    pages.toDF()
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 hour"), col("lang"))
      .agg(count(lit(1)).as("docs"), sum(length(col("html"))).as("bytes"))
  }
}
