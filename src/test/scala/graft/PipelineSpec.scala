package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Corpus
import graft.pipeline.{ExtractionPipeline, ResumableRunner}

/** End-to-end pipeline behavior: resume idempotence, crash-resume,
  * skew balancing, and failure containment (FIXTURES.md §6). */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("full run is byte-identical per url; rerun is a no-op (bucketsRun == 0)") {
    val out = Files.createTempDirectory("graft_resume").toString
    val pages = Corpus.materialize(spark, sfDir)
    val s1 = ResumableRunner.run(spark, pages, out, "t1", numBuckets = 16)
    assert(s1.bucketsRun == 16 && s1.failures == 0)

    val results = spark.read.parquet(s"$out/results")
    val golden = pages.select(col("url"), col("text").as("expected"))
    val bad = results.join(golden, Seq("url"))
      .filter(!col("success") || col("text") =!= col("expected")).count()
    assert(bad == 0)
    assert(results.count() == pages.count())

    val s2 = ResumableRunner.run(spark, pages, out, "t1b", numBuckets = 16)
    assert(s2.bucketsRun == 0, s"rerun must skip all buckets, got $s2")
  }

  test("crash-resume: truncated manifest reprocesses only missing buckets, output complete") {
    val out = Files.createTempDirectory("graft_crash").toString
    val pages = Corpus.materialize(spark, sfDir)
    ResumableRunner.run(spark, pages, out, "t2", numBuckets = 16)
    val full = spark.read.parquet(s"$out/results")
      .select("url", "text", "success").orderBy("url").collect()

    // simulate a crash: keep only manifest rows for buckets < 8
    val kept = spark.read.parquet(s"$out/manifest").filter(col("partition_id") < 8)
      .collect()
    val keptDf = spark.createDataFrame(
      spark.sparkContext.parallelize(kept.toSeq), spark.read.parquet(s"$out/manifest").schema)
    keptDf.write.mode("overwrite").parquet(s"$out/manifest")

    val s = ResumableRunner.run(spark, pages, out, "t2r", numBuckets = 16)
    assert(s.bucketsRun == 8, s"expected 8 reprocessed buckets, got $s")
    val resumed = spark.read.parquet(s"$out/results")
      .select("url", "text", "success").orderBy("url").collect()
    assert(resumed.sameElements(full), "resumed output differs from uninterrupted run")
  }

  test("resume does not re-read finished buckets' output") {
    val out = Files.createTempDirectory("graft_noreread").toString
    val pages = Corpus.materialize(spark, sfDir)
    ResumableRunner.run(spark, pages, out, "t3", numBuckets = 16)

    // keep manifest rows for buckets < 8, then corrupt the DATA FILES of
    // those finished buckets: if the resumed run read any of them (for the
    // manifest rebuild or otherwise), it would throw on the bad footer
    val kept = spark.read.parquet(s"$out/manifest").filter(col("partition_id") < 8).collect()
    val schema = spark.read.parquet(s"$out/manifest").schema
    spark.createDataFrame(spark.sparkContext.parallelize(kept.toSeq), schema)
      .write.mode("overwrite").parquet(s"$out/manifest")
    for (b <- 0 until 8) {
      val dir = new java.io.File(s"$out/results/partition_id=$b")
      assert(dir.isDirectory, s"expected $dir")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.write(f.toPath, "not a parquet file".getBytes)
      }
    }

    val s = ResumableRunner.run(spark, pages, out, "t3r", numBuckets = 16)
    assert(s.bucketsRun == 8, s"expected 8 reprocessed buckets, got $s")
    // and the manifest is complete again (prior rows carried forward)
    val manifest = spark.read.parquet(s"$out/manifest")
      .select("partition_id").distinct().count()
    assert(manifest == 16)
  }

  test("skewed hot host is spread across shuffle partitions by salting") {
    val pages = Corpus.materialize(spark, sfDir, skewHost = true)
    val parts = 8
    val dist = ExtractionPipeline.prepare(pages, parts)
      .mapPartitions(it => Iterator.single(it.count(p => p.url.contains("hot.example.org")).toLong))
      .collect()
    val hot = dist.sum
    assert(hot > 0, "skew corpus must contain hot-host docs")
    // without salting all hot docs hash to one partition; with salting no
    // partition may hold more than half of them
    assert(dist.max < hot / 2 + hot / 4,
      s"hot host concentrated: ${dist.mkString(",")}")
  }

  test("failure containment: poisoned payloads become failure rows, job completes") {
    val ts = new java.sql.Timestamp(0)
    val poisoned = Seq(
      graft.model.WebPage("https://p.example.org/en/doc1",
        ts, "%PDF-1.4 then garbage".getBytes("ISO-8859-1"), "", "en"),
      graft.model.WebPage("https://p.example.org/en/doc2",
        ts, Array[Byte]('<', 0x80.toByte, 0x41), "", "en"),
      graft.model.WebPage("https://p.example.org/en/doc3",
        ts, null, "", "en"))
    val good = Corpus.materialize(spark, sfDir).limit(20)
    val mixed = good.unionByName(poisoned.toDS())
    val res = ExtractionPipeline.extract(mixed, 4).toDF()
    assert(res.count() == 23)
    val metrics = ExtractionPipeline.metrics(
      res.as[graft.model.ExtractionResult], "t4")
    val m = metrics.agg(sum("docs"), sum("failures")).head()
    assert(m.getLong(0) == 23)
    // every poisoned row yields a row (success=false or benign empty), never kills the job
    val pRows = res.filter(col("url").startsWith("https://p.example.org")).collect()
    assert(pRows.length == 3)
    assert(pRows.forall(r => !r.getAs[Boolean]("success") || r.getAs[String]("error").isEmpty))
  }
}
