package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over [[WarcSource.parseStream]] — the idiomatic
  * Spark read surface for WARC/1.1 segments (ISO 28500, the Common Crawl
  * container):
  *
  * {{{
  *   spark.read.format("warc").load("s3a://crawl/segments/")   // dir or glob
  * }}}
  *
  * One InputPartition per .warc(.gz) OBJECT — the correct granularity
  * because per-record gzip members are not independently seekable without
  * an external index — and each partition streams records off the Hadoop
  * FS through the one-record-at-a-time parser (O(one record) heap; a
  * multi-GB segment never materializes). Column pruning is pushed down:
  * a `select(url)` over a crawl does not copy payload bytes into rows.
  *
  * Error semantics are FAILFAST like Spark's file sources: malformed
  * framing fails the task with the parser's NAMED error. The extraction
  * pipeline's per-file CONTAINMENT path (one failure row per rotten
  * segment, job survives) is [[WarcSource.extractFromWarcFiles]] — use
  * that for production ingest; this connector is the queryable relational
  * view of raw segments.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object WarcDataSource {
  /** One row per HTTP response record. `file` carries provenance (which
    * segment), the rest mirror [[WarcSource.ParsedResponse]]. */
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Expand the `path`/`paths` read options through the Hadoop FS (glob-
    * aware, directory-expanding), deterministic order. `paths` arrives as
    * the JSON array DataFrameReader.load(p*) encodes; the values are
    * framework-authored (no escapes beyond \" and \\ in practice), parsed
    * here without a JSON library dependency. */
  def resolvePaths(options: CaseInsensitiveStringMap,
                   conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val raw: Seq[String] =
      Option(options.get("paths")).map(parseJsonStringArray).getOrElse(Seq.empty) ++
        Option(options.get("path")).toSeq
    require(raw.nonEmpty, "warc source needs a path: spark.read.format(\"warc\").load(<path>)")
    raw.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val matches = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      require(matches.nonEmpty, s"warc path matches nothing: $p")
      matches.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }.map(_.getPath.toString)
    }.distinct.sorted
  }

  private def parseJsonStringArray(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    var cur: StringBuilder = null
    while (i < s.length) {
      val c = s.charAt(i)
      if (cur == null) { if (c == '"') cur = new StringBuilder }
      else c match {
        case '\\' if i + 1 < s.length => cur.append(s.charAt(i + 1)); i += 1
        case '"' => out += cur.toString; cur = null
        case other => cur.append(other)
      }
      i += 1
    }
    out.result()
  }
}

private[sources] class WarcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "warc"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // table-level options carry the load() paths; scan options may add more
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(scanOptions.asCaseSensitiveMap())
    new WarcScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class WarcScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WarcScan(options, required)
}

private[sources] case class WarcInputPartition(path: String) extends InputPartition

private[sources] class WarcScan(options: CaseInsensitiveStringMap,
                                required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = "graft WARC segments (one partition per object)"

  // driver-side only (plan time): the active session's Hadoop conf
  private def driverHadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  override def planInputPartitions(): Array[InputPartition] =
    WarcDataSource.resolvePaths(options, driverHadoopConf)
      .map(WarcInputPartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(new WarcSource.SerializableHadoopConf(driverHadoopConf), required)
}

private[sources] class WarcReaderFactory(conf: WarcSource.SerializableHadoopConf,
                                         required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].path,
      conf.value, required)
}

/** Streams one segment's response records as InternalRows, projecting only
  * the pruned columns (an unselected payload column is never copied). */
private[sources] class WarcPartitionReader(path: String,
                                           conf: org.apache.hadoop.conf.Configuration,
                                           required: StructType)
    extends PartitionReader[InternalRow] {

  private val hp = new org.apache.hadoop.fs.Path(path)
  private val stream = new java.io.BufferedInputStream(
    hp.getFileSystem(conf).open(hp), 64 * 1024)
  private val records = WarcSource.parseStream(stream)
  private val fileUtf8 = UTF8String.fromString(path)
  // column extractors bound once per reader, in required-schema order
  private val getters: Array[WarcSource.ParsedResponse => Any] =
    required.fields.map[WarcSource.ParsedResponse => Any] { f =>
      f.name match {
        case "file" => _ => fileUtf8
        case "url" => r => UTF8String.fromString(r.url)
        case "date" => r => UTF8String.fromString(r.date)
        case "status" => r => r.status
        case "content_type" => r => UTF8String.fromString(r.contentType)
        case "payload" => r => r.payload
        case other => throw new IllegalArgumentException(s"unknown warc column $other")
      }
    }

  private var current: WarcSource.ParsedResponse = _
  private val row =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(getters.length)

  override def next(): Boolean = {
    if (records.hasNext) { current = records.next(); true }
    else false
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < getters.length) { row.update(i, getters(i)(current)); i += 1 }
    row
  }

  override def close(): Unit = stream.close()
}
