package graft.model

import java.sql.Timestamp

/** Input row of the webpages table, per BASELINE.json input_hint:
  * (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
  * `text` is the golden: the byte-exact extraction expected for `html`.
  */
case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Per-document extraction result. Shape mirrors the reference's conversion
  * result record (/root/reference/src/converters/document_converters.py:128-137:
  * success, input/output identity, format_from/to, sizes, message/error),
  * re-keyed on `url` since documents are table rows, not files.
  */
case class ExtractionResult(
    url: String,
    success: Boolean,
    text: String,
    format_from: String,
    original_size: Long,
    new_size: Long,
    error: String,
    partition_id: Int)

/** Per-partition lineage + metrics row (north_rule: "per-partition lineage +
  * extraction metrics (docs, bytes, failures)"). Persistent analog of the
  * reference's in-memory history (/root/reference/src/core/base_converter.py:89-100). */
case class PartitionMetrics(
    run_id: String,
    partition_id: Int,
    docs: Long,
    bytes_in: Long,
    bytes_out: Long,
    failures: Long)

/** Processed-partition manifest entry for checkpoint/resume at partition
  * granularity (north_rule). */
case class ManifestEntry(
    run_id: String,
    partition_id: Int,
    status: String,
    docs: Long)
