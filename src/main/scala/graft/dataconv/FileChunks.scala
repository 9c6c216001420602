package graft.dataconv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary chunking / reassembly — the distributed analog of the reference's
  * file split/merge (/root/reference/src/core/file_utils.py:71-101:
  * `split_file` into `stem_partNNN` chunks, `merge_files` concatenating
  * sorted parts). Instead of files on disk, chunks are rows `(id, part_id,
  * chunk: binary)` — the shape that lets a 100MB payload spread across
  * shuffle partitions (size-bucketed repartition feeds on it) and be
  * reassembled by a single groupBy.
  */
object FileChunks {

  /** Explode a binary column into fixed-size chunk rows. Every payload gets
    * at least one part (an empty payload yields one empty chunk — mirrors
    * split_file which always writes part000). */
  def split(df: DataFrame, idCol: String, binCol: String, chunkBytes: Int): DataFrame = {
    // NULL payloads coalesce to empty so the row still yields its one part
    // (a NULL would null the sequence and posexplode would drop the id)
    val payload = coalesce(col(binCol), lit(Array.emptyByteArray))
    val len = length(payload)
    val nParts = greatest(ceil(len.cast("double") / chunkBytes).cast("int"), lit(1))
    df.select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), nParts - 1),
          i => substring(payload, i * chunkBytes + 1, lit(chunkBytes)))))
      .withColumnRenamed("pos", "part_id")
      .withColumnRenamed("col", "chunk")
  }

  /** Reassemble chunk rows into one binary per id: collect, sort by part_id
    * (merge_files' sorted() — file_utils.py:97), fold with binary concat.
    * One shuffle on id; map-side the chunks stay bytes (no decode). */
  def merge(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_parts"),
        array_sort(collect_list(struct(col("part_id"), col("chunk")))).as("parts"))
      .select(col("id"), col("n_parts"),
        aggregate(col("parts"), lit(Array.emptyByteArray),
          (acc, p) => concat(acc, p.getField("chunk"))).as("merged"))
}
