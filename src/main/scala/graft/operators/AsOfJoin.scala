package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively, composed
  * from built-ins per the preference order (compose > custom plan): for each
  * left row, attach the most recent right row whose timestamp is <= the
  * left timestamp, equi-matched on a key.
  *
  * Union-and-window design: tag both sides, union, one window over
  * (key, ts, side) carrying the right-side values forward with
  * last(ignoreNulls). ONE shuffle on the key, no range cross-join, no
  * per-key driver state — at 10^12 rows this is a single sort-based window
  * per key partition (skewed keys: pre-salt the left side and replicate the
  * right, same recipe as the extraction pipeline's host salting).
  *
  * Ties (right.ts == left.ts) match, like DuckDB's ASOF JOIN (>=) — the
  * right row sorts before the left row at equal ts via the side tag.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto each left row (names
    *                  must not collide with left's). Unmatched lefts keep
    *                  them null (left-join semantics).
    *
    * The matched right row is carried as ONE struct with a single
    * last(ignoreNulls=true) — never per-column — so all value columns come
    * from the same right row (a NULL inside a newer right row stays NULL
    * rather than being backfilled from an older row). NULL keys follow SQL
    * equality: they never match (right NULL-key rows are dropped; left
    * NULL-key rows pass through unmatched), like DuckDB's ASOF LEFT JOIN.
    *
    * @param saltBuckets for skewed keys: left rows spread across S salt
    *                    buckets (stable hash of the left timestamp) and the
    *                    right side replicates into every bucket, so one hot
    *                    key's window sort fans out over S tasks instead of
    *                    pinning one. Results are identical for any S —
    *                    each salted partition still sees every right row of
    *                    its key. Cost: right side shuffles ×S; size S to
    *                    the observed skew (1 = off, the default). */
  def asof(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
           leftTs: String, rightTs: String, valueCols: Seq[String],
           saltBuckets: Int = 1): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets $saltBuckets")
    val leftCols = left.columns.toSeq
    val r0 = right
      .filter(col(rightKey).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__v"))
    val vType = r0.schema("__v").dataType
    val l0 = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(vType))
    val rAligned = leftCols.foldLeft(r0)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l0.columns.map(col): _*)

    val (lSalted, rSalted) =
      if (saltBuckets == 1)
        (l0.filter(col("__k").isNotNull).withColumn("__salt", lit(0)),
          rAligned.withColumn("__salt", lit(0)))
      else
        (l0.filter(col("__k").isNotNull)
          .withColumn("__salt", pmod(xxhash64(col("__ts")), lit(saltBuckets)).cast("int")),
          rAligned.withColumn("__salt",
            explode(sequence(lit(0), lit(saltBuckets - 1)))))

    val w = Window.partitionBy(col("__k"), col("__salt"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSalted.unionByName(rSalted)
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__salt")
    val out = matched.unionByName(l0.filter(col("__k").isNull))
    valueCols.foldLeft(out)((d, c) => d.withColumn(c, col("__v").getField(c)))
      .drop("__k", "__ts", "__side", "__v")
  }
}
