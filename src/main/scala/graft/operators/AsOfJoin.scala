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
    *                  them null (left-join semantics). */
  def asof(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
           leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lAligned = valueCols.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumn("__k", col(rightKey))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__ts"), col("__side")) ++ valueCols.map(col): _*)
    val rAligned = leftCols.foldLeft(r0)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lAligned.columns.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(lAligned.unionByName(rAligned))((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1).drop("__k", "__ts", "__side")
  }
}
