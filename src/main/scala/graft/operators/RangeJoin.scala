package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — the second operator Spark lacks
  * natively (a naive formulation is a cross join with a range predicate,
  * which Spark executes as BroadcastNestedLoopJoin or a full cartesian).
  *
  * Bucketed-equi-join design: intervals are exploded onto fixed-width time
  * buckets they overlap, points are stamped with their bucket, and the join
  * becomes an EQUI join on (key, bucket) + an exact containment filter —
  * shuffle-hash-joinable, linear in data size (each interval lands on
  * ceil(span/bucket)+1 buckets). Pick `bucketSeconds` ≈ typical interval
  * span so the blow-up factor stays ~2.
  */
object RangeJoin {

  /** Rows of `points` joined to every row of `intervals` whose
    * [loCol, hiCol] contains the point's ts (inclusive both ends),
    * equi-matched on (pointKey == intervalKey). Column names of the two
    * inputs must be disjoint. */
  def pointInInterval(points: DataFrame, pointKey: String, pointTs: String,
                      intervals: DataFrame, intervalKey: String,
                      loCol: String, hiCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must have disjoint column names")
    val p = points.withColumn("__pb", floor(unix_timestamp(col(pointTs)) / bucketSeconds))
    val i = intervals
      .withColumn("__ib", explode(sequence(
        floor(unix_timestamp(col(loCol)) / bucketSeconds),
        floor(unix_timestamp(col(hiCol)) / bucketSeconds))))
    p.join(i,
        col(pointKey) === col(intervalKey) && col("__pb") === col("__ib") &&
          col(pointTs) >= col(loCol) && col(pointTs) <= col(hiCol))
      .drop("__pb", "__ib")
  }
}
