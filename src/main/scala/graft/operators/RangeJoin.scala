package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join via time-bucket binning.
  *
  * A join whose only predicate is `point BETWEEN start AND end` gives
  * Catalyst nothing to hash on: the plan degenerates to
  * BroadcastNestedLoopJoin (or a cartesian) — quadratic work and, at
  * scale, an OOM broadcast. The reference has no range-join operator
  * either (SURVEY §2.3); this operator is the standard scale-out
  * rewrite: quantize time into fixed buckets, replicate each interval
  * into the buckets it overlaps, equi-join points to intervals on the
  * bucket id (ONE hash shuffle), then apply the exact containment
  * predicate as a residual filter.
  *
  * Correctness: a point's bucket is always within its containing
  * interval's bucket range, so no match is lost; each (point,
  * interval) pair meets in exactly one bucket (the point's), so no
  * duplicates arise. Cost: interval replication = ceil(len/bucket) —
  * pick `bucketSeconds` near the median interval length so replication
  * is O(1) per interval and the shuffle stays proportional to the
  * inputs. Hot buckets (many intervals at the same time) can carry
  * `extraKeys` (e.g. user_id) to subdivide the shuffle key.
  */
object RangeJoin {

  /** Join `points` (event rows with timestamp `pointTs`) to `intervals`
    * (rows with `[startCol, endCol)` timestamps), optionally also
    * equi-keyed on `extraKeys` present on both sides. Emits matched
    * pairs with all columns of both inputs. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, startCol: String, endCol: String,
      bucketSeconds: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    val bcol = "__graft_range_bucket"
    require(!points.columns.contains(bcol) &&
      !intervals.columns.contains(bcol),
      s"inputs must not carry a $bcol column")
    val b = lit(bucketSeconds)
    val p = points.withColumn(bcol,
      floor(unix_timestamp(col(pointTs)) / b))
    val iv = intervals.withColumn(bcol,
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / b),
        floor(unix_timestamp(col(endCol)) / b))))
    p.join(iv, Seq(bcol) ++ extraKeys)
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop(bcol)
  }
}
