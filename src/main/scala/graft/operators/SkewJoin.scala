package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual complement to AQE's
  * skew-join splitting (`spark.sql.adaptive.skewJoin`), for when one
  * key's rows exceed what a single reducer should hold (the classic
  * 100 TB hot-tenant problem; the reference hits the same wall when one
  * tenant's shard dominates — its answer is tenant isolation, ours is
  * salting).
  *
  * Left (large, skewed) rows get a random-ish salt in [0, n); right
  * (dimension-ish, but too big to broadcast) rows are replicated n
  * ways. The join key becomes (key, salt): the hot key's rows spread
  * over n reducers instead of one. Deterministic salt (hash of the
  * whole left row) keeps runs reproducible.
  */
object SkewJoin {

  /** Inner equi-join `left(key) = right(key)` with `salt`-way spreading
    * of the left side. Output columns = left ++ right (minus the
    * duplicate key on the right). */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salt))
        .cast("int"))
    val rightReplicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    leftSalted.join(rightReplicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Skew diagnosis: rows per key, largest keys first — the decision
    * input for choosing salt width (keys whose row count exceeds a
    * reducer's budget need salting). */
  def keyHistogram(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
}
