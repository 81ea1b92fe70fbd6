package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic backward as-of join — for each left row, the latest right
  * row with `rightTs <= leftTs` within the same key group (absent in
  * the reference — `SURVEY.md §2.3`; DuckDB's native ASOF JOIN is the
  * oracle for the query form).
  *
  * Implementation is union + tagged ordering + running `last_value`,
  * NOT a range join: both sides shuffle ONCE on the key columns, the
  * per-key sort is linear, and no (left × candidate-right) pair blowup
  * ever materializes. At 100 TB this is the difference between a
  * merge-scan per key and a range-join explosion — the same reason
  * time-series stores implement as-of as a sorted merge.
  *
  * Ties (`rightTs == leftTs`) match, mirroring ASOF JOIN's `<=`: right
  * rows sort before left rows at equal timestamps.
  */
object AsOfJoin {

  /** Left rows enriched with `pick` columns from the as-of right row
    * (null when no right row precedes). Output = left.* ++ pick
    * (right-side names, `asof_` prefixed). */
  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, pick: Seq[String]): DataFrame = {
    val keyCols = on.map(col)
    val leftRow = struct(left.columns.map(col).toSeq: _*)
    val rightVal = struct(pick.map(col): _*)
    val l = left.select(keyCols :+ col(leftTs).as("__t") :+ lit(1).as("__tag")
      :+ leftRow.as("__lrow") :+ lit(null).cast(
        right.select(rightVal).schema.fields.head.dataType).as("__rv"): _*)
    val r = right.select(keyCols :+ col(rightTs).as("__t") :+ lit(0).as("__tag")
      :+ lit(null).cast(left.select(leftRow).schema.fields.head.dataType)
        .as("__lrow") :+ rightVal.as("__rv"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val leftOut = left.columns.toSeq.map(c => col("__lrow").getField(c).as(c))
    val pickOut = pick.map(p => col("__last").getField(p).as(s"asof_$p"))
    joined.select(leftOut ++ pickOut: _*)
  }
}
