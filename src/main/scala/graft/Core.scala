package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table registry for the driver-generated test data
  * (TESTDATA.md: TPC-H-ish star schema + events/documents/embeddings).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is a nanosecond parquet timestamp, which Spark's reader
      // rejects by default (PARQUET_TYPE_ILLEGAL). Read it as a Long of
      // epoch-nanos; Dsl.nanosToTs converts where timestamp semantics are
      // needed.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  * Queries without an oracle get a weaker rows-only check (sketches etc.).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** headline queries are timed by Bench */
    bench: Boolean = false)

trait QueryModule { def queries: Seq[GraftQuery] }

/** Column helpers shared by the query modules.
  *
  * Numeric-exactness discipline: the driver hash-compares our result
  * values against DuckDB's. Floating-point SUM is order-dependent, so any
  * aggregated money/quantity math is done in exact DECIMAL and only cast
  * to DOUBLE at the end — the decimal sum is bit-identical in both
  * engines, and decimal→double cast is IEEE-deterministic. Raw double
  * columns pass through untouched (also bit-identical).
  */
object Dsl {
  /** money/quantity column (2-decimal doubles in the data) → exact decimal */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** (1 - rate) as a tight decimal — keeps product precision ≤ 38 */
  def oneMinus(c: Column): Column = (lit(1.0) - c).cast(DecimalType(4, 2))
  def onePlus(c: Column): Column = (lit(1.0) + c).cast(DecimalType(4, 2))

  /** exact decimal sum surfaced as double (bit-identical across engines) */
  def dsum(c: Column): Column = sum(c).cast(DoubleType)

  /** exact average: decimal sum cast to double, divided by the count */
  def davg(c: Column): Column = sum(c).cast(DoubleType) / count(c)

  /** revenue expression: l_extendedprice * (1 - l_discount), exact */
  def revenue(ep: Column, disc: Column): Column = money(ep) * oneMinus(disc)

  def ts(s: String): Column =
    lit(java.sql.Timestamp.valueOf(if (s.length == 10) s + " 00:00:00" else s))

  /** events.ts arrives as epoch-nanos Long (see Tables.apply) — convert
    * to a microsecond timestamp for date_trunc/window arithmetic.
    * NB: long `/` in Spark SQL returns DOUBLE, and epoch-nanos exceed
    * 2^53, so naive division rounds the last microsecond — divide in
    * DECIMAL (exact) and truncate instead. */
  def nanosToTs(c: Column): Column =
    timestamp_micros((c.cast(DecimalType(25, 0)) / 1000).cast(LongType))
}
