package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Dsl._

/** Dev tool (round 13, not part of the driver contract): interleaved
  * A/B of the r12 join shapes (inline, "old") vs the r13 optimized
  * entries in SparkEntry ("new") for the two forced-shuffle bench
  * queries. Also value-checks old vs new row sets before timing.
  * Same session config as Bench; one JVM, shared JIT/caches.
  */
object JoinTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-join-tune")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.pinForBench(spark, sfDir)
    def t(n: String): DataFrame = Tables(spark, sfDir, n)

    // r12 shapes, inline (round(x*100) cents + merge hints + r12 order)
    def centsOld(c: Column) = round(c * 100).cast(LongType)
    def omcOld(c: Column) = round((lit(1.0) - c) * 100).cast(LongType)

    def factOld(): DataFrame =
      t("orders").hint("merge")
        .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          (sum(centsOld(col("l_extendedprice")) * omcOld(col("l_discount")))
            .cast(DoubleType) / 10000).as("revenue"))
        .orderBy(col("o_orderstatus"))

    def chOld(): DataFrame = {
      val li = t("lineitem")
      val ord = t("orders")
        .filter(col("o_orderdate").between(ts("1995-01-01"), ts("1996-12-31")))
      val n1 = broadcast(t("nation").select(
        col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region")))
      val n2 = broadcast(t("nation").select(
        col("n_nationkey").as("n2_key"), col("n_name").as("n2_name")))
      val reg = broadcast(t("region").filter(col("r_name") === "EUROPE"))
      val rev = centsOld(col("l_extendedprice")) * omcOld(col("l_discount"))
      li.hint("merge")
        .join(t("supplier"),
          pmod(col("l_partkey") * col("l_suppkey"), lit(100L)) === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t("customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("c_nationkey") === col("n1_key"))
        .join(reg, col("n1_region") === col("r_regionkey"))
        .join(n2, col("s_nationkey") === col("n2_key"))
        .groupBy(year(col("o_orderdate")).as("l_year"))
        .agg((sum(when(col("n2_name") === "GERMANY", rev).otherwise(lit(0L)))
          .cast(DoubleType) / sum(rev).cast(DoubleType)).as("mkt_share"))
        .orderBy(col("l_year"))
    }

    val qmap = SparkEntry.queries
    def factNew(): DataFrame = qmap("join_shuffle_fact")(spark, sfDir)
    def chNew(): DataFrame = qmap("ch_market_share_repartition")(spark, sfDir)

    // r13 batch-2 candidates: EAGER AGGREGATION below the repartition
    // exchange (guide §2.3 "aggregate before you shuffle"): the fact
    // side partially aggregates BY THE JOIN KEY before the exchange,
    // shrinking exchanged rows (join key is unique on the build side,
    // so per-key partials compose exactly).
    def factPre(): DataFrame = {
      val li = t("lineitem")
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) *
            oneMinusCents(col("l_discount"))).as("rev4"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("cnt"), sum(col("rev4")).as("rev4s"))
      t("orders").hint("shuffle_hash")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("cnt")).as("n_lines"),
          (sum(col("rev4s")).cast(DoubleType) / 10000).as("revenue"))
        .orderBy(col("o_orderstatus"))
    }
    def chPre(): DataFrame = {
      val ord = t("orders")
        .filter(col("o_orderdate").between(ts("1995-01-01"), ts("1996-12-31")))
      val n1 = broadcast(t("nation").select(
        col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region")))
      val n2 = broadcast(t("nation").select(
        col("n_nationkey").as("n2_key"), col("n_name").as("n2_name")))
      val reg = broadcast(t("region").filter(col("r_name") === "EUROPE"))
      val custEur = broadcast(t("customer")
        .join(n1, col("c_nationkey") === col("n1_key"))
        .join(reg, col("n1_region") === col("r_regionkey"))
        .select(col("c_custkey")))
      val suppGer = t("supplier")
        .join(n2, col("s_nationkey") === col("n2_key"))
        .select(col("s_suppkey"), (col("n2_name") === "GERMANY").as("is_ger"))
      val liOrd = t("lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(custEur, col("o_custkey") === col("c_custkey"))
        .select(
          pmod(col("l_partkey") * col("l_suppkey"), lit(100L)).as("link_key"),
          (cents(col("l_extendedprice")) *
            oneMinusCents(col("l_discount"))).as("rev4"),
          year(col("o_orderdate")).as("l_year"))
        .groupBy(col("link_key"), col("l_year"))
        .agg(sum(col("rev4")).as("rev4s"))
      liOrd.join(suppGer.hint("shuffle_hash"),
          col("link_key") === col("s_suppkey"))
        .groupBy(col("l_year"))
        .agg((sum(when(col("is_ger"), col("rev4s")).otherwise(lit(0L)))
          .cast(DoubleType) / sum(col("rev4s")).cast(DoubleType)).as("mkt_share"))
        .orderBy(col("l_year"))
    }

    // value check: old vs new result rows must be identical
    Seq(("fact", factOld _, factNew _), ("ch", chOld _, chNew _),
        ("fact_pre", factOld _, factPre _), ("ch_pre", chOld _, chPre _))
      .foreach {
      case (n, o, nw) =>
        val a = o().collect().map(_.toString).sorted.toSeq
        val b = nw().collect().map(_.toString).sorted.toSeq
        println(s"VALUECHECK $n identical=${a == b} rows=${a.size}")
        if (a != b) {
          println("  old: " + a.take(3).mkString(" | "))
          println("  new: " + b.take(3).mkString(" | "))
        }
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "fact_old" -> factOld _, "fact_new" -> factNew _,
      "fact_pre" -> factPre _,
      "ch_old" -> chOld _, "ch_new" -> chNew _,
      "ch_pre" -> chPre _)
    (1 to 4).foreach(_ => variants.foreach(_._2().write.format("noop")
      .mode("overwrite").save()))
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to 9).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        samples(n) = samples(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (n, _) =>
      val s = samples(n).sorted
      println(f"TUNE $n%-10s median=${s(s.size / 2)}%6.4f min=${s.head}%6.4f max=${s.last}%6.4f")
    }
    spark.stop()
  }
}
