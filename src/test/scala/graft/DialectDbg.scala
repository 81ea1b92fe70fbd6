package graft

import graft.sql.PgDialect

/** Dev tool: print the dialect translation of a statement read from
  * stdin (or of the SPARK_GRAFT_SQL env var). `sbt "Test/runMain
  * graft.DialectDbg"` — no Spark session needed. */
object DialectDbg {
  def main(args: Array[String]): Unit = {
    val sql = sys.env.getOrElse("SPARK_GRAFT_SQL",
      scala.io.Source.stdin.mkString)
    println(PgDialect.translate(sql))
    // SPARK_GRAFT_RUN=1: additionally execute against the reference's
    // behavioral fixtures to surface the real analysis error
    if (sys.env.contains("SPARK_GRAFT_RUN")) {
      val spark = TestSpark.spark
      val dataDir = "/root/reference/src/test/regress/data"
      spark.read
        .schema("user_id int, time timestamp, value_1 int, " +
          "value_2 int, value_3 double, value_4 bigint")
        .csv(s"$dataDir/users_table.data")
        .createOrReplaceTempView("users_table")
      spark.read
        .schema("user_id int, time timestamp, event_type int, " +
          "value_2 int, value_3 double, value_4 bigint")
        .csv(s"$dataDir/events_table.data")
        .createOrReplaceTempView("events_table")
      PgDialect.sql(spark, sql).show(20, false)
    }
  }
}
