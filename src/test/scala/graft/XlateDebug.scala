package graft

/** Scratch: print PgDialect translations for debugging (Test scope). */
object XlateDebug {
  def main(args: Array[String]): Unit = {
    val qs = if (args.nonEmpty) args.toSeq else Seq(
      "SELECT i, i::varchar(256) FROM generate_series(1, 100) i")
    qs.foreach(q =>
      println("XLATE>>" + sql.PgDialect.translate(q) + "<<"))
  }
}
