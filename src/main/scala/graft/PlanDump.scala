package graft

/** Optimization-round evidence tool (guide §1.2/§7.2): writes
  * `.explain("formatted")` for every declared query (or a named subset)
  * to `<outDir>/<query>_<suffix>.txt`, one fresh `newSession()` per
  * query so session memos never hide a query's own plan. Read-only with
  * respect to the bench contract — Bench/Verify/oracleSql untouched.
  *
  * {{{ sbt "runMain graft.PlanDump plans/r09 before [query...]" }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: PlanDump <outDir> <suffix> [query...]")
      sys.exit(2)
    }
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val sess = spark.newSession()
      val df = SparkEntry.queries(name)(sess, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), txt)
      sess.catalog.clearCache()
      println(s"wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
