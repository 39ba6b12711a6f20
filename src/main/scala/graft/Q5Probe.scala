package graft

/** One-off diagnostic: explain + run q5_multijoin on SPARK_GRAFT_SF_DIR,
  * dumping the physical plan and any executor failure unfiltered. */
object Q5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.queries.Analytics.q5Multijoin(spark, sfDir)
    println("==== PLAN ====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    println("==== RUN ====")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"q5 ok in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
