package graft

/** Throwaway diagnostics runner (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    spark.range(1000000).selectExpr("sum(id)").collect()
    t("warm q") { queries.TextAnalysis.txTrainQuality(spark, sfDir)
      .write.format("noop").mode("overwrite").save() }
    t("run2") { queries.TextAnalysis.txTrainQuality(spark, sfDir)
      .write.format("noop").mode("overwrite").save() }
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val jl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        println(s"JOB ${j.jobId} stages=${j.stageInfos.map(si => si.stageId + ":" + si.name.take(60)).mkString(" | ")}")
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        println(s"STAGE ${si.stageId} tasks=${si.numTasks} ms=$ms ${si.name.take(70)}")
      }
    }
    spark.sparkContext.addSparkListener(jl)
    listener.reset()
    t("run3") { queries.TextAnalysis.txTrainQuality(spark, sfDir)
      .write.format("noop").mode("overwrite").save() }
    listener.quiesce()
    println(s"stages=${listener.stages.get()} shuffleMB=${listener.shuffleWrite.get() / 1e6}")
    spark.stop()
  }
}
