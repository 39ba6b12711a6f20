package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Decomposes the per-query serving floor (the ~0.11 s every benched
  * key pays regardless of data size) into its phases, so floor work
  * targets the real cost instead of folklore. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.FloorProbe"
  *
  * Prints min/median per phase over N trivial 1-row scan→noop-write
  * round trips: Catalyst tracker phases (analysis / optimization /
  * planning) vs end-to-end wall, the difference being execution-side
  * (job scheduling, task launch, AQE stage turnaround, commit).
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_CONFS="k=v;k=v" — arbitrary conf overrides for floor
    // A/B experiments (static confs included: applied at first-session
    // build, which is what this main creates)
    val b = GraftSession.builder(s"local[$cpus]", cpus.toInt)
    sys.env.get("SPARK_GRAFT_CONFS").toSeq
      .flatMap(_.split(';')).map(_.split("=", 2)).foreach {
        case Array(k, v) => b.config(k, v)
        case _ =>
      }
    val spark = b.getOrCreate()
    graft.plans.GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")

    @volatile var lastPhases: Map[String, Long] = Map.empty
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        lastPhases = qe.tracker.phases.map { case (k, v) => k -> (v.endTimeMs - v.startTimeMs) }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    def once(): (Double, Map[String, Long]) = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/region.parquet").limit(1)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(20) // let the QueryExecutionListener event land (untimed)
      (wall, lastPhases)
    }

    once(); once() // warm: codegen, FS metadata, class loading
    val n = 21
    val samples = (1 to n).map { _ => Thread.sleep(100); once() }
    val walls = samples.map(_._1).sorted
    println(f"wall ms: min=${walls.head}%.1f p50=${walls(n / 2)}%.1f max=${walls.last}%.1f")
    val phaseKeys = samples.flatMap(_._2.keys).distinct
    phaseKeys.foreach { k =>
      val vs = samples.map(_._2.getOrElse(k, 0L)).sorted
      println(f"phase $k%-16s min=${vs.head}%3d p50=${vs(n / 2)}%3d max=${vs.last}%3d ms")
    }
    // a second shape: one 32-partition exchange (the wave floor)
    def wave(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 32 * 64, 1, 4).repartition(32)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e6
    }
    wave()
    val ws = (1 to 11).map { _ => Thread.sleep(100); wave() }.sorted
    println(f"wave ms: min=${ws.head}%.1f p50=${ws(5)}%.1f")
    spark.stop()
  }
}
