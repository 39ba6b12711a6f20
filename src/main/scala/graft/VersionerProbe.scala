package graft

import org.apache.spark.sql.DataFrame

/** Single-JVM alternating A/B of the SCD2/squash string-keyed forms vs
  * the round-12 all-numeric serving twins (the host-noise-robust
  * protocol: both arms sample every window, min/median over N
  * alternations — the same methodology that adjudicated the
  * q_retention fold-vs-agg and gl_typed_bigdecimal opcode switches).
  *
  *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.VersionerProbe"
  */
object VersionerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.EntityVersioner._
    import graft.sources.EntityChanges

    def chS: DataFrame = EntityChanges.changes(spark, sfDir)
    def chU: DataFrame = EntityChanges.changesOpcode(spark, sfDir)
    val pairs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("squash_latest", () => squashLatest(chS), () => squashLatestNumeric(chU)),
      ("scd2_versions", () => scd2Versions(chS), () => scd2VersionsNumeric(chU)),
      ("delete_tombstone", () => deleteTombstone(chS), () => deleteTombstoneNumeric(chU)))

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "7").toInt
    pairs.foreach { case (name, a, b) => // warm both arms
      time(a); time(b)
      // strictly alternating samples: a load burst lands on both arms
      val samples = (1 to n).map(_ => (time(a), time(b)))
      val as = samples.map(_._1).sorted
      val bs = samples.map(_._2).sorted
      println(f"[probe] $name%-18s string min=${as.head}%.3f med=${as(n / 2)}%.3f | numeric min=${bs.head}%.3f med=${bs(n / 2)}%.3f")
    }
    spark.stop()
  }
}
