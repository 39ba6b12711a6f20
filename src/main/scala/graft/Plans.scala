package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan dump for every SparkEntry query — the review artifact
  * behind the "explain, then iterate" loop: one formatted plan per
  * query, written to a single file so a round-over-round diff shows
  * every plan change (new exchanges, lost pushdowns, broken
  * whole-stage-codegen spans) at a glance. `PlanSpec` asserts the
  * load-bearing shapes; this dump is for the human (or judge) reading
  * the rest.
  *
  * Usage: `sbt "runMain graft.Plans [sfDir] [outFile]"`
  * (defaults: /root/testdata/sf0.001 → target/plans.txt)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = if (args.length > 1) args(1) else "target/plans.txt"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_ONLY=k1,k2 limits the dump (the Bench convention);
    // SPARK_GRAFT_PLAN_DIR writes one <dir>/<key><suffix>.txt per key
    // (SPARK_GRAFT_PLAN_SUFFIX, e.g. "_before") instead of the single
    // concatenated file — the per-key before/after artifact layout.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // bench-only extras (mirrors Bench.scala) so the iterative-family
    // production-depth plans are dumpable artifacts too
    val extras: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "q_pagerank20" -> ((s, d) => graft.queries.Analytics.qPagerankDepth(s, d, 20)),
      "q_skew_join_prod" -> ((s, d) => graft.queries.Analytics.qSkewJoinProd(s, d)),
      "q_bloom_join_prod" -> ((s, d) => graft.queries.Analytics.qBloomJoinProd(s, d)))
    val picked = (SparkEntry.queries.toSeq ++ extras).sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val sb = new StringBuilder
    picked.foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        catch { case e: Exception =>
          s"PLAN FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}\n"
        }
      planDir match {
        case Some(dir) =>
          Files.createDirectories(Paths.get(dir))
          Files.writeString(Paths.get(dir, s"$name$suffix.txt"), plan)
        case None =>
          sb.append(s"\n${"=" * 72}\n== $name\n${"=" * 72}\n").append(plan)
      }
    }
    if (planDir.isEmpty) {
      Files.createDirectories(Paths.get(outFile).toAbsolutePath.getParent)
      Files.writeString(Paths.get(outFile), sb.toString)
    }
    println(s"[plans] wrote ${picked.size} plans to ${planDir.getOrElse(outFile)}")
    spark.stop()
  }
}
