package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-JVM alternating A/B of gl_proto_parse's encode projection:
  * the original higher-order `filter(array(...), lambda)` fields list
  * (ArrayFilter is CodegenFallback — it pushes the whole encode
  * Project out of whole-stage codegen) vs the round-12 CASE form that
  * keeps the projection compiled. Both arms run the FULL served
  * pipeline (encode ∘ decode ∘ double explode); only the fields-list
  * construction differs — the same host-noise-robust protocol as
  * [[VersionerProbe]].
  *
  *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.ProtoProbe"
  */
object ProtoProbe {
  private def pipeline(s: SparkSession, d: String, fields: Column): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(s)
    graft.sources.EntityChanges.changes(s, d)
      .select(col("block_num"),
        call_function("graft_entity_changes_encode", array(struct(
          lit("user_state").as("entity"),
          col("id"),
          col("block_num").cast("long").as("ordinal"),
          concat(lit("OPERATION_"), col("op")).as("op"),
          fields.as("fields")))).as("payload"))
      .select(col("block_num"),
        explode(call_function("graft_entity_changes", col("payload"))).as("c"))
      .select(col("block_num"), col("c.entity").as("entity"), col("c.id").as("id"),
        col("c.ordinal").as("ordinal"), col("c.op").as("op"),
        explode(col("c.fields")).as("f"))
      .select(col("block_num"), col("entity"), col("id"), col("ordinal"), col("op"),
        col("f.name").as("field_name"), col("f.vtype").as("vtype"),
        col("f.value").as("field_value"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val vCast = col("value").cast("decimal(20,2)").cast("string")
    val vStruct = struct(lit("value").as("name"), lit("Bigdecimal").as("vtype"),
      vCast.as("value"))
    val pStruct = struct(lit("props").as("name"), lit("String").as("vtype"),
      col("props").as("value"))
    val lambdaFields = filter(array(vStruct, pStruct), f => f("value").isNotNull)
    val caseFields =
      when(vCast.isNotNull && col("props").isNotNull, array(vStruct, pStruct))
        .when(vCast.isNotNull, array(vStruct))
        .when(col("props").isNotNull, array(pStruct))
        .otherwise(slice(array(vStruct), 1, 0))

    def time(fields: Column): Double = {
      val t0 = System.nanoTime()
      pipeline(spark, sfDir, fields).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "7").toInt
    time(lambdaFields); time(caseFields) // warm both arms
    val samples = (1 to n).map(_ => (time(lambdaFields), time(caseFields)))
    val as = samples.map(_._1).sorted
    val bs = samples.map(_._2).sorted
    println(f"[probe] gl_proto_parse lambda-filter min=${as.head}%.3f med=${as(n / 2)}%.3f | case min=${bs.head}%.3f med=${bs(n / 2)}%.3f")
    spark.stop()
  }
}
