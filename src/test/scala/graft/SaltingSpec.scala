package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("salted aggregation equals the direct aggregation on a skewed key") {
    import spark.implicits._
    // heavily skewed: 90% of events mapped to one hot key
    val skewed = Tables.events(spark, sf)
      .withColumn("k", when($"user_id" < 12, lit(0L)).otherwise($"user_id"))
    val direct = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(20,2)")).as("s"),
        max($"event_id").as("m"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDecimal(2), r.getLong(3)))).toMap
    val salted = Salting.saltedAgg(skewed, $"k", $"event_id", salts = 8)(
      (lit(1), "count"), ($"value".cast("decimal(20,2)"), "sum"), ($"event_id", "max"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDecimal(2), r.getLong(3)))).toMap
    assert(salted === direct)
  }

  test("salting spreads the hot key across partial groups") {
    import spark.implicits._
    val skewed = Tables.events(spark, sf).withColumn("k", lit(0L))
    val partials = skewed.withColumn("__salt", pmod(hash($"event_id"), lit(8)))
      .groupBy($"k", $"__salt").count().collect()
    assert(partials.length === 8) // one hot key split 8 ways
  }
}
