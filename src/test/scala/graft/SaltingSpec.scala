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

  test("salted join equals the plain join row-for-row on a degenerate key") {
    import spark.implicits._
    // 3-value join key over the whole fact table — the structural-skew
    // shape q_skew_join targets
    val fact = Tables.events(spark, sf)
      .withColumn("k", ($"event_id" % 3).cast("long"))
    val dim = Seq((0L, "a", 2L), (1L, "b", 3L), (2L, "c", 5L))
      .toDF("k", "name", "w")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1))
    val plain = fact.join(dim, Seq("k"))
      .groupBy($"k", $"name").agg(sum($"user_id" * $"w").as("s"), count(lit(1)).as("n"))
      .collect().map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    val salted = Salting.saltedJoin(fact, dim, "k", $"event_id", salts = 8)
      .groupBy($"k", $"name").agg(sum($"user_id" * $"w").as("s"), count(lit(1)).as("n"))
      .collect().map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    assert(salted === plain)
  }

  test("salted join replicates each dim row once per salt") {
    import spark.implicits._
    val fact = Seq((1L, 0L), (2L, 0L)).toDF("event_id", "k")
    val dim = Seq((0L, "a")).toDF("k", "name")
    // every fact row must still match: the salt values cover pmod range
    val joined = Salting.saltedJoin(fact, dim, "k", $"event_id", salts = 4)
    assert(joined.count() === 2)
  }
}
