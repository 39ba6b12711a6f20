package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kernel-twin contract for `graft_json_long`
  * ([[graft.functions.JsonLong]]): the single-byte-pass extractor must
  * be indistinguishable from BOTH composable forms it replaces —
  * `from_json(j, "k BIGINT").k` (gl_jsonl_parse's twin) and
  * `CAST(get_json_object(j, '$.k') AS BIGINT)` (q_json_extract's twin)
  * — on the corpus and on an adversarial set covering every null
  * contract the scaladoc declares. */
class JsonKernelSpec extends SparkSpec {

  private def kernel(j: org.apache.spark.sql.Column) =
    call_function("graft_json_long", j, lit("k"))

  test("kernel == from_json == get_json_object on the corpus") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val rows = Tables.events(spark, sf)
      .select(
        kernel(col("props")).as("got"),
        from_json(col("props"), StructType.fromDDL("k BIGINT"))
          .getField("k").as("twin1"),
        get_json_object(col("props"), "$.k").cast("long").as("twin2"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.get(0) === r.get(1), s"kernel vs from_json: $r")
      assert(r.get(0) === r.get(2), s"kernel vs get_json_object: $r")
    }
  }

  test("adversarial shapes agree with the from_json twin") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val cases = Seq(
      """{"k": 42}""", """{"k":-7}""", """{ "k" : 0 }""",
      """{"k": 9223372036854775807}""", // Long.MaxValue
      """{"k": -9223372036854775808}""", // Long.MinValue exact
      """{"k": 9223372036854775808}""", // overflow → null
      """{"k": 1.5}""", """{"k": 1e3}""", """{"k": "12"}""",
      """{"k": true}""", """{"k": null}""", """{"k": [1]}""",
      """{"k": {"x": 1}}""",
      """{"a": 1, "k": 2}""", """{"a": "k", "k": 3}""", // key-valued string decoy
      """{"a": "\"k\": 9", "k": 4}""", // escaped decoy inside a string
      """{"nested": {"k": 5}}""", // nested k is NOT top-level → null
      """{"nested": {"k": 5}, "k": 6}""",
      """{"arr": [{"k": 7}], "k": 8}""",
      """{"kk": 9}""", """{"K": 10}""", // near-miss keys
      """{}""", """[1,2]""", """not json""", """{"k"}""", "",
      // ADVICE round 7: dirty-input strictness + escaped keys
      """{"k": 1""", // truncated object → strict twin nulls
      """{"k": 0123}""", // leading zero — not JSON grammar
      """{"k": 1} junk""", // trailing bytes ignored (from_json reads one root)
      """{"k": 1}   """, // trailing whitespace is fine
      """{"k": 2, "a": }""", // malformed AFTER the matched key
      "{\"\\u006b\": 13}", // escaped key == k (literal backslash-u)
      "{\"\\u006B\": 14}", // uppercase hex digits
      "{\"\\u006bb\": 15}", // escaped key == kb, near-miss
      """{"k": -0}""" // -0 is valid JSON
    )
    val rows = cases.toDF("j")
      .select(col("j"), kernel(col("j")).as("got"),
        from_json(col("j"), StructType.fromDDL("k BIGINT"))
          .getField("k").as("twin"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) === r.get(2), s"on input ${r.getString(0)}: got=${r.get(1)} twin=${r.get(2)}")
    }
    // spot-pin the values the twin comparison could vacuously null
    val byInput = rows.map(r => r.getString(0) -> r.get(1)).toMap
    assert(byInput("""{"k": 42}""") === 42L)
    assert(byInput("""{"nested": {"k": 5}, "k": 6}""") === 6L)
    assert(byInput("""{"a": "\"k\": 9", "k": 4}""") === 4L)
    assert(byInput("""{"k": -9223372036854775808}""") === Long.MinValue)
    assert(byInput("""{"nested": {"k": 5}}""") === null)
    assert(byInput("{\"\\u006b\": 13}") === 13L)
    assert(byInput("{\"\\u006B\": 14}") === 14L)
    assert(byInput("""{"k": 1} junk""") === 1L)
    assert(byInput("""{"k": 1}   """) === 1L)
    assert(byInput("""{"k": 0123}""") === null)
  }

  test("duplicate keys: first wins, the get_json_object convention") {
    // the composable twins themselves DISAGREE here (Jackson/from_json
    // takes the last occurrence, get_json_object the first); the
    // kernel follows get_json_object, and the corpus contract is
    // no-duplicates so the gl_jsonl_parse gate is unaffected
    graft.plans.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val r = Seq("""{"k": 11, "k": 12}""").toDF("j")
      .select(kernel(col("j")).as("got"),
        get_json_object(col("j"), "$.k").cast("long").as("twin"))
      .collect().head
    assert(r.get(0) === r.get(1))
    assert(r.get(0) === 11L)
  }
}
