package graft

/** Pins gl_proto_parse's round-12 map-only serve (one one-change
  * EntityChanges message per change row, zero exchange) against the
  * block-framed form it replaced (one message per block via
  * groupBy+collect_list): the flattened field rows must be identical —
  * exploding one N-change message ≡ exploding N one-change messages. */
class ProtoParseFramingSpec extends SparkSpec {

  test("map-only serve == block-framed twin on the corpus") {
    val served = graft.queries.GraphLoad.glProtoParse(spark, sf)
      .collect().map(_.toSeq).toSeq
    val framed = graft.queries.GraphLoad.glProtoParseBlockFramed(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served.nonEmpty)
    // order-insensitive: the oracle sorts; framing only changes row order
    assert(served.groupBy(identity).view.mapValues(_.size).toMap ==
      framed.groupBy(identity).view.mapValues(_.size).toMap)
  }
}
