package graft.plans

import graft.functions.{AlphaCount, BestCent, BigramStats, BpeApply, CharStats, Int128SumProduct, JsonLong, LongDot, Md5Hex, MinhashSigs, NormFingerprint, PairCounts, PiiScrub, PoiHex, PqCodes, PqTable, ProtoEntityChangesEncodeExpr, ProtoEntityChangesExpr, SignBuckets, SimhashText, StepCut}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst registration for graft's native expressions.
  *
  * Two paths to the same registry entry:
  *
  *   - `spark.sql.extensions=graft.plans.GraftExtensions` — the
  *     standard [[SparkSessionExtensions]] hook for sessions the user
  *     builds;
  *   - [[GraftExtensions.ensureRegistered]] — imperative, idempotent,
  *     called by graft query builders so the functions exist even on a
  *     session graft did not construct (e.g. the test driver's).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(e.injectFunction)
}

object GraftExtensions {

  private[plans] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_long_dot"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_long_dot"),
      (args: Seq[Expression]) => LongDot(args(0), args(1))),
    (FunctionIdentifier("graft_sign_buckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "graft_sign_buckets"),
      (args: Seq[Expression]) => SignBuckets(args(0), args(1))),
    (FunctionIdentifier("graft_pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "graft_pq_codes"),
      (args: Seq[Expression]) => PqCodes(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_pq_table"),
      new ExpressionInfo(classOf[PqTable].getName, "graft_pq_table"),
      (args: Seq[Expression]) => PqTable(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_char_stats"),
      new ExpressionInfo(classOf[CharStats].getName, "graft_char_stats"),
      (args: Seq[Expression]) => CharStats(args(0))),
    (FunctionIdentifier("graft_alpha_count"),
      new ExpressionInfo(classOf[AlphaCount].getName, "graft_alpha_count"),
      (args: Seq[Expression]) => AlphaCount(args(0))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashText].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimhashText(args(0))),
    (FunctionIdentifier("graft_bigram_stats"),
      new ExpressionInfo(classOf[BigramStats].getName, "graft_bigram_stats"),
      (args: Seq[Expression]) => BigramStats(args(0))),
    (FunctionIdentifier("graft_pair_counts"),
      new ExpressionInfo(classOf[PairCounts].getName, "graft_pair_counts"),
      (args: Seq[Expression]) => PairCounts(args(0))),
    (FunctionIdentifier("graft_poi_hex"),
      new ExpressionInfo(classOf[PoiHex].getName, "graft_poi_hex"),
      (args: Seq[Expression]) => PoiHex(args)),
    (FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "graft_minhash_sigs"),
      (args: Seq[Expression]) => MinhashSigs(args(0))),
    (FunctionIdentifier("graft_best_cent"),
      new ExpressionInfo(classOf[BestCent].getName, "graft_best_cent"),
      (args: Seq[Expression]) => BestCent(args(0), args(1))),
    (FunctionIdentifier("graft_step_cut"),
      new ExpressionInfo(classOf[StepCut].getName, "graft_step_cut"),
      (args: Seq[Expression]) => StepCut(args(0), args(1))),
    (FunctionIdentifier("graft_pii_scrub"),
      new ExpressionInfo(classOf[PiiScrub].getName, "graft_pii_scrub"),
      (args: Seq[Expression]) => PiiScrub(args(0))),
    (FunctionIdentifier("graft_bpe_apply"),
      new ExpressionInfo(classOf[BpeApply].getName, "graft_bpe_apply"),
      (args: Seq[Expression]) => BpeApply(args(0), args(1))),
    (FunctionIdentifier("graft_entity_changes"),
      new ExpressionInfo(classOf[ProtoEntityChangesExpr].getName, "graft_entity_changes"),
      (args: Seq[Expression]) => ProtoEntityChangesExpr(args(0))),
    (FunctionIdentifier("graft_entity_changes_encode"),
      new ExpressionInfo(classOf[ProtoEntityChangesEncodeExpr].getName, "graft_entity_changes_encode"),
      (args: Seq[Expression]) => ProtoEntityChangesEncodeExpr(args(0))),
    (FunctionIdentifier("graft_json_long"),
      new ExpressionInfo(classOf[JsonLong].getName, "graft_json_long"),
      (args: Seq[Expression]) => JsonLong(args(0), args(1))),
    (FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[NormFingerprint].getName, "graft_fingerprint"),
      (args: Seq[Expression]) => NormFingerprint(args.head)),
    (FunctionIdentifier("graft_md5"),
      new ExpressionInfo(classOf[Md5Hex].getName, "graft_md5"),
      (args: Seq[Expression]) => Md5Hex(args.head)),
    (FunctionIdentifier("graft_sum128_product"),
      new ExpressionInfo(classOf[Int128SumProduct].getName, "graft_sum128_product"),
      (args: Seq[Expression]) => Int128SumProduct(args(0), args(1)))
  )

  /** Register graft functions on an existing session (no-op if
    * already present). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }
}
