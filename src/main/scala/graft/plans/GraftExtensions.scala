package graft.plans

import graft.functions.LongDot
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
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.longDotDescriptor)
  }
}

object GraftExtensions {

  private[plans] val longDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_long_dot"),
    new ExpressionInfo(classOf[LongDot].getName, "graft_long_dot"),
    (args: Seq[Expression]) => LongDot(args(0), args(1))
  )

  /** Register graft functions on an existing session (no-op if
    * already present). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val (id, info, builder) = longDotDescriptor
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info, builder)
    }
  }
}
