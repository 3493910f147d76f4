package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Spark-native deployment surface for graft, registered the way Spark
  * intends third-party engines to plug in
  * (`--conf spark.sql.extensions=graft.core.GraftExtensions`, or via
  * [[Session.builder]], which wires it for every graft session):
  *
  *  - every custom Catalyst expression becomes a SQL function in ANY
  *    session built with the extension — including sessions graft code
  *    never touches (a user's own spark-submit, a JDBC gateway) — from
  *    the same builder list `GraftFunctions.register` uses;
  *  - [[CartesianGuard]], an opt-in optimizer rule that fails fast on
  *    UNHINTED cartesian products. At 100 TB an accidental cross join
  *    is a cluster-week, not a slow query; the guard turns it into an
  *    analysis-time error. Explicitly `broadcast()`-hinted cross joins
  *    (bounded scalar/dimension frames — the legitimate pattern all
  *    over this repo) stay allowed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), b))
    }
    ext.injectOptimizerRule(_ => CartesianGuard)
  }
}

/** Fails the query when `spark.graft.failOnCartesian=true` and the
  * optimized plan contains an inner/cross join with no condition and no
  * broadcast hint on either side. Default off: a pure safety rail for
  * production pipelines, zero behavior change otherwise.
  */
object CartesianGuard extends Rule[LogicalPlan] {

  private def broadcastHinted(h: Option[HintInfo]): Boolean =
    h.exists(_.strategy.contains(BROADCAST))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.failOnCartesian", "false")
        .equalsIgnoreCase("true")) {
      plan.foreach {
        case j: Join if j.condition.isEmpty &&
            (j.joinType == Inner || j.joinType == Cross) &&
            !broadcastHinted(j.hint.leftHint) &&
            !broadcastHinted(j.hint.rightHint) =>
          throw new IllegalStateException(
            "graft cartesian guard: unhinted cartesian product in plan " +
              "(set spark.graft.failOnCartesian=false or broadcast() the " +
              "bounded side to allow it): " + j.simpleString(1))
        case _ => ()
      }
    }
    plan
  }
}
