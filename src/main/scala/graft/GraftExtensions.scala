package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Single SparkSessionExtensions entry point for the whole engine:
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * injects the native codegen'd scalar expressions
  * ([[graft.functions.NormalizeText]], [[graft.functions.SimHashExpr]])
  * and the whole-operator TopKPerKey rewrite
  * ([[graft.plans.TopKPerKeyPlans]]: optimizer rule + planner strategy).
  * Sessions built without the conf (the driver-owned ones) use the
  * idempotent per-object `register`/`install` helpers instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_normalize_text"),
      graft.functions.NormalizeText.info,
      (children: Seq[Expression]) => graft.functions.NormalizeText(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      graft.functions.SimHashExpr.info,
      (children: Seq[Expression]) => graft.functions.SimHashExpr(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      graft.functions.MinHashSigExpr.info,
      (children: Seq[Expression]) => graft.functions.MinHashSigExpr(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      graft.functions.MinHashSigExpr.shinglesInfo,
      (children: Seq[Expression]) => graft.functions.ShinglesExpr(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_lsh_sketch"),
      graft.functions.LshSketchExpr.info,
      (children: Seq[Expression]) => graft.functions.LshSketchExpr(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_md5i"),
      graft.functions.Md5iExpr.info,
      (children: Seq[Expression]) => graft.functions.Md5iExpr(children.head)))
    ext.injectOptimizerRule(_ => graft.plans.TopKPerKeyPlans.TopKRewriteRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyPlans.TopKStrategy)
  }
}
