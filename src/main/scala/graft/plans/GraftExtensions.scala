package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring (SURVEY.md §3): makes graft's native
  * expressions available from SQL. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_dot expects 2 arguments, got ${children.size}")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_normalize expects 1 argument, got ${children.size}")
        L2Normalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[ZValue].getName, "graft_zvalue"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_zvalue expects 2 arguments, got ${children.size}")
        ZValue(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk_by"),
      new ExpressionInfo(classOf[TopKByWeight].getName, "graft_topk_by"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"graft_topk_by expects 3 arguments (item, weight, k), got ${children.size}")
        TopKByWeight(children(0), children(1), children(2))
      }))
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    // SQL catalog reads: graft.<ns>.<table> relations become the
    // zone-map-indexed snapshot scan (see graft.sql.GraftCatalog)
    ext.injectResolutionRule(session => new graft.sql.GraftSqlRule(session))
    // CREATE/REFRESH MATERIALIZED VIEW; everything else delegates.
    // wrap() is idempotent so combining this class with
    // GraftSqlExtensions cannot stack two parser layers.
    ext.injectParser((_, delegate) => graft.sql.GraftSqlParser.wrap(delegate))
  }
}

/** UDF-kernel registration through the public session API — callable
  * on any existing session (no extension config needed).
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    import graft.functions.Signatures
    spark.udf.register("graft_minhash", (text: String) => Signatures.minhashSig(text, 3))
    spark.udf.register("graft_simhash", (text: String) => Signatures.simhash64(text))
    spark.udf.register("graft_shingles", (text: String) => Signatures.shingleStrings(text, 3))
    spark.udf.register("graft_ref_tokens", (text: String) => Signatures.refTokenStrings(text))
    spark.udf.register("graft_fingerprint", (text: String) => Signatures.fingerprint64(text))
  }
}
