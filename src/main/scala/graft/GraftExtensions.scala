package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CosineSimilarity, MinHashSignature, SquaredDistanceLong}

/** Session-extensions injector: makes the engine's native SQL functions
  * available cluster-wide with zero user code —
  * `--conf spark.sql.extensions=graft.GraftExtensions` registers them in
  * every session the cluster creates (the deployment-grade alternative to
  * calling `graft.functions.functions.register(spark)` per session).
  * Extension-injected functions are catalog-level, so they also work from
  * pure-SQL clients (thriftserver, notebooks) that never touch Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_similarity"),
        info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float vectors"),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction(
      (
        FunctionIdentifier("l2sq_long"),
        info("l2sq_long", "l2sq_long(a, b) - integer squared L2 distance of two bigint vectors"),
        (exprs: Seq[Expression]) => SquaredDistanceLong(exprs(0), exprs(1))))
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_signature"),
        info("minhash_signature", "minhash_signature(tokens, k) - k-wide minhash signature"),
        (exprs: Seq[Expression]) =>
          exprs(1) match {
            case Literal(v: Int, _) => MinHashSignature(exprs(0), v)
            case other =>
              throw new IllegalArgumentException(
                s"minhash_signature numHashes must be an integer literal, got $other")
          }))
  }
}
