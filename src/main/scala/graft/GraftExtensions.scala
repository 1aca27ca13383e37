package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{GraftDot, MinHashAgg}

/** SparkSessionExtensions entry point: installs the engine's native
  * functions at session build time, so a deployment can enable the whole
  * graft surface with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (no code changes).
  * In-process callers get the same registrations lazily via
  * [[MinHashAgg.register]] / [[GraftDot.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b, Literal(w: Int, IntegerType)) => MinHashAgg(a, b, w)
        case _ => throw new IllegalArgumentException(
          "graft_minhash(h1, h2, intLiteral)")
      }))
    e.injectFunction((
      FunctionIdentifier("graft_dot"), GraftDot.info, GraftDot.builder))
  }
}
