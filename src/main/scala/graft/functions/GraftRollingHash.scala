package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native order-sensitive rolling fingerprint over a token array:
  * `acc = rotl(acc, 5) XOR xxhash64(token)`, seed 0.
  *
  * Bit-identical to the SQL HOF form
  * `aggregate(tokens, 0L, (acc, t) -> rotl5(acc) xor xxhash64(t))` that it
  * replaces (same hash kernel, same fold order), but the HOF pays an
  * interpreted lambda frame per token — this evaluates the whole fold in
  * one JVM loop per row, the same pattern as [[GraftSimHash]]. Registered
  * per-session as `graft_rolling_hash(tokens)`.
  */
case class GraftRollingHash(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      // bit-parity with the HOF twin for null elements too: SQL xxhash64 of
      // a null value passes the seed (42) through, so the fold still
      // rotates and xors — skipping the element entirely would diverge
      val h = if (tok != null) XxHash64Function.hash(tok, StringType, 42L) else 42L
      acc = ((acc << 5) | (acc >>> 59)) ^ h
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): GraftRollingHash =
    copy(child = c)
  override def prettyName: String = "graft_rolling_hash"
}

object GraftRollingHash {
  val builder: Seq[Expression] => Expression = {
    case Seq(e) => GraftRollingHash(e)
    case args => throw new IllegalArgumentException(
      s"graft_rolling_hash(tokensArray), got ${args.length} args")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", builder, "built-in")
}
