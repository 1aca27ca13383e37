package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Broadcast physical plan for [[AsOfJoinPlan]] — the scale path when the
  * right side is small (a rates table, a dimension history, a model
  * registry): the 100-TB left side is NEVER shuffled or sorted. The right
  * side broadcasts once (`BroadcastDistribution(IdentityBroadcastMode)`,
  * supplied by EnsureRequirements as a `BroadcastExchange`); each partition
  * builds a per-key ts-sorted lookup lazily, then streams left rows through
  * a binary search — O(|L| log |R_key|) per partition, left partitioning
  * and ordering preserved for downstream operators.
  *
  * Matching contract is [[AsOfJoinExec]]'s: backward = latest right row
  * with `rt <= lt`, forward = earliest with `rt >= lt`; right rows with
  * NULL key or ts never match; among right rows tied on exact (key, ts)
  * any one may be carried (same "any tied row" contract as DuckDB ASOF).
  */
case class BroadcastAsOfJoinExec(
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    valueAttrs: Seq[Attribute],
    backward: Boolean,
    left: SparkPlan,
    right: SparkPlan,
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ valueAttrs.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTsB = BindReferences.bindReference(leftTs: Expression, lOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTsB = BindReferences.bindReference(rightTs: Expression, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val valueExprs: Seq[Expression] = valueAttrs
    val outAttrs = output
    val bwd = backward
    val tol = tolerance.getOrElse(-1L)
    if (tol >= 0) AsOfJoinStrategy.requireTolerableTs(leftTs.dataType)

    val broadcastRelation = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions({ lIter =>
      val valueProj = UnsafeProjection.create(valueExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs: Seq[Expression],
        lOut ++ valueAttrs.map(_.withNullability(true)))
      val nullValues = new GenericInternalRow(valueAttrs.length)
      val joined = new JoinedRow

      // per-key (ts[], values[]) sorted by ts, built once per partition
      val lookup = {
        val grouped = scala.collection.mutable.HashMap
          .empty[Any, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]
        broadcastRelation.value.foreach { row =>
          val rk = rKeyB.eval(row)
          val rt = rTsB.eval(row)
          if (rk != null && rt != null) { // NULL key/ts can never match
            grouped.getOrElseUpdate(InternalRow.copyValue(rk),
              scala.collection.mutable.ArrayBuffer.empty) +=
              ((InternalRow.copyValue(rt), valueProj(row).copy()))
          }
        }
        grouped.map { case (k, buf) =>
          val sorted = buf.sortWith((a, b) => tsOrd.compare(a._1, b._1) < 0)
          k -> (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
        }
      }

      // backward: index of the LAST ts <= t; forward: FIRST ts >= t; -1 = none
      def search(ts: Array[Any], t: Any): Int = {
        var lo = 0
        var hi = ts.length - 1
        if (bwd) {
          var res = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (tsOrd.compare(ts(mid), t) <= 0) { res = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          res
        } else {
          var res = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (tsOrd.compare(ts(mid), t) >= 0) { res = mid; hi = mid - 1 }
            else lo = mid + 1
          }
          res
        }
      }

      lIter.map { l =>
        val k = lKeyB.eval(l)
        val t = lTsB.eval(l)
        val values =
          if (k == null || t == null) nullValues
          else lookup.get(k) match {
            case Some((ts, vals)) =>
              val i = search(ts, t)
              // tolerance: the binary-search hit is the nearest eligible
              // row, so one gap check is exhaustive
              if (i >= 0 && (tol < 0 ||
                math.abs(AsOfJoinStrategy.toLongTs(t) -
                  AsOfJoinStrategy.toLongTs(ts(i))) <= tol)) vals(i)
              else nullValues
            case None => nullValues
          }
        resultProj(joined(l, values))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
