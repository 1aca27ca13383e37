package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Sort-merge physical plan for [[AsOfJoinPlan]].
  *
  * The scale shape is exactly what a hand-scheduled engine would pick, but
  * declared through Spark's planner contracts so EnsureRequirements supplies
  * it for free:
  *
  *  - `requiredChildDistribution`: both sides clustered by key — ONE hash
  *    shuffle each (or zero if the child is already co-partitioned, e.g. a
  *    bucketed table);
  *  - `requiredChildOrdering`: (key, ts) in-partition sort — satisfied by a
  *    preceding sort-merge join or sorted scan when available;
  *  - `doExecute`: a single streaming merge pass over each co-partition
  *    pair. O(|L| + |R|) per partition, O(1) state (ONE buffered right row),
  *    no materialized union, no window buffer.
  *
  * Right rows with NULL key or NULL ts can never match and are skipped.
  * Matched-value state is copied (UnsafeRow reuse) only when the right key
  * equals a key the left side will still emit. When several right rows
  * share an exact (key, ts), the last one in sort order wins backward and
  * the first one forward — the same "any of the tied rows" contract as
  * DuckDB ASOF; the composed form adds a payload tiebreak, so outputs can
  * differ only on exact-tie inputs.
  *
  * `backward = false` flips the lookup to the EARLIEST right row with
  * `right.ts >= left.ts`: dead right rows (behind the ascending left
  * cursor) are discarded, and the match is the un-consumed stream head —
  * still one forward pass, still O(1) state.
  */
case class AsOfJoinExec(
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
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

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
    val tol = tolerance.getOrElse(-1L)
    if (tol >= 0) AsOfJoinStrategy.requireTolerableTs(leftTs.dataType)

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val valueProj = UnsafeProjection.create(valueExprs, rOut)
        // bind against NULLABLE value attrs: the null-padded row for
        // unmatched left rows must be read with isNullAt checks even when
        // the right column was declared non-nullable (else a long/double
        // unboxes to 0 and a string NPEs)
        val resultProj = UnsafeProjection.create(outAttrs: Seq[Expression],
          lOut ++ valueAttrs.map(_.withNullability(true)))
        val nullValues = new GenericInternalRow(valueAttrs.length)
        val joined = new JoinedRow
        val rBuf = rIter.buffered

        // last right row whose key might still match upcoming left rows
        var matchedKey: Any = null
        var matchedTs: Any = null
        var matchedValues: InternalRow = null
        // gap bound: as-of picks the NEAREST eligible right row, so checking
        // the chosen row is exhaustive — anything else is farther away
        def withinTol(lt: Any, rt: Any): Boolean =
          tol < 0 || math.abs(AsOfJoinStrategy.toLongTs(lt) -
            AsOfJoinStrategy.toLongTs(rt)) <= tol

        // BACKWARD: consume right rows with (rk < k) or (rk == k && rt <= t);
        // left keys ascend, so consumed rows of smaller keys are dead forever
        def advance(k: Any, t: Any): Unit = {
          var done = false
          while (!done && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = rTsB.eval(head)
            if (rk == null || rt == null) { rBuf.next(); () } // can never match
            else {
              val c = keyOrd.compare(rk, k)
              if (c < 0) { rBuf.next(); () }
              else if (c == 0 && tsOrd.compare(rt, t) <= 0) {
                val row = rBuf.next()
                matchedKey = InternalRow.copyValue(rk) // rk may alias row buffer
                matchedTs = InternalRow.copyValue(rt)
                matchedValues = valueProj(row).copy()
              } else done = true
            }
          }
        }

        // FORWARD: discard right rows that can never match this or any later
        // left row ((rk < k), or (rk == k && rt < t) — later left rows only
        // have larger t); the match, if any, is then the UNCONSUMED head
        // (a future left row with a smaller-or-equal ts may match it too).
        def discardDead(k: Any, t: Any): Unit = {
          var done = false
          while (!done && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = rTsB.eval(head)
            if (rk == null || rt == null) { rBuf.next(); () }
            else {
              val c = keyOrd.compare(rk, k)
              if (c < 0 || (c == 0 && tsOrd.compare(rt, t) < 0)) { rBuf.next(); () }
              else done = true
            }
          }
        }

        lIter.map { l =>
          val k = lKeyB.eval(l)
          val t = lTsB.eval(l)
          val values =
            if (k == null || t == null) nullValues
            else if (backward) {
              advance(k, t)
              if (matchedKey != null && keyOrd.compare(matchedKey, k) == 0 &&
                withinTol(t, matchedTs)) matchedValues
              else nullValues
            } else {
              discardDead(k, t)
              if (rBuf.hasNext && {
                val rk = rKeyB.eval(rBuf.head)
                rk != null && keyOrd.compare(rk, k) == 0 &&
                  withinTol(t, rTsB.eval(rBuf.head))
              }) valueProj(rBuf.head)
              else nullValues
            }
          resultProj(joined(l, values))
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoinPlan]] → sort-merge [[AsOfJoinExec]], or
  * [[BroadcastAsOfJoinExec]] when the caller asserted a small right side
  * (explicit hint, like `broadcast(df)` for equi-joins — the left side is
  * then never shuffled or sorted).
  *
  * The broadcast path keys a per-partition HashMap on evaluated key VALUES
  * (Java equals/hashCode), which is only correct for types whose runtime
  * representation has value-based equality — every atomic type except
  * BinaryType (Array[Byte] equality is reference-based; struct/array/map
  * InternalRow/ArrayData likewise). For those key types the hint silently
  * falls back to the sort-merge exec, which compares keys through the
  * interpreted ordering and handles them correctly (ADVICE r5). */
object AsOfJoinStrategy extends SparkStrategy {

  /** Ts types a `tolerance` can bound: anything whose runtime value is an
    * integral count of native units (µs for timestamps, days for dates). */
  def requireTolerableTs(dt: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType | TimestampNTZType | DateType |
           ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"as-of tolerance is not supported for ts type $other " +
          "(needs an integral native unit: timestamp, date, or integer)")
    }
  }

  /** Runtime ts value -> native-unit count for the gap comparison. */
  def toLongTs(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case other => throw new IllegalArgumentException(
      s"as-of tolerance: non-integral ts value $other")
  }

  /** Key types whose evaluated values have Java value equality (safe to use
    * as HashMap keys in the broadcast lookup) — an explicit whitelist:
    * primitives box to value-equal wrappers, UTF8String/Decimal define
    * value equals. Everything else (binary, struct, array, map, UDT) is
    * reference-equal or row-backed and must take the sort-merge path. */
  private def hashableKey(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | BooleanType | ByteType | ShortType | IntegerType |
           LongType | FloatType | DoubleType | DateType | TimestampType |
           TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan if p.broadcastRight && hashableKey(p.leftKey.dataType) =>
      BroadcastAsOfJoinExec(p.leftKey, p.leftTs, p.rightKey, p.rightTs,
        p.valueAttrs, p.backward, planLater(p.left), planLater(p.right),
        p.tolerance) :: Nil
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.valueAttrs,
        p.backward, planLater(p.left), planLater(p.right), p.tolerance) :: Nil
    case _ => Nil
  }
}
