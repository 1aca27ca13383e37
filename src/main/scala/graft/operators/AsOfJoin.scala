package graft.operators

import graft.Tables
import graft.Ops.Q

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the canonical "operator Spark lacks" (time-series
  * point-in-time lookup: for each left row, the latest right row with
  * `right.ts <= left.ts` in the same key group).
  *
  * Per the builder brief's preference ladder this is tier (a): COMPOSED from
  * built-ins, because the union+window formulation already produces the
  * optimal physical shape — ONE shuffle by key and one in-partition sort —
  * which is exactly what a hand-written sort-merge `AsOfJoinExec`
  * (tier (c)) would do, with none of the planner-extension surface:
  *
  *   1. tag left rows 1, right rows 0; union them (same key/ts columns);
  *   2. window per key ordered by (ts, tag): `last_value(v, ignoreNulls)`
  *      over unbounded-preceding..current carries the most recent right
  *      value forward (tag order makes an equal-ts right row visible to the
  *      left row — inclusive `<=` semantics, matching DuckDB ASOF);
  *   3. keep only left rows.
  *
  * Left-join semantics: a left row with no earlier right match keeps null.
  */
object AsOfJoin {

  /** @param left      probe side (each row gets a match)
    * @param right     reference side (values carried forward in time)
    * @param key       equi-join key column (same name both sides)
    * @param tsCol     event-time column (same name both sides)
    * @param valueCols right-side value columns to attach to left rows */
  def asOfBackward(left: DataFrame, right: DataFrame, key: String, tsCol: String,
                   valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = valueCols.foldLeft(left.withColumn("__tag", lit(1))) {
      (df, v) => df.withColumn(v, lit(null).cast(right.schema(v).dataType))
    }
    val r = leftCols.filterNot(c => c == key || c == tsCol)
      .foldLeft(right.select((key +: tsCol +: valueCols).map(col): _*)
        .withColumn("__tag", lit(0))) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = l.select((leftCols ++ valueCols :+ "__tag").map(col): _*)
      .unionByName(r.select((leftCols ++ valueCols :+ "__tag").map(col): _*))
    val w = Window.partitionBy(key).orderBy(tsCol, "__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__tag")
  }

  // ---------------------------------------------------------------- entries

  /** For every view event, the user's most recent purchase value at or
    * before that moment (point-in-time feature lookup). */
  private val asOfQ: Q = (s, dir) => {
    val ev = Tables(s, dir).events
    val views = ev.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("last_purchase"))
    asOfBackward(views, purchases, "user_id", "ts", Seq("last_purchase"))
      .select("event_id", "user_id", "last_purchase")
      .orderBy("event_id")
  }

  val entries: Map[String, Q] = Map("asof_join_backward" -> asOfQ)

  val oracles: Map[String, String] = Map(
    "asof_join_backward" ->
      """SELECT v.event_id, v.user_id, p.value AS last_purchase
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id AND v.ts >= p.ts
        |ORDER BY v.event_id""".stripMargin,
  )
}
