package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the most recent
  * right row with `right.ts <= left.ts` in the same key group (left-outer —
  * left rows with no prior right row keep NULL payloads).
  *
  * Spark has no AsOfJoin operator (the Pandas API layer lowers merge_asof
  * to a union trick; SQL engines like DuckDB expose ASOF JOIN natively).
  * Rather than a custom SparkStrategy, this composes existing operators
  * into the same O(n log n) shape a native implementation uses:
  *
  *   1. tag right rows 0 and left rows 1, union them;
  *   2. one window per key ordered by (ts, tag): running
  *      `last(payload, ignoreNulls)` carries the latest right payload
  *      forward onto every subsequent row;
  *   3. keep the left rows.
  *
  * ONE shuffle (the window's hash partition on the keys), no join at all —
  * versus the naive `l JOIN r ON key AND r.ts <= l.ts` + rank, whose join
  * output is quadratic per key. Right rows sort BEFORE left rows at equal
  * ts (tag 0 < 1), giving inclusive `<=` semantics.
  *
  * Determinism: several right rows can share (keys, ts); `tieCol` picks
  * the winner (smallest wins) so output is unique and engine-reproducible.
  * CONTRACT: `tieCol` must be unique within each (keys, ts) group — with
  * duplicate (keys, ts, tie) rows carrying different payloads, the winner
  * is whatever row the engine happens to order last, and this composition
  * and the native execs ([[graft.plans.NativeAsOf]]) may legitimately
  * disagree. A rowid/uuid tie column satisfies the contract trivially.
  *
  * Scale: per-key state is a window sort — fine for natural keys (users,
  * devices, symbols). A single degenerate mega-key concentrates one task,
  * the same hazard as any keyed window; pre-filter or salt such keys.
  */
object AsOfJoin {

  /** @param left     probe side (all its columns are kept)
    * @param right    reference side
    * @param keys     equi-join key column names (present on both sides)
    * @param tsCol    ordering column name (present on both sides)
    * @param payload  right columns to carry onto left rows
    * @param tieCol   right column breaking (keys, ts) ties — smallest kept
    * @param prefix   prefix for the attached columns: `prefix+tsCol` and
    *                 `prefix+payload*`
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], tieCol: String, prefix: String = "r_"): DataFrame = {
    val k = keys.map(col)
    // NULL-ts right rows never match anything (SQL/merge_asof
    // semantics): dropped here, which also keeps null-ts LEFT rows on
    // NULL payloads (they sort before every real-ts row of their key) —
    // aligned with plans.NativeAsOf on both physical paths
    val rightOne = right.filter(col(tsCol).isNotNull)
    val rpay = struct(
      col(tsCol).as(prefix + tsCol) +: payload.map(c => col(c).as(prefix + c)): _*)
    val rpayType = rightOne.select(rpay.as("p")).schema("p").dataType
    val lrow = struct(left.columns.toIndexedSeq.map(col): _*)
    val lrowType = left.select(lrow.as("l")).schema("l").dataType
    val r2 = rightOne.select(
      k :+ col(tsCol).as("__ts") :+ lit(0).as("__tag") :+
        col(tieCol).as("__tie") :+
        rpay.as("__rpay") :+ lit(null).cast(lrowType).as("__lrow"): _*)
    val l2 = left.select(
      k :+ col(tsCol).as("__ts") :+ lit(1).as("__tag") :+
        lit(null).cast(r2.schema("__tie").dataType).as("__tie") :+
        lit(null).cast(rpayType).as("__rpay") :+ lrow.as("__lrow"): _*)
    // ties resolve INSIDE the one window: among right rows of equal
    // (keys, ts), ordering by tie DESC puts the smallest tie LAST, so
    // `last(ignoreNulls)` carries exactly the winner — no pre-window
    // (keys, ts)-partitioned dedup pass, which would cost a second
    // exchange of the right side
    val w = Window.partitionBy(k: _*)
      .orderBy(col("__ts"), col("__tag"), col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = r2.unionByName(l2)
      .withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val outCols =
      left.columns.map(c => col("__lrow").getField(c).as(c)) ++
        ((prefix + tsCol) +: payload.map(prefix + _))
          .map(f => col("__asof").getField(f).as(f))
    attached.select(outCols.toIndexedSeq: _*)
  }
}
