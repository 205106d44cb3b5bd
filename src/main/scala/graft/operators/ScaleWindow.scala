package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global order statistics — row_number / running sum / group
  * totals over a TOTAL order without a single-task global sort.
  *
  * A plain `Window.orderBy(...)` (or one partitioned by a low-cardinality
  * column like a 5-value market segment) funnels the whole relation
  * through one task: fine at sf0.1, a scale-killer on a 1000-executor
  * cluster. The classic distributed alternative (the same shape engines
  * use for ORDER BY + ROW_NUMBER):
  *
  *   1. range-repartition on (partCols ++ sortCols) — Spark samples the
  *      keys and assigns contiguous, ordered key ranges to partitions;
  *   2. rank/prefix-sum LOCALLY inside each range partition (window
  *      partitioned by spark_partition_id, so every task sorts only its
  *      own slice);
  *   3. per-partition counts/sums are a partitions-sized frame; a tiny
  *      prefix window turns them into offsets, broadcast-joined back.
  *
  * Sort keys must be a total order (unique tie-break) for deterministic
  * results — the same requirement the single-task window had.
  */
object ScaleWindow {

  /** Appends to `df`:
    *   - `rnName`: 1-based global row number in (partCols, sortCols) order
    *     (per partCols group when partCols is non-empty),
    *   - `nName`: the group's total row count,
    *   - `cumName`/`totName` (when `sumCol` is set): inclusive running sum
    *     and group total of `sumCol` in the same order.
    */
  def orderStats(
      df: DataFrame,
      partCols: Seq[String],
      sortCols: Seq[Column],
      rnName: String,
      nName: String,
      sumCol: Option[(Column, String, String)] = None): DataFrame = {
    val pc = partCols.map(col)
    // 1. ordered, contiguous key ranges (numPartitions = session default).
    //    `parted` feeds TWO plan branches (ranked rows + per-partition
    //    offsets) that join on graft_pid — correctness requires both to
    //    observe the SAME range boundaries / partition ids. Exchange reuse
    //    normally guarantees that, but a replanned exchange could resample
    //    RangePartitioner boundaries; persist() pins one materialization
    //    (the ContextCleaner reclaims it once the result is computed and
    //    the plan is GC'd).
    val parted = df.repartitionByRange((pc ++ sortCols): _*)
      .withColumn("graft_pid", spark_partition_id())
      .persist()
    // 2. local rank / running sum per (range partition, group)
    val local = Window.partitionBy((col("graft_pid") +: pc): _*)
      .orderBy(sortCols: _*)
    val run = local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = sumCol.foldLeft(
      parted.withColumn("graft_lrn", row_number().over(local))) {
      case (d, (c, _, _)) => d.withColumn("graft_lsum", sum(c).over(run))
    }
    // 3. partitions-sized offsets frame; prefix windows here run over
    //    #partitions rows (constant partition key keeps the spec non-empty)
    val per = ranked.groupBy((col("graft_pid") +: pc): _*)
      .agg(count(lit(1)).as("graft_cnt"),
        sumCol.map { case (c, _, _) => sum(c).as("graft_psum") }
          .getOrElse(max(lit(0)).as("graft_unused")))
    val tiny = Window.partitionBy((lit(0) +: pc): _*).orderBy(col("graft_pid"))
    val before = tiny.rowsBetween(Window.unboundedPreceding, -1)
    val whole = tiny.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = per.select(
      (col("graft_pid") +: pc) ++ Seq(
        coalesce(sum(col("graft_cnt")).over(before), lit(0L)).as("graft_cnt_off"),
        sum(col("graft_cnt")).over(whole).as(nName)) ++
        sumCol.toSeq.flatMap { case (_, _, totName) => Seq(
          sum(col("graft_psum")).over(before).as("graft_sum_off"),
          sum(col("graft_psum")).over(whole).as(totName)) }: _*)
    val joined = ranked.join(broadcast(offs), "graft_pid" +: partCols)
      .withColumn(rnName, (col("graft_lrn") + col("graft_cnt_off")).cast("long"))
    val withSum = sumCol.foldLeft(joined) { case (d, (_, cumName, _)) =>
      d.withColumn(cumName,
        col("graft_lsum") + coalesce(col("graft_sum_off"),
          lit(0).cast(d.schema("graft_lsum").dataType)))
    }
    withSum.drop("graft_pid", "graft_lrn", "graft_lsum", "graft_cnt_off",
      "graft_sum_off", "graft_unused")
  }

  /** Exact NTILE(k) bucket from a global row number and group size —
    * the SQL-standard split (first n%k buckets get one extra row). */
  def ntileOf(k: Int, rn: Column, n: Column): Column = {
    val q = (n / k).cast("long") // floor: both operands integral
    val r = n % k
    val big = r * (q + 1) // rows covered by the (q+1)-sized buckets
    when(rn <= big, ceil(rn / (q + 1.0)))
      .otherwise(r + ceil((rn - big) / greatest(q, lit(1L)).cast("double")))
      .cast("int")
  }
}
