package org.apache.spark.sql

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.io.FileCommitProtocol
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.SQLExecution
import org.apache.spark.sql.execution.datasources.{FileFormatWriter, WriteJobStatsTracker, WriteTaskStats, WriteTaskStatsTracker}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Parquet write with IN-TASK statistics collection (Delta's
  * `DeltaJobStatisticsTracker` shape): per-file row counts and numeric
  * min/max ride out of the write tasks themselves, so a snapshot commit
  * costs ZERO post-write file opens, zero extra Spark jobs and zero
  * directory listings — at a 100 TB MERGE emitting tens of thousands of
  * files the old probe pass was a full second job re-opening every file
  * just written. Lives in org.apache.spark.sql because
  * [[FileFormatWriter]] / [[SQLExecution]] are `private[sql]` (the same
  * reason Delta ships inside this package tree).
  *
  * Stat semantics replicate the parquet-footer probe exactly
  * (SnapshotTable.footerProbe) so manifests stay byte-comparable:
  *   - numeric-BACKED columns only: integrals, float/double, date (int32
  *     days), timestamp (int64 micros), decimals of precision ≤ 18
  *     (int32/int64 physical → stats are the UNSCALED values, exactly
  *     what the footer's genericGetMin returns);
  *   - integral values with |v| ≥ 2^53 widen one ulp OUTWARD when
  *     narrowed to double, so range pruning stays sound at the boundary;
  *   - a column with no non-null value in the file is dropped; a
  *     float/double column that saw NaN is dropped (parquet writers do
  *     not trust NaN stats either);
  *   - at most `maxStatCols` columns survive, in schema order, the
  *     engine's row-id column excluded from the budget.
  * Callers with non-atomic schemas (nested structs/arrays, whose footer
  * paths dot into sub-fields) keep the footer-probe path — the tracker
  * only handles flat atomic schemas, which every snapshot-table commit
  * in practice is.
  *
  * Known, documented divergence on MULTI-row-group files: the footer
  * probe drops a column when ANY row group lacks non-null min/max (one
  * stat-less chunk makes file-level pruning via per-group stats unsound
  * for that file in its model), while the in-task tracker aggregates
  * min/max over the whole file and keeps the column. The tracker's
  * file-level range is still SOUND for pruning (it covers every row in
  * the file, including the rows of an all-null chunk, which no value
  * predicate can match) — it is strictly more informative, not wrong.
  * Manifests from the two arms can therefore differ on a file whose
  * nullable column goes all-null for an entire row group;
  * `CommitFooterSpec` pins this exact case.
  */
object GraftParquetWrite {

  /** How one column's values are read off the data row. */
  private final val KindLong = 0    // getLong (bigint, timestamp micros)
  private final val KindInt = 1     // getInt (int, date days)
  private final val KindShort = 2
  private final val KindByte = 3
  private final val KindDouble = 4
  private final val KindFloat = 5
  private final val KindDecimal = 6 // unscaled long, precision <= 18

  private final case class TrackedCol(name: String, ordinal: Int, kind: Int,
      precision: Int, scale: Int)

  /** True if the footer probe would consider this field for stats — and
    * we can reproduce its value semantics from the InternalRow.
    * `int96Timestamps`: when the session writes TIMESTAMP as INT96
    * (spark.sql.parquet.outputTimestampType=INT96), parquet stores no
    * Number-typed stats for it and the footer probe drops the column —
    * the tracker must drop it too for stat parity. */
  private def trackableKind(dt: DataType, int96Timestamps: Boolean)
      : Option[(Int, Int, Int)] = dt match {
    case TimestampType if int96Timestamps => None
    case LongType | TimestampType | TimestampNTZType => Some((KindLong, 0, 0))
    case IntegerType | DateType => Some((KindInt, 0, 0))
    case ShortType => Some((KindShort, 0, 0))
    case ByteType => Some((KindByte, 0, 0))
    case DoubleType => Some((KindDouble, 0, 0))
    case FloatType => Some((KindFloat, 0, 0))
    case d: DecimalType if d.precision <= 18 =>
      Some((KindDecimal, d.precision, d.scale))
    case _ => None
  }

  /** Non-tracked but footer-neutral: the footer drops these columns from
    * stats without consuming budget (their parquet stats are non-numeric
    * or absent). Any OTHER type (struct/array/map) means the footer would
    * see dotted sub-paths we do not reproduce → caller must fall back. */
  private def atomicUntracked(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | BooleanType | _: DecimalType | NullType |
         TimestampType | _: CharType | _: VarcharType => true
    case _ => false
  }

  /** Whether the in-task tracker reproduces footer-probe stats for this
    * (data-column) schema. */
  def supportsSchema(schema: StructType): Boolean =
    schema.fields.forall(f =>
      trackableKind(f.dataType, int96Timestamps = false).isDefined ||
        atomicUntracked(f.dataType))

  /** One finished file, shipped with the task result (metadata-sized). */
  private final case class FileStat(tempPath: String, rows: Long,
      length: Long, stats: Map[String, (Double, Double)])

  private final case class GraftTaskStats(files: Seq[FileStat])
    extends WriteTaskStats

  /** footerProbe's outward ulp-widening for integrals above 2^53. */
  @inline private def widenLo(v: Long): Double = {
    val d = v.toDouble
    if (v >= (1L << 53) || v <= -(1L << 53)) Math.nextDown(d) else d
  }
  @inline private def widenHi(v: Long): Double = {
    val d = v.toDouble
    if (v >= (1L << 53) || v <= -(1L << 53)) Math.nextUp(d) else d
  }

  private final class TaskTracker(tracked: Array[TrackedCol],
      statOrder: Array[String], maxStatCols: Int,
      conf: SerializableConfiguration) extends WriteTaskStatsTracker {
    private val done = mutable.ArrayBuffer.empty[FileStat]
    private var curPath: String = null
    private var rows = 0L
    private val n = tracked.length
    private val mins = new Array[Double](n)
    private val maxs = new Array[Double](n)
    private val seen = new Array[Boolean](n)
    private val bad = new Array[Boolean](n)

    override def newPartition(partitionValues: InternalRow): Unit = ()

    override def newFile(filePath: String): Unit = {
      curPath = filePath
      rows = 0L
      java.util.Arrays.fill(seen, false)
      java.util.Arrays.fill(bad, false)
    }

    override def newRow(filePath: String, row: InternalRow): Unit = {
      rows += 1L
      var i = 0
      while (i < n) {
        val c = tracked(i)
        if (!bad(i) && !row.isNullAt(c.ordinal)) {
          c.kind match {
            case KindDouble | KindFloat =>
              val d =
                if (c.kind == KindDouble) row.getDouble(c.ordinal)
                else row.getFloat(c.ordinal).toDouble
              if (java.lang.Double.isNaN(d)) bad(i) = true
              else if (!seen(i)) { seen(i) = true; mins(i) = d; maxs(i) = d }
              else {
                if (d < mins(i)) mins(i) = d
                if (d > maxs(i)) maxs(i) = d
              }
            case _ =>
              val v: Long = c.kind match {
                case KindLong => row.getLong(c.ordinal)
                case KindInt => row.getInt(c.ordinal).toLong
                case KindShort => row.getShort(c.ordinal).toLong
                case KindByte => row.getByte(c.ordinal).toLong
                case KindDecimal =>
                  row.getDecimal(c.ordinal, c.precision, c.scale)
                    .toUnscaledLong
              }
              val lo = widenLo(v)
              val hi = widenHi(v)
              if (!seen(i)) { seen(i) = true; mins(i) = lo; maxs(i) = hi }
              else {
                if (lo < mins(i)) mins(i) = lo
                if (hi > maxs(i)) maxs(i) = hi
              }
          }
        }
        i += 1
      }
    }

    override def closeFile(filePath: String): Unit = {
      val p = new Path(filePath)
      // The task itself just closed this file — a stat failure here is
      // abnormal and MUST fail the task (it retries) rather than record
      // a fabricated 0-byte length: manifest lengths feed compaction
      // bin-packing and size-based planning, and a silent 0 poisons both.
      val len =
        try p.getFileSystem(conf.value).getFileStatus(p).getLen
        catch {
          case e: java.io.IOException => throw new java.io.UncheckedIOException(
            s"stats tracker failed to stat just-written file $filePath", e)
        }
      // surviving stats in schema order, budget applied exactly as the
      // footer probe does (dropped columns never consume budget)
      val byName = mutable.Map.empty[String, (Double, Double)]
      var i = 0
      while (i < n) {
        if (seen(i) && !bad(i)) byName(tracked(i).name) = (mins(i), maxs(i))
        i += 1
      }
      val stats = statOrder.iterator.filter(byName.contains)
        .take(maxStatCols).map(c => c -> byName(c)).toMap
      done += FileStat(filePath, rows, len, stats)
      curPath = null
    }

    override def getFinalStats(taskCommitTime: Long): WriteTaskStats =
      GraftTaskStats(done.toSeq)
  }

  private final class JobTracker(tracked: Array[TrackedCol],
      statOrder: Array[String], maxStatCols: Int,
      conf: SerializableConfiguration) extends WriteJobStatsTracker {
    @transient val results = mutable.ArrayBuffer.empty[FileStat]
    override def newTaskInstance(): WriteTaskStatsTracker =
      new TaskTracker(tracked, statOrder, maxStatCols, conf)
    override def processStats(stats: Seq[WriteTaskStats],
        jobCommitTime: Long): Unit =
      stats.foreach {
        case g: GraftTaskStats => results ++= g.files
        case _ => ()
      }
  }

  /** Write `df` as parquet under `outPath` (optionally hive-partitioned
    * by `partitionCol`, whose values land in `partitionCol=v/` subdirs
    * and NOT in the data files — exactly `writer.partitionBy`'s layout)
    * and return, per written data file:
    * (final path, partition value or null, length, rows, stats).
    * Final paths render as the FileSystem qualifies them ("file:" +
    * absolute path locally) — byte-compatible with manifest paths from
    * the listing-based probe, which DV marks reference by string
    * equality. `statSkip` columns (the engine's materialized row-id) are
    * excluded from the stat budget like the footer probe excludes them. */
  def writeWithStats(df: DataFrame, outPath: String,
      partitionCol: Option[String], extraHadoopOpts: Map[String, String],
      statSkip: Set[String], maxStatCols: Int)
    : Seq[(String, String, Long, Long, Map[String, (Double, Double)])] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val spark = cdf.sparkSession
    val qe = cdf.queryExecution
    val outputColumns = qe.analyzed.output
    val partitionAttrs = partitionCol.toSeq.map { pc =>
      outputColumns.find(_.name == pc).getOrElse(
        throw new IllegalArgumentException(
          s"partition column $pc not in ${outputColumns.map(_.name)}"))
    }
    val partSet = partitionAttrs.map(_.exprId).toSet
    val dataFields = outputColumns.filterNot(a => partSet.contains(a.exprId))
    require(supportsSchema(StructType(dataFields.map(a =>
        StructField(a.name, a.dataType)))),
      "writeWithStats: non-atomic schema — caller must use the footer probe")
    // tracked columns in DATA-ROW ordinal space (stats trackers receive
    // rows with partition columns already projected away)
    val int96 = spark.sessionState.conf.parquetOutputTimestampType ==
      org.apache.spark.sql.internal.SQLConf.ParquetOutputTimestampType.INT96
    val tracked = dataFields.zipWithIndex.flatMap { case (a, i) =>
      if (statSkip.contains(a.name)) None
      else trackableKind(a.dataType, int96).map { case (k, p, s) =>
        TrackedCol(a.name, i, k, p, s)
      }
    }.toArray
    val statOrder = tracked.map(_.name)
    val hadoopConf =
      spark.sessionState.newHadoopConfWithOptions(extraHadoopOpts)
    val serConf = new SerializableConfiguration(hadoopConf)
    val tracker =
      new JobTracker(tracked, statOrder, maxStatCols, serConf)
    val committer = FileCommitProtocol.instantiate(
      spark.sessionState.conf.fileCommitProtocolClass,
      jobId = java.util.UUID.randomUUID().toString,
      outputPath = outPath,
      dynamicPartitionOverwrite = false)
    SQLExecution.withNewExecutionId(qe, Some("graft write")) {
      FileFormatWriter.write(
        sparkSession = spark,
        plan = qe.executedPlan,
        fileFormat = new ParquetFileFormat(),
        committer = committer,
        outputSpec = FileFormatWriter.OutputSpec(
          outPath, Map.empty, outputColumns),
        hadoopConf = hadoopConf,
        partitionColumns = partitionAttrs,
        bucketSpec = None,
        statsTrackers = Seq(tracker),
        options = Map.empty)
    }
    // Task-side paths are the commit protocol's TEMP locations; the
    // committed file keeps its name and partition subdir under the
    // final output dir. Reconstruct and qualify the final path the way
    // a FileSystem listing would render it (manifest-path parity).
    val outFs = new Path(outPath).getFileSystem(hadoopConf)
    val outQualified = outFs.makeQualified(new Path(outPath))
    tracker.results.toSeq.map { f =>
      val name = new Path(f.tempPath).getName
      val pv = partitionCol.flatMap { pc =>
        f.tempPath.split('/').find(_.startsWith(s"$pc="))
      }
      val finalPath = pv match {
        case Some(seg) => new Path(new Path(outQualified, seg), name)
        case None => new Path(outQualified, name)
      }
      (finalPath.toString, pv.map(_.split("=", 2)(1)).orNull,
        f.length, f.rows, f.stats)
    }
  }
}
