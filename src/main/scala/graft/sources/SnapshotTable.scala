package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table with a manifest log — the engine's
  * parquet-snapshot algebra standing in for lakehouse DML (no
  * Delta/Iceberg/Hudi jars on the classpath; reference operations:
  * MERGE INTO `IncrementalTPCDSBenchmark.scala:259-283`, OPTIMIZE/
  * compaction `:186-204`, DESCRIBE HISTORY/DETAIL `:206-217`,
  * `TPCDSDataLoad.scala:135-143`).
  *
  * Layout:
  * {{{
  *   root/_graft_log/<version>/        one parquet manifest per commit:
  *                                     'file' rows (path, part_value,
  *                                     bytes, rows) + one 'commit' row
  *                                     (operation, counts)
  *   root/data/c<version>/...          data files written by that commit
  * }}}
  *
  * Why a manifest instead of directory listing: reads resolve the exact
  * file set from the log (like Delta), so planning cost is O(log), not
  * O(listing 200k objects) — the reference's file-count benchmark is
  * exactly this metadata-scaling test (FileCountBenchmark.scala).
  *
  * Per-file row counts live in the manifest (read once from the parquet
  * footers of newly-written files at commit time — O(new files) metadata
  * reads, never a data scan). A commit's total row count is the sum of
  * its file entries' counts, so MERGE/COMPACT never re-read the table:
  * at 100 TB a DML commit costs only its own rewrite + footer stats,
  * exactly like Delta's per-file stats in the transaction log.
  *
  * Copy-on-write MERGE with partition pruning: when the table is
  * partitioned and the merge keys include the partition column (the
  * reference guarantees this — merge keys = PKs ∪ partition keys,
  * IncrementalTPCDSBenchmark.scala:274), only partitions present in the
  * source are rewritten; untouched files carry over by reference (their
  * manifest entries, including row counts, are copied forward). That
  * invariant makes pruning sound: a matched row's partition value cannot
  * change, so stale rows can never hide in an unscanned partition.
  * MoR (deferred merge-on-read) is out of scope — CoW only.
  */
class SnapshotTable(spark: SparkSession, root: String) {

  import SnapshotTable._

  private val rootPath = new Path(root)
  private def fs: FileSystem = rootPath.getFileSystem(
    spark.sessionState.newHadoopConf())
  private def logDir = new Path(root, "_graft_log")

  def exists: Boolean = fs.exists(logDir)

  def currentVersion: Int = {
    val vs = fs.listStatus(logDir).map(_.getPath.getName.toInt)
    require(vs.nonEmpty, s"empty snapshot log at $root")
    vs.max
  }

  private def manifest(version: Int): DataFrame =
    spark.read.parquet(new Path(logDir, f"$version%05d").toString)

  private def fileEntries(version: Int): Seq[FileEntry] =
    manifest(version).filter(col("entry_type") === "file")
      .select("path", "part_value", "bytes", "rows").collect()
      .map(r => FileEntry(r.getString(0), Option(r.getString(1)).orNull,
        r.getLong(2), r.getLong(3))).toSeq

  /** Read the table at `version` (default: latest) straight from the
    * manifest's file list — no directory listing. */
  def read(version: Int = -1): DataFrame = {
    val v = if (version < 0) currentVersion else version
    val paths = fileEntries(v).map(_.path)
    spark.read.parquet(paths: _*).drop(PartCol)
  }

  /** Manifest-planned file list (path, part_value, bytes, rows) at the
    * latest version — the metadata probes read this, not the filesystem. */
  def files: Seq[FileEntry] = fileEntries(currentVersion)

  /** Manifest-pruned read of one partition value: file selection is pure
    * metadata (no directory listing, no scan of other partitions) — the
    * same partition-pruning-from-the-log that the reference's file-count
    * partition-filter probe measures (FileCountBenchmark.scala:244-249). */
  def readWhere(partValue: String): DataFrame = {
    val entries = fileEntries(currentVersion).filter(_.partValue == partValue)
    require(entries.nonEmpty, s"no files for partition $partValue")
    spark.read.parquet(entries.map(_.path): _*).drop(PartCol)
  }

  /** Footer-stat row count of the whole table straight from the manifest —
    * a COUNT(*) that reads zero data files. */
  def countFromManifest: Long = fileEntries(currentVersion).map(_.rows).sum

  /** Create version 0 from `df`, optionally hive-partitioned by
    * `partitionBy` (the column is duplicated into `__p` so data files
    * keep the real column and the manifest keeps the partition value). */
  def create(df: DataFrame, partitionBy: Option[String] = None): SnapshotTable = {
    commit(df, "CREATE", 0, partitionBy, carryOver = Seq.empty)
    this
  }

  /** Copy-on-write MERGE (UPDATE SET * / WHEN NOT MATCHED INSERT *):
    * result = target rows with no key match in source + all source rows.
    * Source must be unique on `keys`. */
  def merge(source: DataFrame, keys: Seq[String], partitionBy: Option[String] = None): SnapshotTable = {
    val (base, carryOver) = prunedBase(source, keys, partitionBy, source.schema)
    val rewritten = base.join(source, keys, "left_anti").unionByName(source)
    commit(rewritten, "MERGE", currentVersion + 1, partitionBy, carryOver)
    this
  }

  /** Copy-on-write MERGE … WHEN MATCHED THEN DELETE: result = target
    * rows with no key match in `source`. Partition pruning as in
    * [[merge]] — only partitions named by the source are rewritten;
    * that is sound for deletes for the same reason (a matched row's
    * partition value is one of the source's partition values). */
  def mergeDelete(source: DataFrame, keys: Seq[String], partitionBy: Option[String] = None): SnapshotTable = {
    val (base, carryOver) = prunedBase(source, keys, partitionBy,
      read(currentVersion).schema)
    val rewritten = base.join(source.select(keys.map(col): _*), keys, "left_anti")
    commit(rewritten, "MERGE_DELETE", currentVersion + 1, partitionBy, carryOver)
    this
  }

  /** Shared CoW prologue: split the current file set into partitions the
    * source touches (re-read as the rewrite base) and untouched entries
    * (carried over by reference). */
  private def prunedBase(
      source: DataFrame,
      keys: Seq[String],
      partitionBy: Option[String],
      baseSchema: org.apache.spark.sql.types.StructType)
      : (DataFrame, Seq[FileEntry]) = {
    val entries = fileEntries(currentVersion)
    val pruned = partitionBy.filter(keys.contains)
    val (touched, carryOver) = pruned match {
      case Some(p) =>
        val vals = source.select(col(p).cast("string")).distinct()
          .collect().map(_.getString(0)).toSet
        entries.partition(e => e.partValue == null || vals.contains(e.partValue))
      case None => (entries, Seq.empty[FileEntry])
    }
    val base =
      if (touched.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], baseSchema)
      else spark.read.parquet(touched.map(_.path): _*).drop(PartCol)
    (base, carryOver)
  }

  /** Bin-pack compaction: rewrite the current snapshot into
    * `numFiles` files (per partition when partitioned). */
  def compact(numFiles: Int, partitionBy: Option[String] = None): SnapshotTable = {
    val v = currentVersion
    val df = partitionBy match {
      case Some(p) => read(v).repartition(numFiles, col(p))
      case None    => read(v).repartition(numFiles)
    }
    commit(df, "COMPACT", v + 1, partitionBy, carryOver = Seq.empty)
    this
  }

  /** DESCRIBE HISTORY analog: (version, operation, num_files, num_rows). */
  def history: DataFrame = {
    val dirs = fs.listStatus(logDir).map(_.getPath.toString).sorted
    spark.read.parquet(dirs: _*)
      .filter(col("entry_type") === "commit")
      .select("version", "operation", "num_files", "num_rows")
      .orderBy("version")
  }

  /** DESCRIBE DETAIL analog for the latest version. */
  def detail: DataFrame = {
    val v = currentVersion
    manifest(v).groupBy()
      .agg(
        lit(v).as("version"),
        sum(when(col("entry_type") === "file", 1).otherwise(0)).cast("long").as("num_files"),
        sum(when(col("entry_type") === "file", col("bytes"))).cast("long").as("total_bytes"),
        sum(when(col("entry_type") === "file", col("rows"))).cast("long").as("num_rows"))
  }

  // ------------------------------------------------------------------

  private def commit(
      df: DataFrame,
      operation: String,
      version: Int,
      partitionBy: Option[String],
      carryOver: Seq[FileEntry]): Unit = {
    val dataDir = new Path(root, f"data/c$version%05d")
    val writer = partitionBy match {
      case Some(p) =>
        df.withColumn(PartCol, col(p).cast("string"))
          .repartition(col(PartCol)) // cluster by partition → no file spray
          .write.partitionBy(PartCol)
      case None => df.write
    }
    writer.mode(SaveMode.Overwrite).parquet(dataDir.toString)

    // Per-file row counts from the parquet footers of the files THIS
    // commit wrote — metadata-only reads, O(new files); carried-over
    // files keep the counts from the previous manifest. No table scan.
    // Footers are fetched in parallel (independent ~8 KB metadata reads).
    val conf = spark.sessionState.newHadoopConf()
    import scala.collection.parallel.CollectionConverters._
    val written = listDataFiles(fs, dataDir).par.map { case (p, pv, len) =>
      FileEntry(p, pv, len, footerRowCount(conf, p))
    }.seq.toSeq
    val files = written ++ carryOver
    val numRows = files.map(_.rows).sum

    import spark.implicits._
    val fileRows = files.map { e =>
      (version, "file", Option(e.path), Option(e.partValue), e.bytes, e.rows,
        None: Option[String], None: Option[Long])
    }
    val commitRow =
      (version, "commit", None: Option[String], None: Option[String], 0L, 0L,
        Option(operation), Option(numRows))
    (fileRows :+ commitRow)
      .toDF("version", "entry_type", "path", "part_value", "bytes", "rows",
        "operation", "num_rows")
      .withColumn("num_files", lit(files.size.toLong))
      .coalesce(1)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(new Path(logDir, f"$version%05d").toString)
  }
}

object SnapshotTable {
  /** Duplicated hive-partition column name in data dirs. */
  val PartCol = "__p"

  /** One manifest 'file' entry. */
  final case class FileEntry(path: String, partValue: String, bytes: Long, rows: Long)

  private def partValueOf(path: String): String =
    path.split('/').find(_.startsWith(s"$PartCol="))
      .map(_.stripPrefix(s"$PartCol=")).orNull

  /** Row count from the parquet footer — no data pages are read. */
  private def footerRowCount(conf: Configuration, path: String): Long = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try reader.getRecordCount finally reader.close()
  }

  private def listDataFiles(fs: FileSystem, dir: Path): Seq[(String, String, Long)] = {
    val it = fs.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_"))
        buf += ((st.getPath.toString, partValueOf(st.getPath.toString), st.getLen))
    }
    buf.toSeq
  }
}
