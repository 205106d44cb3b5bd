package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *                                     'file'/'delta' rows (path,
  *                                     part_value, bytes, rows, origin)
  *                                     + one 'commit' row (operation,
  *                                     counts, merge keys)
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
  *
  * Merge-on-read (MoR) upserts ([[mergeDeferred]]) are the deferred
  * alternative the reference benchmarks against CoW
  * (IncrementalTPCDSBenchmark MoR table options; README.md:30,36):
  * the source is appended as 'delta' files — merge cost is O(source),
  * independent of table size — and [[read]] resolves base-minus-matched
  * plus latest-delta-per-key at scan time (read amplification ∝ total
  * delta rows, the CoW/MoR trade the reference measures). [[compact]]
  * folds deltas back into base files.
  *
  * Shallow clone ([[shallowCloneTo]], Delta `SHALLOW CLONE` analog) is a
  * metadata-only commit: the clone's manifest references the source's
  * data files; subsequent DML on the clone writes only under the clone's
  * root. [[vacuum]] deletes unreferenced files under this table's own
  * root only, so a vacuumed source never reaches into its clones —
  * but (exactly like Delta) vacuuming a SOURCE can strand clones that
  * still reference its files.
  */
class SnapshotTable(spark: SparkSession, root: String) {

  import SnapshotTable._

  private val rootPath = new Path(root)
  private def fs: FileSystem = rootPath.getFileSystem(
    spark.sessionState.newHadoopConf())
  private def logDir = new Path(root, "_graft_log")
  private def dataRoot = new Path(root, "data")

  def exists: Boolean = fs.exists(logDir)

  def currentVersion: Int = {
    val vs = fs.listStatus(logDir).map(_.getPath.getName.toInt)
    require(vs.nonEmpty, s"empty snapshot log at $root")
    vs.max
  }

  private def manifest(version: Int): DataFrame =
    spark.read.parquet(new Path(logDir, f"$version%05d").toString)

  private def entriesOf(version: Int, kind: String): Seq[FileEntry] =
    manifest(version).filter(col("entry_type") === kind)
      .select("path", "part_value", "bytes", "rows", "origin").collect()
      .map(r => FileEntry(r.getString(0), Option(r.getString(1)).orNull,
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq

  private def fileEntries(version: Int): Seq[FileEntry] =
    entriesOf(version, "file")

  private def deltaEntries(version: Int): Seq[FileEntry] =
    entriesOf(version, "delta")

  private def mergeKeysOf(version: Int): Seq[String] =
    manifest(version).filter(col("entry_type") === "commit")
      .select("merge_keys").collect().headOption
      .flatMap(r => Option(r.getString(0))).map(_.split(",").toSeq)
      .getOrElse(Seq.empty)

  /** Read the table at `version` (default: latest) straight from the
    * manifest's file list — no directory listing. If the version carries
    * MoR delta files, the scan resolves them transparently (base rows
    * without a delta key match + the latest delta row per key). */
  def read(version: Int = -1): DataFrame = {
    val v = if (version < 0) currentVersion else version
    val deltas = deltaEntries(v)
    if (deltas.isEmpty) readPaths(fileEntries(v).map(_.path))
    else resolveMerged(fileEntries(v), deltas, mergeKeysOf(v))
  }

  private def readPaths(paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*).drop(PartCol)

  /** MoR read resolution: per merge key keep the newest delta row
    * (origin-commit descending), drop matched base rows, union. One
    * shuffle on the merge keys serves both the window and the anti join. */
  private def resolveMerged(
      base: Seq[FileEntry], deltas: Seq[FileEntry], keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, s"MoR table at $root has deltas but no merge keys")
    val byGen = deltas.groupBy(_.origin).toSeq.sortBy(_._1)
    val deltaDf = byGen.map { case (gen, es) =>
      readPaths(es.map(_.path)).withColumn(GenCol, lit(gen))
    }.reduce(_ unionByName _)
    val newest = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(GenCol).desc)
    val latest = deltaDf
      .withColumn(RnCol, row_number().over(newest))
      .filter(col(RnCol) === 1).drop(RnCol, GenCol)
    val baseDf = readPaths(base.map(_.path))
    baseDf.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(latest)
  }

  /** Manifest-planned file list (path, part_value, bytes, rows) at the
    * latest version — the metadata probes read this, not the filesystem. */
  def files: Seq[FileEntry] = fileEntries(currentVersion)

  /** Manifest-pruned read of one partition value: file selection is pure
    * metadata (no directory listing, no scan of other partitions) — the
    * same partition-pruning-from-the-log that the reference's file-count
    * partition-filter probe measures (FileCountBenchmark.scala:244-249).
    * On a MoR version the resolution runs within the partition only. */
  def readWhere(partValue: String): DataFrame = {
    val v = currentVersion
    val base = fileEntries(v).filter(_.partValue == partValue)
    val deltas = deltaEntries(v).filter(_.partValue == partValue)
    require(base.nonEmpty || deltas.nonEmpty, s"no files for partition $partValue")
    if (deltas.isEmpty) readPaths(base.map(_.path))
    else resolveMerged(base, deltas, mergeKeysOf(v))
  }

  /** Footer-stat row count of the whole table straight from the manifest —
    * a COUNT(*) that reads zero data files. (Exact only when no deltas
    * are pending; a MoR count must resolve matches, so it falls back to
    * the resolved scan.) */
  def countFromManifest: Long = {
    val v = currentVersion
    if (deltaEntries(v).isEmpty) fileEntries(v).map(_.rows).sum
    else read(v).count()
  }

  /** Create version 0 from `df`, optionally hive-partitioned by
    * `partitionBy` (the column is duplicated into `__p` so data files
    * keep the real column and the manifest keeps the partition value). */
  def create(df: DataFrame, partitionBy: Option[String] = None): SnapshotTable = {
    val written = writeData(df, 0, partitionBy)
    writeManifest(0, "CREATE", written, Seq.empty, Seq.empty)
    this
  }

  /** Copy-on-write MERGE (UPDATE SET * / WHEN NOT MATCHED INSERT *):
    * result = target rows with no key match in source + all source rows.
    * Source must be unique on `keys`. Pending MoR deltas are folded in
    * (the rewrite base is the resolved view of touched partitions). */
  def merge(source: DataFrame, keys: Seq[String], partitionBy: Option[String] = None): SnapshotTable = {
    val v = currentVersion
    val (base, carryOver) = prunedBase(source, keys, partitionBy, source.schema)
    val rewritten = base.join(source, keys, "left_anti").unionByName(source)
    val written = writeData(rewritten, v + 1, partitionBy)
    writeManifest(v + 1, "MERGE", written ++ carryOver, Seq.empty, Seq.empty)
    this
  }

  /** Copy-on-write MERGE … WHEN MATCHED THEN DELETE: result = target
    * rows with no key match in `source`. Partition pruning as in
    * [[merge]] — only partitions named by the source are rewritten;
    * that is sound for deletes for the same reason (a matched row's
    * partition value is one of the source's partition values). */
  def mergeDelete(source: DataFrame, keys: Seq[String], partitionBy: Option[String] = None): SnapshotTable = {
    val v = currentVersion
    val (base, carryOver) = prunedBase(source, keys, partitionBy,
      read(v).schema)
    val rewritten = base.join(source.select(keys.map(col): _*), keys, "left_anti")
    val written = writeData(rewritten, v + 1, partitionBy)
    writeManifest(v + 1, "MERGE_DELETE", written ++ carryOver, Seq.empty, Seq.empty)
    this
  }

  /** Merge-on-read upsert: append `source` as delta files without
    * touching base files — commit cost is O(source) regardless of table
    * size (the MoR side of the reference's CoW/MoR comparison,
    * README.md:30,36). Reads resolve deltas until [[compact]] folds them
    * in. All deferred merges on a table must use the same `keys`
    * (enforced), mirroring a fixed primary key. Upsert-only (no
    * deferred delete), like the reference's MERGE update-all/insert-all. */
  def mergeDeferred(source: DataFrame, keys: Seq[String], partitionBy: Option[String] = None): SnapshotTable = {
    val v = currentVersion
    val prior = mergeKeysOf(v)
    require(prior.isEmpty || prior == keys,
      s"deferred-merge keys $keys differ from table's $prior")
    val written = writeData(source, v + 1, partitionBy)
    writeManifest(v + 1, "MERGE_MOR", fileEntries(v),
      deltaEntries(v) ++ written, keys)
    this
  }

  /** Shared CoW prologue: split the current file set into partitions the
    * source touches (re-read as the rewrite base, with MoR resolution if
    * deltas are pending) and untouched BASE entries (carried over by
    * reference; untouched deltas are folded too when present, since a
    * delta partition-slice may be empty only for untouched partitions). */
  private def prunedBase(
      source: DataFrame,
      keys: Seq[String],
      partitionBy: Option[String],
      baseSchema: org.apache.spark.sql.types.StructType)
      : (DataFrame, Seq[FileEntry]) = {
    val v = currentVersion
    val entries = fileEntries(v)
    val deltas = deltaEntries(v)
    val pruned = partitionBy.filter(keys.contains)
    def touchedValues(p: String): Set[String] =
      source.select(col(p).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
    val (touched, carryOver, touchedDeltas) =
      if (deltas.isEmpty) pruned match {
        case Some(p) =>
          val vals = touchedValues(p)
          val (tb, cb) = entries.partition(e =>
            e.partValue == null || vals.contains(e.partValue))
          (tb, cb, Seq.empty[FileEntry])
        case None => (entries, Seq.empty[FileEntry], Seq.empty[FileEntry])
      } else pruned match {
        case Some(p) if deltas.forall(_.partValue != null) =>
          val vals = touchedValues(p)
          val (tb, cb) = entries.partition(e =>
            e.partValue == null || vals.contains(e.partValue))
          val (td, cd) = deltas.partition(e => vals.contains(e.partValue))
          // a CoW commit drops delta entries, so untouched deltas cannot
          // carry over as-is — fold everything in when any would remain
          // (correctness over pruning).
          if (cd.isEmpty) (tb, cb, td) else (entries, Seq.empty[FileEntry], deltas)
        case _ => (entries, Seq.empty[FileEntry], deltas)
      }
    val base =
      if (touched.isEmpty && touchedDeltas.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], baseSchema)
      else if (touchedDeltas.isEmpty) readPaths(touched.map(_.path))
      else resolveMerged(touched, touchedDeltas, mergeKeysOf(v))
    (base, carryOver)
  }

  /** Bin-pack compaction: rewrite the current snapshot into
    * `numFiles` files (per partition when partitioned). Pending MoR
    * deltas are folded into the compacted base (Hudi-style compaction). */
  def compact(numFiles: Int, partitionBy: Option[String] = None): SnapshotTable = {
    val v = currentVersion
    val df = partitionBy match {
      case Some(p) => read(v).repartition(numFiles, col(p))
      case None    => read(v).repartition(numFiles)
    }
    val written = writeData(df, v + 1, partitionBy)
    writeManifest(v + 1, "COMPACT", written, Seq.empty, Seq.empty)
    this
  }

  /** Metadata-only shallow clone (Delta `SHALLOW CLONE` analog): the
    * clone's version 0 references this table's current files — zero data
    * copied, O(manifest) cost. DML on the clone writes under the clone's
    * root; carried-over source files stay shared by reference. */
  def shallowCloneTo(dst: String): SnapshotTable = {
    val v = currentVersion
    val clone = new SnapshotTable(spark, dst)
    clone.writeManifest(0, "CLONE", fileEntries(v), deltaEntries(v),
      mergeKeysOf(v))
    clone
  }

  /** Physically delete data files under THIS root that no retained
    * version references, then drop the vacuumed versions' manifests.
    * `retainVersions = 1` keeps only the current version. Files outside
    * this root (shallow-clone references) are never touched. Returns the
    * number of files deleted. Time travel below the cutoff is gone —
    * that is the point (storage reclamation). */
  def vacuum(retainVersions: Int = 1): Int = {
    require(retainVersions >= 1, "must retain at least the current version")
    val cur = currentVersion
    val cutoff = math.max(0, cur - retainVersions + 1)
    val keep: Set[String] = (cutoff to cur).flatMap { v =>
      (fileEntries(v) ++ deltaEntries(v)).map(_.path)
    }.toSet
    val removed = listDataFiles(fs, dataRoot).map(_._1).filterNot(keep)
    removed.foreach(p => fs.delete(new Path(p), false))
    (0 until cutoff).foreach(v =>
      fs.delete(new Path(logDir, f"$v%05d"), true))
    removed.size
  }

  /** DESCRIBE HISTORY analog: (version, operation, num_files, num_rows). */
  def history: DataFrame = {
    val dirs = fs.listStatus(logDir).map(_.getPath.toString).sorted
    spark.read.parquet(dirs.toSeq: _*)
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
        sum(when(col("entry_type") =!= "commit", 1).otherwise(0)).cast("long").as("num_files"),
        sum(when(col("entry_type") =!= "commit", col("bytes"))).cast("long").as("total_bytes"),
        sum(when(col("entry_type") === "commit", col("num_rows"))).cast("long").as("num_rows"))
  }

  // ------------------------------------------------------------------

  /** Write `df` into this commit's data dir and return its file entries
    * (row counts from parquet footers — metadata-only, O(new files),
    * fetched in parallel). */
  private def writeData(
      df: DataFrame, version: Int, partitionBy: Option[String]): Seq[FileEntry] = {
    val dataDir = new Path(root, f"data/c$version%05d")
    val writer = partitionBy match {
      case Some(p) =>
        df.withColumn(PartCol, col(p).cast("string"))
          .repartition(col(PartCol)) // cluster by partition → no file spray
          .write.partitionBy(PartCol)
      case None => df.write
    }
    writer.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    val conf = spark.sessionState.newHadoopConf()
    import scala.collection.parallel.CollectionConverters._
    listDataFiles(fs, dataDir).par.map { case (p, pv, len) =>
      FileEntry(p, pv, len, footerRowCount(conf, p), version.toLong)
    }.seq.toSeq
  }

  /** Persist one commit's manifest: base 'file' rows + MoR 'delta' rows
    * + the 'commit' row (operation, totals, merge keys). num_rows for a
    * MoR commit counts base + delta rows (an upper bound until matches
    * resolve — documented in [[countFromManifest]]). */
  private def writeManifest(
      version: Int,
      operation: String,
      base: Seq[FileEntry],
      delta: Seq[FileEntry],
      mergeKeys: Seq[String]): Unit = {
    val numRows = (base ++ delta).map(_.rows).sum
    import spark.implicits._
    val fileRows =
      base.map(e => (version, "file", Option(e.path), Option(e.partValue),
        e.bytes, e.rows, e.origin, None: Option[String], None: Option[Long],
        None: Option[String])) ++
      delta.map(e => (version, "delta", Option(e.path), Option(e.partValue),
        e.bytes, e.rows, e.origin, None: Option[String], None: Option[Long],
        None: Option[String]))
    val commitRow =
      (version, "commit", None: Option[String], None: Option[String], 0L, 0L,
        version.toLong, Option(operation), Option(numRows),
        if (mergeKeys.isEmpty) None: Option[String] else Some(mergeKeys.mkString(",")))
    (fileRows :+ commitRow)
      .toDF("version", "entry_type", "path", "part_value", "bytes", "rows",
        "origin", "operation", "num_rows", "merge_keys")
      .withColumn("num_files", lit((base.size + delta.size).toLong))
      .coalesce(1)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(new Path(logDir, f"$version%05d").toString)
  }
}

object SnapshotTable {
  /** Duplicated hive-partition column name in data dirs. */
  val PartCol = "__p"
  private val GenCol = "__gen"
  private val RnCol = "__rn"

  /** One manifest 'file'/'delta' entry; `origin` = the commit version
    * that wrote the file (drives MoR last-writer-wins resolution). */
  final case class FileEntry(
      path: String, partValue: String, bytes: Long, rows: Long, origin: Long = 0L)

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
    if (!fs.exists(dir)) return Seq.empty
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
