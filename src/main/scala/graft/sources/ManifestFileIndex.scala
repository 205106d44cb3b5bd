package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Manifest-backed scan planning (the Delta/Iceberg file-index idea —
  * Delta's TahoeFileIndex, reference workload FileCountBenchmark.scala):
  * the snapshot log already records every data file's path and size, so
  * constructing a scan performs ZERO filesystem operations — no per-file
  * getFileStatus, no recursive listing, no driver-side listing job.
  *
  * Without this, `spark.read.parquet(100k paths)` stats every file
  * before planning; at the reference's 200k-file tier that listing IS
  * the planning cost. With it, planning cost is O(manifest in memory)
  * regardless of file count — the scan's split computation uses the
  * manifest's recorded lengths directly.
  */
private[graft] class ManifestFileIndex(
    spark: SparkSession,
    root: Path,
    entries: Seq[SnapshotTable.FileEntry]) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  /** Manifest tables surface the partition value as a real data column
    * (PartCol is layout-only), so the scan is unpartitioned to Spark. */
  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = entries.map(_.bytes).sum

  override def inputFiles: Array[String] = entries.map(_.path).toArray

  /** Manifests are immutable — nothing to refresh. */
  override def refresh(): Unit = ()

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val files = entries.map { e =>
      // Synthesized FileStatus from the manifest: length drives split
      // planning; block size only caps split width; mod time is unused
      // by the parquet read path.
      FileStatusWithMetadata(new FileStatus(
        e.bytes, false, 1, 128L * 1024 * 1024, 0L, new Path(e.path)))
    }
    Seq(PartitionDirectory(InternalRow.empty, files))
  }
}
