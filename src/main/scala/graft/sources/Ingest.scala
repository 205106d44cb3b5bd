package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Load-path operators: schema'd CSV ingest, verified bulk load (CTAS
  * analog), seeded synthetic generation, controlled file layout.
  * Reference: TPCDSDataLoad.scala:95-129 (CTAS + verify),
  * IncrementalTPCDSBenchmark.scala:422-443 (pipe-delimited CSV with
  * declared schema), MergeMicroBenchmark.scala:225-251 (synthetic + merge
  * source), FileCountBenchmark.scala:172-238 (file layout).
  */
object Ingest {

  /** Pipe-delimited, headerless CSV read with a declared schema —
    * identical API shape to the reference's dsdgen loader. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = "|"): DataFrame =
    spark.read.format("csv")
      .option("delimiter", delimiter)
      .option("header", "false")
      .schema(schema)
      .load(path)

  /** Bulk load: source DF → partitioned parquet + row-count verification
    * (the reference's CTAS + count assert, TPCDSDataLoad.scala:117-128).
    * Null partition keys are excluded exactly as the reference does. */
  def loadVerified(df: DataFrame, dest: String,
      partitionBy: Option[String] = None): Long = {
    val (toWrite, writer) = partitionBy match {
      case Some(p) =>
        val clean = df.filter(col(p).isNotNull)
        (clean, clean.repartition(col(p)).write.partitionBy(p))
      case None => (df, df.write)
    }
    val expected = toWrite.count()
    writer.mode(SaveMode.Overwrite).parquet(dest)
    val actual = df.sparkSession.read.parquet(dest).count()
    require(actual == expected, s"load verification failed: $actual != $expected")
    actual
  }

  /** Seeded synthetic table via range + pure arithmetic (deterministic —
    * the reference's unseeded rand() is the flagged nondeterminism risk,
    * MergeMicroBenchmark.scala:249). Columns mirror the merge-micro
    * shape: (key, value, value2, partition). */
  def synthetic(spark: SparkSession, rows: Long, numSplits: Int = 4): DataFrame =
    spark.range(0, rows, 1, numSplits).select(
      col("id").as("key"),
      (((col("id") * 2654435761L) % 1000003L) / lit(1000.0)).as("value"),
      concat(lit("v"), ((col("id") * 31L) % 97L).cast("string")).as("value2"),
      (col("id") % 7L).as("partition"))

  /** Merge-source generator (MergeMicroBenchmark.scala:231-251 analog):
    * deterministic fraction of updated keys + appended inserts. */
  def mergeSource(base: DataFrame, keyCol: String, updateEveryNth: Long,
      insertEveryNth: Long, insertKeyOffset: Long): DataFrame = {
    val updates = base.filter(col(keyCol) % updateEveryNth === 0)
      .withColumn("value", col("value") + 1.0)
    val inserts = base.filter(col(keyCol) % insertEveryNth === 0)
      .withColumn(keyCol, col(keyCol) + insertKeyOffset)
    updates.unionByName(inserts)
  }

  /** Controlled file layout (FileCountBenchmark.scala:172-238): exactly
    * `numFiles` files, rows sorted by `sortCols` within each file so
    * per-file min/max stats are tight (data-skipping friendly). */
  def controlledLayout(df: DataFrame, dest: String, numFiles: Int,
      sortCols: Seq[String]): Unit =
    df.repartition(numFiles)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dest)
}
