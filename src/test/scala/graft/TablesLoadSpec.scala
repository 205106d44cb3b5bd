package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Fixture-vintage normalization: `events.ts` has shipped both as parquet
  * TIMESTAMP(NANOS) (which Spark decodes as raw Long under the legacy
  * nanosAsLong conf) and as TIMESTAMP(MICROS). [[Tables.load]] must hand
  * every downstream operator one microsecond TimestampType column with
  * identical values whichever encoding the generator used. */
class TablesLoadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("events.ts arrives as TimestampType from the shipped fixture") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.filter(col("ts").isNotNull).limit(1).count() == 1L)
  }

  test("a nanos-vintage events table (Long ts) normalizes to the same micros") {
    import spark.implicits._
    val micros = Seq(
      1696118400000000L, // 2023-10-01 00:00:00 UTC
      1696118400123456L) // same + 123.456ms
    // nanos vintage = the same instants encoded as int64 nanoseconds
    val dir = Scratch.dir("nanos_fixture")
    try {
      micros.map(us => (1L, us * 1000L)).toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType)
      val got = df.select(unix_micros(col("ts"))).as[Long].collect().sorted
      assert(got.toSeq == micros, "Long-nanos branch must truncate to micros")
    } finally {
      Scratch.sweep(spark)
    }
  }
}
