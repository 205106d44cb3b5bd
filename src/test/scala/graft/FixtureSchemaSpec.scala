package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Early-warning gate on fixture vintage: the driver regenerates
  * /root/testdata between rounds and has already flipped a physical type
  * once (events.ts nanos → micros). Operators and their DuckDB oracles
  * assume the post-[[Tables.load]] types below; if a regeneration changes
  * them, this spec fails FIRST with a readable diff instead of dozens of
  * queries failing deep in the gate. On failure: inspect the parquet with
  * pyarrow, then either extend Tables.load normalization (as done for
  * events.ts) or re-fit the operators — never assume fixture physical
  * types are stable. */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Map[String, DataType]] = Map(
    "lineitem" -> Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "orders" -> Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "customer" -> Map(
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "part" -> Map(
      "p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "supplier" -> Map(
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "events" -> Map( // post-normalization contract, both vintages
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  // date-ish columns the queries compare/extract with date functions; they
  // have shipped as timestamp[us] — DateType would also work in both
  // engines, so accept either rather than overpin
  private val dateish = Map(
    "lineitem" -> Seq("l_shipdate"), "orders" -> Seq("o_orderdate"))

  test("fixture tables load with the types the operator corpus assumes") {
    val diffs = expected.flatMap { case (table, cols) =>
      val schema = Tables.load(spark, dir, table).schema
      val got = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.flatMap { case (c, want) =>
        got.get(c) match {
          case None => Some(s"$table.$c: MISSING (fixture regenerated?)")
          case Some(`want`) => None
          case Some(other) => Some(s"$table.$c: expected $want, got $other")
        }
      } ++ dateish.getOrElse(table, Nil).flatMap { c =>
        got.get(c) match {
          case Some(TimestampType) | Some(TimestampNTZType) | Some(DateType) => None
          case other => Some(s"$table.$c: expected a date/timestamp, got $other")
        }
      }
    }
    assert(diffs.isEmpty,
      "\nFixture vintage changed — see Tables.load scaladoc before fixing:\n  "
        + diffs.mkString("\n  "))
  }
}
