package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** tpcds_q22 ships the decomposable-aggregate rollup rewrite: SUM/COUNT
  * are pre-aggregated per join key before the ROLLUP, so Spark's Expand
  * multiplies key-count rows instead of fact-count rows (5x the fact scan
  * at 100 TB). This spec pins the algebraic claim the rewrite rests on:
  * ROLLUP over per-key partials equals ROLLUP over the raw join for any
  * data, including NULL measures (SUM skips them, COUNT(*) does not) and
  * NULL attribute values (data-NULL groups vs rollup marker rows land
  * identically in both shapes because the finest grouping set keys on
  * every attribute column).
  */
class RollupPreAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 8 dim keys -> attributes with deliberate collisions and a NULL class
  private def dim = {
    import spark.implicits._
    (0 to 7).map(k => (k, s"brand${k % 3}",
      if (k % 4 == 0) None else Some(s"class${k % 2}")))
      .toDF("key", "brand", "cls")
  }

  test("rollup over per-key partial sums equals rollup over raw facts") {
    import spark.implicits._
    val rnd = new Random(22)
    for (trial <- 1 to 8) {
      val facts = List.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(8), if (rnd.nextInt(5) == 0) None
                         else Some(rnd.nextInt(106) - 5)))
      val fact = facts.toDF("key", "qty")
      val direct = fact.join(dim, "key")
        .rollup(col("brand"), col("cls"))
        .agg(sum(col("qty")).as("s"), count(lit(1)).as("c"))
      val pre = fact.groupBy(col("key"))
        .agg(sum(col("qty")).as("ps"), count(lit(1)).as("pc"))
        .join(dim, "key")
        .rollup(col("brand"), col("cls"))
        .agg(sum(col("ps")).as("s"), sum(col("pc")).as("c"))
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3))).toSet
      assert(canon(direct.collect()) == canon(pre.collect()),
        s"trial $trial: ${facts.size} facts")
    }
  }

  test("q22 shape: qoh ratio from partials is the exact per-group mean") {
    import spark.implicits._
    val fact = Seq((0, Some(4)), (0, None), (1, Some(10)), (4, Some(6)),
      (4, Some(0)), (5, None), (5, None)).toDF("key", "qty")
    val got = fact.groupBy(col("key"))
      .agg(sum(col("qty")).as("ps"), count(lit(1)).as("pc"))
      .join(dim, "key")
      .rollup(col("brand"), col("cls"))
      .agg((sum(col("ps")).cast("double") / sum(col("pc"))).as("qoh"))
    val want = fact.join(dim, "key")
      .rollup(col("brand"), col("cls"))
      .agg((sum(col("qty")).cast("double") / count(lit(1))).as("qoh"))
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(canon(got.collect()) == canon(want.collect()))
  }
}
