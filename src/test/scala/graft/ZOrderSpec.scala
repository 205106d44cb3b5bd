package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Z-order clustering: the Morton value must interleave bits exactly,
  * and a zorder-clustered file layout must shrink per-file min/max
  * spans on BOTH dimensions (the data-skipping property a linear sort
  * only provides for its leading column). */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ZOrder2.z interleaves bits (known values + round-trip)") {
    import graft.functions.ZOrder2.z
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)  // x → even bit positions
    assert(z(0, 1) == 2L)  // y → odd bit positions
    assert(z(3, 0) == 5L)  // 0b11 interleaved → 0b0101
    assert(z(0, 3) == 10L) // 0b11 on odd positions → 0b1010
    assert(z(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    // only the low 16 bits participate
    assert(z(0x1FFFF, 0) == z(0xFFFF, 0))
    // de-interleave round-trip on random values
    val rnd = new scala.util.Random(23)
    (1 to 200).foreach { _ =>
      val x = rnd.nextInt(65536); val y = rnd.nextInt(65536)
      val v = z(x, y)
      var rx = 0L; var ry = 0L
      (0 until 16).foreach { i =>
        rx |= ((v >> (2 * i)) & 1L) << i
        ry |= ((v >> (2 * i + 1)) & 1L) << i
      }
      assert(rx == x && ry == y)
    }
  }

  test("ZOrderN generalizes ZOrder2 and round-trips 3-D") {
    import graft.functions.{ZOrder2, ZOrderN}
    val rnd = new scala.util.Random(31)
    // 2-ary: bit-identical to the dedicated ZOrder2 (the gate oracle)
    (1 to 200).foreach { _ =>
      val x = rnd.nextInt(65536).toLong; val y = rnd.nextInt(65536).toLong
      assert(ZOrderN.z(Array(x, y)) == ZOrder2.z(x, y))
    }
    // 3-ary: de-interleave round-trip (dim d's bit i sits at i*3 + d)
    (1 to 200).foreach { _ =>
      val xs = Array.fill(3)(rnd.nextInt(65536).toLong)
      val v = ZOrderN.z(xs)
      val back = (0 until 3).map { d =>
        (0 until 16).foldLeft(0L)((acc, i) =>
          acc | (((v >> (i * 3 + d)) & 1L) << i))
      }
      assert(back == xs.toSeq)
    }
    // SQL dispatch: 3-ary goes through ZOrderN inside codegen
    graft.functions.GraftFunctions.registerAll(spark)
    import spark.implicits._
    val r = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L)).toDF("a", "b", "c")
      .selectExpr("graft_zorder(a, b, c) AS z").collect().map(_.getLong(0))
    assert(r.toSeq == Seq(1L, 2L, 4L))
    // nulls propagate
    val n = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .selectExpr("graft_zorder(a, b, a) AS z").head
    assert(n.isNullAt(0))
    // duckSql mirror agrees with the JVM fold
    val expr3 = ZOrderN.duckSql(Seq("a", "b", "c"))
    val viaSql = Seq((7L, 11L, 13L)).toDF("a", "b", "c")
      .selectExpr(s"$expr3 AS z").head.getLong(0)
    assert(viaSql == ZOrderN.z(Array(7L, 11L, 13L)))
  }

  test("4-dim curve never goes negative (signed range-sort stays in curve order)") {
    import graft.functions.ZOrderN
    val rnd = new scala.util.Random(47)
    (1 to 500).foreach { _ =>
      val xs = Array.fill(4)(rnd.nextInt(65536).toLong)
      assert(ZOrderN.z(xs) >= 0L, s"negative curve value for ${xs.toSeq}")
    }
    // the old 16-bit interleave put dim 3's top bit on bit 63: a row
    // with dim3 >= 32768 sorted BELOW all-zero rows under signed order
    val hi = ZOrderN.z(Array(0L, 0L, 0L, 65535L))
    assert(hi > ZOrderN.z(Array(0L, 0L, 0L, 0L)))
    // dominance along each axis is preserved at 15-bit resolution
    (0 until 4).foreach { d =>
      val lo = Array.fill(4)(0L)
      val up = Array.fill(4)(0L); up(d) = 65534L
      assert(ZOrderN.z(up) > ZOrderN.z(lo))
    }
    // duckSql mirror agrees in the 4-ary (15-bit) regime too
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val expr4 = ZOrderN.duckSql(Seq("a", "b", "c", "d"))
    val row = Seq((40000L, 7L, 65535L, 33000L)).toDF("a", "b", "c", "d")
      .selectExpr(s"$expr4 AS m", "graft_zorder(a, b, c, d) AS z").head
    assert(row.getLong(0) == row.getLong(1))
    assert(row.getLong(1) == ZOrderN.z(Array(40000L, 7L, 65535L, 33000L)))
  }

  test("zorder layout narrows per-file spans on both dimensions") {
    graft.functions.GraftFunctions.registerAll(spark)
    val o = Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .select("o_orderkey", "o_custkey")
    val nFiles = 8
    def spans(dir: String): (Double, Double) = {
      val byFile = spark.read.parquet(dir)
        .select(input_file_name().as("f"), col("o_orderkey"), col("o_custkey"))
        .groupBy("f")
        .agg((max("o_orderkey") - min("o_orderkey")).as("sk"),
          (max("o_custkey") - min("o_custkey")).as("sc"))
        .agg(avg("sk"), avg("sc")).head()
      (byFile.getDouble(0), byFile.getDouble(1))
    }
    // Z-order prerequisite: normalize both dimensions to a common scale
    // (8 bits here) before interleaving — raw interleave of unequal-range
    // keys degenerates to a linear sort on the wider key's high bits.
    val stats = o.agg(max("o_orderkey"), max("o_custkey")).head()
    val (mk, mc) = (stats.getLong(0), stats.getLong(1))
    val zdir = Files.createTempDirectory("graft_zorder").toString
    o.withColumn("xn", floor(col("o_custkey") * 256.0 / (mc + 1)).cast("long"))
      .withColumn("yn", floor(col("o_orderkey") * 256.0 / (mk + 1)).cast("long"))
      .withColumn("zval", expr("graft_zorder(xn, yn)"))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval", "xn", "yn")
      .write.mode("overwrite").parquet(zdir)
    val rdir = Files.createTempDirectory("graft_rand").toString
    o.repartition(nFiles).write.mode("overwrite").parquet(rdir)

    val keySpan = o.agg(max("o_orderkey") - min("o_orderkey"),
      max("o_custkey") - min("o_custkey")).head()
    val (fullK, fullC) = (keySpan.getLong(0).toDouble, keySpan.getLong(1).toDouble)
    val (zk, zc) = spans(zdir)
    val (rk, rc) = spans(rdir)
    // random layout: every file spans ~the full range on both dims
    assert(rk > fullK * 0.9 && rc > fullC * 0.9)
    // zorder layout: BOTH dims shrink well below the full span (8 ranges
    // over interleaved 8-bit dims → one dim splits 4 ways, the other 2)
    assert(zk < fullK * 0.7, s"orderkey span $zk vs full $fullK")
    assert(zc < fullC * 0.7, s"custkey span $zc vs full $fullC")
  }
}
