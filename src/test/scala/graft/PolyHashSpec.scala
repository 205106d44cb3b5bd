package graft

import graft.functions.{PolyHash, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd PolyHash expression must agree with (a) a direct Scala
  * reference fold over code points (= DuckDB's unicode() fold), and
  * (b) the HOF variant for ASCII/BMP text. */
class PolyHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def reference(s: String): Long = {
    var acc = 0L
    s.codePoints().forEach(cp => acc = (acc * 31 + cp) % 1000000007L)
    acc
  }

  test("PolyHash.hash matches the code-point reference fold") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(120)).mkString
      assert(PolyHash.hash(s) == reference(s))
    }
    // non-ASCII BMP text too
    assert(PolyHash.hash("héllo wörld") == reference("héllo wörld"))
    assert(PolyHash.hash("") == 0L)
  }

  test("SQL graft_polyhash equals the HOF fold on fixture-like text") {
    import spark.implicits._
    val texts = Seq("key agg row scan", "a b", "", "part value table hash",
      "x" * 200)
    val df = texts.toDF("s")
    val got = df.select(expr("graft_polyhash(s)")).collect().map(_.getLong(0))
    val hof = df.select(TextFunctions.polyHash("s")).collect().map(_.getLong(0))
    assert(got.toSeq == hof.toSeq)
    assert(got.toSeq == texts.map(PolyHash.hash))
  }

  test("graft_shingles equals the HOF shingles on fixture text") {
    graft.functions.GraftFunctions.registerAll(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
        expr("graft_shingles(text, 3)").as("fast"),
        TextFunctions.shingles("text", 3).as("hof"))
      .filter(expr("fast <> hof"))
      .count()
    assert(diff == 0)
    // edge cases: fewer words than k, empty string
    import spark.implicits._
    val edges = Seq("", "one", "two words", "a b c").toDF("text")
    val got = edges.select(expr("graft_shingles(text, 3)")).collect()
      .map(_.getSeq[String](0).toList).toList
    assert(got == List(Nil, Nil, Nil, List("a b c")))
  }

  test("graft_dot equals the HOF fold bit-for-bit on float and double arrays") {
    graft.functions.GraftFunctions.registerAll(spark)
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    // double arrays: self dot (the norm path)
    val dd = e.select(
        expr("graft_dot(v, v)").as("fast"),
        expr("aggregate(v, CAST(0 AS DOUBLE), (s, x) -> s + x * x)").as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(dd == 0)
    // float arrays straight from parquet (no pre-cast) promote exactly
    val fd = e.select(
        expr("graft_dot(embedding, embedding)").as("fast"),
        expr("graft_dot(v, v)").as("viaDouble"))
      .filter(col("fast") =!= col("viaDouble")).count()
    assert(fd == 0)
    // cross dot between two different vectors matches zip_with chain
    val a = e.select(col("vec_id"), col("v"))
    val pairs = a.as("a").join(a.as("b"),
      col("a.vec_id") === col("b.vec_id") - 1)
    val xd = pairs.select(
        expr("graft_dot(a.v, b.v)").as("fast"),
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x)").as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(xd == 0)
  }

  test("expression participates in codegen (no fallback errors) at scale") {
    import spark.implicits._
    val n = spark.range(0, 10000)
      .selectExpr("concat('doc ', id, ' text payload') AS s")
      .selectExpr("graft_polyhash(s) AS h")
      .agg(countDistinct($"h")).head().getLong(0)
    assert(n > 9900) // distinct inputs hash distinctly (mod collisions)
  }
}
