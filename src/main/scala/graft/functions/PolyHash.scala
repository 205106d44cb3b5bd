package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable 31-polynomial string hash
  * mod 1e9+7 (the shingle/fingerprint hash of the dedup suites).
  *
  * Why a custom `Expression` instead of the higher-order-function fold in
  * [[TextFunctions.polyHash]]: HOF lambdas evaluate interpreted per
  * element (a `split('')` + per-character lambda allocates and dispatches
  * for every character), which measured ~5.8 s for 260k shingles at
  * sf0.1. This expression participates in whole-stage codegen — the
  * generated code makes one static JVM call per row and loops over code
  * points with no allocation.
  *
  * Semantics: fold over UNICODE CODE POINTS, `(acc*31 + cp) % 1e9+7`,
  * exactly DuckDB's `list_transform(string_split(s,''), unicode)` fold —
  * the oracle mirror ([[TextFunctions.duckPolyHash]]) by construction.
  * (The HOF variant matches only for BMP text because Spark's
  * `split('')` cuts UTF-16 code units; for the ASCII fixtures all three
  * agree.)
  *
  * Registered as SQL function `graft_polyhash` either through
  * [[GraftExtensions]] (`spark.sql.extensions` — the reference-free
  * extension route) or imperatively via [[GraftFunctions.registerAll]].
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Static hot loop invoked from generated code: no lambda dispatch,
    * no allocation beyond the UTF8String→String decode. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * 31 + cp) % Mod
    }
    acc
  }
}

/** Word k-shingles of the lowercased text as a codegen'd expression —
  * space-joined k-grams of the single-space-separated word list, exactly
  * [[TextFunctions.shingles]] (which builds the same thing from
  * `transform(sequence(...), concat_ws(...))` HOF lambdas, measured ~4 s
  * interpreted for 5000 docs at sf0.1). One static call per row; the
  * word array and every shingle are UTF8String ops with no regex and no
  * lambda dispatch. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires (string, k>=1), got (${child.dataType}, $k)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.build(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.build($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** Static hot loop invoked from generated code. Mirrors
    * `transform(sequence(1, n-k+1), i -> concat_ws(' ', w[i..i+k-1]))`
    * over `split(lower(text), ' ')` (regex split, limit -1 — empties
    * kept exactly like Spark's split). */
  def build(s: UTF8String, k: Int): ArrayData = {
    val words = s.toLowerCase.split(Space, -1)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(words, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Imperative registration for sessions not built with the extension
  * (idempotent; used by operator builds so they work in any session). */
object GraftFunctions {
  private def intLit(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_polyhash", exprs => PolyHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs.head, intLit(exprs(1))), "built-in")
  }
}

/** `spark.sql.extensions` entry point: injects the engine's SQL
  * functions into every session derived from the config — the
  * SparkSessionExtensions route from SURVEY.md §5. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs(1).asInstanceOf[Literal].value.asInstanceOf[Number].intValue())))
  }
}
