package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Rabin-Karp-style rolling hash over a token array as a native
  * codegen'd expression: h = (h*131 + (numChars(t)*31 + firstCP(t)))
  * mod 1e9+7, left to right.
  *
  * Why custom (SURVEY §2.11): the composable form
  * (`aggregate(tokens, ...)` in TextFunctions.rollingFingerprintHof)
  * is a higher-order function — CodegenFallback, interpreted lambda
  * dispatch per token in q24's hot path. This expression generates one
  * fused loop. Semantics are IDENTICAL to the HOF form (asserted
  * bit-for-bit in PipelineSpec, unicode included): `length` = code
  * point count = UTF8String.numChars, `ascii` = first code point
  * (supplementary-safe via codePointAt) with 0 for the empty string.
  * Modular arithmetic keeps every intermediate < 2^38 — exact on the
  * JVM and in the DuckDB oracle alike (q24's oracle is unchanged).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  private val M = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null // HOF form: null token nulls the fold
      val t = arr.getUTF8String(i)
      h = RollingHash.step(h, t)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val cls = RollingHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $arr.numElements();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $h = $cls.step($h, $arr.getUTF8String($i));
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** One fold step — shared by interpreted and generated code so the
    * arithmetic exists once. numChars counts code points (= Spark
    * `length`); codePointAt(0) matches Spark `ascii` incl.
    * supplementary planes; empty token contributes code 0.
    */
  def step(h: Long, t: UTF8String): Long = {
    val chars = t.numChars().toLong
    val code = if (chars == 0) 0L else t.toString.codePointAt(0).toLong
    (h * 131L + (chars * 31L + code)) % 1000000007L
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", exprs => RollingHash(exprs(0)), "built-in")

  def rollingHash(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("graft_rolling_hash", tokens)
  }
}
