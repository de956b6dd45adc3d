package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams over an `array<string>` column as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Why custom (SURVEY §2.11): the composable form
  * `transform(sequence(0, len - n), i -> concat_ws(' ', toks[i], ...))`
  * is a higher-order function — CodegenFallback, per-row lambda
  * dispatch plus a `sequence` array allocation — sitting in the
  * hottest text paths (shingles for q26/q27/q54, bigrams for q55/q56,
  * trigrams for q61). This generates one fused loop building the
  * output array directly.
  *
  * Semantics are identical to the composable form for n >= 1 on
  * non-null token arrays: fewer than n tokens => empty array (callers
  * additionally pre-filter, matching the oracle CTEs). `concatWs`
  * skips nulls exactly like `concat_ws`; `tokens()` never yields null
  * elements.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements() - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val m = ctx.freshName("m")
      val res = ctx.freshName("res")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $m = $c.numElements() - $n + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  Object[] $res = new Object[$m];
         |  $u8[] $parts = new $u8[$n];
         |  for (int $i = 0; $i < $m; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $c.getUTF8String($i + $j);
         |    }
         |    $res[$i] = $u8.concatWs($sepRef, $parts);
         |  }
         |  ${ev.value} = new $gad($res);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  /** Idempotently register and return a Column-level handle. The width
    * rides in as a literal so the registry lambda stays (exprs -> expr).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams",
      exprs => WordNGrams(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")

  def ngrams(spark: SparkSession, toks: Column, n: Int): Column = {
    register(spark)
    call_function("graft_ngrams", toks, lit(n))
  }
}
