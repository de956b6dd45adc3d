package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Maximum multiplicity of any element in an `array<string>` column
  * (the count of the mode), as a native codegen'd expression. NULL for
  * an empty array — "no elements" has no mode, and the repetition
  * fractions built on it must NULL-propagate, not divide by zero.
  *
  * Why custom (SURVEY §2.11): with this, per-document n-gram
  * statistics (q55) become a PURE MAP — the explode + two keyed
  * aggregations they would otherwise need all carry doc_id, so at
  * 100 TB they shuffle the whole exploded corpus just to count within
  * each row's own array. One per-row hash count removes the shuffle
  * entirely.
  */
case class ArrayMaxFreq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  // NULL on empty input regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_max_freq"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      val counts = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
      var best = 0L
      var i = 0
      while (i < n) {
        val k = arr.getUTF8String(i)
        val c = counts.merge(k, 1L, (a, b) => a + b)
        if (c > best) best = c
        i += 1
      }
      best
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val best = ctx.freshName("best")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val cur = ctx.freshName("cur")
      val v = ctx.freshName("v")
      val u8 = classOf[UTF8String].getName
      // raw-type HashMap: janino's generics support is unreliable
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.util.HashMap $counts = new java.util.HashMap($n * 2);
         |  long $best = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $u8 $k = $c.getUTF8String($i);
         |    Object $cur = $counts.get($k);
         |    long $v = ($cur == null) ? 1L : ((Long) $cur).longValue() + 1L;
         |    $counts.put($k, java.lang.Long.valueOf($v));
         |    if ($v > $best) $best = $v;
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayMaxFreq =
    copy(child = newChild)
}

object ArrayMaxFreq {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_array_max_freq", exprs => ArrayMaxFreq(exprs(0)), "built-in")

  def maxFreq(spark: SparkSession, arr: Column): Column = {
    register(spark)
    call_function("graft_array_max_freq", arr)
  }
}
