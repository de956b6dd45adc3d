package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature sketch as a TypedImperativeAggregate (SURVEY
  * §2.11's sketch-aggregate candidate): one pass over a group's
  * shingles produces the full `numHashes`-slot signature
  * `h_i = min over shingles of xxhash64(i, shingle)`.
  *
  * Why custom: the composable form is `numHashes` independent
  * `min(xxhash64(lit(i), col))` aggregates — numHashes hash
  * evaluations AND numHashes aggregation buffers per group. This
  * sketch keeps one mutable long-array buffer per group and one
  * input-string traversal per hash slot, merges partials elementwise
  * (map-side combine works as usual), and hashes identically to
  * `functions.xxhash64(lit(i), col)` (seed 42 chained through the int
  * slot then the string), so the two forms are bit-equal — tested in
  * PipelineSpec.
  */
case class MinHashSketch(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  // per-slot seeds depend only on the slot index — precomputed once
  // per executor instead of once per input row
  @transient private lazy val slotSeeds: Array[Long] =
    Array.tabulate(numHashes)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        // identical chaining to functions.xxhash64(lit(i), col):
        // seed 42 -> hash(int slot) -> becomes seed for the string
        val h = XxHash64Function.hash(s, StringType, slotSeeds(i))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSketch =
    copy(child = c.head)
}

object MinHashSketch {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinHashSketch(exprs(0),
        exprs(1).asInstanceOf[Literal].value.asInstanceOf[Int]),
      "built-in")

  /** Aggregate Column: array<bigint> MinHash signature of the group. */
  def minhash(spark: SparkSession, shingle: Column, numHashes: Int): Column = {
    register(spark)
    call_function("graft_minhash", shingle,
      org.apache.spark.sql.functions.lit(numHashes))
  }
}
