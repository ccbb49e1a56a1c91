package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary (k counters) as a Catalyst
  * aggregate: the heavy-hitters answer at 100 TB, where an exact
  * groupBy over a high-cardinality key would shuffle every distinct
  * value. State is AT MOST k (item, counter) pairs per group regardless
  * of input size; map-side partials merge by counter addition followed
  * by the (k+1)-th-largest-counter subtraction (Agarwal et al.,
  * "Mergeable Summaries", PODS'12), which preserves the deterministic
  * error bound: every item with true frequency > n/(k+1) is in the
  * summary, and each estimate undercounts by at most n/(k+1).
  *
  * The candidate SET and its bound are guaranteed; the exact estimates
  * can vary with partition merge order (like any MG summary), so the
  * query key is ✖-oracle by design — when k ≥ the true distinct count
  * no counter is ever decremented and the summary is EXACT, which is
  * what the spec pins.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int = 8,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters_agg"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      if (buf.contains(item)) buf(item) += 1L
      else if (buf.size < k) buf(item) = 1L
      else {
        // decrement-all step: kill one "vote" of every tracked item.
        // Snapshot first — mutating a LongMap mid-iteration relies on
        // an undocumented guarantee of its foreachEntry.
        buf.toArray.foreach { case (i, c) =>
          if (c == 1L) buf.remove(i) else buf(i) = c - 1L
        }
      }
    }
    buf
  }

  override def merge(a: mutable.LongMap[Long], b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreachEntry { (i, c) => a(i) = a.getOrElse(i, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter from all, drop
      // non-positive; snapshot before mutating (see update above)
      val d = a.values.toArray.sorted(Ordering[Long].reverse)(k)
      a.toArray.foreach { case (i, c) =>
        if (c - d <= 0L) a.remove(i) else a(i) = c - d
      }
    }
    a
  }

  override def eval(buf: mutable.LongMap[Long]): Any =
    new GenericArrayData(
      buf.toArray.sortBy { case (i, c) => (-c, i) }
        .map { case (i, c) => InternalRow(i, c) })

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (i, c) => bb.putLong(i); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m(bb.getLong()) = bb.getLong(); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHittersAgg {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters_agg", exprs => HeavyHittersAgg(exprs.head), "built-in")
}
