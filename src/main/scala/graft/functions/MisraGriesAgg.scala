package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native typed aggregate — the
  * engine's `TypedImperativeAggregate` surface (custom aggregation
  * state with its own serialization, partial update, and merge), used
  * as the distributed candidate stage for exact heavy hitters.
  *
  * Semantics: at most `k` counters survive in any buffer. Updating an
  * absent item when the buffer is full decrements every counter
  * (dropping zeros) instead of inserting — the classic bound that a
  * counter is undercounted by at most `N/(k+1)`. Merging sums the two
  * counter sets and, if more than `k` survive, subtracts the
  * `(k+1)`-th largest count from all (the Agarwal et al. mergeable-
  * summaries rule), preserving the same bound over the combined
  * stream. Consequence: every item with true frequency GREATER than
  * `N/(k+1)` is guaranteed present in the final map; reported counts
  * are lower bounds. Exact counts come from a recount pass over the
  * candidates (see [[graft.ops.HeavyHitters]]).
  *
  * Returns `map<string, bigint>` (candidate → lower-bound count).
  * The candidate SET beyond the guaranteed heavy hitters depends on
  * partition merge order — treat the output as a superset to verify,
  * never as final truth.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "sketch size k must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, " +
          s"got ${child.dataType.catalogString}")

  override def prettyName: String = "graft_misra_gries"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // probe with the transient row-backed UTF8String; clone only when
    // the key is actually inserted (scala HashMap.update on an existing
    // key retains the original key object, so the hit path never copies)
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item.clone(), 1L)
      case None =>
        // decrement-all; drop exhausted counters
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (key, c) => keys(i) = key; vals(i) = c; i += 1 }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      val c = in.getLong
      buf.update(UTF8String.fromBytes(arr), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  /** `misraGries(col, k)` as an aggregate Column. */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
