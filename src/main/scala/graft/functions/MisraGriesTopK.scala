package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate` — the
  * Catalyst mechanism for JVM-object aggregation buffers (SURVEY §4.3:
  * "custom sketches → TypedImperativeAggregate"; the reference runs Spark's
  * own such aggregates through `ObjectHashAggregateDirectExec`, reference
  * `ObjectHashAggregateDirectExec.scala:59-137`).
  *
  * Guarantees: any value with frequency > n/(capacity+1) is present in the
  * final candidate set; counts are lower bounds. Buffers are mergeable
  * (partial aggregation works: counter-wise add, then reduce back to
  * capacity), so the operator scales as a normal two-phase aggregate — the
  * sketch is what you ship from 1000 executors instead of full frequency
  * maps. Exact counts for the survivors come from a second cheap pass over
  * the candidates only (see u65_sketch_topk).
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.check(prettyName, child.dataType -> "string")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Classic MG step: increment if tracked or space free, else decrement all
    * (dropping zeroed counters). */
  override def update(buf: mutable.HashMap[UTF8String, Long], input: InternalRow)
      : mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key.clone(), 1L)
        case None =>
          val dead = buf.iterator.filter(_._2 <= 1).map(_._1).toList
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Counter-wise sum, then MG-reduce back to capacity: subtract the
    * (size-capacity)-th largest count and drop non-positive counters. */
  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(capacity) // largest count that must go
      val dead = buf.iterator.filter(_._2 <= cut).map(_._1).toList
      buf.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Candidates ordered by (estimated count desc, value) — deterministic. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map(_._1.asInstanceOf[Any]))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = cs.head)
  override def prettyName: String = "graft_mg_topk"
}
