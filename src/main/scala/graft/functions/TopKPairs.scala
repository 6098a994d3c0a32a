package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k by score as a `TypedImperativeAggregate`: keeps the k best
  * (score DESC, id ASC) pairs in a k-sized buffer. The alternative — a rank
  * window — must SORT every group member on each map partition before the
  * partial group-limit can prune (O(n log n) per partition); this aggregate
  * does a bounded insert per row (O(n·k) for tiny k) and ships a k-row
  * partial state through a plain hash aggregate, the same partial/final
  * shape as any sum. Exact, not a sketch: merge keeps the k best of both
  * buffers, and top-k selection is associative/commutative.
  *
  * eval returns array<struct<score double, id bigint>> best-first; ties
  * break on smaller id, so the result is deterministic.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.check(prettyName,
      scoreExpr.dataType -> "double", idExpr.dataType -> "bigint")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < other.size) { buf.insert(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData((0 until buf.size).map { j =>
      InternalRow(buf.scores(j), buf.ids(j))
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var j = 0
    while (j < buf.size) {
      out.writeDouble(buf.scores(j)); out.writeLong(buf.ids(j)); j += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    (1 to n).foreach(_ => buf.insert(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKPairs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKPairs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = cs.head, idExpr = cs(1))
  override def prettyName: String = "graft_topk_pairs"
}

/** Sorted fixed-capacity buffer: slot 0 is best. Insertion shifts — optimal
  * for the small k this exists for (top-3/top-10 neighbor lists). */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** SQL-compatible double ordering: NaN is LARGEST (Spark's sort and
    * DuckDB agree), -0.0 == 0.0. A raw `>`/`==` comparator is NOT a total
    * order under NaN — a NaN landing in the last slot would freeze the
    * buffer (both comparisons false for every challenger). */
  @inline private def cmpScore(a: Double, b: Double): Int =
    if (a == b) 0
    else if (java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b)) 0
    else if (java.lang.Double.isNaN(a)) 1
    else if (java.lang.Double.isNaN(b)) -1
    else java.lang.Double.compare(a, b)

  /** true if (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = cmpScore(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(s: Double, i: Long): Unit = {
    if (size == k && !better(s, i, scores(k - 1), ids(k - 1))) return
    // find insertion slot (first entry we beat)
    var pos = if (size == k) k - 1 else size
    while (pos > 0 && better(s, i, scores(pos - 1), ids(pos - 1))) pos -= 1
    // shift worse entries down
    var j = math.min(size, k - 1)
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = s; ids(pos) = i
    if (size < k) size += 1
  }
}
