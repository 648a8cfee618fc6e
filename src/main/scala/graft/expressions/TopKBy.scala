package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `topk_by(ord, payload, k)` keeps the k
  * largest (ord, payload) pairs per group and returns them as
  * ARRAY<STRUCT<ord, payload>> sorted descending.
  *
  * Why an aggregate when `TopK.perGroup`'s window plan exists (and Spark 4's
  * WindowGroupLimit already makes it hot-key-safe): an aggregate COMPOSES —
  * top-k can ride the same `groupBy.agg(...)` pass as counts/sums/avgs,
  * where the window formulation needs a second shuffle plus a join back.
  * Partial aggregation also bounds the shuffle at k rows per group per map
  * partition, vs the window's full row stream through one exchange.
  *
  * Determinism: ties on `ord` break by the LARGER payload (both orderings
  * descending in the output), so results are stable wherever (ord, payload)
  * is unique per group — the same tiebreak discipline the window queries
  * use. Rows with null `ord` are ignored (max-like null semantics); null
  * payloads order before non-null ones.
  *
  * Serialization between partial and final aggregation writes each heap
  * element through an UnsafeProjection of the element struct — the standard
  * TypedImperativeAggregate pattern (cf. Spark's own
  * `org.apache.spark.sql.catalyst.expressions.aggregate.Collect` / the
  * percentile aggregates).
  */
case class TopKBy(
    ord: Expression,
    payload: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBy.Buffer] with TernaryLike[Expression] {

  lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long if l.isValidInt => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"topk_by: k must be a constant positive integer, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(ord.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: ordering type ${ord.dataType.catalogString} is not orderable")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(payload.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: payload type ${payload.dataType.catalogString} is not " +
          "orderable (needed for deterministic ties)")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_by: k must be a constant")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"topk_by: k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val elementType = StructType(Seq(
    StructField("ord", ord.dataType, nullable = false),
    StructField("payload", payload.dataType, nullable = true)))

  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def nullable: Boolean = false

  override def first: Expression = ord
  override def second: Expression = payload
  override def third: Expression = kExpr
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKBy =
    copy(ord = newFirst, payload = newSecond, kExpr = newThird)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)

  @transient private lazy val ordOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)
  @transient private lazy val payloadOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(payload.dataType)

  /** Ascending over (ord, payload) with nulls-first payload: the heap head
    * is the overall WORST element, the one k+1 insertion evicts. */
  @transient private[expressions] lazy val pairOrdering: Ordering[(Any, Any)] =
    new Ordering[(Any, Any)] {
      def compare(a: (Any, Any), b: (Any, Any)): Int = {
        val c = ordOrdering.compare(a._1, b._1)
        if (c != 0) c
        else (a._2, b._2) match {
          case (null, null) => 0
          case (null, _) => -1
          case (_, null) => 1
          case (x, y) => payloadOrdering.compare(x, y)
        }
      }
    }

  override def createAggregationBuffer(): TopKBy.Buffer =
    new TopKBy.Buffer(k, pairOrdering)

  override def update(buffer: TopKBy.Buffer, input: InternalRow): TopKBy.Buffer = {
    val o = ord.eval(input)
    if (o != null) {
      val p = payload.eval(input)
      // copy BEFORE offering: eval results may alias reused row buffers
      buffer.offer((InternalRow.copyValue(o),
        if (p == null) null else InternalRow.copyValue(p)))
    }
    buffer
  }

  override def merge(buffer: TopKBy.Buffer, other: TopKBy.Buffer): TopKBy.Buffer = {
    other.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKBy.Buffer): Any =
    new GenericArrayData(buffer.sortedDesc.map { case (o, p) =>
      InternalRow(o, p): Any
    })

  @transient private lazy val elementProjection =
    UnsafeProjection.create(elementType)

  override def serialize(buffer: TopKBy.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (o, p) =>
      val row = elementProjection(InternalRow(o, p))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBy.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, size)
      val o = InternalRow.copyValue(row.get(0, ord.dataType))
      val p =
        if (row.isNullAt(1)) null
        else InternalRow.copyValue(row.get(1, payload.dataType))
      buf.offer((o, p))
      i += 1
    }
    buf
  }

  override def prettyName: String = "topk_by"
}

object TopKBy {
  /** Bounded min-heap of capacity k: `offer` keeps only the k largest
    * elements ever seen under the supplied ascending ordering. */
  final class Buffer(k: Int, ordering: Ordering[(Any, Any)]) {
    // Initial capacity is capped: the k bound is enforced by offer(), not
    // the backing array, so topk_by(..., 1_000_000) over many small groups
    // must not allocate O(k) per group buffer up front.
    private val heap =
      new java.util.PriorityQueue[(Any, Any)](
        math.max(1, math.min(k, 16)), ordering)

    def offer(e: (Any, Any)): Unit = {
      if (heap.size < k) { heap.offer(e); () }
      else if (ordering.compare(e, heap.peek()) > 0) {
        heap.poll(); heap.offer(e); ()
      }
    }

    def size: Int = heap.size
    def foreach(f: ((Any, Any)) => Unit): Unit = heap.forEach(e => f(e))

    /** Elements best-first: descending (ord, payload). */
    def sortedDesc: Array[(Any, Any)] =
      heap.toArray(Array.empty[(Any, Any)])
        .sortWith((a, b) => ordering.compare(a, b) > 0)
  }

  /** Column DSL entry: top-k payloads per group by `ord` descending. */
  def topkBy(ord: org.apache.spark.sql.Column, payload: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      TopKBy(
        org.apache.spark.sql.GraftBridge.expression(ord),
        org.apache.spark.sql.GraftBridge.expression(payload),
        org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())
}
