package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.types._

/** Mergeable quantile sketches as stored data — the quantile analog of the
  * DataSketches HLL rollup (x10): `qsketch_agg(v, eps)` builds a
  * Greenwald–Khanna summary per group and returns it as BINARY;
  * `qsketch_merge_agg(sk)` unions stored sketches; `qsketch_query(sk, p)`
  * reads a quantile out of a sketch. Together they support the 100 TB
  * rollup pattern: per-partition (e.g. per-day) sketches are built ONCE at
  * a few KB each, and any period's quantiles come from merging the sketch
  * rows — history is never rescanned.
  *
  * The sketch machinery is Spark's own
  * `org.apache.spark.sql.catalyst.util.QuantileSummaries` (what
  * `approx_percentile` uses internally), so rank-error behavior matches the
  * built-in aggregate; what the built-in does NOT offer is the sketch as a
  * first-class value that can be stored and re-merged later. Rank error is
  * `eps` per sketch; merging preserves the GK invariants with at most an
  * additive-eps degradation, so property checks should leave a few eps of
  * slack (x17 checks ±4 eps).
  *
  * Estimates are DATA-dependent but PARTITIONING-dependent too (GK merge
  * order matters), so — like h01/x06/x10 — queries must surface property
  * flags (estimate within exact rank bounds), never raw estimates, to stay
  * deterministic across executor counts and retries.
  */
object QSketch {
  /** Mutable holder so insert's copy-on-head-flush stays encapsulated. */
  final class Buf(val eps: Double) {
    var qs: QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)
    def insert(v: Double): Unit = qs = qs.insert(v)
    def mergeIn(other: QuantileSummaries): Unit = {
      qs = qs.compress()
      qs = if (qs.count == 0) other else if (other.count == 0) qs else qs.merge(other)
    }
  }

  /** (eps, count, sampled triples) — compressed form only. */
  def serialize(qsIn: QuantileSummaries): Array[Byte] = {
    val qs = qsIn.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(qs.relativeError)
    out.writeLong(qs.count)
    val sampled = qs.sampled
    out.writeInt(sampled.length)
    var i = 0
    while (i < sampled.length) {
      val s = sampled(i)
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val eps = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = new Array[QuantileSummaries.Stats](n)
    var i = 0
    while (i < n) {
      sampled(i) = QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong())
      i += 1
    }
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, eps, sampled, count, true)
  }

  // Column DSL entries (SQL names registered in GraftExtensions).
  import org.apache.spark.sql.{Column, GraftBridge}
  def sketchAgg(v: Column, eps: Double): Column =
    GraftBridge.column(QSketchAgg(GraftBridge.expression(v),
      org.apache.spark.sql.catalyst.expressions.Literal(eps)).toAggregateExpression())
  def mergeAgg(sk: Column): Column =
    GraftBridge.column(
      QSketchMergeAgg(GraftBridge.expression(sk)).toAggregateExpression())
  def query(sk: Column, p: Double): Column =
    GraftBridge.column(QSketchQuery(GraftBridge.expression(sk),
      org.apache.spark.sql.catalyst.expressions.Literal(p)))
}

/** `qsketch_agg(value, eps)` → BINARY GK summary of the group's non-null
  * values. Null-skipping like approx_percentile; an all-null group yields
  * an empty (count=0) sketch, which queries as NULL. */
case class QSketchAgg(
    child: Expression,
    epsExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch.Buf] with BinaryLike[Expression] {

  lazy val eps: Double = epsExpr.eval() match {
    case d: Double => d
    case f: Float => f.toDouble
    case other => throw new IllegalArgumentException(
      s"qsketch_agg: eps must be a constant double, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"qsketch_agg: value must be DOUBLE, got ${child.dataType.catalogString}")
    else if (epsExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"qsketch_agg: eps must be DOUBLE, got ${epsExpr.dataType.catalogString}")
    else if (!epsExpr.foldable)
      TypeCheckResult.TypeCheckFailure("qsketch_agg: eps must be a constant")
    else if (eps <= 0d || eps >= 1d)
      TypeCheckResult.TypeCheckFailure(
        s"qsketch_agg: eps must be in (0, 1), got $eps")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def left: Expression = child
  override def right: Expression = epsExpr
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QSketchAgg =
    copy(child = newLeft, epsExpr = newRight)
  override def withNewMutableAggBufferOffset(newOffset: Int): QSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): QSketch.Buf = new QSketch.Buf(eps)

  override def update(buf: QSketch.Buf, input: InternalRow): QSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QSketch.Buf, other: QSketch.Buf): QSketch.Buf = {
    buf.mergeIn(other.qs.compress())
    buf
  }

  override def eval(buf: QSketch.Buf): Any = QSketch.serialize(buf.qs)
  override def serialize(buf: QSketch.Buf): Array[Byte] = QSketch.serialize(buf.qs)
  override def deserialize(bytes: Array[Byte]): QSketch.Buf = {
    val buf = new QSketch.Buf(eps)
    buf.mergeIn(QSketch.deserialize(bytes))
    buf
  }

  override def prettyName: String = "qsketch_agg"
}

/** `qsketch_merge_agg(sketch)` → BINARY union of stored sketches. The
  * result's eps is carried from the inputs (all inputs must share one eps —
  * enforced at merge time, since mixing sketch resolutions silently
  * degrades the bound the reader believes). */
case class QSketchMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch.Buf] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"qsketch_merge_agg: input must be BINARY, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override protected def withNewChildInternal(newChild: Expression): QSketchMergeAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(newOffset: Int): QSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)

  // eps is unknown until the first sketch arrives; an empty union serializes
  // as an empty sketch at the default error.
  override def createAggregationBuffer(): QSketch.Buf =
    new QSketch.Buf(QuantileSummaries.defaultRelativeError)

  private def requireSameEps(buf: QSketch.Buf, in: QuantileSummaries): Unit =
    if (buf.qs.count > 0 && buf.qs.relativeError != in.relativeError)
      throw new IllegalArgumentException(
        s"qsketch_merge_agg: mixed sketch eps ${buf.qs.relativeError} vs " +
          s"${in.relativeError} — rebuild at one resolution")

  override def update(buf: QSketch.Buf, input: InternalRow): QSketch.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val in = QSketch.deserialize(v.asInstanceOf[Array[Byte]])
      if (in.count > 0) { requireSameEps(buf, in); buf.mergeIn(in) }
    }
    buf
  }

  override def merge(buf: QSketch.Buf, other: QSketch.Buf): QSketch.Buf = {
    if (other.qs.count > 0) { requireSameEps(buf, other.qs); buf.mergeIn(other.qs.compress()) }
    buf
  }

  override def eval(buf: QSketch.Buf): Any = QSketch.serialize(buf.qs)
  override def serialize(buf: QSketch.Buf): Array[Byte] = QSketch.serialize(buf.qs)
  override def deserialize(bytes: Array[Byte]): QSketch.Buf = {
    val qs = QSketch.deserialize(bytes)
    val buf = new QSketch.Buf(qs.relativeError)
    buf.mergeIn(qs)
    buf
  }

  override def prettyName: String = "qsketch_merge_agg"
}

/** `qsketch_query(sketch, p)` → approximate p-quantile (DOUBLE; NULL for an
  * empty sketch). Interpreted-only eval: queries run over sketch ROWS
  * (one per day/partition), never the raw data, so codegen would buy
  * nothing. */
case class QSketchQuery(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"qsketch_query: sketch must be BINARY, got ${left.dataType.catalogString}")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"qsketch_query: p must be DOUBLE, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QSketchQuery =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(sk: Any, p: Any): Any = {
    val qs = QSketch.deserialize(sk.asInstanceOf[Array[Byte]])
    if (qs.count == 0) null
    else qs.query(p.asInstanceOf[Double]).getOrElse(null).asInstanceOf[Any]
  }

  override def prettyName: String = "qsketch_query"
}
