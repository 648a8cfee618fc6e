package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Gap-filled LOCF grid generator: from one key's observed cells
  * `ARRAY<STRUCT<bucket BIGINT, n_events BIGINT, v ANY>>` (any order) and
  * the span [lo, hi], yields one row per bucket — `(bucket, n_events,
  * value_locf)` with `n_events = 0` for gaps and `value_locf` = the last
  * non-null observed `v` at a bucket ≤ the emitted one (null until the
  * first non-null observation) — exactly the rows the
  * map-expand + LOCF-window formulation produced.
  *
  * Why (guide §1.2 step 2): the expand built a `bucket→cell` MAP per key
  * and probed it once per grid bucket — Catalyst map lookup is a LINEAR
  * scan, so the expand cost O(span · cells) per key — and the
  * carried-forward value then needed a full window pass (a sort of the
  * |grid| rows) downstream. Here the cells sort once (O(cells log cells)),
  * a two-pointer walk emits the grid lazily, and the carry rides the walk
  * — the window disappears from the plan.
  */
case class GapFillLocfGen(cells: Expression, lo: Expression, hi: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {

  override def children: Seq[Expression] = Seq(cells, lo, hi)

  private def cellFields: Option[Seq[StructField]] = cells.dataType match {
    case ArrayType(StructType(fs), _) if fs.length == 3 &&
      fs(0).dataType == LongType && fs(1).dataType == LongType => Some(fs.toSeq)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (cellFields.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        "gap_fill_locf requires ARRAY<STRUCT<BIGINT, BIGINT, v>>, got " +
          cells.dataType.catalogString)
    else if (lo.dataType != LongType || hi.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"gap_fill_locf bounds must be BIGINT, got " +
          s"(${lo.dataType.catalogString}, ${hi.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val vType: DataType = cellFields.get(2).dataType

  override def elementSchema: StructType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("n_events", LongType, nullable = false),
    StructField("value_locf", vType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = cells.eval(input)
    val loV = lo.eval(input)
    val hiV = hi.eval(input)
    if (data == null || loV == null || hiV == null) Iterator.empty
    else {
      val arr = data.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val bks = new Array[Long](n)
      val cnts = new Array[Long](n)
      val vs = new Array[Any](n)
      var i = 0
      while (i < n) {
        val st = arr.getStruct(i, 3)
        bks(i) = st.getLong(0)
        cnts(i) = st.getLong(1)
        vs(i) = if (st.isNullAt(2)) null
          else InternalRow.copyValue(st.get(2, vType))
        i += 1
      }
      // sort the cell triplets by bucket (collect_list order is arbitrary)
      val order = (0 until n).toArray.map(Integer.valueOf)
      java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
        def compare(a: Integer, b: Integer): Int =
          java.lang.Long.compare(bks(a), bks(b))
      })
      val start = loV.asInstanceOf[Long]
      val end = hiV.asInstanceOf[Long]
      new Iterator[InternalRow] {
        private var b = start
        private var p = 0
        private var carry: Any = null
        override def hasNext: Boolean = b <= end
        override def next(): InternalRow = {
          var cnt = 0L
          while (p < n && bks(order(p)) < b) p += 1 // cells below lo, if any
          if (p < n && bks(order(p)) == b) {
            val idx = order(p)
            cnt = cnts(idx)
            if (vs(idx) != null) carry = vs(idx)
            p += 1
          }
          val r = InternalRow(b, cnt, carry)
          b += 1
          r
        }
      }
    }
  }

  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GapFillLocfGen =
    copy(cells = newChildren(0), lo = newChildren(1), hi = newChildren(2))

  override def prettyName: String = "gap_fill_locf"
}

object GapFillLocfGen {
  def apply(cells: Column, lo: Column, hi: Column): Column =
    GraftBridge.column(GapFillLocfGen(
      GraftBridge.expression(cells), GraftBridge.expression(lo),
      GraftBridge.expression(hi)))
}
