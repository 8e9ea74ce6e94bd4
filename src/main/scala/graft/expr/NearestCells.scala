package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The IVF assignment kernel as ONE native expression: the `maxProbes`
  * nearest cells of `vec` over the broadcast cell-directory array, ordered
  * by (cosine DESC — NaN first, cell ASC).
  *
  * Why not the HOF spelling `slice(array_sort(transform(cents, …)), 1, p)`:
  * higher-order functions evaluate their lambdas INTERPRETED — one
  * expression-tree walk per (row × cell) — which put the assignment pass
  * ~2× over the old join+window plan at sf1 geometry (nlist = 157:
  * measured q113 2.8 → 4.4 s, q57 1.3 → 2.0 s). This kernel keeps the
  * fold's zero-exchange shape but runs the whole per-row loop in ONE eval
  * call: nlist dot products over primitive arrays, small insertion-select
  * of the top p. (CodegenFallback: one virtual call per ROW is noise next
  * to the nlist × dim multiply-adds inside it.)
  *
  * Arithmetic is bit-identical to the HOF spelling it replaces (which the
  * q53/q82/q88/q104/q113/q121 oracles pin):
  *   - dot products are [[DotProduct]]'s strict left fold with per-element
  *     float widening, index order 0..n−1;
  *   - sim = dot(v, cent) / (se * cn) with se = sqrt(dot(v, v)) hoisted
  *     once per row and cn the directory's precomputed sqrt(dot(c, c));
  *   - ranking key = −sim with NaN mapped to −∞ (= the window spelling
  *     `orderBy(sim.desc, cell.asc)`: Spark sorts double NaN largest);
  *     double comparisons via java.lang.Double.compare, so ±0.0 order
  *     matches Spark's struct natural ordering.
  *
  * Input `cents` is the [[graft.llm.Similarity]] directory row: an array
  * of struct(cell, cent, cn) — always broadcast-sized (nlist ≪ corpus).
  * Output: array of struct(cell [, cent]) of length min(p, nlist), in rank
  * order — callers posexplode it (rank = position + 1). Null vec/cents, a
  * null directory entry, or a cent/vec length mismatch yield null (the
  * row drops at the explode, as in the HOF spelling).
  */
case class NearestCells(vec: Expression, cents: Expression, maxProbes: Int,
    withCent: Boolean) extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = cents

  override def prettyName: String = "graft_nearest_cells"

  override def nullable: Boolean = true

  private def centsStruct: StructType = cents.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def dataType: DataType = {
    val st = centsStruct
    val fields = StructField("cell", st("cell").dataType, nullable = false) ::
      (if (withCent) StructField("cent", st("cent").dataType,
        nullable = false) :: Nil else Nil)
    ArrayType(StructType(fields), containsNull = false)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType) match {
      // field TYPES validated too, not just names (ADVICE r20): eval reads
      // cell via getLong/getInt, cent via getArray of float|double and cn
      // via getDouble — a frame that analyzed with, say, a float cn would
      // otherwise silently read garbage at eval time
      case (ArrayType(FloatType | DoubleType, _), ArrayType(st: StructType, _))
          if st.fieldNames.take(3).sameElements(Array("cell", "cent", "cn")) &&
            (st("cell").dataType == LongType ||
              st("cell").dataType == IntegerType) &&
            (st("cent").dataType match {
              case ArrayType(FloatType | DoubleType, _) => true
              case _ => false
            }) &&
            st("cn").dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, " +
          s"array<struct<cell: int|bigint, cent: array<float|double>, " +
          s"cn: double>>), got ${vec.dataType.sql} " +
          s"and ${cents.dataType.sql}")
    }

  private lazy val vecIsFloat =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val centIsFloat = centsStruct("cent").dataType
    .asInstanceOf[ArrayType].elementType == FloatType
  private lazy val centIdx = centsStruct.fieldIndex("cent")
  private lazy val cnIdx = centsStruct.fieldIndex("cn")
  private lazy val cellIdx = centsStruct.fieldIndex("cell")
  private lazy val cellType = centsStruct("cell").dataType

  /** [[DotProduct]]'s strict left fold, same null semantics (null element
    * or length mismatch → null, boxed — NaN cannot stand in as a sentinel
    * because a legitimate NaN sim must rank FIRST, not drop). */
  private def dot(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def nullSafeEval(v: Any, cs: Any): Any = {
    val vd = v.asInstanceOf[ArrayData]
    val dir = cs.asInstanceOf[ArrayData]
    val selfDot = dot(vd, vecIsFloat, vd, vecIsFloat)
    if (selfDot == null) return null
    val se = math.sqrt(selfDot)
    val n = dir.numElements()
    val p = math.min(maxProbes, n)
    if (p <= 0) return new GenericArrayData(Array.empty[Any])
    // rank keys + indices of the current top-p (insertion-select: p is
    // tiny — 1, 2 or nprobe — next to nlist)
    val topNs = new Array[Double](p)
    val topCell = new Array[Long](p)
    val topIdx = new Array[Int](p)
    var filled = 0
    var k = 0
    while (k < n) {
      if (dir.isNullAt(k)) return null
      val entry = dir.getStruct(k, centsStruct.length)
      val cent = entry.getArray(centIdx)
      val cn = entry.getDouble(cnIdx)
      val cell = cellType match {
        case LongType => entry.getLong(cellIdx)
        case IntegerType => entry.getInt(cellIdx).toLong
        case _ => entry.getLong(cellIdx)
      }
      val d = dot(vd, vecIsFloat, cent, centIsFloat)
      if (d == null) return null
      val sim = d / (se * cn)
      val ns = if (java.lang.Double.isNaN(sim)) Double.NegativeInfinity
               else -sim
      // find insertion position among the filled entries
      var pos = filled
      while (pos > 0 && {
        val c = java.lang.Double.compare(ns, topNs(pos - 1))
        c < 0 || (c == 0 && cell < topCell(pos - 1))
      }) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var m = last
        while (m > pos) {
          topNs(m) = topNs(m - 1); topCell(m) = topCell(m - 1)
          topIdx(m) = topIdx(m - 1); m -= 1
        }
        topNs(pos) = ns; topCell(pos) = cell; topIdx(pos) = k
        if (filled < p) filled += 1
      }
      k += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      val entry = dir.getStruct(topIdx(r), centsStruct.length)
      val cellValue: Any = cellType match {
        case IntegerType => topCell(r).toInt
        case _ => topCell(r)
      }
      out(r) =
        if (withCent) InternalRow(cellValue, entry.getArray(centIdx).copy())
        else InternalRow(cellValue)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(vec = newLeft, cents = newRight)
}

object NearestCells {
  import org.apache.spark.sql.Column

  def apply(vec: Column, cents: Column, maxProbes: Int,
      withCent: Boolean): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      NearestCells(org.apache.spark.sql.GraftSqlBridge.expression(vec),
        org.apache.spark.sql.GraftSqlBridge.expression(cents), maxProbes,
        withCent))
}
