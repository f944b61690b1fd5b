package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Deterministically-compacted MRL quantile sketch (Manku–Rajagopalan–
  * Lindsay-style multilevel buffers; "Mergeable Summaries" merge rule) as
  * a `TypedImperativeAggregate` over LONG values — the bounded-state leg
  * of the two-pass EXACT quantile protocol in
  * [[graft.ops.SketchQuantiles]] (the a11 heavy-hitters doctrine applied
  * to ranks: sketch → candidate bracket → exact verification pass).
  *
  * State: ≤ `k` values per level, values at level l carrying weight 2^l.
  * A full level sorts, keeps the LARGER of each adjacent pair (promoting
  * ⌊m/2⌋ values to level l+1, the odd leftover stays), and charges the
  * sketch's self-tracked rank-error budget `err += 2^l` — a conservative
  * certified envelope: for every value v, the true rank of v is within
  * `[prefixWeight(v) − err, prefixWeight(v) + err]`. The keep-larger rule
  * makes the maximum EXACT (it survives every compaction). Merging
  * concatenates level-wise then compacts, and error budgets ADD, so any
  * merge tree over any partitioning yields a valid envelope — the
  * downstream protocol re-verifies it against exact counts anyway, so a
  * violated envelope can only fail loudly, never silently mis-answer.
  *
  * Result: `struct<n bigint, err bigint,
  *                 items array<struct<v bigint, w bigint>>>`
  * with items value-ascending (weights of equal values coalesced). NULLs
  * drop. */
case class MrlQuantileSketch(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MrlQuantileSketch.Buf] {

  require(k >= 8 && k % 2 == 0, s"k must be even and ≥ 8, got $k")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (value.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires a bigint value, got " +
      value.dataType.simpleString)
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType), StructField("err", LongType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", LongType), StructField("w", LongType)))))))
  override def prettyName: String = "graft_mrl_quantile"

  override def createAggregationBuffer(): MrlQuantileSketch.Buf =
    new MrlQuantileSketch.Buf

  override def update(buf: MrlQuantileSketch.Buf, input: InternalRow): MrlQuantileSketch.Buf = {
    val v = value.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: MrlQuantileSketch.Buf, other: MrlQuantileSketch.Buf): MrlQuantileSketch.Buf = {
    buf.mergeIn(other, k)
    buf
  }

  override def eval(buf: MrlQuantileSketch.Buf): Any = {
    // coalesce to (value, total weight) ascending
    val all = ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < buf.levels.length) {
      val w = 1L << l
      buf.levels(l).foreach(v => all += ((v, w)))
      l += 1
    }
    val sorted = all.sortBy(_._1)
    val out = ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < sorted.length) {
      var w = sorted(i)._2
      val v = sorted(i)._1
      while (i + 1 < sorted.length && sorted(i + 1)._1 == v) {
        i += 1; w += sorted(i)._2
      }
      out += InternalRow(v, w)
      i += 1
    }
    InternalRow(buf.n, buf.err,
      new GenericArrayData(out.toArray.asInstanceOf[Array[Any]]))
  }

  override def serialize(buf: MrlQuantileSketch.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n); out.writeLong(buf.err)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MrlQuantileSketch.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MrlQuantileSketch.Buf
    // the constructor pre-seeds an empty level 0 — clear it, or every
    // deserialized level lands one slot up and weights double
    buf.levels.clear()
    buf.n = in.readLong(); buf.err = in.readLong()
    val nl = in.readInt()
    var l = 0
    while (l < nl) {
      val m = in.readInt()
      val lvl = ArrayBuffer.empty[Long]
      var j = 0
      while (j < m) { lvl += in.readLong(); j += 1 }
      buf.levels += lvl
      l += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MrlQuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MrlQuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MrlQuantileSketch =
    copy(value = newChildren(0))
}

object MrlQuantileSketch {

  /** Multilevel buffer: `levels(l)` holds weight-2^l values, unsorted. */
  final class Buf {
    val levels: ArrayBuffer[ArrayBuffer[Long]] = ArrayBuffer(ArrayBuffer.empty[Long])
    var err: Long = 0L
    var n: Long = 0L

    def add(v: Long, k: Int): Unit = {
      levels(0) += v
      n += 1
      if (levels(0).length >= k) compact(0, k)
    }

    /** Sort level l, promote the larger of each adjacent pair to l+1,
      * keep the odd leftover; charge 2^l to the error budget. */
    private def compact(l: Int, k: Int): Unit = {
      val buf = levels(l)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      if (levels.length == l + 1) levels += ArrayBuffer.empty[Long]
      val up = levels(l + 1)
      val pairs = arr.length / 2
      var i = 0
      while (i < pairs) { up += arr(2 * i + 1); i += 1 }
      buf.clear()
      if (arr.length % 2 == 1) buf += arr(arr.length - 1)
      err += 1L << l
      if (up.length >= k) compact(l + 1, k)
    }

    def mergeIn(other: Buf, k: Int): Unit = {
      n += other.n
      err += other.err
      var l = 0
      while (l < other.levels.length) {
        if (levels.length == l) levels += ArrayBuffer.empty[Long]
        levels(l) ++= other.levels(l)
        l += 1
      }
      var l2 = 0
      while (l2 < levels.length) {
        if (levels(l2).length >= k) compact(l2, k)
        l2 += 1
      }
    }
  }

  /** Aggregate Column: the MRL sketch of a bigint value column. */
  def mrlSketch(value: Column, k: Int): Column =
    Bridge.column(MrlQuantileSketch(
      Bridge.expression(value), k).toAggregateExpression())
}
