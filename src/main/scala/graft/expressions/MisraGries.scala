package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate` — the
  * bounded-state alternative to [[graft.ops.Partitioning.hotKeys]]'s exact
  * groupBy count. The exact form shuffles one row PER DISTINCT KEY; at
  * 100 TB with billions of distinct keys that shuffle IS the job. This
  * sketch keeps at most `counters` (key, count) pairs per partition and
  * only those cross the network in the partial-merge, at the classic MG
  * price: every counter underestimates its key's true frequency by at
  * most n/counters (n = total rows), and every key with true frequency
  * ABOVE n/counters is guaranteed present in the final sketch.
  *
  * Merging follows Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * counters sum keyed, then if more than `counters` survive, the
  * (counters+1)-th largest value is subtracted from all and non-positive
  * entries drop — the combined sketch keeps the n/counters error bound of
  * a sequential pass, so the distributed result is a valid MG summary of
  * the whole input regardless of partitioning.
  *
  * Result: `array<struct<key string, est bigint>>`, est-descending with
  * key-ascending tiebreak (deterministic). `est` is the surviving counter
  * value: `true_count - n/counters <= est <= true_count`.
  */
case class MisraGriesSketch(
    key: Expression,
    counters: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(counters > 0, "counters must be positive")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (key.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires a string key, got " +
      key.dataType.simpleString)
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("est", LongType))))
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val k = key.eval(input)
    if (k != null) {
      val ks = k.asInstanceOf[UTF8String].toString
      buf.get(ks) match {
        case Some(c) => buf.update(ks, c + 1)
        case None if buf.size < counters => buf.update(ks, 1L)
        case None =>
          // classic MG step: a full table decrements EVERYTHING — each
          // such step retires `counters` input rows at once, so total
          // decrement mass is bounded by n/counters
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace { (_, c) => c - 1 }
          buf.foreach { case (kk, c) => if (c <= 0) dead += kk }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > counters) {
      // Mergeable-Summaries reduction: subtract the (counters+1)-th
      // largest counter from all, drop the non-positive
      val values = buf.values.toArray
      java.util.Arrays.sort(values)
      val cut = values(values.length - counters - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace { (_, c) => c - cut }
      buf.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.update(new String(kb, "UTF-8"), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(key = newChildren(0))
}

object MisraGriesSketch {
  /** Aggregate Column: the Misra–Gries sketch of a string key. */
  def mgSketch(key: Column, counters: Int): Column =
    Bridge.column(MisraGriesSketch(
      Bridge.expression(key), counters).toAggregateExpression())
}
