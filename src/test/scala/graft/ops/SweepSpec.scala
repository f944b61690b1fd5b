package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SweepSpec extends SparkSpec {
  import spark.implicits._

  test("concurrencyDaily: hand-computed open counts; half-open intervals") {
    val df = Seq(
      ("2024-01-01", "2024-01-03"),
      ("2024-01-02", "2024-01-05"),
      ("2024-01-02", "2024-01-03"),
      (null, "2024-01-04")) // NULL endpoint drops
      .toDF("s", "e")
      .select(to_date(col("s")).as("s"), to_date(col("e")).as("e"))
      .repartition(3)
    val r = Sweep.concurrencyDaily(df, col("s"), col("e"))
      .as[(java.sql.Date, Long, Long, Long)].collect()
      .map(t => (t._1.toString, t._2, t._3, t._4))
    assert(r.toSeq == Seq(
      ("2024-01-01", 1L, 0L, 1L),
      ("2024-01-02", 2L, 0L, 3L),
      ("2024-01-03", 0L, 2L, 1L),
      ("2024-01-05", 0L, 1L, 0L)))
  }

  test("concurrencyDaily: layout independence (sharded prefix is exact)") {
    val df = (1 to 200).map { i =>
      (f"2024-01-${i % 28 + 1}%02d", f"2024-02-${i % 27 + 1}%02d")
    }.toDF("s", "e")
      .select(to_date(col("s")).as("s"), to_date(col("e")).as("e"))
    val a = Sweep.concurrencyDaily(df.repartition(1), col("s"), col("e"))
      .collect().toSeq
    val b = Sweep.concurrencyDaily(df.repartition(13), col("s"), col("e"))
      .collect().toSeq
    assert(a == b)
    // every interval eventually closes: final open count is 0
    assert(a.last.getLong(3) == 0L)
  }
}
