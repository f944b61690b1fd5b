package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward attaches the latest right row at-or-before each left row") {
    val trades = Seq( // (symbol, t, qty)
      ("A", 10L, 1), ("A", 25L, 2), ("A", 5L, 3), ("B", 50L, 4)
    ).toDF("sym", "t", "qty")
    val quotes = Seq( // (symbol, t, price)
      ("A", 8L, 100.0), ("A", 10L, 101.0), ("A", 20L, 102.0), ("B", 60L, 200.0)
    ).toDF("sym", "t", "price")
    val out = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", "t",
      Seq("price" -> "price"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(out == Set(
      ("A", 10L, Some(101.0)), // same-instant quote visible (<= semantics)
      ("A", 25L, Some(102.0)),
      ("A", 5L, None),         // no quote yet
      ("B", 50L, None)))       // B's only quote is later
  }

  test("a matched right row with NULL carried value yields NULL, not a stale older value") {
    val left = Seq(("k", 5L)).toDF("sym", "t")
    val right = Seq(("k", 1L, Some(10.0), Some("a")), ("k", 3L, None, Some("b")))
      .toDF("sym", "t", "v", "tag")
    val out = AsOfJoin.asofBackward(left, right, Seq("sym"), "t", "t",
      Seq("v" -> "v", "tag" -> "tag")).collect().head
    // the latest right row (t=3) wins as a WHOLE row: v is its NULL, tag is "b" —
    // never v=10.0 from t=1 mixed with tag="b" from t=3
    assert(out.isNullAt(out.fieldIndex("v")))
    assert(out.getString(out.fieldIndex("tag")) == "b")
  }

  test("matches a brute-force per-row maximum formulation on random data") {
    val rng = new scala.util.Random(13)
    val left = (1 to 300).map(_ => (rng.nextInt(5), rng.nextInt(1000).toLong))
      .toDF("k", "t")
    val right = (1 to 200).map(i => (rng.nextInt(5), rng.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "rid")
    val asof = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "t",
      Seq("rid" -> "rid"))
      .groupBy("k", "t").agg(max("rid").as("rid")) // dedupe identical left rows
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // brute force: per (k,t) the rid of the max (t', tiebreak max rid) ≤ t
    val rightRows = right.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val brute = left.dropDuplicates("k", "t").collect().map { lr =>
      val (k, t) = (lr.getInt(0), lr.getLong(1))
      val cands = rightRows.filter(rr => rr._1 == k && rr._2 <= t)
      val best = if (cands.isEmpty) -1L
        else { val mt = cands.map(_._2).max; cands.filter(_._2 == mt).map(_._3).max }
      (k, t, best)
    }.toSet
    assert(asof == brute)
  }

  test("asofForward attaches the earliest right row at-or-after each left row") {
    val views = Seq(
      ("A", 10L, 1), ("A", 25L, 2), ("A", 40L, 3), ("B", 50L, 4)
    ).toDF("sym", "t", "vid")
    val buys = Seq(
      ("A", 12L, 100.0), ("A", 25L, 101.0), ("A", 30L, 102.0), ("B", 40L, 200.0)
    ).toDF("sym", "t", "price")
    val out = AsOfJoin.asofForward(views, buys, Seq("sym"), "t", "t",
      Seq("price" -> "price"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(out == Set(
      ("A", 10L, Some(100.0)), // next at 12
      ("A", 25L, Some(101.0)), // same-instant match (>= semantics)
      ("A", 40L, None),        // nothing after
      ("B", 50L, None)))       // B's only buy is earlier
  }

  test("asofForward matches a brute-force per-row minimum formulation") {
    val rng = new scala.util.Random(29)
    val left = Seq.fill(120)((s"k${rng.nextInt(4)}", rng.nextInt(100).toLong))
      .toDF("k", "t")
    val rightRows = Seq.fill(60)((s"k${rng.nextInt(4)}", rng.nextInt(100).toLong))
      .distinct // unique (key, time) so the match is well-defined
    val right = rightRows.map { case (k, t) => (k, t, t * 10.0) }
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofForward(left.repartition(5), right.repartition(3),
        Seq("k"), "t", "t", Seq("v" -> "v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val brute = left.as[(String, Long)].collect().map { case (k, t) =>
      val cand = rightRows.filter(r => r._1 == k && r._2 >= t)
      (k, t, if (cand.isEmpty) None else Some(cand.map(_._2).min * 10.0))
    }.toSet
    assert(got == brute)
  }
}
