package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // 40k rows over a 200×200 key space, uncorrelated dims — the layout
  // either clusters both dims (z-order) or only one (single-column sort)
  private lazy val data = {
    val rng = new scala.util.Random(13)
    (1 to 40000).map(i => (i.toLong, rng.nextInt(200), rng.nextInt(200),
      rng.nextDouble() * 100)).toDF("id", "a", "b", "x")
  }

  private def writeAndBoxFiles(df: org.apache.spark.sql.DataFrame,
      dir: String): (Int, Int) = {
    df.write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    // per-file min/max envelopes of BOTH dims — what parquet stats pruning
    // sees; count files whose envelope intersects a small 2-D box
    val boxed = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min($"a"), max($"a"), min($"b"), max($"b")).head()
      val (aLo, aHi, bLo, bHi) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      aHi >= 20 && aLo <= 39 && bHi >= 20 && bLo <= 39 // 10% × 10% box
    }
    (boxed, files.length)
  }

  test("z-order clusters both dimensions: a 2-D box touches few files; single-sort touches all") {
    val base = sys.props("java.io.tmpdir") + s"/graft-layout-${System.nanoTime()}"
    val (zBox, zTotal) = writeAndBoxFiles(
      Layout.zorder(data, Seq("a", "b"), bits = 8, outPartitions = 32), s"$base/z")
    val (sBox, sTotal) = writeAndBoxFiles(
      data.repartitionByRange(32, $"a").sortWithinPartitions($"a"), s"$base/s")
    info(s"2-D box file hits: z-order $zBox/$zTotal, single-column sort $sBox/$sTotal")
    assert(zTotal >= 16 && sTotal >= 16, "need a real multi-file layout to compare")
    // single-column layout: every file spans the whole b-range, so the box
    // intersects essentially all files that match dim a... and since a is
    // range-partitioned, ~10% of files match a but ALL of those span b.
    // The 2-D box under z-order must touch strictly fewer files than the
    // 1-D-pruned bound AND be a small fraction of the total.
    assert(zBox * 4 <= zTotal, s"z-order box hits $zBox of $zTotal files — not clustered")
    // the same box under a pure-b predicate: single-sort prunes NOTHING
    val bOnly = {
      val files = new java.io.File(s"$base/s").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      files.count { f =>
        val r = spark.read.parquet(f).agg(min($"b"), max($"b")).head()
        r.getInt(1) >= 20 && r.getInt(0) <= 39
      }
    }
    assert(bOnly == sTotal, "a single-column sort cannot prune the other dimension")
  }

  test("z-order preserves content exactly") {
    val out = Layout.zorder(data, Seq("a", "b"), bits = 8, outPartitions = 8)
    assert(out.select($"id").as[Long].collect().sorted.toSeq ==
      data.select($"id").as[Long].collect().sorted.toSeq)
    // exact DECIMAL sum: a double sum would differ by FP association after
    // the reorder, which is exactly what the layout change does
    assert(out.agg(sum($"x".cast("decimal(18,6)"))).head.getDecimal(0) ==
      data.agg(sum($"x".cast("decimal(18,6)"))).head.getDecimal(0))
  }

  test("zvalue interleaves bits: locality in both dims maps to nearby z") {
    val z = Layout.zvalue(Seq($"a", $"b"), Seq(0.0, 0.0), Seq(255.0, 255.0), 8)
    val vals = Seq((0, 0), (1, 0), (0, 1), (1, 1), (255, 255))
      .toDF("a", "b").select(z.as("z")).as[Long].collect()
    assert(vals(0) == 0L)
    assert(vals(1) == 1L) // bit 0 of dim 0 → position 0
    assert(vals(2) == 2L) // bit 0 of dim 1 → position 1
    assert(vals(3) == 3L)
    assert(vals(4) == (1L << 16) - 1) // all 16 interleaved bits set
  }
}
