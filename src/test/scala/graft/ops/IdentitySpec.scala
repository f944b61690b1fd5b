package graft.ops

import graft.SparkSpec

class IdentitySpec extends SparkSpec {
  import spark.implicits._

  test("assignIds: dense, contiguous, key-ordered, layout-independent") {
    val rng = new scala.util.Random(47)
    val keys = rng.shuffle((1L to 500L).toList)
    val df = keys.map(k => (k, s"p$k")).toDF("k", "payload").repartition(13)
    val got = Identity.assignIds(df, "k", "row_id", start = 100L)
      .select($"k", $"row_id").as[(Long, Long)].collect().sortBy(_._1)
    // id = start + rank(k) - 1, regardless of input layout
    assert(got.toSeq == (1L to 500L).map(k => (k, 99L + k)))
    // dense and contiguous
    assert(got.map(_._2).sorted.toSeq == (100L to 599L))
  }

  test("assignIds drops NULL keys and refuses an existing id column") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c")).toDF("k", "p")
    val got = Identity.assignIds(df, "k", "id").select($"k", $"id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L), (3L, 2L)))
    intercept[IllegalArgumentException](
      Identity.assignIds(df.withColumnRenamed("p", "id"), "k", "id"))
  }

  test("appends continue from fastStats' metadata-only high-water mark") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-identity-spec").resolve("tbl").toString
    val S = graft.sources.SnapshotTable
    S.write(Identity.assignIds(Seq((10L, 1.0), (20L, 2.0)).toDF("k", "x"),
      "k", "row_id", start = 7L), root, statsCols = Seq("row_id"))
    val next = S.fastStats(root, Seq("row_id")).get._2("row_id")._2.toLong + 1
    assert(next == 9L)
    S.write(Identity.assignIds(Seq((30L, 3.0)).toDF("k", "x"),
      "k", "row_id", start = next), root, mode = "append",
      statsCols = Seq("row_id"))
    val ids = S.read(spark, root).select($"k", $"row_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(ids == Seq((10L, 7L), (20L, 8L), (30L, 9L)))
  }
}
