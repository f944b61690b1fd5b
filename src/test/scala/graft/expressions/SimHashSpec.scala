package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog near the river",
    "the quick brown fox jumps over the lazy dog near the river",   // dup
    "the quick brown fox jumps over the lazy dog near the ocean",   // near dup
    "completely different text about distributed query engines here")

  test("identical docs collide; near dups closer than unrelated docs") {
    val sigs = docs.toDF("t")
      .select(SimHash64Expr.simhash64($"t")).as[Long].collect()
    assert(sigs(0) == sigs(1))
    val near = java.lang.Long.bitCount(sigs(0) ^ sigs(2))
    val far = java.lang.Long.bitCount(sigs(0) ^ sigs(3))
    assert(near < far, s"near=$near far=$far")
  }

  test("whitespace runs and leading/trailing space don't change the signature") {
    val df = Seq("a b c", "  a \t b \n c  ").toDF("t")
    val sigs = df.select(SimHash64Expr.simhash64($"t")).as[Long].collect()
    assert(sigs(0) == sigs(1))
  }

  test("eval and codegen paths agree") {
    val viaCodegen = spark.range(50)
      .select(concat(lit("doc word"), $"id".cast("string")).as("t"))
      .select(SimHash64Expr.simhash64($"t")).as[Long].collect()
    val viaEval = (0 until 50).map(i =>
      SimHashImpl.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString(s"doc word$i")))
    assert(viaCodegen.toSeq == viaEval)
  }

  test("type check rejects non-string input") {
    val e = intercept[Exception] {
      Seq(1).toDF("n").select(SimHash64Expr.simhash64($"n")).collect()
    }
    assert(e.getMessage.contains("graft_simhash64") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
