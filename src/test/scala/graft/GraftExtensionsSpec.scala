package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot_product is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(got == 11.0)
  }

  test("every native expression is callable from SQL; SQL ≡ library API") {
    GraftExtensions.register(spark)
    val row = spark.sql("""
      SELECT graft_simhash64('hello world spark') AS sh,
             graft_shingles('a b c d', 3) AS ss,
             graft_shingle_hashes('a b c d', 3) AS hs,
             graft_minhash_sig(graft_shingle_hashes('a b c d', 3), 16, 42L) AS sig,
             graft_sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS ic,
             graft_sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS ag,
             graft_lsh_buckets(array(0.5D, -0.25D), 4, 2, 3, 42L) AS lb
    """).collect()(0)
    import org.apache.spark.sql.functions.{col, lit}
    val lib = Seq("hello world spark").toDF("t").select(
      graft.expressions.SimHash64Expr.simhash64(col("t")).as("sh")).as[Long].head()
    assert(row.getAs[Long]("sh") == lib)
    assert(row.getSeq[String](row.fieldIndex("ss")) == Seq("a b c", "b c d"))
    assert(row.getSeq[Long](row.fieldIndex("hs")).length == 2) // "a b c", "b c d"
    assert(row.getSeq[Long](row.fieldIndex("sig")).length == 16)
    assert(row.getAs[Int]("ic") == 2)
    assert(row.getAs[Int]("ag") == 2)
    val lbLib = Seq(Seq(0.5, -0.25)).toDF("v").select(
      graft.expressions.VectorExpressions.lshBucketsAll(
        col("v"), 4, 2, 3, 42L).as("lb")).as[Seq[Long]].head()
    assert(row.getSeq[Long](row.fieldIndex("lb")) == lbLib)
  }

  test("non-literal constant arguments are rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes('a b c', CAST(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}
