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
}
