package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column
  * (NOT-IN-REFERENCE §2.9 extension — the dimensionality-reduction stage a
  * training-data pipeline runs before clustering/visualization; the linear
  * sibling of the reference's tree fits).
  *
  * Scale shape: the corpus reduces to ONE map-side-combined aggregate of
  * exact integer moments — `n`, the 16 first-order sums `s_i`, and the 136
  * upper-triangle second-order sums `p_ij` — over FLOOR-QUANTIZED
  * coordinates `q_i = floor(x_i·10⁶)` (the m17 floor doctrine: floor is
  * exact on doubles in both engines, and integer sums are order-free, so
  * the moment row is bit-identical on any partitioning). Products
  * accumulate as DECIMAL(38,0) so the pass survives 10⁹-row corpora where
  * a LONG would overflow. The eigen-decomposition then runs DRIVER-side on
  * the bounded 16×16 covariance (one 1-row collect — the r37 bounded-
  * protocol doctrine), and the loadings export as `Double.toString`
  * literals: the projection and the per-component quadratic-form
  * eigenvalue replay relationally in both engines as identical
  * left-to-right chains.
  *
  * Correctness split: the ORACLE verifies λ_k = w_kᵀ C w_k and the
  * projections against the data with w as literals (true for any w); the
  * SPEC verifies eigen-ness (C w = λ w), orthonormality, and
  * partitioning-independence — together they pin the full contract. */
object Pca {

  /** Quantized coordinate columns `q0..q{dim-1}` = floor(x_i·10⁶) as LONG
    * (Spark `floor` returns LongType; the SQL twin casts explicitly). */
  def quantCols(embCol: String, dim: Int): Seq[Column] =
    (0 until dim).map(i =>
      floor(element_at(col(embCol), i + 1).cast("double") * lit(1000000.0))
        .as(s"q$i"))

  def quantColsSql(embCol: String, dim: Int): String =
    (0 until dim).map(i =>
      s"CAST(floor(CAST($embCol[${i + 1}] AS DOUBLE) * 1000000.0) AS BIGINT) AS q$i")
      .mkString(",\n                  ")

  /** The one-pass exact moment aggregate: `n`, `s_i` (LONG), `p_i_j`
    * (DECIMAL(38,0), i ≤ j upper triangle). Input must carry `q0..` */
  def momentAgg(qdf: DataFrame, dim: Int): DataFrame = {
    val firsts = (0 until dim).map(i => sum(col(s"q$i")).as(s"s$i"))
    val seconds = for { i <- 0 until dim; j <- i until dim } yield
      sum((col(s"q$i") * col(s"q$j")).cast("decimal(38,0)")).as(s"p_${i}_$j")
    qdf.agg(count(lit(1)).as("n"), (firsts ++ seconds): _*)
  }

  def momentAggSql(dim: Int): String = {
    val firsts = (0 until dim).map(i => s"CAST(sum(q$i) AS BIGINT) AS s$i")
    val seconds = for { i <- 0 until dim; j <- i until dim } yield
      s"sum(q$i * q$j) AS p_${i}_$j"
    (Seq("CAST(count(*) AS BIGINT) AS n") ++ firsts ++ seconds)
      .mkString(",\n                  ")
  }

  /** Fitted PCA in quantized units: `n`, first-order sums `s`, top-k unit
    * loadings `w` (k × dim, deterministic sign: largest-|coord| positive),
    * eigenvalues `lambdaQ` (quantized units, descending). */
  case class PcaFit(n: Long, s: Array[Long], w: Array[Array[Double]],
      lambdaQ: Array[Double], dim: Int)

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix — fixed
    * (p, q) sweep order and a fixed convergence threshold, so the result
    * is a pure function of the input matrix. Returns (values, vectors)
    * with vectors as rows, UNSORTED. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var fro = 0.0
    for (i <- 0 until n; j <- 0 until n) fro += a(i)(j) * a(i)(j)
    val thresh = math.max(Double.MinPositiveValue, 1e-28 * fro)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > thresh) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), Array.tabulate(n, n)((i, j) => v(j)(i)))
  }

  /** Fit from the collected 1-row moment frame (bounded driver collect). */
  def fitFromMoments(moments: DataFrame, dim: Int, k: Int): PcaFit = {
    val r = moments.collect()(0)
    val n = r.getLong(r.fieldIndex("n"))
    require(n > 1, "PCA needs at least 2 rows")
    val s = Array.tabulate(dim)(i => r.getLong(r.fieldIndex(s"s$i")))
    val nD = n.toDouble
    val c = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val p = r.getDecimal(r.fieldIndex(s"p_${i}_$j")).doubleValue()
      val cij = p / nD - (s(i) / nD) * (s(j) / nD)
      c(i)(j) = cij; c(j)(i) = cij
    }
    val (vals, vecs) = jacobiEigen(c)
    // descending eigenvalue order, index tiebreak; canonical sign: the
    // largest-|coordinate| entry (first on ties) is positive
    val order = (0 until dim).sortBy(i => (-vals(i), i)).take(k)
    val w = order.map { i =>
      val vec = vecs(i)
      val m = vec.indices.maxBy(j => (math.abs(vec(j)), -j))
      if (vec(m) < 0.0) vec.map(x => -x) else vec.clone()
    }.toArray
    PcaFit(n, s, w, order.map(vals(_)).toArray, dim)
  }

  /** The component-k projection in quantized units as an explicit
    * left-to-right chain: `z = Σ_i w_ki·(q_i − s_i/n)`. */
  def projExpr(fit: PcaFit, k: Int): Column = {
    val nD = fit.n.toDouble
    (0 until fit.dim).foldLeft(lit(0.0)) { (acc, i) =>
      acc + lit(fit.w(k)(i)) *
        (col(s"q$i").cast("double") - lit(fit.s(i).toDouble / nD))
    }
  }

  def projSql(fit: PcaFit, k: Int): String = {
    val nD = fit.n.toDouble
    (0 until fit.dim).foldLeft("0.0") { (acc, i) =>
      s"($acc + (${fit.w(k)(i)}) * (CAST(q$i AS DOUBLE) - (${fit.s(i).toDouble / nD})))"
    }
  }

  /** The quadratic form w_kᵀ C w_k over the RELATIONAL moment row — the
    * data-derived eigenvalue the oracle checks against the exported one:
    * `(Σ_{i≤j} c_ij·p_ij)/n − (Σ_i w_ki·s_i/n)²` with c_ij = w_i·w_j
    * doubled off the diagonal, every sum an explicit ordered chain. */
  def quadformExpr(fit: PcaFit, k: Int): Column = {
    val nD = lit(fit.n.toDouble)
    // per-row sub-chains combined left-associatively: DuckDB's binder caps
    // expression nesting at 128, so the 136-term triangle cannot be one
    // flat chain — the association is (((row0 + row1) + row2) + …) with
    // each row_i = (0 + Σ_j c_ij p_ij) on BOTH sides
    val rows = (0 until fit.dim).map { i =>
      (i until fit.dim).foldLeft(lit(0.0)) { (acc, j) =>
        val cij = (if (i == j) 1.0 else 2.0) * fit.w(k)(i) * fit.w(k)(j)
        acc + lit(cij) * col(s"p_${i}_$j").cast("double")
      }
    }
    val raw = rows.reduceLeft(_ + _)
    val m = (0 until fit.dim).foldLeft(lit(0.0)) { (acc, i) =>
      acc + lit(fit.w(k)(i)) * col(s"s$i").cast("double")
    } / nD
    raw / nD - m * m
  }

  def quadformSql(fit: PcaFit, k: Int): String = {
    val nD = fit.n.toDouble
    val rows = (0 until fit.dim).map { i =>
      (i until fit.dim).foldLeft("0.0") { (acc, j) =>
        val cij = (if (i == j) 1.0 else 2.0) * fit.w(k)(i) * fit.w(k)(j)
        s"($acc + ($cij) * CAST(p_${i}_$j AS DOUBLE))"
      }
    }
    val raw = rows.reduceLeft((a, b) => s"($a + $b)")
    val m = "(" + (0 until fit.dim).foldLeft("0.0") { (acc, i) =>
      s"($acc + (${fit.w(k)(i)}) * CAST(s$i AS DOUBLE))"
    } + s" / ($nD))"
    s"(($raw / ($nD)) - $m * $m)"
  }

  /** The covariance trace in quantized units over the relational moment
    * row — the explained-variance-ratio denominator. */
  def traceExpr(dim: Int, n: Long): Column = {
    val nD = lit(n.toDouble)
    (0 until dim).foldLeft(lit(0.0)) { (acc, i) =>
      acc + (col(s"p_${i}_$i").cast("double") / nD -
        (col(s"s$i").cast("double") / nD) * (col(s"s$i").cast("double") / nD))
    }
  }

  def traceSql(dim: Int, n: Long): String = {
    val nD = n.toDouble
    (0 until dim).foldLeft("0.0") { (acc, i) =>
      s"($acc + (CAST(p_${i}_$i AS DOUBLE) / ($nD) - " +
        s"(CAST(s$i AS DOUBLE) / ($nD)) * (CAST(s$i AS DOUBLE) / ($nD))))"
    }
  }
}
