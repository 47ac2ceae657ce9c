package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector kernels for similarity search over `array<float>`
  * embedding columns. Built-ins only (zip_with / aggregate HOFs) — stays
  * in codegen; no UDFs.
  *
  * Cross-engine determinism contract: every reduction is a LEFT FOLD in
  * array order (Spark `aggregate` and DuckDB `list_reduce` both fold
  * left), elements are cast float→double (exact) before any arithmetic,
  * and IEEE-754 double ops are deterministic — so Spark and DuckDB
  * produce bit-identical dot products and cosines on the same input.
  */
object VectorKernels {

  /** float[] → double[] (exact widening; keeps later math engine-stable). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold sum of a double array, seeded with 0.0. */
  private def fsum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = fsum(zip_with(a, b, (x, y) => x * y))

  def norm(a: Column): Column = sqrt(fsum(transform(a, x => x * x)))

  /** Cosine similarity; null-safe on zero vectors via nullif-style guard. */
  def cosine(a: Column, b: Column): Column = {
    val (ad, bd) = (toDouble(a), toDouble(b))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH, derived from
    * md5 so DuckDB can regenerate the identical planes: component i of
    * plane j is nibble(md5("<j>_<i>")) - 7.5 ∈ {-7.5 … +7.5}. Computed
    * driver-side once (tiny: planes × dims doubles) and shipped as
    * literals — never per row. */
  def hyperplane(j: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      val d   = java.security.MessageDigest.getInstance("MD5").digest(s"${j}_$i".getBytes("UTF-8"))
      val nib = (d(0) >> 4) & 0xF
      nib - 7.5
    }

  /** Sign-LSH bucket id in [0, 2^planes): bit j set iff dot(v, plane_j)>0.
    * Plane components are exact halves, so the fold is engine-stable. */
  def lshBucket(v: Column, planes: Int, dims: Int): Column = {
    val vd = toDouble(v)
    (0 until planes).map { j =>
      val h   = typedLit(hyperplane(j, dims))
      val d   = fsum(zip_with(vd, h, (x, y) => x * y))
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Deterministic pseudo-centroids for an IVF-style coarse quantizer,
    * md5-derived like [[hyperplane]] so both engines regenerate them:
    * component i of centroid j is (nibble(md5("c<j>_<i>")) - 7.5) / 8
    * — exact sixteenths, engine-stable doubles. (A production IVF trains
    * centroids with k-means; the operator contract — assign to nearest
    * cell, probe nprobe cells at query time — is what's built here, and a
    * trained codebook drops in as literals the same way.) */
  def centroid(j: Int, dims: Int): Seq[Double] =
    hyperplane(1000 + j, dims).map(_ / 8.0)

  /** Squared L2 distance to a literal centroid (left fold, engine-stable). */
  def dist2(v: Column, c: Seq[Double]): Column =
    aggregate(zip_with(v, typedLit(c), (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)

  /** IVF cell assignment: index of the nearest of `cells` centroids
    * (first-wins tie-break). */
  def ivfCell(v: Column, cells: Int, dims: Int): Column = {
    val ds   = (0 until cells).map(j => dist2(v, centroid(j, dims)))
    val dmin = least(ds: _*)
    ds.zipWithIndex.foldRight(lit(-1L)) { case ((d, j), acc) =>
      when(d === dmin, lit(j.toLong)).otherwise(acc)
    }
  }

  /** Second probe cell: nearest centroid excluding `cell` (first-wins). */
  def ivfSecondCell(v: Column, cell: Column, cells: Int, dims: Int): Column = {
    val ds   = (0 until cells).map(j => dist2(v, centroid(j, dims)))
    val masked = ds.zipWithIndex.map { case (d, j) =>
      when(lit(j.toLong) === cell, lit(Double.PositiveInfinity)).otherwise(d)
    }
    val dmin = least(masked: _*)
    masked.zipWithIndex.foldRight(lit(-1L)) { case ((d, j), acc) =>
      when(d === dmin, lit(j.toLong)).otherwise(acc)
    }
  }

  /** DuckDB SQL twins. `e` is a list-typed SQL expression. */
  object Dk {
    def dot(a: String, b: String, dims: Int): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, [$a[i]::DOUBLE * $b[i]::DOUBLE for i in generate_series(1, $dims)]), (x, y) -> x + y)"

    def norm(a: String, dims: Int): String = s"sqrt(${dot(a, a, dims)})"

    def cosine(a: String, b: String, dims: Int): String =
      s"(${dot(a, b, dims)} / (${norm(a, dims)} * ${norm(b, dims)}))"

    /** Plane j literal as a DuckDB list expression (regenerated via md5 so
      * the oracle is self-contained — but we inline the computed doubles;
      * halves print exactly). */
    def planeLit(j: Int, dims: Int): String =
      hyperplane(j, dims).map(d => f"$d%.1f").mkString("[", ",", "]")

    def lshBucket(v: String, planes: Int, dims: Int): String =
      (0 until planes).map { j =>
        s"(case when ${dot(v, s"(${planeLit(j, dims)})", dims)} > 0 then ${1L << j} else 0 end)"
      }.mkString("(", " + ", ")::BIGINT")

    /** Centroid j as a DuckDB list literal (values are exact sixteenths,
      * so 4 decimals round-trips them exactly). */
    def centroidLit(j: Int, dims: Int): String =
      centroid(j, dims).map(d => f"$d%.4f").mkString("[", ",", "]")

    /** Squared L2 distance of list expression `v` to centroid j. */
    def dist2(v: String, j: Int, dims: Int): String = {
      val c = s"(${centroidLit(j, dims)})"
      s"list_reduce(list_prepend(0.0::DOUBLE, " +
        s"[($v[i]::DOUBLE - $c[i]) * ($v[i]::DOUBLE - $c[i]) for i in generate_series(1, $dims)]), " +
        "(x, y) -> x + y)"
    }
  }
}
