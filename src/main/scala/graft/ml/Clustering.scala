package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering for corpus curation (topic bucketing, diversity
  * sampling, near-dup blocking): nearest-centroid assignment plus a
  * distributed Lloyd's k-means.
  *
  * Scale shape: centroids are always the broadcast side (k × dim doubles
  * — kilobytes), assignment is map-only over the vectors, and the Lloyd
  * update is one map-side-combinable groupBy per iteration whose shuffle
  * carries k × dim partial sums per task, never vectors. This is the
  * same plan MLlib's KMeans lowers to, expressed in DataFrame ops so it
  * composes with the rest of the engine (and with Catalyst pruning). */
object Clustering {

  /** Squared L2 distance between two array columns, computed in exact
    * decimal arithmetic: float→decimal(18,9) per element, squared diffs
    * summed by a left-to-right fold. Decimal makes the sum
    * order-independent and engine-independent — bit-identical in any
    * system that rounds the initial cast the same way — which is what
    * lets nearest-centroid assignment hash-match a DuckDB oracle
    * (float/double sums differ in the last ulp across engines and
    * aggregation orders; see Queries.scala's decimal-sum discipline). */
  def sqDistDecimal(a: Column, b: Column): Column = {
    val dec = (c: Column) => transform(c, x => x.cast("decimal(18,9)"))
    // type-stable fold: the accumulator must keep ONE decimal type or the
    // lambda fails analysis ((38,18)+(37,18) would widen past 38 and
    // Spark rescales the result to (38,16)). Diffs are re-cast to (18,9)
    // (exact for |x| < 1e9 — any sane feature scale) so products stay
    // (37,18), and each partial sum folds back into (37,18) (exact while
    // the running sum < 1e19).
    val d9 = "decimal(18,9)"
    aggregate(
      zip_with(dec(a), dec(b),
        (x, y) => ((x - y).cast(d9) * (x - y).cast(d9))),
      lit(java.math.BigDecimal.ZERO).cast("decimal(37,18)"),
      (acc, x) => (acc + x).cast("decimal(37,18)"))
  }

  /** Plain double-precision squared L2 (the fast path for iterative use;
    * one whole-stage-codegen'd fold, no decimal boxing). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Assign each vector to its nearest centroid (squared-L2, ties to the
    * smallest centroid id). `centroids` must be small — it is broadcast —
    * and the argmin is a `min(struct(dist, cid))`, so the whole operator
    * is one broadcast nested-loop + one groupBy on the vector id.
    * `exact = true` routes distances through [[sqDistDecimal]] for
    * cross-engine reproducibility; false keeps doubles. */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, cidCol: String, cvecCol: String,
             exact: Boolean = false): DataFrame = {
    val dist = if (exact) sqDistDecimal(col(vecCol), col("__cv"))
               else sqDist(col(vecCol), col("__cv"))
    vecs.crossJoin(broadcast(
        centroids.select(col(cidCol).as("__cid"), col(cvecCol).as("__cv"))))
      .withColumn("__d2", dist)
      .groupBy(idCol)
      .agg(min(struct(col("__d2"), col("__cid"))).as("__m"))
      .select(col(idCol), col("__m.__cid").as("cluster"))
  }

  /** Lloyd's k-means: init = the k lowest-id vectors, `iters` rounds of
    * (broadcast-assign, mean-update). The update explodes each vector to
    * (cluster, dim, value) and aggregates — map-side combine reduces the
    * shuffle to k × dim partials per task. Empty clusters keep their
    * previous centroid. Returns (assignments, inertia-per-iteration);
    * inertia is monotonically non-increasing — the standard Lloyd
    * convergence witness. */
  def kmeans(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int): (DataFrame, Seq[Double]) = {
    val spark = vecs.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dims = vecs.select(size(col(vecCol))).first().getInt(0)
    val centSchema = StructType(Seq(
      StructField("__cid", LongType),
      StructField("__cvec", ArrayType(DoubleType))))
    def centDf(rows: Seq[(Long, Seq[Double])]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (i, v) => Row(i, v) }, 1), centSchema)

    var cents: Seq[(Long, Seq[Double])] = vecs
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast(ArrayType(DoubleType))).collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](0)) }.toSeq
    val inertias = scala.collection.mutable.ArrayBuffer.empty[Double]

    for (_ <- 0 until iters) {
      val assigned = vecs.crossJoin(broadcast(centDf(cents)))
        .withColumn("__d2", sqDist(col(vecCol), col("__cvec")))
        .groupBy(col(idCol))
        .agg(min(struct(col("__d2"), col("__cid"))).as("__m"))
        .select(col(idCol), col("__m.__cid").as("__cl"),
          col("__m.__d2").as("__d2"))
      val withVec = vecs.join(assigned, idCol)
      inertias += withVec.agg(sum(col("__d2"))).first().getDouble(0)
      // mean update: explode to (cluster, dim, x) — the shuffle carries
      // k*dims partial (sum, count) pairs per map task, not vectors
      val means = withVec
        .select(col("__cl"), posexplode(col(vecCol).cast(
          ArrayType(DoubleType))).as(Seq("__d", "__x")))
        .groupBy("__cl", "__d").agg(avg("__x").as("__m"))
        .groupBy("__cl")
        .agg(map_from_arrays(collect_list(col("__d")),
          collect_list(col("__m"))).as("__byDim"))
        .collect()
        .map { r =>
          val m = r.getMap[Int, Double](1)
          r.getLong(0) -> (0 until dims).map(m(_)).toSeq
        }.toMap
      cents = cents.map { case (i, old) => (i, means.getOrElse(i, old)) }
    }
    val finalAssign = vecs.crossJoin(broadcast(centDf(cents)))
      .withColumn("__d2", sqDist(col(vecCol), col("__cvec")))
      .groupBy(col(idCol))
      .agg(min(struct(col("__d2"), col("__cid"))).as("__m"))
      .select(col(idCol), col("__m.__cid").as("cluster"))
    (finalAssign, inertias.toSeq)
  }
}
