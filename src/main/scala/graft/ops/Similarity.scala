package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`). Two paths:
  *
  *  - brute force: query-set × corpus cross join, exact cosine, windowed
  *    top-k. Correctness baseline; linear in |queries|·|corpus|, so only for
  *    small query sets or reranking.
  *  - sign-LSH: random-hyperplane buckets degenerate to coordinate
  *    hyperplanes (sign of the first B dims) so the oracle can mirror the
  *    arithmetic exactly. Candidates = same-bucket rows → the cross join
  *    shrinks to sum(bucket²); the scale path for full-corpus kNN.
  *
  * All dot products promote float elements to double and fold sequentially
  * (zip_with + aggregate), matching the oracle bit-for-bit.
  */
object Similarity {

  /** Sequential-fold dot product over two float vectors, in doubles.
    * Reference implementation — interpreter-bound (HOF lambdas don't
    * codegen); the hot path uses [[cosine]] instead.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Fused native cosine ([[graft.functions.CosineSimilarity]]): one
    * codegen'd loop per pair, bit-identical to dot/(norm*norm) (asserted in
    * CosineSpec; measured 8x faster on an all-pairs sweep).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.functions.cosine_similarity(a, b)

  /** Bucket id from the sign bits of the first `bits` dimensions. `get`
    * (null past the end, matching SQL list indexing) keeps short vectors
    * legal: missing dims contribute 0.
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits)
      .map(i => when(get(v, lit(i)) > 0f, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)

  /** Exact top-k neighbors for each query vector (excluding self). Rank by
    * cosine rounded to 6 places, descending, neighbor id ascending — the
    * rounding makes rank order engine-portable under FP noise.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    rank(
      q.join(c, col("query_id") =!= col("neighbor_id"))
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(cosine(col("qv"), col("cv")), 6).as("cos_r")),
      k)
  }

  /** Sign-LSH top-k: candidates restricted to the query's bucket. Same
    * ranking contract as [[bruteForceTopK]]; recall depends on bucket
    * granularity (tested against the brute-force baseline).
    */
  def signLshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      bits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    rank(
      q.join(c, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(cosine(col("qv"), col("cv")), 6).as("cos_r")),
      k)
  }

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn(
        "rank",
        row_number().over(
          Window
            .partitionBy("query_id")
            .orderBy(col("cos_r").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_r")
  }
}
