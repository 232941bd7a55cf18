package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, as a production ANN stack needs both:
  *  - `bruteTopK`: exact cosine top-k. The query side is broadcast (it is
  *    small by construction); the corpus side streams — a single narrow
  *    map + per-query top-k, no corpus shuffle. This is the baseline and
  *    the recall oracle.
  *  - `lshTopK`: random-hyperplane LSH. Corpus and queries hash to sign
  *    buckets; only same-bucket pairs are scored. At 100 TB the bucket
  *    join replaces the full cross product — cost drops from |Q|·|C| to
  *    Σ_bucket |Q_b|·|C_b|. Hyperplanes are PSEUDO-RANDOM from xxhash64
  *    (plane i, dim j) so every executor materializes the same planes
  *    without any broadcast of random state.
  *
  * All arithmetic in double precision via codegen'd higher-order
  * functions (`zip_with` + `aggregate`) — no UDFs.
  */
object Similarity {

  /** Double-precision copy of a float vector column — a native Cast
    * (codegen'd), NOT a per-element transform lambda. */
  def toDoubleVec(v: Column): Column = v.cast("array<double>")
  private def toDouble(v: Column): Column = toDoubleVec(v)

  /** Codegen'd native expressions (graft.functions.VectorExpressions):
    * the zip_with/aggregate higher-order formulation is interpreted per
    * element and dominates all-pairs similarity cost. Same accumulation
    * order, bit-identical results. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotNative(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineNative(a, b)

  /** Exact top-k neighbors by cosine for each query vector.
    * Output: (queryIdCol, neighborIdCol, rank). Ties break on neighbor id
    * (deterministic). Self-pairs excluded. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("_cv"))
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("_qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("_sim", cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Sign-bucket id from `planes` pseudo-random hyperplanes. Plane i's
    * j-th coordinate is a deterministic hash-derived value in [-1, 1]. */
  def lshBucket(vec: Column, planes: Int = 8): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, j) =>
          x * (pmod(xxhash64(lit(p), j), lit(2001L)) - 1000L).cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: score only corpus vectors in the query's LSH
    * bucket. Scale path for when the cross product is infeasible;
    * recall < 1 by construction (tune `planes` / multi-probe for more). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("_cv"))
      .withColumn("_bkt", lshBucket(col("_cv"), planes))
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("_qv"))
      .withColumn("_bkt", lshBucket(col("_qv"), planes))
    val scored = c.join(broadcast(q), Seq("_bkt"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("_sim", cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (id1 < id2, cosine ≥ thresh)
    * restricted to LSH-bucket collisions — the embedding analogue of
    * MinHash near-dup. */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 6): DataFrame = {
    val v = df.select(col(idCol).as("_id"), toDouble(col(vecCol)).as("_v"))
      .withColumn("_bkt", lshBucket(col("_v"), planes))
    val l = v.select(col("_id").as("id1"), col("_v").as("_v1"), col("_bkt"))
    val r = v.select(col("_id").as("id2"), col("_v").as("_v2"), col("_bkt"))
    l.join(r, Seq("_bkt")).where(col("id1") < col("id2"))
      .withColumn("cos", cosine(col("_v1"), col("_v2")))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
      .distinct()
  }
}
