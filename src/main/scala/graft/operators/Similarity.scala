package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity operators over Array[Float] embedding columns.
  *
  * All math is folded left-to-right with `aggregate` (sequential, order-
  * deterministic) in double precision — bit-identical across engines and
  * runs, and fully codegen'd (no UDFs). The dot product/norm per row is a
  * narrow map; brute-force top-k is TakeOrderedAndProject (per-partition
  * top-k, then merge — no global sort); the ANN paths (sign-LSH, IVF)
  * turn global search into one shuffle on a small bucket key, which is
  * the shape that survives 100 TB.
  */
object Similarity {

  /** Σ aᵢ·bᵢ folded sequentially in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via composed higher-order folds — three interpreted array
    * walks; kept as the differential reference for the native path. */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine via the native single-pass codegen'd expression (same fold
    * order ⇒ bit-identical to cosineComposed; ExtensionSpec pins it). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimExpr.cosineSim(a, b)

  /** Brute-force top-k cosine neighbors of one query vector. */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = vectors.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"))
    vectors.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("query_vec")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Sign-LSH bucket signature from the first `bits` components
    * (axis-aligned hyperplanes — valid LSH for normalized embeddings):
    * the bit string [v₁>0, v₂>0, …] folded as acc·2 + bit. */
  def signLshBucket(vec: Column, bits: Int): Column =
    aggregate(slice(vec, 1, bits), lit(0L),
      (acc, v) => acc * 2 + when(v > 0f, 1L).otherwise(0L))

  /** IVF-style assignment: nearest of the given centroid vectors by dot
    * product (argmax with deterministic low-index tie-break). */
  def ivfAssign(vec: Column, centroids: Seq[Column]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(dot(vec, c).as("score"), lit(-i).as("negidx"))
    }
    -greatest(scored: _*).getField("negidx")
  }
}
