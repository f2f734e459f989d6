package graft.ml

import graft.functions.Blob
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the (huge) corpus, one scan, no shuffle of the corpus, then
  * a per-query top-k. This is the exact-recall reference and is already
  * the right 100 TB plan when queries are few: corpus partitions stream
  * once, `dot` runs in codegen, only k rows per (query, partition) survive.
  *
  * Scale path: random-hyperplane LSH — bucket corpus + queries by sign
  * signature and only score within matching buckets (tunable recall).
  */
object Similarity {

  /** Sign-signature of `planes` random hyperplanes (deterministic seed) as
    * a compact Long bucket id. One fused per-row loop over the vector — the
    * expression form (dim × planes element_at terms) exceeds the 64KB
    * codegen method limit and falls back to slow interpretation. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(planes, dim)(rnd.nextGaussian()) // planes × dim
    val f = udf { (v: Seq[Float]) =>
      var sig = 0L
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var i = 0
        val row = m(p)
        val n = math.min(dim, v.length)
        while (i < n) { dot += row(i) * v(i); i += 1 }
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
    f(vec.cast(ArrayType(FloatType)))
  }

  /** Brute-force cosine top-k for each row of `queries` against `corpus`.
    * Output: (query_id, vec_id, cosine, rank) with rank 1..k.
    * `queries` is broadcast; the corpus is scanned exactly once.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv")))
    val scored = corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("_cv"))
      .crossJoin(q)
      .withColumn("cosine", Blob.cosineSimilarity(col("_cv"), col("_qv")))
    // deterministic total order: cosine desc, id asc
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: score only pairs sharing a bucket in >=1 of `tables`
    * hyperplane tables. Recall < 1.0 but corpus-side work drops from
    * O(|corpus| * |queries|) to O(bucket collisions). */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String, dim: Int,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, planesPerTable: Int = 10, tables: Int = 6,
              seed: Long = 42L): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String, idAs: String, vecAs: String) = {
      val sigs = (0 until tables).map(t =>
        hyperplaneSignature(col(vec), dim, planesPerTable, seed + t))
      df.select(col(id).as(idAs), col(vec).as(vecAs),
        posexplode(array(sigs: _*)).as(Seq("_tbl", "_sig")))
    }
    val c = withBuckets(corpus, corpusId, corpusVec, "vec_id", "_cv")
    val q = broadcast(withBuckets(queries, queryId, queryVec, "query_id", "_qv"))
    val scored = c.join(q, Seq("_tbl", "_sig"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("cosine", Blob.cosineSimilarity(col("_cv"), col("_qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }
}
