package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with a broadcast query set — the
  * exact reference answer and the right physical plan when |queries| is
  * small (one broadcast, no shuffle of the big side, window top-k per
  * query). Scale path: sign-LSH bucketing (see DedupOps.embeddingNearDups)
  * or an IVF-style cell restriction; both reuse this exact scorer for the
  * final rerank.
  */
object SimilarityOps {

  /** Approximate cosine top-k via multi-table sign-projection LSH (the
    * scale path): candidates = vectors sharing any of `tables` bucket
    * signatures with the query (native VecLshBuckets expression), exact
    * cosine reranks the candidate set. Same output schema as the exact
    * form; queries with fewer than k candidates return fewer rows (ANN
    * semantics). At the 10^12 posture the bucket join shuffles only
    * (tables x rows) narrow rows instead of scoring the full table per
    * query.
    */
  def cosineTopKAnn(emb: DataFrame, queries: DataFrame, k: Int,
                    tables: Int = 8, bits: Int = 12,
                    broadcastQueries: Boolean = true): DataFrame = {
    import graft.plans.TextHashExpressions.vecLshBuckets
    def banded(df: DataFrame, idCol: String, embCol: String): DataFrame =
      df.select(col(idCol), col(embCol),
          posexplode(vecLshBuckets(col(embCol), tables, bits)).as(Seq("table", "bucket")))
    val e = banded(emb, "vec_id", "embedding")
    // corpus-vs-corpus workloads (|queries| ~ |emb|) pass
    // broadcastQueries = false: the candidate join becomes a plain shuffle
    // equi-join on (table, bucket) and nothing ships the query table whole
    val qb = banded(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qemb")), "qid", "qemb")
    val q = if (broadcastQueries) broadcast(qb) else qb
    val cand = e.join(q, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), col("embedding"), col("qemb"))
      .dropDuplicates("qid", "nid")
    val scored = cand.select(col("qid"), col("nid"),
      round(graft.plans.TextHashExpressions.vecCosine(col("embedding"), col("qemb")) * lit(1000000.0), 0)
        .cast("long").as("cos_e6"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_e6").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos_e6"))
  }

  /** IVF-Flat approximate cosine top-k (the inverted-file scale path,
    * complementing the LSH path): a deterministic coarse quantizer —
    * centroids are the vectors with vec_id % centroidMod == 3, so the
    * centroid count scales as n/centroidMod without a training pass —
    * assigns every vector to its nearest centroid (cosine, rounded to
    * 1e-6, ties by centroid id); a query probes its `nprobe` nearest
    * centroids and exact cosine reranks the union of those inverted
    * lists. ANN semantics: queries may return fewer than k rows.
    *
    * Plan shape: the centroid table is tiny by construction and rides a
    * broadcast nested-loop join; the big side is scanned twice (assign,
    * rerank) with no all-pairs stage — candidate volume per query is
    * ~nprobe * centroidMod vectors.
    */
  def cosineTopKIvf(emb: DataFrame, queries: DataFrame, k: Int,
                    centroidMod: Int = 37, nprobe: Int = 4): DataFrame = {
    val cent = broadcast(emb.filter(col("vec_id") % centroidMod === 3)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    def nearest(df: DataFrame, idCol: String, embCol: String, top: Int): DataFrame = {
      val scored = df.crossJoin(cent)
        .withColumn("c_e6", round(graft.plans.TextHashExpressions.vecCosine(col(embCol), col("cemb")) * lit(1000000.0), 0)
          .cast("long"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("c_e6").desc, col("cid"))
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= top)
        .drop("cemb", "c_e6", "__rn")
    }
    val assigned = nearest(emb, "vec_id", "embedding", 1)
    val probes = nearest(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qemb")), "qid", "qemb", nprobe)
    val cand = probes.join(assigned, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(graft.plans.TextHashExpressions.vecCosine(col("embedding"), col("qemb")) * lit(1000000.0), 0)
          .cast("long").as("cos_e6"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_e6").desc, col("nid"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos_e6"))
  }

  /** Exact cosine top-k: (qid, nid, rank, cos_e6). Deterministic — scores
    * rounded to 1e-6 before ranking, ties broken by neighbor id.
    */
  def cosineTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qemb")))
    val scored = emb.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(graft.plans.TextHashExpressions.vecCosine(col("embedding"), col("qemb")) * lit(1000000.0), 0)
          .cast("long").as("cos_e6"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_e6").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos_e6"))
  }
}
