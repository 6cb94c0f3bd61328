package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid (sparse + dense) retrieval.
  *
  * A training-data curation stack retrieves with BOTH a lexical ranker
  * (BM25, [[TextAnalysis.bm25TopK]]) and an embedding ranker
  * ([[Similarity.bruteForceTopK]] / ivfTopK) — each misses what the
  * other catches (exact rare terms vs paraphrase). Reciprocal-rank
  * fusion (Cormack, Clarke & Büttcher, SIGIR '09) merges any number of
  * ranked lists without score calibration:
  *
  *   rrf(q, d) = Σ_lists 1 / (k + rank_list(q, d))
  *
  * with the standard k = 60. Only ranks enter the formula, so the
  * fusion is insensitive to each ranker's score scale — the property
  * that makes it the default hybrid combiner in retrieval systems.
  *
  * Scale shape: the corpus-sized work (term join / vector scan) happens
  * in the upstream rankers, which each emit O(queries × K) rows. Fusion
  * is one hash aggregate on (query, doc) over those bounded lists plus
  * a per-query rank window whose WindowGroupLimit partial keeps only
  * topK rows per query ahead of the exchange — total shuffled volume is
  * O(queries × K · lists), independent of corpus size. Nothing here
  * rescans or reshuffles the corpus.
  *
  * Determinism (oracle contract): rrf is a sum of ≤ `lists.size` exact
  * reciprocals, rounded to 6 dp BEFORE the rank window, and the window
  * tie-breaks on doc_id — docs appearing in a single list at the same
  * rank tie exactly, so the tie-break is load-bearing, not cosmetic.
  */
object Retrieval {

  /** Fuse ranked lists, each with columns (query_id, doc_id, rank),
    * into (query_id, doc_id, rrf, n_lists, rank) keeping the best
    * `topK` fused docs per query. `rank` in the inputs is 1-based.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0 && topK > 0, "k and topK must be positive")
    val unioned = lists
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ union _)
    val fused = unioned
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        round(sum(lit(1.0) / (lit(k) + col("rank"))), 6).as("rrf"),
        count(lit(1)).cast("int").as("n_lists"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }
}
