package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-triple assembly — the step that turns the
  * engine's dedup and retrieval artifacts into model-ready
  * (anchor, positive, hard-negative) rows, the data shape dense
  * retrievers train on (Karpukhin 2020 §3.2: positives from labeled or
  * mined pairs, hard negatives from a LEXICAL search that scores high
  * but is not a true match — "BM25 negatives", the recipe's strongest
  * variant). The engine already mines each ingredient: near-duplicate
  * pairs (the q32 Jaccard graph) supply positives, and the text index
  * supplies the lexically-confusable negative — this operator is the
  * deterministic join of those artifacts, the text-side sibling of
  * q139's embedding-space [[HardNegatives]].
  *
  * Semantics per anchor (the top-`nAnchors` pairs by Jaccard): the
  * positive is the pair partner; the anchor's query is its
  * `termsPerAnchor` most characteristic terms (tf·idf over the shared
  * index, [[SearchDsl.mltTerms]]'s scoring, batched); the negative is
  * the top-scoring document under those terms that is NOT the anchor,
  * NOT the positive, and NOT near-duplicate-linked to the anchor
  * (direct pair exclusion — DPR excludes gold matches; transitive
  * cluster exclusion would need the component fixpoint and buys
  * little: a doc lexically close yet below pair threshold IS the
  * wanted hard negative).
  *
  * Determinism discipline: term selection and the negative's ranking
  * follow the q35/q85 precedent — scores are fixed-op-order doubles,
  * selection ranks on the ROUNDED score with total (term / doc_id)
  * tie-breaks, emission is rounded. The top-1-per-anchor cut is the
  * window-free min(struct) mergeable aggregate (q161/q167's trick).
  *
  * Scale shape: anchors are a top-k TakeOrderedAndProject over the
  * pair frame; anchor terms touch only the ANCHORS' postings rows
  * (doc-keyed semi-join, k·terms rows out); candidate scoring is one
  * postings-sized shuffle bounded by the selected terms' postings
  * (the bm25 shape); every per-anchor frame thereafter is
  * metadata-sized. Nothing rescans raw text.
  */
object Triples {

  /** (anchor, positive, jaccard, negative, neg_score) — one row per
    * anchor, anchors ascending. `pairs` carries (id1, id2, jaccard)
    * with id1 < id2; `index` the corpus [[Retrieval.TextIndex]].
    */
  def mine(pairs: DataFrame, index: Retrieval.TextIndex, nAnchors: Int,
      termsPerAnchor: Int = 3): DataFrame = {
    require(nAnchors >= 1, s"nAnchors must be >= 1, got $nAnchors")
    require(termsPerAnchor >= 1,
      s"termsPerAnchor must be >= 1, got $termsPerAnchor")
    import graft.queries.Par
    val anchors = pairs
      .orderBy(col("jaccard").desc, col("id1"), col("id2")).limit(nAnchors)
      .select(col("id1").as("aid"), col("id2").as("pos_id"),
        col("jaccard"))
      .localCheckpoint(true) // three consumers of a top-k frame
    // The anchors' own most characteristic terms (mltTerms batched):
    // tf·idf over the anchors' postings rows only, top-k per anchor by
    // (raw tfidf desc, term) — the q105 ordering.
    val aTerms = index.postings
      .join(broadcast(anchors.select(col("aid").as("doc_id"))), "doc_id")
      .join(index.df, "term").crossJoin(broadcast(index.stats))
      .select(col("doc_id").as("aid"), col("term"),
        (col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0))))
          .as("tfidf"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("aid")
          .orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rnk") <= termsPerAnchor)
      .select(col("aid"), col("term"))
    // Candidate scoring: every doc carrying an anchor's term, scored
    // by summed tf·idf per (anchor, doc) — one postings-sized shuffle.
    val scored = index.postings
      .join(broadcast(aTerms), "term")
      .join(index.df, "term").crossJoin(broadcast(index.stats))
      .groupBy(col("aid"), col("doc_id"))
      .agg(sum(col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0))))
        .as("score"))
    // Exclusions: self, the gold positive, and any direct pair
    // partner. The partner table is first cut to the ANCHORS' rows
    // (k anchors × their degree) so the anti-join sees a small frame in
    // the common case — but the degree itself is UNBOUNDED (an anchor
    // inside a large boilerplate near-dup clique contributes
    // cluster-size rows), so `linked` carries no broadcast hint: AQE
    // reads its runtime size and broadcasts only when it actually fits,
    // falling back to shuffle join for the pathological clique instead
    // of OOMing the driver (round-14 ADVICE fix).
    val linked = pairs.select(col("id1").as("aid"), col("id2").as("doc_id"))
      .unionByName(pairs.select(col("id2").as("aid"), col("id1").as("doc_id")))
      .join(broadcast(anchors.select(col("aid"))), Seq("aid"))
    val eligible = scored
      .join(broadcast(anchors), Seq("aid"))
      .filter(col("doc_id") =!= col("aid") && col("doc_id") =!= col("pos_id"))
      .join(linked, Seq("aid", "doc_id"), "left_anti")
    eligible
      .groupBy(col("aid"), col("pos_id"), col("jaccard"))
      .agg(min(struct((-Par.r2(col("score"))).as("ns"), col("doc_id").as("d")))
        .as("best"))
      .select(col("aid").as("anchor"), col("pos_id").as("positive"),
        col("jaccard"), col("best.d").as("negative"),
        (-col("best.ns")).as("neg_score"))
  }
}
