package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — the BM25 ranking a data
  * pipeline uses to pull topical slices out of 100 TB of text (build a
  * domain subset, mine hard negatives for embedding training, spot-
  * check near-dup clusters) without any embedding model in the loop.
  *
  * Scale shape: the inverted-index statistics (term frequencies,
  * document frequencies, document lengths) are one explode + two
  * map-side-combined aggregates over the corpus; the QUERY side is a
  * handful of terms and joins the tf rows via a BROADCAST equi-join on
  * term, so scoring only ever touches postings of queried terms —
  * never a corpus-wide pass per query. The two corpus-level scalars
  * (N, avgdl) ride along as a broadcast 1-row frame.
  */
object Retrieval {

  /** Okapi BM25 parameters — the standard defaults. */
  val K1 = 1.2
  val B = 0.75

  /** Tokenized corpus statistics: `(doc_id, term, tf, dl)` — term
    * frequency and document length (in tokens) per posting. Tokens
    * come from [[TextDedup.normText]] so casing/whitespace match the
    * dedup family's view of the text.
    */
  def postings(docs: DataFrame): DataFrame = {
    val toks = tokens(docs)
    toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(docLengths(toks), "doc_id")
  }

  /** One row per (doc, token occurrence). */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(TextDedup.normText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)

  /** `(doc_id, dl)` — token count per document with >= 1 token. One
    * map-side-combined aggregate; also the frame `avgdl` averages
    * over DIRECTLY (one row per doc by construction — re-deriving it
    * from the joined postings would need a corpus-wide distinct).
    */
  private def docLengths(toks: DataFrame): DataFrame =
    toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** BM25 score expression for one posting row joined with its term's
    * document frequency and the corpus scalars. The Robertson–Spärck
    * Jones idf with the +1 smoothing (never negative), doubles
    * throughout — consumers rank on `round(score, 4)` so the ranking
    * replays across engines (same trick as the tf-idf query).
    */
  def bm25Term(
      tf: Column, df: Column, dl: Column, nDocs: Column,
      avgdl: Column): Column = {
    val idf = log(lit(1.0) +
      (nDocs.cast("double") - df + lit(0.5)) / (df + lit(0.5)))
    idf * (tf * (K1 + 1.0)) / (tf + lit(K1) *
      (lit(1.0 - B) + lit(B) * dl.cast("double") / avgdl))
  }

  /** Top-k documents per query by BM25. `queries` must have columns
    * `(q_id, term)` — one row per query term (duplicate terms in one
    * query are deduplicated: BM25 is a bag-of-TERMS model over the
    * DOCUMENT side). Output `(q_id, doc_id, rk)`; ranking is by
    * `round(score, 4)` descending with doc_id tiebreak, so an external
    * engine replays it exactly.
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int = 10): DataFrame = {
    val toks = tokens(docs)
    val dl = docLengths(toks)
    val qterms = queries.select(col("q_id"), col("term")).distinct()
    // token stream restricted to queried terms FIRST (broadcast
    // semi-join BELOW the tf aggregate), so both the tf groupBy and
    // the document frequency only ever touch queried-term rows —
    // never a vocabulary-wide aggregate
    val qpost = toks.join(
      broadcast(qterms.select("term").distinct()), Seq("term"),
      "left_semi")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
    val dfreq = qpost.groupBy("term").agg(count(lit(1)).as("df"))
    // N = all docs; avgdl = mean token count over docs with >= 1
    // token (exactly the docs that carry postings) — averaged over
    // the one-row-per-doc dl aggregate directly, not a distinct of
    // the joined postings
    val scalars = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(avg(col("dl").cast("double")).as("avgdl")))
    val scored = qpost
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(scalars))
      .select(col("q_id"), col("doc_id"),
        bm25Term(col("tf"), col("df"), col("dl"), col("n_docs"),
          col("avgdl")).as("s"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("s")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("score"), 4).desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("doc_id"),
        col("rk").cast("int").as("rk"))
  }

  /** Late-interaction (ColBERT-style MaxSim) scoring — the reranker
    * between single-vector ANN and a cross-encoder: query and document
    * are each a BAG of token vectors, and
    * `score(q, d) = Σ_{qtok} max_{dtok} ⟨qtok, dtok⟩`. Vectors here
    * are INT8 code arrays ([[Quantization.quantize]]), so every dot
    * product, max, and sum is exact 64-bit integer arithmetic and the
    * full ranking replays bit-exactly in an external engine — no
    * float-order-of-summation hazard.
    *
    * `queryTokens`: `(q_id, qtok_id, qvec)`, one row per query token
    * vector. `docTokens`: `(d_id, dvec)`, one row per document token
    * vector. Output `(q_id, d_id, score, rk)`, top-k per query by
    * score with d_id tiebreak.
    *
    * Scale shape: the query side is small and BROADCAST; the pairing
    * is linear in the doc-token count at a fixed query set (the
    * ann_cosine_topk shape, not an all-pairs product). The MaxSim
    * reduction is two map-side-combined aggregates — `max` per
    * (q, d, qtok), then `sum` per (q, d) — followed by one top-k
    * window over the already-aggregated (q, d) frame. At corpus scale
    * pass `candidates` (q_id, d_id — e.g. the top-m of a pooled-vector
    * ANN stage) and the whole computation becomes linear in the
    * candidate list: exact late-interaction scores exactly where a
    * first-stage retriever says they might matter, which is the
    * two-stage ColBERT serving layout.
    *
    * `excludeSelf` drops d_id = q_id pairs (for fixtures where queries
    * are drawn from the corpus itself).
    */
  def maxSimTopK(
      queryTokens: DataFrame,
      docTokens: DataFrame,
      k: Int = 10,
      candidates: Option[DataFrame] = None,
      excludeSelf: Boolean = false): DataFrame = {
    val q = queryTokens.select(col("q_id"), col("qtok_id"), col("qvec"))
    val d = docTokens.select(col("d_id"), col("dvec"))
    val paired0 = candidates match {
      case Some(c) => c.select(col("q_id"), col("d_id"))
        .join(d, Seq("d_id")).join(broadcast(q), Seq("q_id"))
      case None => d.crossJoin(broadcast(q))
    }
    val paired =
      if (excludeSelf) paired0.filter(col("d_id") =!= col("q_id"))
      else paired0
    val tokMax = paired
      .select(col("q_id"), col("d_id"), col("qtok_id"),
        Quantization.intDot(col("qvec"), col("dvec")).as("dot"))
      .groupBy(col("q_id"), col("d_id"), col("qtok_id"))
      .agg(max(col("dot")).as("mx"))
    val scored = tokMax.groupBy(col("q_id"), col("d_id"))
      .agg(sum(col("mx")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("d_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("d_id"), col("score"),
        col("rk").cast("int").as("rk"))
  }

  /** Element-wise SUM pooling of a group of integer code vectors —
    * the single-vector proxy for a multi-vector document (mean
    * pooling up to the constant factor, which ranking ignores):
    * `dot(Σq, Σd) = Σ_qtok Σ_dtok dot(qt, dt)`, the all-pairs
    * interaction total, a far better MaxSim surrogate than any single
    * token. Input `(id, vec)` rows (one per token vector, `vec` an
    * int code array); output `(id, pvec)` with `pvec` the positional
    * sum as `array<int>` — exact integer arithmetic (int8 codes × the
    * tokens-per-doc fan-in stay far inside int range).
    *
    * Scale shape: one posexplode + a map-side-combined per-(id, pos)
    * sum + per-id ordered reassembly — a single corpus pass executed
    * ONCE at index-build time; the rebuild HOF runs per document, not
    * per pair.
    */
  def sumPool(toks: DataFrame, id: String, vec: String): DataFrame =
    toks.select(col(id), posexplode(col(vec)).as(Seq("pos", "v")))
      .groupBy(col(id), col("pos")).agg(sum(col("v")).as("sv"))
      .groupBy(col(id))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("sv")))),
        x => x.getField("sv").cast("int")).as("pvec"))

  /** Boolean-AND relevance judgments: a document is relevant to a
    * query iff it contains EVERY query term (the deterministic qrel
    * set a pipeline can compute without human labels — the classic
    * pseudo-qrel for regression-testing a ranker). Output
    * `(q_id, doc_id)`.
    *
    * Scale shape: the corpus side is one distinct over (doc, term)
    * RESTRICTED to queried terms by a broadcast join first (the
    * bm25TopK discipline — never a vocabulary-wide pass), then a
    * count-equals-arity gate against the broadcast per-query arity.
    */
  def booleanAndQrels(docs: DataFrame, queries: DataFrame): DataFrame = {
    val qterms = queries.select(col("q_id"), col("term")).distinct()
    val nq = qterms.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_terms"))
    tokens(docs)
      .join(broadcast(qterms.select("term").distinct()), Seq("term"),
        "left_semi")
      .distinct()
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(nq), Seq("q_id"))
      .filter(col("c") === col("n_terms"))
      .select(col("q_id"), col("doc_id"))
  }

  /** Rank-quality census of a retrieval run against relevance
    * judgments — the eval harness a pipeline runs after every ranker
    * change: per query, the relevant-set size, the number of relevant
    * docs retrieved in the top k (recall@k's numerator), and the rank
    * of the first relevant hit (MRR's denominator; 0 = none
    * retrieved). All exact integers, so the report replays bit-exactly
    * in an external engine — compute the float recall/MRR from these
    * at presentation time.
    *
    * `run` must have `(q_id, doc_id, rk)`; `qrels` `(q_id, doc_id)`.
    * Queries with an empty relevant set are dropped (no denominator).
    * Both inputs are query-bounded frames, so every join here is
    * trivially broadcastable — cost is independent of corpus size.
    */
  /** Graded relevance judgments from matched-term frequency:
    * grade = `min(4, ⌊log2(Σ tf of matched query terms)⌋+1)` — the
    * deterministic stand-in for human 1-to-4-star qrels that keeps
    * the whole eval oracle-replayable (`length(bin(x))` is the exact
    * integer log2 both engines share). Raw-frequency grades
    * deliberately DISAGREE with BM25's length-normalized ranking, so
    * NDCG actually discriminates instead of saturating at 1. The
    * token stream restricts to queried terms FIRST (broadcast
    * semi-join), so the tf aggregate only touches queried-term
    * postings.
    */
  def gradedQrels(docs: DataFrame, queries: DataFrame): DataFrame = {
    val qterms = queries.select(col("q_id"), col("term")).distinct()
    tokens(docs)
      .join(broadcast(qterms.select("term").distinct()), Seq("term"),
        "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(least(lit(4L), length(bin(sum(col("tf")))).cast("long"))
        .as("grade"))
  }

  /** NDCG-style graded ranking eval, integer-exact: DCG with the
    * LINEAR discount `gain/(1+rank)` instead of `gain/log2(1+rank)` —
    * the variant you pick when the verdict must replay bit-for-bit
    * (log2 discounts force floats whose summation order differs
    * across engines). Scores are pre-scaled by `lcm(2..k+1)` so every
    * per-position term is an exact integer; `ndcg_ppm` is the floor
    * ratio in parts-per-million.
    *
    * The IDEAL ranking never sorts documents: grades are small
    * integers, so IDCG folds into per-(query, grade) COUNTS — the
    * positions a grade occupies are `[cum_higher+1, cum_higher+cnt]`
    * capped at k, and the position-discount prefix sums are a k-entry
    * compile-time array. The only window runs over the tiny
    * (query × grade) frame. Output per query:
    * `(q_id, n_graded, dcg_scaled, idcg_scaled, ndcg_ppm)`.
    */
  def gradedRankEval(
      run: DataFrame, qrels: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 20, s"k must be in [1,20], got $k")
    // lcm(2..k+1): every discount DiscScale/(1+rk) is an exact integer
    val discScale = (2 to k + 1).map(BigInt(_))
      .reduce((a, b) => a * b / a.gcd(b)).toLong
    val prefix = (0 to k).scanLeft(0L) {
      case (acc, p) => if (p == 0) acc else acc + discScale / (1 + p)
    }.tail // prefix(p) = Σ_{i=1..p} DiscScale/(1+i), prefix(0) = 0
    val prefixArr = array(prefix.map(lit): _*)
    def prefixAt(pos: Column) = element_at(prefixArr, (pos + 1).cast("int"))
    val dcg = run.filter(col("rk") <= k)
      .join(qrels, Seq("q_id", "doc_id"))
      .groupBy(col("q_id"))
      .agg(sum(col("grade") * expr(s"$discScale div (rk + 1)"))
        .as("dcg_scaled"))
    val gc = qrels.groupBy(col("q_id"), col("grade"))
      .agg(count(lit(1)).as("cnt"))
    val higher = Window.partitionBy(col("q_id"))
      .orderBy(col("grade").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val idcg = gc
      .withColumn("cb", coalesce(sum(col("cnt")).over(higher), lit(0L)))
      .select(col("q_id"),
        (col("grade") *
          (prefixAt(least(col("cb") + col("cnt"), lit(k.toLong))) -
            prefixAt(least(col("cb"), lit(k.toLong))))).as("c"))
      .groupBy(col("q_id")).agg(sum(col("c")).as("idcg_scaled"))
    qrels.groupBy(col("q_id")).agg(count(lit(1)).as("n_graded"))
      .join(idcg, Seq("q_id"))
      .join(dcg, Seq("q_id"), "left")
      .select(col("q_id"), col("n_graded"),
        coalesce(col("dcg_scaled"), lit(0L)).as("dcg_scaled"),
        col("idcg_scaled"),
        expr("(coalesce(dcg_scaled, 0) * 1000000) div idcg_scaled")
          .as("ndcg_ppm"))
  }

  def rankEval(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hits = run.filter(col("rk") <= k)
      .join(qrels, Seq("q_id", "doc_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("__h"), min(col("rk")).as("__fr"))
    qrels.groupBy(col("q_id")).agg(count(lit(1)).as("n_rel"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_rel"),
        coalesce(col("__h"), lit(0L)).as("hits_at_k"),
        coalesce(col("__fr"), lit(0)).cast("int").as("first_rel_rank"))
  }

  /** Reciprocal-rank fusion of two ranked lists — the standard hybrid
    * retrieval combiner (lexical BM25 + embedding ANN) that needs NO
    * score calibration between systems: each list contributes
    * `1/(kRrf + rank)` and the fused ranking orders by the sum.
    *
    * Inputs must both have columns `(q_id, doc_id, rk)` (top-m per
    * query from each system). A doc present in only one list gets zero
    * from the other — the full-outer join on `(q_id, doc_id)` is over
    * two already-top-m-bounded frames, so the fusion costs O(q·m)
    * regardless of corpus size.
    *
    * Determinism note: `1/(kRrf+rk)` over integer ranks is one
    * correctly-rounded IEEE division, and the sum of the two is one
    * correctly-rounded addition — every engine computes bit-identical
    * scores from the same rank pairs, so the fused ordering replays
    * exactly with no rounding trick.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      k: Int = 10,
      kRrf: Int = 60): DataFrame = {
    require(kRrf >= 1, "kRrf must be positive")
    val fa = a.select(col("q_id"), col("doc_id"), col("rk").as("rk_a"))
    val fb = b.select(col("q_id"), col("doc_id"), col("rk").as("rk_b"))
    val score =
      coalesce(lit(1.0) / (lit(kRrf) + col("rk_a")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kRrf) + col("rk_b")), lit(0.0))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    fa.join(fb, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"), score.as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("doc_id"), col("rk").cast("int").as("rk"))
  }
}
