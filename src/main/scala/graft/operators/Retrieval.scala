package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokenCount, tokens}
import graft.functions.TopKAgg.topkAgg
import graft.sources.Tables

/** Lexical retrieval (BM25) and hybrid lexical+vector fusion over the
  * `documents`/`embeddings` tables — the retrieval surface a training
  * corpus needs next to its dedup screens: "find the documents most
  * like this query/example" powers decontamination triage, targeted
  * corpus audits, and seed-expansion ("more like these") sampling.
  *
  * Reference scope note: zypp-io/df_to_azure has no retrieval surface;
  * this extends the mandated similarity-search family (SURVEY §2.2)
  * with the lexical + fused complement of q34–q36/q41/q61/q65/q68.
  *
  * Cross-engine exactness (why this BM25 is log-free and fixed-point):
  * the driver's gate hash-compares against DuckDB, and a sum of
  * doubles over a group is order-nondeterministic in BOTH engines. The
  * per-term weight here is therefore built from IEEE ops that are all
  * correctly rounded (+, −, ×, ÷ over doubles — bit-identical in any
  * engine given identical inputs and evaluation tree), quantized to
  * fixed point (floor(w·1e6) as BIGINT), and summed as integers —
  * order-free, hash-exact. `ln` is deliberately NOT used: libm vs
  * Java `Math.log` only agree to ~1 ulp, and one flipped quantization
  * bucket would flake the gate. The idf is Robertson's raw odds
  * (N − df + 0.5)/(df + 0.5) — BM25's idf before the log transfer
  * curve; always positive (never the negative-idf anomaly of the log
  * form at df > N/2), monotone in df, so ranking behavior is the
  * standard one. k1 = 1.2, b = 0.75 (the textbook dials).
  *
  * Fixed-point range: per-term weight ≤ idf·(k1+1) ≈ 2.2·N, so the
  * quantized BIGINT stays exact in TopKAgg's double score (< 2^53)
  * up to corpora of ~4·10^9 docs per gate run — beyond that, serve
  * ranking from the double weight directly (ordering is what matters
  * at that scale; the fixed-point form exists for the oracle gate).
  *
  * Scale shape (the 100 TB story):
  *  - ONE shuffle builds the (doc, term) frequency table: `dl` rides
  *    the groupBy key (functionally dependent on doc_id — zero extra
  *    groups), so no second shuffle or join materializes doc lengths.
  *  - the query-term prune is a BROADCAST semi-join applied directly
  *    to that stream — only postings of query terms survive; df for
  *    those terms is a tiny aggregate, re-broadcast to the scoring
  *    join. Corpus-level stats (N, Σdl) are a 1-row broadcast cross
  *    join, never a driver scalar.
  *  - per-query scoring is a map-side-combinable SUM keyed by
  *    (query_id, doc_id); top-k is [[graft.functions.TopKAgg]] — a
  *    bounded map-side heap, NO window, so the final shuffle carries
  *    ≤ k rows per (partition, query) instead of every candidate.
  *  One full-corpus tokenize pass is inherent to ad-hoc BM25 (df/dl
  *  are corpus stats); an amortized deployment persists the tf table
  *  bucketed by token — the same persisted-index upgrade path the ANN
  *  family takes via [[IndexStore]].
  */
object Retrieval {

  /** The gate's literal query set (vocabulary from TESTDATA.md's
    * synthetic corpus, so every term has postings). */
  val bm25Queries: Seq[(Int, String)] = Seq(
    0 -> "hash join merge",
    1 -> "window agg stream batch",
    2 -> "fast vector scan",
    3 -> "customer order value",
    4 -> "spark query data table",
    5 -> "slow dup row filter")

  val bm25K = 5
  /** BM25 dials (k1, b) and the fixed-point quantum. The derived
    * constants (1−b, k1+1) are spelled as DECIMAL LITERALS, never
    * computed: `lit(1.2 + 1.0)` could differ from strtod("2.2") — the
    * value DuckDB's `CAST(2.2 AS DOUBLE)` parses — by one ulp, and a
    * one-ulp weight shift can flip a quantization bucket. A literal on
    * both sides parses to the identical double by construction. */
  val bm25K1 = 1.2
  val bm25B = 0.75
  private val bm25OneMinusB = 0.25
  private val bm25K1Plus1 = 2.2
  val bm25Quantum = 1000000.0

  /** Hybrid fusion dials: query-by-example doc ids < hybridQueries,
    * per-leg candidate depth, RRF smoothing constant, fused top-k. */
  val hybridQueries = 8
  val hybridLegK = 20
  val rrfC = 60
  val hybridK = 10
  /** RRF contributions as exact integers: numer DIV (c + rank). */
  val rrfNumer = 1000000000L

  /** Quantized per-term BM25 weight — the ONE definition both gated
    * queries score with. Inputs are the posting's tf, the doc's token
    * count dl, the term's document frequency df, and the corpus stats
    * (n_docs, sum_dl). Evaluation tree mirrors SparkEntry's
    * `bm25WSql` fragment token for token; change either only with the
    * other. */
  private[operators] def bm25Wq(tf: Column, dl: Column, df: Column,
      nd: Column, sumdl: Column): Column = {
    val tfd = tf.cast("double")
    val idf = (nd - df.cast("double") + lit(0.5)) / (df.cast("double") + lit(0.5))
    val dlnorm = dl.cast("double") * nd / sumdl
    val denom = tfd + lit(bm25K1) * (lit(bm25OneMinusB) + lit(bm25B) * dlnorm)
    floor(idf * (tfd * lit(bm25K1Plus1) / denom) * lit(bm25Quantum))
      .cast("long")
  }

  /** (doc_id, dl, token, tf) over the corpus: one map-side-combinable
    * shuffle; `dl` rides the key (see object doc).
    *
    * The token ARRAY is computed exactly once, in the Generate's
    * child — `dl` is then a size() over the materialized array
    * attribute ABOVE the Generate (an O(1) header read per exploded
    * row), never a second run of the normalize+split regex. The
    * earlier form computed `tokenCount(text)` and `tokens(text)` as
    * two independent expressions: no cross-operator subexpression
    * elimination applies, so the regex — the dominant token-query
    * cost (see TextFunctions.tokens; measured 7.8 s → 0.9 s on the
    * sf0.1 tf build when it stopped riding the exploded stream) —
    * ran twice per document. The when-guard replicates tokenCount's
    * NULL rule exactly (`toks` is NULL iff `text` is NULL), keeping
    * dl bit-identical for every row that survives the explode. */
  private[operators] def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        when(col("toks").isNotNull, size(col("toks"))).as("dl"),
        explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** 1-row corpus stats as LONGS — the exact values [[LexIndex]]
    * persists; both serving paths cast the same longs to double. */
  private[operators] def corpusStatsLong(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(tokenCount(col("text"))).as("sum_dl"))

  /** BM25 scores for `qterms` = (query_id, token) against the corpus:
    * prune → df → fan out to queries → quantized weights → integer
    * SUM per (query_id, doc_id). `excludeSelf` drops doc_id ==
    * query_id postings (query-by-example mode). */
  private[operators] def bm25Scores(docs: DataFrame, qterms: DataFrame,
      excludeSelf: Boolean): DataFrame = {
    val tf = termFreqs(docs)
    val terms = qterms.select(col("token")).distinct()
    val pruned = tf.join(broadcast(terms), "token")
    // df BEFORE the per-query fan-out: a term shared by two queries
    // must not double-count its documents
    val dfq = pruned.groupBy(col("token")).agg(count(lit(1)).as("df"))
    scoreAgainst(pruned, qterms, dfq, corpusStatsLong(docs), excludeSelf)
  }

  /** The scoring core both serving paths share BIT-IDENTICALLY: fan
    * the pruned postings out to queries, weight, integer-sum. The
    * ad-hoc path ([[bm25Scores]]) computes `pruned`/`dfq`/`statsLong`
    * in-query; [[LexIndex]] reads the SAME values from its persisted
    * tables — one expression tree means the twin gate can hold. */
  private[operators] def scoreAgainst(pruned: DataFrame,
      qterms: DataFrame, dfq: DataFrame, statsLong: DataFrame,
      excludeSelf: Boolean): DataFrame = {
    val stats = statsLong.select(col("n_docs").cast("double").as("nd"),
      col("sum_dl").cast("double").as("sumdl"))
    val fanned = pruned.join(
      broadcast(qterms.withColumnRenamed("token", "qtoken")),
      col("token") === col("qtoken") &&
        (if (excludeSelf) col("doc_id") =!= col("query_id") else lit(true)))
    fanned
      .join(broadcast(dfq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("wq", bm25Wq(col("tf"), col("dl"), col("df"),
        col("nd"), col("sumdl")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("wq")).as("score"))
  }

  /** Bounded top-k per query via TopKAgg, emitting (query_id, rnk,
    * <idName>, <scoreName>). Scores arrive as exact-in-double values
    * (integer-valued or bit-stable cosines), so the (score DESC, id
    * ASC) heap order is total and engine-independent. */
  private[operators] def topkPerQuery(scored: DataFrame, scoreCol: Column,
      idCol: Column, k: Int, idName: String, scoreName: String,
      scoreBack: Column => Column): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(topkAgg(scoreCol, idCol, k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as(idName), scoreBack(col("col.score")).as(scoreName))

  /** The literal query set as a (query_id, token) frame — shared by
    * q72 and the index-served q74 so both tokenize identically. */
  private[operators] def bm25QueryTerms(spark: SparkSession): DataFrame =
    spark.createDataFrame(bm25Queries).toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(tokens(col("qtext"))).as("token")).distinct()

  /** q72: BM25 top-5 documents per literal query. Output
    * (query_id, rnk, doc_id, score) — score is the fixed-point BIGINT
    * sum, hash-exact vs the DuckDB oracle. */
  def q72Bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val qterms = bm25QueryTerms(spark)
    val scores = bm25Scores(docs, qterms, excludeSelf = false)
    topkPerQuery(scores, col("score").cast("double"), col("doc_id"),
        bm25K, "doc_id", "score", _.cast("long"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** q73: hybrid retrieval — reciprocal-rank fusion of a BM25 leg and
    * an exact-cosine leg, query-by-example on doc ids < 8.
    *
    * Each leg produces its top-20 with the SAME bounded TopKAgg shape
    * as q72 (no windows anywhere: at scale a per-query window would
    * sort every candidate on 8 partitions). Fusion is pure integer
    * math — contribution = 10^9 DIV (60 + rank) — so the fused score
    * is order-free and exact, like the BM25 fixed point. A doc absent
    * from one leg simply contributes nothing (the standard RRF
    * convention); at sf where `documents` outnumbers `embeddings`,
    * lexical-only candidates are expected and correct. The vector leg
    * reuses q35's bit-stable cosine (precomputed norms, left-fold
    * dot); its scale path is the [[IndexStore]] ANN probe — fusion is
    * rank-only, so swapping the leg swaps recall, not the operator. */
  def q73HybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // lexical leg: query terms = distinct tokens of the example docs
    val qterms = docs.filter(col("doc_id") < hybridQueries)
      .select(col("doc_id").as("query_id"),
        explode(tokens(col("text"))).as("token")).distinct()
    val lex = topkPerQuery(
      bm25Scores(docs, qterms, excludeSelf = true),
      col("score").cast("double"), col("doc_id"), hybridLegK,
      "id", "score", _.cast("long"))
    // vector leg: q35's exact shape at the same query ids
    val e = Similarity.prepped(spark, sfDir).filter(Similarity.validNorm)
    val qv = e.filter(col("vec_id") < hybridQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val cos = graft.functions.VectorFunctions
      .dotD(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val vecScored = broadcast(qv)
      .join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("id"), cos.as("cosine"))
    val vec = topkPerQuery(vecScored, col("cosine"), col("id"),
      hybridLegK, "id", "cosine", identity)
    rrfFuse(lex, vec)
  }

  /** RRF fusion of two ranked legs (each (query_id, rnk, id, ...)):
    * integer contributions, integer sum, bounded top-k — shared by
    * q73 (exact legs) and q75 (index-served legs) so the fusion
    * semantics cannot drift between them. */
  private[operators] def rrfFuse(lex: DataFrame, vec: DataFrame)
      : DataFrame = {
    val contrib = expr(
      s"CAST($rrfNumer AS BIGINT) div (CAST($rrfC AS BIGINT) + CAST(rnk AS BIGINT))")
    val fused = lex.select(col("query_id"), col("id"), contrib.as("c"))
      .unionByName(vec.select(col("query_id"), col("id"), contrib.as("c")))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("rrf"))
    topkPerQuery(fused, col("rrf").cast("double"), col("id"), hybridK,
        "id", "rrf", _.cast("long"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
