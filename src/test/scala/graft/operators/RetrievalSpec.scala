package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retrieval (q72 BM25, q73 hybrid RRF) — the oracle pins the full
  * formula against DuckDB; these tests pin the PLUMBING with an
  * independent hand-counted corpus (tf/df/dl/N/Σdl wiring, fan-out
  * dedup, self-exclusion) plus the rank/fusion invariants and
  * partitioning-independence of the bounded top-k path. */
class RetrievalSpec extends SparkSpec {

  /** Test-local twin of the quantized weight: same IEEE ops in the
    * same order over hand-counted inputs. Deliberately re-written
    * here (not imported) so a formula change in the operator breaks
    * the golden until BOTH are updated consciously. */
  private def wq(tf: Long, dl: Long, df: Long, nd: Double,
      sumdl: Double): Long = {
    val tfd = tf.toDouble
    val idf = (nd - df.toDouble + 0.5) / (df.toDouble + 0.5)
    val dlnorm = dl.toDouble * nd / sumdl
    val denom = tfd + 1.2 * (0.25 + 0.75 * dlnorm)
    math.floor(idf * (tfd * 2.2 / denom) * 1000000.0).toLong
  }

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25Scores: hand-counted tf/df/dl golden on a crafted corpus") {
    // d1="a a b" (dl 3), d2="a c" (dl 2), d3="b b b c" (dl 4)
    // N=3, sumdl=9; df(a)=2, df(b)=2, df(c)=2
    val docs = df(Seq(1L -> "a a b", 2L -> "a c", 3L -> "b b b c"))
    import spark.implicits._
    val qterms = Seq((0, "a"), (0, "b")).toDF("query_id", "token")
    val got = Retrieval.bm25Scores(docs, qterms, excludeSelf = false)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val exp = Map(
      (0, 1L) -> (wq(2, 3, 2, 3.0, 9.0) + wq(1, 3, 2, 3.0, 9.0)), // a×2, b×1
      (0, 2L) -> wq(1, 2, 2, 3.0, 9.0),                           // a×1
      (0, 3L) -> wq(3, 4, 2, 3.0, 9.0))                           // b×3
    assert(got === exp)
  }

  test("bm25Scores: a term shared by two queries keeps its single df") {
    // if df were counted AFTER the per-query fan-out, term a (in both
    // queries) would read df=4 and its idf would silently halve
    val docs = df(Seq(1L -> "a a b", 2L -> "a c", 3L -> "b b b c"))
    import spark.implicits._
    val qterms = Seq((0, "a"), (1, "a"), (1, "b")).toDF("query_id", "token")
    val got = Retrieval.bm25Scores(docs, qterms, excludeSelf = false)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got((0, 2L)) === wq(1, 2, 2, 3.0, 9.0))
    assert(got((1, 2L)) === wq(1, 2, 2, 3.0, 9.0))
  }

  test("bm25Scores: excludeSelf drops only the query's own doc") {
    val docs = df(Seq(1L -> "a a b", 2L -> "a c", 3L -> "b b b c"))
    import spark.implicits._
    val qterms = Seq((1L, "a")).toDF("query_id", "token")
    val ids = Retrieval.bm25Scores(docs, qterms, excludeSelf = true)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L)) // doc 1 excluded, doc 3 has no 'a'
  }

  test("q72: rank invariants — dense 1..k, scores non-increasing, " +
    "every hit shares a term with its query") {
    val out = Retrieval.q72Bm25TopK(spark, sfDir).collect()
    val byQ = out.groupBy(_.getInt(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rows.length))
      val scores = sorted.map(_.getLong(3)).toSeq
      assert(scores === scores.sorted(Ordering[Long].reverse))
      assert(rows.length <= Retrieval.bm25K)
    }
    // membership: each returned doc contains at least one query term
    val terms = Retrieval.bm25Queries.toMap
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toSet).toMap
    out.foreach { r =>
      val qts = terms(r.getInt(0)).split(' ').toSet
      assert(docs(r.getLong(2)).intersect(qts).nonEmpty)
    }
  }

  test("q73: fused ranks dense, no self-hit, every rrf value is a " +
    "feasible one- or two-leg contribution sum") {
    val out = Retrieval.q73HybridRrf(spark, sfDir).collect()
    val contribs = (1 to Retrieval.hybridLegK)
      .map(r => Retrieval.rrfNumer / (Retrieval.rrfC + r)).toSet
    val feasible = contribs ++
      (for (a <- contribs; b <- contribs) yield a + b)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rows.length))
      assert(rows.length <= Retrieval.hybridK)
      rows.foreach { r =>
        assert(r.getLong(2) !== q, "self-hit leaked through exclusion")
        assert(feasible.contains(r.getLong(3)),
          s"rrf ${r.getLong(3)} is not a legal contribution sum")
      }
    }
  }

  test("q72/q73 results are invariant to input partitioning") {
    // the bounded TopKAgg path must give identical answers whatever
    // the upstream split — reshuffle the session default and re-run
    val a = Retrieval.q72Bm25TopK(spark, sfDir).collect().toSeq
    val b = spark.sessionState.conf
    val old = b.numShufflePartitions
    try {
      spark.conf.set("spark.sql.shuffle.partitions", 7)
      val c = Retrieval.q72Bm25TopK(spark, sfDir).collect().toSeq
      assert(a === c)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
