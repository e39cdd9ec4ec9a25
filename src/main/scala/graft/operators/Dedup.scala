package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ArgExtremumAgg.{maxByAgg, minByAgg}
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Deduplication operators for a training-data pipeline: exact
  * (fingerprint hash), MinHash+LSH near-dup, SimHash near-dup, and
  * token-set Jaccard similarity join.
  *
  * Scale design (the point of every choice here):
  *  - **no all-pairs cross join anywhere** — candidate pairs come from
  *    equality joins on LSH band signatures (MinHash) or simhash bands,
  *    which shuffle on a high-cardinality key and stay linear-ish in
  *    corpus size; the quadratic step runs only inside tiny buckets;
  *  - exact verification (true Jaccard / true Hamming) prunes LSH false
  *    positives, so results are exact w.r.t. the declared threshold;
  *  - the SimHash banding (10 bands × 6 bits over a 60-bit hash) is a
  *    *guarantee*, not a heuristic: Hamming ≤ 9 implies at least one of
  *    10 bands is identical (pigeonhole), so at threshold 8 there are no
  *    false negatives;
  *  - MinHash banding (16 bands × 4 rows, 64 permutations) misses a
  *    Jaccard-0.9 pair with probability (1−0.9⁴)¹⁶ ≈ 4e-8;
  *  - all hashing is codegen'd built-ins (xxhash64 / md5-derived), no
  *    UDFs.
  */
object Dedup {

  // --- exact -------------------------------------------------------------

  /** Exact dedup with a deterministic keeper: the row with the smallest
    * tie-break value per fingerprint, as a MAP-SIDE-COMBINABLE aggregate
    * — `min_by(whole row, tie-break)` — never a window. A
    * `row_number() over partitionBy(fp)` keeper funnels EVERY copy of
    * the hottest fingerprint into one task, and real corpora are
    * exactly that skewed (billions of byte-identical boilerplate/empty
    * documents share one fingerprint); window partitions are also the
    * one shuffle shape AQE's skew handling cannot split. The aggregate
    * form reduces each map partition to one candidate row per
    * fingerprint before the shuffle, so the hot key moves O(partitions)
    * rows instead of O(copies) and no task ever holds a fingerprint's
    * full duplicate set.
    *
    * Deterministic iff `tieBreak` is unique within a fingerprint group
    * (every caller uses the table's primary key, `doc_id`); on a
    * genuine tie the kept row among the tied ones is engine-chosen —
    * identical to the `row_number` contract this replaces. Columns are
    * packed into the aggregation buffer, so callers that drop wide
    * columns afterwards should select them away BEFORE deduping (q30
    * does) — pruning cannot reach below the packed struct. */
  def exactDedup(df: DataFrame, fp: Column, tieBreak: Seq[Column]): DataFrame = {
    val cols = df.columns.toSeq
    // r19: typed minByAgg, not declarative min_by — the whole-row
    // struct buffer made min_by SORT-aggregate (each task sorted its
    // entire input by fingerprint just to keep one row per group); the
    // typed buffer plans as ObjectHashAggregate, one compare per row
    // (VERDICT r18 #6). Same values, same tie contract.
    df.groupBy(fp.as("__fp"))
      .agg(minByAgg(struct(cols.map(col): _*), struct(tieBreak: _*)).as("__row"))
      .select(cols.map(c => col(s"__row.`$c`").as(c)): _*)
  }

  /** q30: exact-dedup survivors of `documents` by content fingerprint.
    * Output columns are selected before the dedup so the scan reads
    * (and the keeper aggregate carries) only what the query returns —
    * see the pruning note on [[exactDedup]]. */
  def q30ExactDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("fp", fingerprint(col("text")))
      .select(col("doc_id"), col("fp"), col("lang"))
    exactDedup(d, col("fp"), Seq(col("doc_id")))
      .orderBy(col("doc_id"))
  }

  // --- MinHash + LSH -------------------------------------------------------

  /** Prime just above 2^32 for the universal-hash family. */
  private val P = 4294967311L
  val numHashes = 64
  val numBands = 16
  val rowsPerBand = 4

  /** Deterministic (a, b) coefficients; a*x+b stays < 2^62 for x < 2^32. */
  private val coeffs: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Seq.fill(numHashes)((1L + rng.nextInt((1 << 30) - 1).toLong,
      rng.nextInt(1 << 30).toLong))
  }

  /** Materialize a (small) derived frame once. The dedup operators all
    * self-join their tokenized corpus: without this, every join branch
    * re-scans the parquet and re-tokenizes (measured: 6 scans, zero
    * ReusedExchange in q33). Mechanism (localCheckpoint vs reliable
    * checkpoint) is the deployment seam in [[graft.Materialize]]. */
  private[operators] def materialize(df: DataFrame): DataFrame =
    graft.Materialize(df)

  /** (doc_id, sh) with distinct 3-word shingles; docs with < 3 tokens
    * cannot be near-dups and are dropped. */
  private def shingled(spark: SparkSession, sfDir: String): DataFrame =
    materialize(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), shingles3(col("text")).as("sh"))
        .filter(size(col("sh")) > 0))

  /** LSH band signatures: (doc_id, band, sig), numBands rows per doc.
    *
    * Shape: explode shingles → 64 permuted hashes per (doc, shingle) row
    * as plain projections → 64-way min hash-aggregate on doc_id. All
    * codegen'd arithmetic — the higher-order-function form
    * (array_min over transform) is CodegenFallback and was measured 30×
    * slower at sf0.1. One shuffle on doc_id, then bands explode.
    *
    * Why 64 DECLARATIVE `min(...)` columns and not one 64-slot
    * TypedImperativeAggregate (the [[graft.functions.SimHashAgg]]
    * shape): typed-buffer aggregates plan as ObjectHashAggregate, which
    * abandons hashing for SORT-based aggregation beyond
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128) distinct keys per task — on a corpus with one group
    * per document that means sorting the entire exploded shingle table.
    * Measured at 200k docs: the buffer-aggregate form was 3-5× SLOWER
    * end to end; declarative mins stay inside whole-stage codegen's
    * vectorized hash aggregate at any group count. (SimHashAgg is fine:
    * its alternative was 60 CASE-expression sums, not 60 cheap mins.) */
  def minhashBands(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("x", xxhash64(col("s")).bitwiseAND(lit(0xFFFFFFFFL)))
    val minCols = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min((col("x") * a + b) % P).as(s"mh$i")
    }
    val mh = ex.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val bands: Seq[Column] = (0 until numBands).map { j =>
      xxhash64((lit(j) +: (rowsPerBand * j until rowsPerBand * (j + 1))
        .map(i => col(s"mh$i"))): _*)
    }
    mh.select(col("doc_id"), posexplode(array(bands: _*)))
      .toDF("doc_id", "band", "sig")
  }

  /** Candidate pairs from any shared band bucket (equality join — the
    * only shuffle key is (band, sig)). */
  def lshCandidates(sig: DataFrame): DataFrame =
    sig.as("l")
      .join(sig.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

  /** MinHash-LSH candidate pairs exact-verified at `threshold` over the
    * given (doc_id, sh) frame — the reusable core of q31/q44.
    *
    * ORACLE-COUPLING CAVEAT (q31/q44/q50/q54): the DuckDB oracles for
    * these queries compute exact all-pairs Jaccard, so they agree with
    * this operator only when the 16×4 banding catches EVERY pair at or
    * above the threshold. Banding recall is 1-(1-j^4)^16: ~64% for a
    * pair at exactly j = 0.5, ~99% at j = 0.7, ~99.98% at j = 0.8. The
    * fixture's true pairs are near-identical replicas (j well above
    * 0.7), which is why the gate has always hash-matched. On a dataset dense in pairs sitting just above the
    * threshold the LSH result would (correctly, by design) be a strict
    * subset of the oracle's. That is the standard recall/efficiency
    * trade of banded MinHash, not a bug: an exact-at-threshold answer
    * is inherently all-pairs (q34's block-join shape). Raising
    * numBands (or lowering rowsPerBand) raises recall at more
    * candidate cost. */
  def nearDupPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val cand = lshCandidates(minhashBands(docs))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** q31: MinHash-LSH near-duplicate pairs, exact-verified at
    * Jaccard ≥ 0.5 over 3-word shingles. */
  def q31MinHashDedup(spark: SparkSession, sfDir: String): DataFrame =
    nearDupPairs(shingled(spark, sfDir), 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  /** q44: the composed corpus-cleaning pipeline a training run actually
    * executes — quality filter (≥ 15 tokens) → exact dedup
    * (deterministic keeper per fingerprint) → near-dup removal (drop
    * the larger doc_id of every verified MinHash pair among survivors)
    * → per-language corpus stats. Every stage is one of this engine's
    * operators; the whole thing is still just equality joins + windows
    * + aggregates. */
  def q44CorpusClean(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("tok_cnt", tokenCount(col("text")))
    val quality = d.filter(col("tok_cnt") >= 15)
    // ONE materialized pass for the deduped corpus (r18): the keeper
    // and the shingle table used to live on separate branches of the
    // same lineage, so the final per-language aggregate re-ran the
    // whole tokenize + fingerprint + dedup chain a second time (the
    // round-11 two-consumer rule). Checkpointing the keeper output
    // WITH its shingles and WITHOUT the raw text makes every
    // downstream branch (near-dup pairs twice, the final aggregate) a
    // cheap checkpoint read — one corpus tokenize per call instead of
    // two. Same rows, same expressions, same result.
    val unique = materialize(exactDedup(
        quality.withColumn("fp", fingerprint(col("text"))),
        col("fp"), Seq(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("tok_cnt"),
        shingles3(col("text")).as("sh")))
    val survivors = unique
      .select(col("doc_id"), col("sh"))
      .filter(size(col("sh")) > 0)
    val drop = nearDupPairs(survivors, 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    unique.join(drop, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_cnt")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  // --- SimHash -------------------------------------------------------------

  val simhashBits = 60
  val simhashBands = 10 // 6 bits each; guarantees recall for Hamming <= 9
  val hammingThreshold = 8

  /** (doc_id, simhash): majority vote per bit over the 60-bit md5-derived
    * shingle hashes — one explode + ONE custom aggregate
    * ([[graft.functions.SimHashAgg]]: a TypedImperativeAggregate with a
    * 60-vote buffer, partial-aggregated map-side like any sum). */
  def simhashes(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("h", h60(col("s")))
    ex.groupBy(col("doc_id"))
      .agg(graft.functions.SimHashAgg.simhashAgg(col("h")).as("simhash"))
  }

  /** q32: SimHash near-duplicate pairs at Hamming ≤ 8 — COMBINATION
    * banding (LSH AND-composition), exact, verified with bit_count.
    *
    * Plain banding (10 bands × 6 bits) is complete for Hamming ≤ 9 by
    * pigeonhole, but a 6-bit band has only 64 bucket values: at corpus
    * scale every (band, bval) bucket holds n/64 docs and the join
    * enumerates ~10·n²/64 candidate pairs — measured 311 s at 200k
    * docs, quadratic doom at 100 TB. The fix uses the slack the
    * threshold leaves: Hamming ≤ 8 can dirty at most 8 of the 10
    * bands, so at least C(2,2) = one PAIR of bands is clean — joining
    * on all 45 band-pairs with their CONCATENATED 12-bit values stays
    * complete (that clean pair is one of the keys) while the bucket
    * space grows 64× (2^12 vs 2^6): enumerations drop to 45·n²/4096 ≈
    * n²/91, a 14× enumeration cut (311 s → ~60 s measured end to
    * end; the residual is the simhash aggregation itself), at the price of
    * 45 instead of 10 index rows per doc. The same knob extends: with
    * b bands and threshold t, any (b−t)-subset of bands works as one
    * AND-key. The residual xor+popcount verify runs inside the join,
    * so only true pairs reach the distinct. For thresholds looser than
    * a few percent of the sketch width, banding narrows inherently —
    * q31's MinHash is the prescribed operator there. */
  def q32SimHashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = simhashes(shingled(spark, sfDir))
    val bandVal: Int => Column =
      j => shiftright(col("simhash"), 6 * j).bitwiseAND(63)
    val combos = for {
      i <- 0 until simhashBands
      j <- i + 1 until simhashBands
    } yield bandVal(i) * 64 + bandVal(j)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array(combos: _*)))
      .toDF("doc_id", "simhash", "bp", "bv")
    banded.as("l")
      .join(banded.as("r"),
        col("l.bp") === col("r.bp") && col("l.bv") === col("r.bv") &&
          col("l.doc_id") < col("r.doc_id") &&
          bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
            <= hammingThreshold)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
          .as("hamming"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- token-set Jaccard join ---------------------------------------------

  /** q33: within-source unigram-token Jaccard similarity join (≥ 0.9),
    * PPjoin-style:
    *
    *  1. **prefix filter** — under a global rarest-first token order,
    *     two sets with Jaccard ≥ t MUST share a token inside their
    *     first `|d| − ceil(t·|d|) + 1` tokens (else the remaining
    *     suffixes are too short to overlap enough). Only that prefix is
    *     indexed, so the inverted-index join sees ~t-fraction fewer
    *     postings on BOTH sides;
    *  2. **length filter** — J ≥ 0.9 forces 9·(na+nb) ≤ 19·min(na,nb),
    *     checked in exact integer arithmetic inside the join;
    *  3. **exact verify** — surviving candidate pairs (near-planted
    *     only) rejoin their full token arrays and compute true Jaccard.
    *
    * No false negatives at the declared threshold, no array-vs-array
    * work outside the tiny candidate set, and every join is an equality
    * join. The prefix filter only needs a consistent TOTAL ORDER on
    * tokens, and `(freq, tok)` already is one — the per-doc prefix
    * window sorts by that pair directly. (An earlier revision first
    * densified it into a global `row_number` rank, which funnels the
    * whole token dictionary through ONE partition-less WindowExec — a
    * single-task bottleneck at scale, for zero semantic gain.
    * PlanCheckSpec now pins the absence of partition-less windows.)
    * The doc-frequency side is a plain map-side-combinable aggregate;
    * its join back onto postings is left to AQE, which broadcasts it
    * when small and shuffles on the (high-cardinality) token key when
    * not. (History: naive all-pairs array_intersect 20 s at sf0.1 →
    * plain inverted index ~6 s → this.) */
  /** PPjoin prefix of each doc's postings: the (n − ⌈t·n⌉ + 1) rarest
    * tokens under the (freq, tok) total order, with their 1-based rank
    * `pos` — (source, doc_id, n, pos, tok).
    *
    * r19 (VERDICT r18 #3): per-doc bounded aggregate instead of the
    * former row_number window — the window EXCHANGED every posting on
    * doc_id and then SORTED each partition by (doc_id, freq, tok) just
    * to discard ~90% of rows at the rank filter. This form collects
    * each doc's (freq, tok) pairs in one hash aggregate (the session's
    * raised ObjectHashAggregate threshold keeps it hash-based at any
    * group count), sorts ONLY within each doc's own array (tokens are
    * unique per doc, so the struct sort order equals the window's
    * (freq, tok) order exactly), and slices the prefix BEFORE the
    * explode — value-identical rows, no partition-wide sort anywhere;
    * the per-doc variable k that a fixed-k TopKAgg cannot express is
    * just the slice length. DedupSpec pins both the plan shape (no
    * WindowExec) and row-identity against the window form. */
  private[operators] def jaccardPrefix(posting: DataFrame,
      t: Double): DataFrame = {
    val prefixLen = (col("n") - ceil(lit(t) * col("n")) + 1).cast("int")
    posting
      .groupBy(col("source"), col("doc_id"), col("n"))
      .agg(array_sort(collect_list(struct(col("freq"), col("tok"))))
        .as("fts"))
      .select(col("source"), col("doc_id"), col("n"),
        posexplode(slice(col("fts"), lit(1), prefixLen)))
      .select(col("source"), col("doc_id"), col("n"),
        (col("pos") + 1).cast("int").as("pos"),
        col("col.tok").as("tok"))
  }

  def q33SourceJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val t = 0.9
    val d = materialize(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), col("doc_id"),
          array_distinct(tokens(col("text"))).as("ts")))
    // per-token document frequency — no global rank, just the count
    val freq = d.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val posting = d
      .select(col("source"), col("doc_id"), size(col("ts")).as("n"),
        explode(col("ts")).as("tok"))
      .join(freq, "tok")
    // materialized: the prefix index is self-joined below, and without
    // this the freq-join + per-doc prefix pass would run once per branch
    val prefix = materialize(jaccardPrefix(posting, t))
    // POSITIONAL filter (the P in PPjoin), checked per candidate
    // generation: a pair first colliding at prefix positions (i, j) can
    // overlap on at most 1 + min(na−i, nb−j) tokens, which must reach
    // α = ⌈t/(1+t)·(na+nb)⌉ = ⌈9(na+nb)/19⌉. Safe: a true pair's FIRST
    // common token under the global order sits inside both prefixes
    // (prefix theorem) and that generation always passes the bound; the
    // distinct() keeps the pair if ANY generation survives. On corpora
    // with small vocabularies (where posting lists are long and the
    // prefix filter alone is weak) this prunes most of the candidate
    // set before the array-verify join (7.3M → 6.5M candidates even on
    // the probe corpus, whose 3-token prefixes rarely bind the bound).
    val alpha = ceil((lit(9) * (col("l.n") + col("r.n"))).cast("double") / 19)
    val cand = prefix.as("l")
      .join(prefix.as("r"),
        col("l.source") === col("r.source") && col("l.tok") === col("r.tok") &&
          col("l.doc_id") < col("r.doc_id") &&
          lit(9) * (col("l.n") + col("r.n")) <= lit(19) * least(col("l.n"), col("r.n")) &&
          lit(1) + least(col("l.n") - col("l.pos"), col("r.n") - col("r.pos"))
            >= alpha)
      .select(col("l.source").as("source"),
        col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val full = d.select(col("doc_id"), col("ts"))
    cand
      .join(full.select(col("doc_id").as("doc_a"), col("ts").as("ta")), "doc_a")
      .join(full.select(col("doc_id").as("doc_b"), col("ts").as("tb")), "doc_b")
      .select(col("source"), col("doc_a"), col("doc_b"),
        jaccard(col("ta"), col("tb")).as("jaccard"))
      .filter(col("jaccard") >= t)
      .orderBy(col("source"), col("doc_a"), col("doc_b"))
  }

  // --- winnowing fingerprint overlap ---------------------------------------

  val winnowK = 8 // character k-gram width
  val winnowW = 4 // winnowing window (guarantee: any match >= k+w-1 chars shares a fingerprint)
  val winnowDfCap = 20 // drop "stop fingerprints" seen in more docs
  val winnowMinShared = 5 // pair overlap threshold

  /** q46: containment-style near-dup pairs from winnowing fingerprints
    * (MOSS scheme) — docs sharing ≥ [[winnowMinShared]] selected
    * k-gram rolling hashes. Finds COPIED SPANS (plagiarism/boilerplate
    * containment), which set-similarity over whole-doc shingles (q31)
    * misses when the rest of the doc differs.
    *
    * Scale shape mirrors q33's inverted index: per-doc fingerprints are
    * ~n/w selected minima (the winnowing guarantee: every substring
    * match of length ≥ k+w−1 shares at least one SELECTED hash, so
    * recall for long clones is structural, not probabilistic); the
    * candidate join is an equality join on the fingerprint value; and
    * the df-cap drops boilerplate "stop fingerprints" FIRST — the
    * inverted-index analogue of q33's prefix filter — which caps every
    * posting-list bucket at [[winnowDfCap]]² pair emissions, keeping
    * the join linear-ish in corpus size instead of quadratic in the
    * hottest bucket. The per-doc fingerprinting itself is the O(n)
    * rolling-hash pass of [[graft.functions.WinnowFingerprints]]. */
  def q46WinnowPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = materialize(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.winnow(col("text"), winnowK, winnowW)
            .as("fps"))
        .filter(size(col("fps")) > 0))
    val ex = d.select(col("doc_id"), explode(col("fps")).as("fp"))
    // document frequency per fingerprint: df = 1 pairs with nothing,
    // df > cap is boilerplate — both leave the index before the join
    val keep = ex.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= winnowDfCap)
    val exf = materialize(ex.join(keep.select(col("fp")), "fp"))
    exf.as("a")
      .join(exf.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= winnowMinShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- contamination screen ------------------------------------------------

  val contamProbes = 10 // doc_id < 10 play the held-out benchmark set
  val contamMinShingles = 5 // distinct shared shingles to flag a doc

  /** q53: train/benchmark contamination screen — which corpus docs
    * overlap a (small) held-out evaluation set at the n-gram level,
    * the decontamination pass every serious training-data pipeline
    * runs before training. A corpus doc is flagged when it shares ≥
    * [[contamMinShingles]] distinct 3-word shingles with the benchmark;
    * the report carries the shingle count and how many distinct
    * benchmark docs it collides with.
    *
    * Scale shape: the benchmark side is tiny and the corpus side
    * explodes to (shingle, doc) postings, so the collision test is an
    * equality join on the shingle string against a broadcast-able probe
    * index — linear in corpus size, never pairwise in the corpus. */
  def q53Contamination(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingled(spark, sfDir)
    val probes = sh.filter(col("doc_id") < contamProbes)
      .select(col("doc_id").as("probe_id"), explode(col("sh")).as("sg"))
    val corpus = sh.filter(col("doc_id") >= contamProbes)
      .select(col("doc_id"), explode(col("sh")).as("sg"))
    corpus.join(broadcast(probes), "sg")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sg")).as("n_shingles"),
        countDistinct(col("probe_id")).as("n_probes"))
      .filter(col("n_shingles") >= contamMinShingles)
      .orderBy(col("doc_id"))
  }

  /** q60: [[q53Contamination]] with a Bloom prefilter on the corpus
    * side — the SAME answer (the driver checks it against q53's
    * oracle verbatim), a different scale shape. q53's broadcast of
    * the exact probe postings stops working once the benchmark set's
    * exploded shingle strings outgrow executor memory; its Bloom
    * sketch does not (1%-fpp is ~12 MB per 10M distinct shingles —
    * sketch size is independent of string length). The corpus side
    * then probes the sketch INSIDE whole-stage codegen
    * ([[graft.functions.BloomMightContain]]) and only the surviving
    * ~1%+collisions reach the exact join, which removes the false
    * positives — so at the scale where the exact join must shuffle,
    * it shuffles ~1% of the corpus postings instead of all of them.
    * False negatives cannot occur, which the shared oracle pins.
    *
    * The sketch itself is built distributed (one pass over the probe
    * postings, mergeable partials) and only the fixed-size filter
    * returns to the driver — not a collect of the data. */
  def q60ContaminationBloom(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val sh = shingled(spark, sfDir)
    val probes = sh.filter(col("doc_id") < contamProbes)
      .select(col("doc_id").as("probe_id"), explode(col("sh")).as("sg"))
    val corpus = sh.filter(col("doc_id") >= contamProbes)
      .select(col("doc_id"), explode(col("sh")).as("sg"))
    // expectedNumItems sizes the sketch; the count is one cheap
    // action on the tiny probe side
    val nProbe = probes.select("sg").distinct().count()
    val bloom = probes.stat.bloomFilter("sg", math.max(nProbe, 64L), 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val pre = corpus.filter(Bridge.column(graft.functions.BloomMightContain(
      Bridge.expression(col("sg")), bytes)))
    pre.join(broadcast(probes), "sg")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sg")).as("n_shingles"),
        countDistinct(col("probe_id")).as("n_probes"))
      .filter(col("n_shingles") >= contamMinShingles)
      .orderBy(col("doc_id"))
  }

  // --- incremental ingest ---------------------------------------------------

  /** Incoming docs with a VERIFIED near-dup (Jaccard ≥ threshold over
    * 3-word shingles) anywhere in the corpus — the asymmetric
    * (increment × corpus) form of [[nearDupPairs]], taking the corpus
    * side as PRE-COMPUTED index frames: `corpusBands` (doc_id, band,
    * sig — [[minhashBands]] output, deterministic across JVMs, so it
    * can be persisted once and appended to) and `corpusSh` (doc_id,
    * sh) for the exact verify. Per-batch COMPUTE is then proportional
    * to the increment (shingling + 64 permutations over batch docs
    * only); corpus-side cost is the IO of the two index scans feeding
    * the equality joins — at real scale both indexes live bucketed on
    * their join keys ([[Layout]]) so even that IO is co-located and
    * shuffle-free. Same banding-recall caveat as [[nearDupPairs]]. */
  def crossNearDupIdsIndexed(incSh: DataFrame, corpusBands: DataFrame,
      corpusSh: DataFrame, threshold: Double): DataFrame = {
    // the id-inequality guard matters only when an increment doc's own
    // rows are already IN the persisted index (ingest crash-replay
    // after the index append, before the corpus append): a doc must
    // never be dropped as a near-dup of itself. It does NOT protect a
    // doc from ANOTHER uncommitted doc's orphaned rows — a caller
    // replaying against persisted indexes must first restrict them to
    // committed corpus doc_ids (as the streaming sink does); otherwise
    // two mutually-near-dup docs in one crashed batch would drop each
    // other on replay
    val cand = minhashBands(incSh).as("l")
      .join(corpusBands.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") =!= col("r.doc_id"))
      .select(col("l.doc_id").as("doc_in"), col("r.doc_id").as("doc_corp"))
      .distinct()
    // exact verify, corpus side FIRST with the candidate pairs
    // broadcast: when `corpusSh` carries the writer's `pfx` layout
    // column ([[withShPfx]] — the streaming sink persists the shingle
    // index partitioned by it), joining on (pfx, doc_id) under a
    // broadcast build lets dynamic partition pruning restrict the
    // shingle-index scan to the candidates' directories — the heavy
    // array column is read only for docs that actually matched a band
    // bucket (zero directories when no candidates), instead of a full
    // per-batch corpus scan. The broadcast side is bare id pairs,
    // bounded by the increment's band rows × bucket width — the same
    // boundedness argument as the band join itself. Un-partitioned
    // corpusSh (the one-shot q59 form) takes the plain equality join.
    val hasPfx = corpusSh.columns.contains("pfx")
    val corpSel =
      if (hasPfx)
        corpusSh.select(col("pfx"),
          col("doc_id").as("doc_corp"), col("sh").as("shb"))
      else corpusSh.select(col("doc_id").as("doc_corp"), col("sh").as("shb"))
    val candKeyed = graft.Materialize(
      if (hasPfx) cand.withColumn("pfx", shPfx(col("doc_corp")))
      else cand)
    // broadcast is what makes the corpus-side partition pruning fire,
    // but the candidate set is only PROBABLY small: a corpus rich in
    // sub-threshold template clusters (Jaccard just under the dedup
    // threshold, all legitimately kept) hands every batch doc of that
    // template a band bucket proportional to the cluster — a forced
    // broadcast would then OOM the driver where a shuffle join
    // completes. The pairs are materialized anyway (the verify needs
    // them), so one cheap count picks the strategy; above the cap the
    // join shuffles and the pruning is forfeit — at that candidate
    // volume the verify work dominates the shingle scan regardless
    val joinKeys = if (hasPfx) Seq("pfx", "doc_corp") else Seq("doc_corp")
    val verified =
      if (candKeyed.count() <= candBroadcastCap)
        corpSel.join(broadcast(candKeyed), joinKeys)
      else corpSel.join(candKeyed, joinKeys)
    verified
      .join(incSh.select(col("doc_id").as("doc_in"), col("sh").as("sha")),
        "doc_in")
      .filter(jaccard(col("sha"), col("shb")) >= threshold)
      .select(col("doc_in")).distinct()
  }

  /** Candidate-pair broadcast cap for [[crossNearDupIdsIndexed]]'s
    * exact-verify join: ~2M (doc_in, doc_corp, pfx) rows ≈ 50 MB —
    * comfortably under driver limits, far above any deployment-shaped
    * batch's band matches. */
  private val candBroadcastCap = 2000000L

  /** [[crossNearDupIdsIndexed]] with the corpus band index computed
    * in-query — the one-shot form (q59); a standing pipeline persists
    * the bands instead (see [[graft.streaming.StreamOps
    * .incrementalIngestStream]]). */
  def crossNearDupIds(incSh: DataFrame, corpusSh: DataFrame,
      threshold: Double): DataFrame =
    crossNearDupIdsIndexed(incSh, minhashBands(corpusSh), corpusSh, threshold)

  /** Clean an incoming batch against a standing corpus (both carrying
    * at least `doc_id`, `text`): intra-batch exact dedup, fingerprint
    * anti-join against the corpus, then the asymmetric near-dup screen
    * ([[crossNearDupIds]]). Returns the admitted batch rows (original
    * columns + `fp`). An empty corpus admits every batch-unique row —
    * the bootstrap case for a brand-new corpus.
    *
    * WITHIN-batch near-dups are deliberately NOT screened (only exact):
    * the increment-vs-corpus contract keeps per-batch cost linear in
    * the batch; a pipeline that also wants intra-batch near-dup
    * removal composes [[nearDupPairs]] over the batch first (q44's
    * shape) before handing it here. */
  def cleanIncrement(incoming: DataFrame, corpus: DataFrame,
      threshold: Double): DataFrame = {
    val corpusSh = materialize(shingleIndex(corpus))
    cleanIncrementIndexed(incoming,
      corpus.select(fingerprint(col("text")).as("fp")).distinct(),
      minhashBands(corpusSh), corpusSh, threshold)
  }

  /** The (doc_id, sh) frame the ingest indexes persist. */
  def shingleIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Directory-bucket count for the persisted shingle index: the sink
    * writes `<corpus>__sh` partitioned by [[shPfx]] so the exact-verify
    * join prunes to the candidate docs' directories (see
    * [[crossNearDupIdsIndexed]]). 32 = one bucket per local core; at
    * cluster scale this grows with the corpus (like the ANN index's
    * nlist) so a bucket stays one task's worth of shingle rows. A
    * CONSTANT per index instance — the pfx values baked into an index's
    * directories must match the probe-side [[shPfx]] of every later
    * reader, so changing it requires rebuilding the index
    * ([[graft.sources.Maintenance.compactIngestIndexes]]). */
  val shPfxBuckets = 32

  /** The shingle-index layout key: a stable hash-bucket of doc_id.
    * Plain modulo (not a hash) — doc_ids are already arbitrary; int
    * type so the value survives a partition-directory round-trip with
    * the same type Spark's path inference assigns. */
  def shPfx(docId: Column): Column =
    pmod(docId, lit(shPfxBuckets.toLong)).cast("int")

  /** [[shingleIndex]] rows carrying their layout key — the frame the
    * streaming sink writes `partitionBy("pfx")`. */
  def withShPfx(sh: DataFrame): DataFrame =
    sh.withColumn("pfx", shPfx(col("doc_id")))

  /** [[cleanIncrement]] against PRE-COMPUTED corpus indexes — the form
    * a standing ingest pipeline runs so per-batch compute never
    * re-fingerprints, re-shingles, or re-hashes the corpus:
    * `corpusFp` (fp), `corpusBands` ([[minhashBands]] rows), `corpusSh`
    * ((doc_id, sh) for the exact verify). All three are deterministic
    * functions of admitted docs, so they persist and APPEND alongside
    * the corpus. */
  def cleanIncrementIndexed(incoming: DataFrame, corpusFp: DataFrame,
      corpusBands: DataFrame, corpusSh: DataFrame,
      threshold: Double): DataFrame = {
    val batchUnique = exactDedup(
      incoming.withColumn("fp", fingerprint(col("text"))),
      col("fp"), Seq(col("doc_id")))
    // NULL-SAFE anti-join (<=>): a null-text doc fingerprints to a
    // NULL fp, and an equi-key anti-join never matches NULL keys — a
    // corpus already holding one null-text doc would then re-admit
    // another from EVERY batch (the intra-batch exactDedup groups
    // NULL fps into one keeper, so the cross screen must treat them
    // as equals too; the near-dup screen can't catch them either —
    // shingleIndex filters token-less docs out)
    val fresh = materialize(
      batchUnique.alias("__b").join(corpusFp.alias("__c"),
          col("__b.fp") <=> col("__c.fp"), "left_anti")
        .select(batchUnique.columns.map(c => col(s"__b.`$c`").as(c)): _*))

    val freshSh = materialize(shingleIndex(fresh))
    val nearDup =
      crossNearDupIdsIndexed(freshSh, corpusBands, corpusSh, threshold)
        .withColumnRenamed("doc_in", "doc_id")

    fresh.join(nearDup, Seq("doc_id"), "left_anti")
  }

  /** q59: incremental corpus ingest — the shape a production pipeline
    * actually runs at 100 TB. The standing corpus is NOT re-deduped
    * nightly; each incoming batch is cleaned against it:
    *
    *   1. intra-batch exact dedup (deterministic keeper);
    *   2. exact cross-dedup — anti-join of batch fingerprints against
    *      corpus fingerprints (at scale the corpus side is a persisted
    *      fingerprint index, e.g. a [[Layout]]-bucketed table on fp,
    *      making this anti-join co-located and shuffle-free);
    *   3. near-dup cross screen — [[crossNearDupIds]] at 0.5 drops
    *      batch docs near-duplicating the corpus (at scale the corpus
    *      band signatures are likewise persisted and incrementally
    *      appended, so per-batch cost is |batch| × bands, never
    *      |corpus|);
    *   4. survivors are admitted.
    *
    * The fixture splits `documents` 80/20 by doc_id into standing
    * corpus / incoming batch. Returns the admitted rows. */
  def q59IncrementalIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    cleanIncrement(
      d.filter(col("doc_id") % 5 === 0), d.filter(col("doc_id") % 5 =!= 0), 0.5)
      .select(col("doc_id"), col("fp"), col("lang"))
      .orderBy(col("doc_id"))
  }

  // --- duplicate clusters (connected components) ---------------------------

  /** Connected components over an undirected edge list by distributed
    * min-label propagation: every vertex starts as its own component
    * and repeatedly adopts the smallest component id among itself and
    * its neighbors, until a fixpoint. Each round is one equality join +
    * one map-side-combinable min-aggregate; the loop runs on the
    * driver but touches only a per-round CHANGED-COUNT scalar, and each
    * round's labels are localCheckpoint'ed so the plan doesn't grow
    * with the iteration count. Rounds needed = graph diameter — fine
    * for dedup graphs (tight clumps of near-identical docs); for
    * adversarial long-chain graphs the alternating large-star/
    * small-star variant (Kiveris et al.) drops it to O(log n) with the
    * same per-round join shape.
    *
    * Exhausting `maxRounds` while labels are still moving THROWS:
    * partially-propagated labels are silently-wrong cluster answers
    * (two docs of one component reported as two), and the caller can't
    * tell them from converged ones. A >maxRounds-diameter dedup graph
    * is a signal to switch to [[connectedComponentsStar]], not to
    * truncate. */
  def connectedComponents(pairs: DataFrame, src: String, dst: String,
      maxRounds: Int = 64): DataFrame = {
    val edges = materialize(
      pairs.select(col(src).as("u"), col(dst).as("v"))
        .union(pairs.select(col(dst).as("u"), col(src).as("v"))))
    var labels = materialize(
      edges.select(col("u").as("vtx")).distinct()
        .withColumn("comp", col("vtx")))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val nb = edges
        .join(labels.select(col("vtx").as("v"), col("comp").as("ncomp")), "v")
        .groupBy(col("u").as("vtx")).agg(min(col("ncomp")).as("best"))
      // the moved count rides the materialize action itself
      // (Dataset.observe → CollectMetrics, delivered by the eager
      // checkpoint's own job): the former separate count() was one
      // extra driver action per round (VERDICT r18 #4 — fold the
      // convergence signal into the checkpoint)
      val obs = new org.apache.spark.sql.Observation()
      val next = materialize(
        labels.join(nb, Seq("vtx"), "left")
          .select(col("vtx"),
            least(col("comp"), coalesce(col("best"), col("comp"))).as("comp"),
            (col("best") < col("comp")).as("moved"))
          .observe(obs,
            sum(when(col("moved"), 1L).otherwise(0L)).as("moved")))
      changed = obs.get("moved") match {
        case null => 0L
        case x => x.asInstanceOf[Long]
      }
      labels = next.drop("moved")
      rounds += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds rounds " +
        s"($changed labels still moving): graph diameter exceeds the " +
        "round cap; use connectedComponentsStar (O(log n) rounds) or " +
        "raise maxRounds")
    labels
  }

  /** q54: the FULL corpus-assembly pipeline a modern training run
    * executes, as one Spark DAG — every stage one of this engine's
    * operators, end-to-end hash-checked against a pure-SQL oracle:
    *
    *  1. quality filter (≥ 15 tokens),
    *  2. exact dedup (deterministic min-id keeper per fingerprint),
    *  3. CLUSTER-based near-dup dedup — connected components over
    *     exact-verified MinHash pairs, keep each cluster's canonical
    *     (minimum-id) member: strictly better retention than q44's
    *     pairwise drop-the-larger rule, which can delete every member
    *     of a chain-shaped cluster except by luck,
    *  4. decontamination against the held-out probe set (q53's rule),
    *  5. deterministic stratified sampling at q52's per-language rates,
    *  6. per-language corpus statistics.
    *
    * Scale: stages compose without materializing anything but the two
    * self-joined shingle tables; the only iteration (connected
    * components) touches just the near-dup pair graph — vanishingly
    * small next to the corpus — and every join in sight is an equality
    * join. */
  def q54CorpusV2(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("tok_cnt", tokenCount(col("text")))
    val quality = d.filter(col("tok_cnt") >= 15)
    // one materialized tokenize+dedup+shingle pass, shared by every
    // branch (pairs, contamination, the final sample aggregate) —
    // q44's r18 restructure, same rows and expressions
    val uniq = materialize(exactDedup(
        quality.withColumn("fp", fingerprint(col("text"))),
        col("fp"), Seq(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("tok_cnt"),
        shingles3(col("text")).as("sh")))
    // near-dup clusters among survivors: drop non-canonical members
    val sh2 = uniq
      .select(col("doc_id"), col("sh"))
      .filter(size(col("sh")) > 0)
    val clusterDrop = connectedComponents(
      nearDupPairs(sh2, 0.5), "doc_a", "doc_b")
      .filter(col("vtx") =!= col("comp"))
      .select(col("vtx").as("doc_id"))
    // contamination vs the raw benchmark probes (q53 semantics).
    // Shingle ONLY the probe rows: `shingled()` eagerly materializes
    // the WHOLE corpus's shingle table, and the doc_id filter cannot
    // push below an eager checkpoint — q54 would tokenize+shingle the
    // full corpus a second time (sh2 already covers the survivors) to
    // read ~contamProbes rows. Filter-then-shingle is O(probes);
    // exploding an empty shingle array yields no rows, so the
    // size(sh) > 0 guard is implied.
    val pe = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < contamProbes)
      .select(explode(shingles3(col("text"))).as("sg")).distinct()
    val contam = sh2.filter(col("doc_id") >= contamProbes)
      .select(col("doc_id"), explode(col("sh")).as("sg"))
      .join(broadcast(pe), "sg")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sg")).as("ns"))
      .filter(col("ns") >= contamMinShingles)
      .select(col("doc_id"))
    val clean = uniq.filter(col("doc_id") >= contamProbes)
      .join(clusterDrop, Seq("doc_id"), "left_anti")
      .join(contam, Seq("doc_id"), "left_anti")
    // deterministic stratified sample — q52's exact rule by
    // construction: saltedBucket is "the ONE membership rule" (its
    // oracle twin is SparkEntry.bucketSql) and sampleRateExpr the one
    // rate ladder; an inline copy here would silently desync from the
    // oracle pair on any future change to either
    val bucket = graft.functions.TextFunctions.saltedBucket(
      col("doc_id"), "sample", 100)
    clean.filter(bucket < TextAnalysis.sampleRateExpr)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_cnt")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** Connected components by ALTERNATING STARS (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"): each round every
    * node u re-wires its neighborhood toward m = min(N(u) ∪ {u}) —
    * large-star moves the strictly-larger neighbors, small-star the
    * smaller-or-equal ones — and the edge set provably converges to a
    * star forest labeling every vertex with its component minimum in
    * O(log n) rounds REGARDLESS of graph diameter (each round is two
    * join+min-aggregate passes, same per-round shape as
    * [[connectedComponents]]). Use this over the plain propagation
    * when clusters can be chain-shaped (propagation needs diameter
    * rounds: a 1M-doc boilerplate chain would need 1M passes; this
    * needs ~20). Results are identical — the fuzz spec pins both
    * algorithms to each other on random graphs. */
  def connectedComponentsStar(pairs: DataFrame, src: String, dst: String,
      maxRounds: Int = 40): DataFrame = {
    // One star pass. Returns the rewired edge set plus a MOVED count —
    // the number of (u,v) rows whose rewire target differs from the
    // edge they came from. moved == 0 certifies the pass was a set-level
    // no-op (every row maps to itself and attachments are existing
    // edges), so "movedL + movedS == 0" is an exact convergence test
    // costing one cheap count on the already-materialized join — the
    // round's former convergence check was TWO exceptAll shuffle-diffs
    // over the full edge set, pure waste at scale. Per-edge "unchanged"
    // means {v, m(u)} == {u, v}: for large-star (v > u) that is
    // m(u) == u (m(u) <= u < v rules out m == v); small-star (v <= u)
    // additionally allows m(u) == v (the rewire collapses to a self-loop
    // and the center attachment (u, m(u)) == (u, v) restores the edge).
    def star(edges: DataFrame, large: Boolean): (DataFrame, Long) = {
      val nb = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val m = nb.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      // the (u, v, m(u)) join is the pass's workhorse — materialize it
      // once; the moved count, the rewire, and the center attachment
      // are all cheap derivations of it. r19 (VERDICT r18 #4): the
      // moved count rides the materialize action via Dataset.observe —
      // the former separate count() cost one extra driver action per
      // star pass (two per round)
      val dir = if (large) col("v") > col("u") else col("v") <= col("u")
      val movedCond =
        if (large) col("m") =!= col("u")
        else col("m") =!= col("u") && col("m") =!= col("v")
      val obs = new org.apache.spark.sql.Observation()
      val joined = materialize(nb.join(m, "u")
        .observe(obs,
          sum(when(dir && movedCond, 1L).otherwise(0L)).as("moved")))
      val moved = obs.get("moved") match {
        case null => 0L
        case x => x.asInstanceOf[Long]
      }
      // keep each center attached to its min so components never split
      val out = joined.filter(dir)
        .select(col("v").as("u"), col("m").as("v"))
        .union(joined.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      (out, moved)
    }
    var edges = materialize(
      pairs.select(col(src).as("u"), col(dst).as("v"))
        .filter(col("u") =!= col("v")).distinct())
    val verts = edges.select(col("u").as("vtx"))
      .union(edges.select(col("v").as("vtx"))).distinct()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val (ls, movedL) = star(edges, large = true)
      val (next, movedS) = star(ls, large = false)
      changed = movedL + movedS
      edges = next
      rounds += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxRounds rounds " +
        s"($changed edges still moving) — raise maxRounds (the star " +
        "algorithm needs O(log n) rounds, so hitting a 40-round cap " +
        "means something is structurally wrong with the edge input)")
    // converged star forest: every edge is (member, component-min)
    val members = edges.select(col("u").as("vtx"), col("v").as("comp"))
      .union(edges.select(col("v").as("vtx"), col("u").as("comp")))
      .groupBy(col("vtx")).agg(min(col("comp")).as("comp"))
      .withColumn("comp", least(col("comp"), col("vtx")))
    verts.join(members, Seq("vtx"), "left")
      .select(col("vtx"), coalesce(col("comp"), col("vtx")).as("comp"))
  }

  /** q50: duplicate CLUSTERS — the transitive closure the pairwise
    * near-dup queries stop short of. Edges are q31's exact-verified
    * MinHash pairs (Jaccard ≥ 0.5); output is every clustered doc with
    * its canonical (minimum) member id and the cluster size. A corpus
    * clean that keeps one doc per CLUSTER (rather than dropping the
    * larger id of each pair) needs exactly this. */
  def q50DedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = nearDupPairs(shingled(spark, sfDir), 0.5)
    // the O(log n) star algorithm carries the driver query; q54 runs
    // the plain propagation, so the oracle gate exercises both
    // materialized: consumed by BOTH the size aggregate and the join
    // below — without this the star forest's final labeling pass (vertex
    // union + member min + left join) executes once per branch
    val labels = materialize(connectedComponentsStar(pairs, "doc_a", "doc_b")
      .select(col("vtx").as("doc_id"), col("comp").as("cluster_id")))
    // cluster size as a map-side-combinable aggregate joined back —
    // never count().over(partitionBy(cluster_id)): dedup graphs have
    // exactly the mega-cluster skew (one boilerplate clump spanning a
    // large corpus fraction) that funnels a window partition into one
    // task, and window partitions are the shuffle shape AQE's skew
    // handling cannot split (same argument as [[exactDedup]]'s keeper)
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("n_members"))
      .orderBy(col("doc_id"))
  }

  /** q77: QUALITY-keeper cluster clean — one kept representative per
    * near-dup cluster, chosen by q21's quality score instead of q50's
    * canonical min-id. This is the selection rule production corpus
    * cleans actually run (FineWeb/Gopher-style: among near-duplicates,
    * keep the best document, not the lowest-numbered one): clusters
    * are q50's exact-verified MinHash components, the score is q21's
    * tok_cnt × (1 − stop_ratio) — per-row double trees, bit-portable
    * against the oracle — and ties break to the LOWEST doc_id.
    *
    * Scale shape: the labels come from the O(log n) alternating-star
    * CC; scoring touches only CLUSTERED docs (inner join prunes the
    * corpus scan to cluster members); the keeper is ONE map-side-
    * combinable `max_by` aggregate with the tie-break encoded in its
    * ordering key — no window over cluster_id (dedup graphs have
    * exactly the mega-cluster skew that funnels a window partition
    * into one task; same argument as [[exactDedup]]'s keeper and
    * q50's sizes).
    *
    * Clustered docs always score non-NULL: membership requires a
    * shingle (≥ [[graft.functions.TextFunctions]] shingle width
    * tokens), so tok_cnt ≥ 1 and the NULLIF guard never fires — the
    * max_by ordering never compares a NULL score. */
  def q77ClusterKeeper(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = nearDupPairs(shingled(spark, sfDir), 0.5)
    val labels = materialize(connectedComponentsStar(pairs, "doc_a", "doc_b")
      .select(col("vtx").as("doc_id"), col("comp").as("cluster_id")))
    val scored = Tables.load(spark, sfDir, "documents")
      .join(labels, Seq("doc_id"))
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("cluster_id"),
        (when(col("toks").isNotNull, size(col("toks"))).cast("double") *
          (lit(1.0) - wordRatio(col("toks"), TextAnalysis.stopwords)))
          .as("score"))
    scored.groupBy(col("cluster_id"))
      .agg(
        // r19: typed maxByAgg (hash, not sort — see exactDedup)
        maxByAgg(struct(col("doc_id"), col("score")),
          struct(col("score"), (-col("doc_id")).as("nid"))).as("k"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("k.doc_id").as("kept_id"),
        col("k.score").as("kept_score"), col("n_members"))
      .orderBy(col("cluster_id"))
  }

  /** Words per sub-document segment for [[q63SegmentDedup]]. */
  val segmentWords = 8

  /** q63: SUB-document exact dedup — the C4/RefinedWeb-style span pass
    * that whole-document dedup (q30) structurally misses: boilerplate
    * repeated ACROSS otherwise-distinct documents (headers, footers,
    * license blocks, templated paragraphs). Real pipelines drop
    * duplicated lines/paragraphs corpus-wide; this fixture's documents
    * are single-line, so the unit is a fixed [[segmentWords]]-word
    * segment of the normal form — same operator shape, fixture-sized
    * units.
    *
    * Scale shape: one explode to (doc_id, seg_idx, segment), then the
    * corpus-wide keeper is ONE hash aggregate on the segment's md5
    * FINGERPRINT — `min(struct(doc_id, seg_idx, seg))` (the q30 keeper
    * rule generalized to spans; the unique (doc_id, seg_idx) prefix
    * decides, the text rides along) — map-side combinable, so no
    * window over a giant partition anywhere and the hottest
    * boilerplate fingerprint moves O(partitions) candidate rows, not
    * O(copies). Carrying the text inside the aggregate means the
    * keeper shuffle moves each DISTINCT segment at most once per map
    * partition and the former verify join (which re-shuffled every
    * copy of the corpus text on the composite key) disappears; the
    * only other text movement is the survivors' reassembly
    * groupBy(doc_id) with the array_sort(collect_list) pattern —
    * order restored from seg_idx, no re-sort of the corpus. The
    * per-doc totals aggregate shuffles counts only. Dropping ALL of a
    * document's segments leaves an empty clean_text row (the document
    * was pure boilerplate), not a missing row. */
  def q63SegmentDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val sw = segmentWords
    // coalesce BEFORE tokenizing, and a RAW split (not
    // TextFunctions.tokens, which maps blank text to the EMPTY list):
    // this operator's contract is "no document vanishes", which
    // includes null/blank-text documents — they must keep the
    // one-empty-token list so they yield exactly one (empty) segment
    // and so one clean_text row. The oracle twin (toksNn in
    // SparkEntry) is the same raw string_split for the same reason.
    // materialized at the TOKEN level, not the segment level: toks is
    // consumed by two branches (the segment keeper and the per-doc
    // totals), so without this the dominant normalize+split regex
    // runs twice per doc (q33's measured lesson) — while
    // materializing the EXPLODED segment table instead would
    // checkpoint a corpus-sized-times-segments frame just to avoid a
    // projection
    val toks = materialize(Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        split(graft.functions.TextFunctions.normText(
          coalesce(col("text"), lit(""))), " ").as("t"))
      .filter(size(col("t")) >= 1))
    val segs = toks
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((size(col("t")) + lit(sw - 1)) / sw).cast("int") - 1))
          .as("seg_idx"),
        col("t"))
      .select(col("doc_id"), col("seg_idx"),
        array_join(slice(col("t"), col("seg_idx") * sw + 1, lit(sw)), " ")
          .as("seg"))
      .withColumn("fp", md5(col("seg")))
    // r19: typed minByAgg (hash, not sort — see exactDedup). The
    // ordering key is the unique (doc_id, seg_idx) prefix alone; seg
    // is payload-only, exactly the "text rides along" contract above.
    val kept = segs.groupBy(col("fp"))
      .agg(minByAgg(struct(col("doc_id"), col("seg_idx"), col("seg")),
        struct(col("doc_id"), col("seg_idx"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.seg_idx").as("seg_idx"),
        col("k.seg").as("seg"))
    // per-doc segment count DERIVED from the token array — exactly
    // segs.groupBy(doc_id).count() (each doc emits ceil(|t|/sw)
    // segments by construction), without generating a single segment
    // row or shuffling anything: an O(docs) projection off the
    // materialized toks
    val totals = toks.select(col("doc_id"),
      floor((size(col("t")) + lit(sw - 1)) / sw).cast("long").as("n_segs"))
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("seg_idx"), col("seg"))))
          .as("pm"),
        count(lit(1)).as("n_kept"))
      .select(col("doc_id"),
        array_join(col("pm").getField("seg"), " ").as("clean_text"),
        col("n_kept"))
    totals.join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_segs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      .orderBy(col("doc_id"))
  }
}
