package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

/** Dedup operator behavior on the real documents fixture (sf0.001) plus
  * synthetic planted cases. The LSH paths must agree with the exact
  * brute-force computation — MinHash banding at these parameters has a
  * ~4e-8 miss probability per true pair; SimHash banding is exact by
  * pigeonhole. */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("exactDedup keeps exactly one deterministic row per fingerprint") {
    val df = Seq(
      (1L, "the cat  sat"), (2L, "THE CAT SAT"), (3L, "other text here"))
      .toDF("doc_id", "text")
    val got = Dedup.exactDedup(
      df.withColumn("fp", fingerprint(col("text"))),
      col("fp"), Seq(col("doc_id")))
    // normalization collapses case+whitespace → docs 1,2 collide; keeper
    // is the smallest doc_id
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("exactDedup keeps ONE row even for fully duplicated rows") {
    // the ingest-replay shape: a batch can carry byte-identical rows
    // (same doc_id AND same text), so the keeper must collapse ties on
    // the tie-break itself to one survivor — a keeper that joins back
    // on (fp, tie-break) equality would keep every tied copy and a
    // replayed batch would admit duplicates into the corpus
    val df = Seq(
      (7L, "same doc twice"), (7L, "same doc twice"), (9L, "distinct"))
      .toDF("doc_id", "text")
    val got = Dedup.exactDedup(
      df.withColumn("fp", fingerprint(col("text"))),
      col("fp"), Seq(col("doc_id")))
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq === Seq(7L, 9L))
  }

  test("minhash LSH pairs == exact-Jaccard pairs at threshold 0.5") {
    val exact = {
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), shingles3(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      docs.as("l").join(docs.as("r"), col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
          jaccard(col("l.sh"), col("r.sh")).as("j"))
        .filter(col("j") >= 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    }
    val lsh = Dedup.q31MinHashDedup(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
    assert(lsh.nonEmpty) // the fixture has planted near-dups
  }

  test("simhash banded pairs == exact-Hamming pairs at threshold 8") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val sh = Dedup.simhashes(docs)
    val exact = sh.as("l").join(sh.as("r"), col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("h"))
      .filter(col("h") <= Dedup.hammingThreshold)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val banded = Dedup.q32SimHashDedup(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded === exact)
    assert(banded.nonEmpty)
  }

  test("minhash and simhash both surface the strong planted near-dups") {
    val mh = Dedup.q31MinHashDedup(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.q32SimHashDedup(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // Different similarity spaces need not agree pair-for-pair on
    // borderline cases, but both must find a substantial overlap of the
    // planted strong near-dups.
    assert(mh.nonEmpty && sh.nonEmpty)
    val overlap = (mh intersect sh).size.toDouble / math.min(mh.size, sh.size)
    info(f"minhash=${mh.size} simhash=${sh.size} overlap=$overlap%.2f")
    assert(overlap >= 0.8)
  }

  test("connected components: chains converge to the minimum member id") {
    import spark.implicits._
    // two components: a 6-vertex CHAIN (needs multi-round propagation —
    // one round only moves labels one hop) and a disjoint pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(got(_) == 1L))
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got.size == 8)
  }

  test("q50 clusters agree with q31 pairs (every pair lands in one cluster)") {
    import spark.implicits._
    val cluster = Dedup.q50DedupClusters(spark, sfDir)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val pairs = Dedup.q31MinHashDedup(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(cluster(a) == cluster(b)) }
    // canonical id is a member, and is minimal in its cluster
    cluster.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.min == cid)
    }
  }

  test("q77 keeps the max-quality member of every q50 cluster, " +
    "tie-broken to the lowest doc_id") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // reference keeper via a window rank — the shape q77 deliberately
    // avoids at scale, which makes it the right independent oracle here
    val labels = Dedup.q50DedupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
    val scored = graft.sources.Tables.load(spark, sfDir, "documents")
      .join(labels, Seq("doc_id"))
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
      .select(col("doc_id"), col("cluster_id"),
        (when(col("toks").isNotNull, size(col("toks"))).cast("double") *
          (lit(1.0) - graft.functions.TextFunctions.wordRatio(col("toks"),
            TextAnalysis.stopwords))).as("score"))
    val want = scored
      .withColumn("rn", row_number().over(Window.partitionBy("cluster_id")
        .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id"), col("score"))
      .as[(Long, Long, Double)].collect().toSet
    val got = Dedup.q77ClusterKeeper(spark, sfDir)
      .select(col("cluster_id"), col("kept_id"), col("kept_score"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty && got === want)
    // and the keeper is a genuine member with cluster-max score
    val byCluster = scored.as[(Long, Long, Double)].collect()
      .groupBy(_._2)
    got.foreach { case (cid, kept, ks) =>
      val members = byCluster(cid)
      assert(members.exists(_._1 == kept))
      assert(members.forall(_._3 <= ks))
    }
  }

  test("star CC equals propagation CC on fuzzed graphs and chains") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val cases: Seq[Seq[(Long, Long)]] =
      // adversarial: long chains (diameter = n) in both id directions
      Seq((1L to 12L).sliding(2).map(s => (s(0), s(1))).toSeq,
        (1L to 12L).sliding(2).map(s => (s(1), s(0))).toSeq) ++
      Seq.fill(6)(Seq.fill(14)((rng.nextInt(10).toLong, rng.nextInt(10).toLong))
        .filter { case (a, b) => a != b })
    cases.zipWithIndex.foreach { case (es, i) =>
      val df = es.toDF("doc_a", "doc_b")
      val prop = Dedup.connectedComponents(df, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      val star = Dedup.connectedComponentsStar(df, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(star === prop, s"case $i: $es")
    }
  }

  test("CC round-cap exhaustion throws instead of returning wrong labels") {
    import spark.implicits._
    // a 10-vertex chain needs ~9 propagation rounds; cap at 2 → labels
    // still moving at exit → must THROW, not return half-propagated ids
    val chain = (1L to 10L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "doc_a", "doc_b", maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    val e2 = intercept[IllegalStateException] {
      Dedup.connectedComponentsStar(chain, "doc_a", "doc_b", maxRounds = 1)
    }
    assert(e2.getMessage.contains("did not converge"))
    // sanity: the same chain converges fine under the default caps
    val ok = Dedup.connectedComponentsStar(chain, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 10L).forall(ok(_) == 1L))
  }

  test("q63 segment dedup: invariants hold and duplicates genuinely drop") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val deduped = Dedup.q63SegmentDedup(spark, sfDir).cache()
    val out = deduped.collect()
    // one row per document, none vanish — a fully-boilerplate doc keeps
    // an empty clean_text row
    assert(out.length === docs.count())
    out.foreach { r =>
      val (kept, dropped) = (r.getLong(2), r.getLong(3))
      assert(kept >= 0 && dropped >= 0)
      val words = r.getString(1).split(" ").filter(_.nonEmpty).length
      // every kept segment contributes <= segmentWords words
      assert(words <= kept * Dedup.segmentWords)
    }
    // the fixture's planted near-dups share 8-word spans — some must drop
    assert(out.map(_.getLong(3)).sum > 0)
    // corpus-wide uniqueness: no md5(segment) appears twice AFTER the pass
    val sw = Dedup.segmentWords
    val toksCol = tokens(col("clean_text"))
    val resegmented = deduped
      .filter(length(col("clean_text")) > 0)
      .select(col("doc_id"), toksCol.as("t"))
      .select(col("doc_id"), posexplode(col("t")))
      .withColumn("seg_idx", (col("pos") / sw).cast("int"))
      .groupBy(col("doc_id"), col("seg_idx"))
      .agg(array_join(array_sort(collect_list(struct(col("pos"),
        col("col")))).getField("col"), " ").as("seg"))
    val dupSegs = resegmented.groupBy(md5(col("seg")))
      .count().filter(col("count") > 1).count()
    assert(dupSegs === 0, "a duplicate segment survived the pass")
    deduped.unpersist()
  }

  test("q64 repetition signals: fractions bounded, flags match thresholds") {
    val rows = TextAnalysis.q64RepetitionSignals(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var flagged = 0
    rows.foreach { r =>
      val top = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val dup = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      top.foreach(v => assert(v > 0 && v <= 1))
      dup.foreach(v => assert(v >= 0 && v < 1))
      val expect = top.exists(_ > TextAnalysis.topBigramFracMax) ||
        dup.exists(_ > TextAnalysis.dupTrigramFracMax)
      assert(r.getBoolean(4) === expect)
      if (expect) flagged += 1
    }
    // thresholds are calibrated to split the fixture, not rubber-stamp it
    assert(flagged > 0 && flagged < rows.length)
  }

  test("connected components on an empty edge list terminates empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty, "doc_a", "doc_b").count() === 0)
    assert(Dedup.connectedComponentsStar(empty, "doc_a", "doc_b").count() === 0)
  }

  test("q52: realized sample rates track the nominal per-language rates") {
    val rows = graft.operators.TextAnalysis
      .q52StratifiedSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val rates = graft.operators.TextAnalysis.sampleRates.toMap
    rows.foreach { r =>
      val lang = r.getString(0)
      val n = r.getLong(1).toDouble
      val sampled = r.getLong(2).toDouble
      val nominal = rates.getOrElse(lang,
        graft.operators.TextAnalysis.defaultSampleRate) / 100.0
      // md5 buckets over a 2-digit grid: allow wide tolerance on the
      // tiny fixture; the DETERMINISM (exact same set every run) is
      // what the oracle hash pins — this just sanity-checks the rate
      assert(math.abs(sampled / n - nominal) < 0.35,
        s"$lang sampled ${sampled / n} vs nominal $nominal")
    }
  }

  test("q66: mix rates cap at 100% and kept tokens respect the budget") {
    val ta = graft.operators.TextAnalysis
    val rows = ta.q66DomainMix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getLong(2)).sum
    val budget = totalTokens / 2
    rows.foreach { r =>
      val (src, nDocs, srcToks, rate, nKept, keptToks) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      assert(rate >= 0 && rate <= 10000, s"$src rate $rate")
      assert(nKept <= nDocs && keptToks <= srcToks, src)
      // a full-rate source is taken whole — never upsampled
      if (rate == 10000L) assert(nKept == nDocs && keptToks == srcToks, src)
    }
    // weighted sources get at-least-as-high rates as default ones (>=,
    // not >: both sides legitimately saturate at 10000 bp when smaller
    // than their allocation — "taken whole" is the contract); .get
    // tolerates a weight naming a source absent from the fixture
    val rateOf = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    val defaultRates = rateOf.view
      .filterKeys(s => !ta.mixWeights.exists(_._1 == s)).values
    assert(ta.mixWeights.forall { case (s, _) =>
      rateOf.get(s).forall(_ >= defaultRates.max) },
      "weighted sources should never rank below unweighted ones")
    // realized total stays in the budget's neighborhood (hash sampling
    // on a tiny fixture is noisy; determinism is what the oracle pins)
    val kept = rows.map(_.getLong(5)).sum
    assert(kept <= (budget * 1.5).toLong && kept >= budget / 2,
      s"kept $kept vs budget $budget")
  }

  test("q67: window counts and straddlers match a local re-pack") {
    val ta = graft.operators.TextAnalysis
    val rows = ta.q67PackSequences(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute the packing serially from the raw table
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("lang"), col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("tok"),
        graft.functions.TextFunctions
          .saltedBucket(col("doc_id"), "pack", ta.packShards).as("shard"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLang = docs.groupBy(_._1)
    rows.foreach { r =>
      val lang = r.getString(0)
      val shardGroups = byLang(lang).groupBy(_._4)
      var wins = 0L; var straddle = 0L
      shardGroups.values.foreach { g =>
        var cum = 0L
        g.sortBy(_._2).foreach { case (_, _, tok, _) =>
          val (s, e) = (cum / ta.packBudget, (cum + tok - 1) / ta.packBudget)
          if (tok > 0 && e > s) straddle += 1
          cum += tok
        }
        wins += (cum + ta.packBudget - 1) / ta.packBudget
      }
      assert(r.getLong(1) === byLang(lang).length.toLong, s"$lang n_docs")
      assert(r.getLong(2) === byLang(lang).map(_._3).sum, s"$lang tokens")
      assert(r.getLong(3) === wins, s"$lang windows")
      assert(r.getLong(4) === straddle, s"$lang straddlers")
    }
  }

  test("q53: every flagged doc genuinely shares shingles with a probe") {
    import org.apache.spark.sql.functions._
    val flagged = Dedup.q53Contamination(spark, sfDir).collect()
    assert(flagged.nonEmpty)
    val sh = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), graft.functions.TextFunctions.shingles3(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val probeSh = (0L until Dedup.contamProbes.toLong)
      .flatMap(sh.get).reduce(_ union _)
    flagged.foreach { r =>
      val id = r.getLong(0)
      val shared = sh(id).intersect(probeSh).size
      assert(shared === r.getLong(1), s"doc $id")
      assert(shared >= Dedup.contamMinShingles)
    }
  }

  test("winnow pairs respect the df cap and overlap threshold") {
    val rows = Dedup.q46WinnowPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= Dedup.winnowMinShared))
  }

  test("cleanIncrement: admitted docs are genuinely fresh, and " +
    "re-ingesting them against the grown corpus admits NOTHING") {
    import org.apache.spark.sql.functions.col
    // real fixture split: corpus 80% / batch 20% (q59's shape)
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    val batch = d.filter(col("doc_id") % 5 === 0)
    val admitted = Dedup.cleanIncrement(batch, corpus, 0.5)
    val admittedIds = admitted.select("doc_id").as[Long].collect().toSet
    assert(admittedIds.nonEmpty)
    // admitted ⊆ batch
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    assert(admittedIds.subsetOf(batchIds))
    // no admitted fingerprint exists in the corpus (exact-dup freedom)
    val corpusFps = corpus
      .select(graft.functions.TextFunctions.fingerprint(col("text")))
      .as[String].collect().toSet
    val admittedFps = admitted.select("fp").as[String].collect()
    assert(admittedFps.forall(!corpusFps.contains(_)))
    // THE streaming-sink invariant: replaying the admitted rows against
    // corpus ∪ admitted drops every row as an exact duplicate
    val grown = corpus.select("doc_id", "text")
      .union(admitted.select("doc_id", "text"))
    val replay = Dedup.cleanIncrement(admitted.drop("fp"), grown, 0.5)
    assert(replay.count() === 0)
  }

  test("null-text cross-dedup: a corpus already holding a null-text " +
    "doc suppresses batch null-text docs (null-safe fp anti-join), " +
    "consistent with the intra-batch keeper") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq((1L, "real content here", "en"),
      (2L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")
    val batch = Seq((10L, null.asInstanceOf[String], "en"),
      (11L, "genuinely fresh words entirely", "en"))
      .toDF("doc_id", "text", "lang")
    val admitted = Dedup.cleanIncrement(batch, corpus, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(11L),
      "a null-text doc re-admitted against a corpus that has one — " +
        "the fp anti-join is not null-safe")
    // and with NO null-text doc in the corpus, exactly one null-text
    // batch doc admits (the intra-batch keeper), like exactDedup
    val admitted2 = Dedup.cleanIncrement(
      Seq((20L, null.asInstanceOf[String], "en"),
        (21L, null.asInstanceOf[String], "en"))
        .toDF("doc_id", "text", "lang"),
      corpus.filter(col("text").isNotNull), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted2 === Set(20L))
  }

  test("ingest crash-replay: orphaned own index rows don't block " +
    "re-admission") {
    // the streaming sink writes indexes BEFORE the corpus; a crash
    // between them leaves a doc's bands/shingles in the index with no
    // corpus row — on replay the doc must be re-admitted, not dropped
    // as a "near-dup" of its own orphaned entries
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog", "en"))
      .toDF("doc_id", "text", "lang")
    val orphanSh = Dedup.shingleIndex(batch)
    val admitted = Dedup.cleanIncrementIndexed(batch,
      Seq.empty[String].toDF("fp"),
      Dedup.minhashBands(orphanSh), orphanSh, 0.5)
    assert(admitted.select("doc_id").as[Long].collect().toSeq === Seq(100L))
  }

  test("q60: bloom-prefiltered contamination equals the exact screen") {
    // the sketch may only PRUNE (false positives die in the exact
    // join; false negatives are impossible) — so the two plans must
    // agree row for row on the real fixture
    val exact = Dedup.q53Contamination(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val bloomed = Dedup.q60ContaminationBloom(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(bloomed === exact)
  }

  test("null text: token counts are NULL (not sizeOfNull -1) in q64/q66/q67") {
    // Under Spark's default spark.sql.legacy.sizeOfNull=true,
    // size(split(NULL)) = -1 — unguarded, a null-text doc would carry
    // n_words=-1 / tok=-1 into sums where the DuckDB oracle computes
    // len(NULL)=NULL and SUM skips the row. The guards in
    // TextFunctions.tokenCount / q64's n_words pin the NULL semantics.
    val base = java.nio.file.Files
      .createTempDirectory("graft_nulltext").toString
    Seq(
      (1L, "alpha beta gamma alpha beta", "en", "src0", 27L),
      (2L, null.asInstanceOf[String], "en", "src0", 0L),
      (3L, "one two three four five six seven", "fr", "src1", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")

    val q64 = TextAnalysis.q64RepetitionSignals(spark, base).collect()
    val nullRow = q64.find(_.getLong(0) == 2L).get
    assert(nullRow.isNullAt(1), "n_words must be NULL for null text")
    assert(nullRow.isNullAt(2) && nullRow.isNullAt(3))
    assert(nullRow.getBoolean(4) === false)

    // q66: src0 has 2 docs but only doc 1's 5 tokens (NULL skipped by
    // SUM in both engines; -1 would read 4)
    val src0 = TextAnalysis.q66DomainMix(spark, base)
      .filter(col("source") === "src0").collect().head
    assert(src0.getLong(1) === 2L)   // n_docs
    assert(src0.getLong(2) === 5L)   // src_tokens

    // q67: lang en counts both docs, sums only the non-null 5 tokens
    val en = TextAnalysis.q67PackSequences(spark, base)
      .filter(col("lang") === "en").collect().head
    assert(en.getLong(1) === 2L)     // n_docs
    assert(en.getLong(2) === 5L)     // sum_tokens

    // q21: the null-text doc carries NULL stats, not sizeOfNull's -1
    val q21null = TextAnalysis.q21Quality(spark, base)
      .filter(col("doc_id") === 2L).collect().head
    assert(q21null.isNullAt(q21null.fieldIndex("tok_cnt")))
    assert(q21null.isNullAt(q21null.fieldIndex("score")))

    // q47: bpe and ws sums must agree on skipping the null doc
    // ("alpha beta gamma alpha beta" = 5 tokens under both counters)
    val q47en = TextAnalysis.q47BpeTokens(spark, base)
      .filter(col("lang") === "en").collect().head
    assert(q47en.getLong(q47en.fieldIndex("n_docs")) === 2L)
    assert(q47en.getLong(q47en.fieldIndex("sum_bpe_tokens")) === 5L)
    assert(q47en.getLong(q47en.fieldIndex("sum_ws_tokens")) === 5L)

    // q22: NULL marker counts fall through to the otherwise/ELSE arm in
    // BOTH engines (unguarded, Spark's -1 === -1 would pick the FIRST
    // language); the fixture's null doc lands on the last marker lang
    val q22 = TextAnalysis.q22LangProfile(spark, base).collect()
    assert(q22.map(_.getLong(2)).sum === 3L)
    val nullPred = q22.find(r => r.getString(0) == "en" &&
      r.getString(1) == TextAnalysis.langMarkers.last._1)
    assert(nullPred.isDefined && nullPred.get.getLong(2) === 1L)
  }

  test("source-scoped jaccard join only pairs within a source") {
    val rows = Dedup.q33SourceJaccard(spark, sfDir).collect()
    val bySource = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      assert(bySource(r.getLong(1)) === r.getString(0))
      assert(bySource(r.getLong(2)) === r.getString(0))
      assert(r.getDouble(3) >= 0.9)
    }
  }

  test("q33 prefix: the bounded aggregate is row-identical to the " +
    "row_number window form and plans without any Window or sort " +
    "aggregate (r19)") {
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      ("a", 1L, Seq("x", "y", "z", "w", "q")),
      ("a", 2L, Seq("x", "y", "z", "w")),
      ("a", 3L, Seq("k", "y")),
      ("b", 4L, Seq("x", "k", "m", "n", "o", "p", "r", "s", "t", "u")),
      ("b", 5L, Seq("m", "x")))
      .toDF("source", "doc_id", "ts")
    val freq = docs.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val posting = docs
      .select(col("source"), col("doc_id"), size(col("ts")).as("n"),
        explode(col("ts")).as("tok"))
      .join(freq, "tok")
    val t = 0.6 // non-trivial per-doc prefix lengths
    val agg = Dedup.jaccardPrefix(posting, t)
    val prefixLen = (col("n") - ceil(lit(t) * col("n")) + 1).cast("int")
    val win = posting
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("freq"), col("tok"))))
      .filter(col("pos") <= prefixLen)
      .select(col("source"), col("doc_id"), col("n"), col("pos"),
        col("tok"))
    val a = agg.collect().map(_.toString).sorted.toSeq
    val w = win.collect().map(_.toString).sorted.toSeq
    assert(a === w)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
