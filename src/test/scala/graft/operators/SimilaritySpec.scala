package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("cosine of a vector with itself is 1") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f))).toDF("v")
    val got = df.select(Similarity.cosine(col("v"), col("v"))).head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("cosine matches a hand computation") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("scale-aware dials: fixture identity, fitted points, override, " +
    "overflow guard") {
    // the 500-vector calibration corpus must map to the legacy
    // constants EXACTLY — every pre-round-9 recall number depends on it
    assert(Similarity.nlistFor(500) === 16)
    assert(Similarity.nprobeFor(16) === 5)
    assert(Similarity.shortlistFor(500) === 100)
    // the two measured sf0.1 calibration points the 1.45 exponent was
    // fitted through (2000 vectors → 31 cells, 13 probes, 400-wide
    // shortlist)
    assert(Similarity.nlistFor(2000) === 31)
    assert(Similarity.nprobeFor(31) === 13)
    assert(Similarity.shortlistFor(2000) === 400)
    // the round-10 third calibration size (8000 vectors → 63 cells):
    // the 0.45-fraction cap binds BELOW the raw curve's 36 probes —
    // the measured minimal np for target recall is 18 (fraction 0.29),
    // so 28 holds recall (measured 0.88-0.92 band) at under half the
    // uncapped scan cost; uncapped, the curve would reach brute-force
    // probing (np = nl) by N ≈ 92k
    assert(Similarity.nlistFor(8000) === 63)
    assert(Similarity.nprobeFor(63) === 28)
    // the cap keeps the probe fraction bounded at ANY scale (the
    // uncapped curve exceeds nl itself past nl ≈ 212)
    assert(Similarity.nprobeFor(1000) === 450)
    // nprobe never exceeds the cell count
    assert(Similarity.nprobeFor(4) === 4)
    // the deployment override WINS, including downward (clustered real
    // data wants fewer probes), clamped to [1, nl]; malformed values
    // fail fast naming the property
    val key = "graft.ann.nprobe"
    try {
      System.setProperty(key, "3")
      assert(Similarity.nprobeFor(31) === 3)
      System.setProperty(key, "999")
      assert(Similarity.nprobeFor(31) === 31)
      System.setProperty(key, "auto")
      val e = intercept[IllegalArgumentException](Similarity.nprobeFor(31))
      assert(e.getMessage.contains(key))
    } finally System.clearProperty(key)
    // Long-safe shortlist: at 100 TB-regime counts n/5 overflows Int —
    // must clamp to Int.MaxValue, never wrap back to the fixed 100
    assert(Similarity.shortlistFor(400L * 1000 * 1000 * 1000)
      === Int.MaxValue)
  }

  test("brute-force knn returns k ranked neighbors per query") {
    val knn = Similarity.q35KnnBrute(spark, sfDir).collect()
    val byQuery = knn.groupBy(_.getLong(0))
    assert(byQuery.size === Similarity.knnQueries)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to Similarity.k))
      // ranks ordered by non-increasing cosine
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN recall@5 against brute force is usable") {
    val brute = Similarity.q35KnnBrute(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.q36KnnLsh(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ann).size.toDouble / brute.size
    info(f"LSH ANN recall@5 = $recall%.2f")
    // 16 tables × 4 bits with multiprobe-1 on the query side: the
    // showcase bar is ≥ 0.9 against exact brute force.
    assert(recall >= 0.9)
  }

  test("IVF ANN recall@5 against brute force is usable") {
    val brute = Similarity.q35KnnBrute(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.q41KnnIvf(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"IVF ANN recall@5 = $recall%.2f")
    // 5 of 16 k-means cells probed (~31% of the corpus scanned);
    // geometric cells beat the old label-cell 0.56 at the same scan
    // fraction. The trained index is bit-deterministic (fixed-point
    // centroid sums, hash seeds), so this is a stable floor, not a
    // flaky sample.
    assert(recall >= 0.7)
  }

  test("PQ ANN recall@5 against brute force is usable") {
    val brute = Similarity.q35KnnBrute(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.q61KnnPq(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    info(f"PQ ANN recall@5 = $recall%.2f")
    // 8 subspaces × 16 codes quantize hard on near-orthogonal random
    // 64-dim data, but the 100-wide ADC shortlist + exact re-rank keeps
    // true top-5 neighbors in play; the trained codebooks are
    // bit-deterministic (fixed-point centroid sums, hash seeds), so
    // this is a stable floor, not a flaky sample.
    assert(recall >= 0.7)
  }

  test("IVFPQ ANN recall@5 against brute force is usable") {
    val brute = Similarity.q35KnnBrute(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity.q65KnnIvfPq(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivfpq).size.toDouble / brute.size
    info(f"IVFPQ ANN recall@5 = $recall%.2f")
    // compounds IVF's cell recall (0.78 measured) with PQ's shortlist
    // recall (0.84) — the price of scanning ~31% of the corpus 32×
    // compressed; deterministic for the same reasons as q41/q61
    assert(recall >= 0.55)
  }

  test("residual IVFPQ recall@5 is at least plain IVFPQ's") {
    val brute = Similarity.q35KnnBrute(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val plain = recallOf(Similarity.q65KnnIvfPq(spark, sfDir))
    val res = recallOf(Similarity.q68KnnIvfPqRes(spark, sfDir))
    info(f"residual IVFPQ recall@5 = $res%.2f (plain IVFPQ $plain%.2f)")
    // same index size and scan cost; the shared residual codebook
    // spends its 8×16 resolution on what the coarse quantizer missed,
    // so recall must not regress below the raw-vector encoding (ties
    // allowed: both are capped by IVF's cell recall)
    assert(res >= plain)
    assert(res >= 0.55)
  }

  test("PQ re-ranked cosines are exact (match brute force where ids agree)") {
    val brute = Similarity.q35KnnBrute(spark, sfDir)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val pq = Similarity.q61KnnPq(spark, sfDir)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    // approximation is allowed to change WHICH neighbors surface, never
    // the reported cosine of a surfaced neighbor
    pq.filter(r => brute.contains((r._1, r._2))).foreach { case (q, n, c) =>
      assert(c === brute((q, n)), s"cosine drifted for ($q, $n)")
    }
  }

  test("cosine-pair join is symmetric-free (a < b) and thresholded") {
    val rows = Similarity.q34CosinePairs(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= Similarity.pairThreshold)
    }
  }

  test("a zero-norm vector is neither a neighbor nor a seed: q35 " +
    "excludes it and q41 trains/serves unpoisoned") {
    // corpus = real slice + one all-zero embedding. Unfiltered, the
    // zero vector's cosine is NaN — Spark ranks NaN FIRST descending,
    // so it would be every query's #1 "neighbor" in q35 while every
    // ANN path excludes it (rerankTopK), breaking recall gates; and a
    // zero-norm SEED in q41's k-means yields a NaN centroid that wins
    // every assignment (quantizer collapse). Both paths filter nrm > 0.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files
      .createTempDirectory("graft_zeronorm").toString
    val slice = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 300)
    val zero = spark.createDataFrame(
      java.util.List.of(Row(999999L, Array.fill(64)(0.0f), 0)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
    slice.unionByName(zero).write.parquet(s"$base/embeddings.parquet")
    val brute = Similarity.q35KnnBrute(spark, base)
    assert(brute.filter(col("neighbor_id") === 999999L).isEmpty)
    assert(brute.count() ===
      (Similarity.knnQueries * Similarity.k).toLong)
    val ivf = Similarity.q41KnnIvf(spark, base)
    assert(ivf.filter(col("neighbor_id") === 999999L).isEmpty)
    assert(!ivf.isEmpty)
    // no NaN cosine anywhere in either result
    assert(brute.filter(isnan(col("cosine"))).isEmpty)
    assert(ivf.filter(isnan(col("cosine"))).isEmpty)
  }

  test("NaN/Inf-component vectors are excluded like zero vectors " +
    "(validNorm), not crashed on: q34/q45/q61 stay total under ANSI") {
    // nrm > 0 alone PASSES a NaN or Inf norm (Spark ranks NaN above
    // everything, so NaN > 0 is true) — and one such vector then hits
    // floor(NaN) cast to long inside the fixed-point trainers, which
    // THROWS under ANSI (the session default) instead of truncating.
    // validNorm (positive AND finite) must make every path treat the
    // poisoned vector exactly like a zero vector: invisible, loudless.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files
      .createTempDirectory("graft_nanvec").toString
    val slice = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 300)
    val poisoned = spark.createDataFrame(
      java.util.List.of(
        Row(999998L, Array.fill(64)(Float.NaN), 0),
        Row(999999L,
          (Array.fill(63)(0.5f) :+ Float.PositiveInfinity), 0)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
    slice.unionByName(poisoned).write.parquet(s"$base/embeddings.parquet")
    // exact pair join: poisoned ids appear on neither side, no NaN rows
    val pairs = Similarity.q34CosinePairs(spark, base)
    assert(pairs.filter(col("vec_a") >= 999998L ||
      col("vec_b") >= 999998L).isEmpty)
    assert(pairs.filter(isnan(col("cosine"))).isEmpty)
    // dedup: poisoned vectors are never near-dups, so they SURVIVE
    val surv = Similarity.q45EmbedDedup(spark, base)
    assert(surv.filter(col("vec_id") >= 999998L).count() === 2L)
    // fixed-point PQ trainer completes (no ANSI CAST_OVERFLOW) and the
    // poisoned vectors never surface as neighbors
    val pq = Similarity.q61KnnPq(spark, base)
    assert(!pq.isEmpty)
    assert(pq.filter(col("neighbor_id") >= 999998L).isEmpty)
    assert(pq.filter(isnan(col("cosine"))).isEmpty)
  }
}
