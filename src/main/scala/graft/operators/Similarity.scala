package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *  - **brute-force cosine** ([[q34CosinePairs]], [[q35KnnBrute]]): the
  *    exact baseline. Fine when one side is small (a query batch) —
  *    the candidate side streams through codegen'd array math, no state.
  *  - **LSH-bucketed ANN** ([[q36KnnLsh]]): random-hyperplane signatures,
  *    multiple tables OR'd together; candidate generation is an equality
  *    join on (table, bucket) so it scales like the dedup LSH joins
  *    instead of quadratically.
  *
  * All vector math is built-in higher-order functions (zip_with /
  * aggregate) over the array column — codegen'd, no UDF, no
  * driver-side collect. Dot products accumulate in DOUBLE left-to-right,
  * so results are bit-stable and match the DuckDB oracle exactly.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double
    * via the codegen'd [[graft.functions.VectorFunctions.dotD]] (single
    * IEEE ops, left-to-right fold — bit-stable across engines). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineD(a, b)

  val pairThreshold = 0.42
  val knnQueries = 10 // vec_id < 10 are the query batch
  val k = 5

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")

  import graft.functions.VectorFunctions.dotD

  /** (vec_id, v: array<double>, nrm): norms are computed ONCE per vector
    * before any pairwise join — the pair-level work drops to a single
    * codegen'd dot product + one division. Bit-identical to computing
    * the norm per pair (same expression over the same data). */
  private def prepped(spark: SparkSession, sfDir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    emb(spark, sfDir).select(col("vec_id"), v.as("v"),
      sqrt(dotD(v, v)).as("nrm"))
  }

  /** q34: embedding near-duplicate pairs — all pairs with cosine ≥ 0.42.
    * Brute-force exact baseline (self-join); the scale path for the same
    * predicate is [[q36KnnLsh]]-style bucketing. */
  def q34CosinePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val e = prepped(spark, sfDir)
    e.as("l").join(e.as("r"), col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        (dotD(col("l.v"), col("r.v")) / (col("l.nrm") * col("r.nrm")))
          .as("cosine"))
      .filter(col("cosine") >= pairThreshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** q35: brute-force top-k cosine neighbors for the query batch
    * (vec_id < 10), deterministic tie-break on neighbor id. */
  def q35KnnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = prepped(spark, sfDir)
    val q = e.filter(col("vec_id") < knnQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val scored = broadcast(q).join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotD(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  // --- LSH ANN --------------------------------------------------------------

  val lshTables = 6
  val lshBitsPerTable = 4
  val dim = 64

  /** Deterministic random hyperplanes: lshTables × lshBitsPerTable planes
    * of `dim` gaussians, seeded — same planes every run. */
  private lazy val planes: Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(7)
    Array.fill(lshTables, lshBitsPerTable, dim)(rng.nextGaussian())
  }

  /** Sign-bucket id of a double-array embedding under table t's
    * hyperplanes (codegen'd dot per plane). */
  private def bucket(v: Column, t: Int): Column =
    (0 until lshBitsPerTable).map { j =>
      val plane = array(planes(t)(j).map(lit): _*)
      when(dotD(v, plane) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** (vec_id, embedding, table, bucket) — lshTables rows per vector. */
  def lshBuckets(e: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    e.select(col("vec_id"), v.as("embedding"),
      posexplode(array((0 until lshTables).map(t => bucket(v, t)): _*)))
      .toDF("vec_id", "embedding", "table", "bucket")
  }

  /** q41: IVF-style ANN — a coarse quantizer (per-label centroids, the
    * stand-in for k-means cells) assigns every vector to its nearest
    * centroid; a query probes only the `nprobe` nearest cells and
    * re-ranks candidates exactly. The centroid table is tiny and rides
    * along as literal arrays (a real build would broadcast it); the
    * candidate join is an equality join on the cell id — the second
    * classic ANN scale path next to [[q36KnnLsh]]'s hyperplane LSH. */
  val nprobe = 3

  def q41KnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = prepped(spark, sfDir)
    // coarse quantizer: label centroids (10 × 64 doubles, driver-side)
    val cents: Array[(Int, Array[Double])] =
      Advanced.q37LabelCentroids(spark, sfDir)
        .select(col("label"), col("pos"), col("centroid"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (l, rows) =>
          l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }.toArray.sortBy(_._1)
    def cellOf(v: Column): Column = {
      // argmax over centroid dots with deterministic tie-break (first)
      val dots = cents.map { case (l, c) =>
        (l, dotD(v, array(c.map(lit): _*)))
      }
      val best = dots.map(_._2).reduce((a, b) => greatest(a, b))
      dots.foldRight(lit(-1)) { case ((l, d), acc) =>
        when(d === best, lit(l)).otherwise(acc)
      }
    }
    def cellsOf(v: Column, n: Int): Column = {
      // top-n cells by dot: rank via count of strictly-greater dots
      val dots = cents.map { case (l, c) =>
        struct(dotD(v, array(c.map(lit): _*)).as("d"), lit(l).as("l"))
      }
      slice(reverse(array_sort(array(dots: _*))), 1, n).getField("l")
    }
    val indexed = e.withColumn("cell", cellOf(col("v")))
    val queries = e.filter(col("vec_id") < knnQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"),
        explode(cellsOf(col("v"), nprobe)).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(queries)
      .join(indexed, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotD(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
          .as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** q36: ANN top-k — candidates share an LSH bucket in ≥ 1 table with
    * the query, then exact cosine re-rank. Approximate (recall measured
    * against q35 in the test suite), but candidate generation is an
    * equality join — the 100 TB path. */
  def q36KnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val buckets = lshBuckets(e)
    val qb = buckets.filter(col("vec_id") < knnQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("table"), col("bucket"))
    val cand = broadcast(qb)
      .join(buckets, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("qv"),
        col("vec_id").as("neighbor_id"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }
}
