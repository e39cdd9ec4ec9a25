package graft

/** Scratch profiling main (not part of the driver contract) —
  * currently instrumented to A/B the exact all-pairs join
  * (Similarity.exactPairs' shape, replicated inline) between the
  * clustered MoG calibration corpus and the decorrelated replication
  * corpus at the same size: the full q34 reads 19.7 s decorrelated vs
  * 808 s clustered (same row count, same plan), so some term is
  * VALUE-dependent. Variants isolate: (1) join machinery alone
  * (count of joined rows, constant payload), (2) join + dot-product
  * aggregate (no filter, no output), (3) full cosine filter + count
  * (output rows reduced to a count), (4) the as-shipped q34 with its
  * orderBy. Whichever pair of adjacent variants opens the gap carries
  * the cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.dotD
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val b = 8
    def pairJoin(dir: String) = {
      val v = col("embedding").cast("array<double>")
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), v.as("v"),
          sqrt(dotD(v, v)).as("nrm"))
        .filter(col("nrm") > 0 && col("nrm") < Double.PositiveInfinity)
        .withColumn("g", pmod(xxhash64(col("vec_id")), lit(b)).cast("int"))
      val lhs = e.select(col("vec_id").as("id_l"), col("v").as("vl"),
        col("nrm").as("nl"), col("g").as("gl"),
        explode(sequence(col("g") * b + col("g"),
          col("g") * b + lit(b - 1))).as("task"))
      val rhs = e.select(col("vec_id").as("id_r"), col("v").as("vr"),
        col("nrm").as("nr"), col("g").as("gr"),
        explode(sequence(col("g"), col("g") * b + col("g"), lit(b)))
          .as("task"))
      lhs.join(rhs, Seq("task"))
        .filter(col("gl") =!= col("gr") || col("id_l") < col("id_r"))
    }
    Seq(("mogdd32k", "/tmp/mogdd32k"), ("sf16ann", "/tmp/sf16ann"))
      .foreach { case (label, dir) =>
        val t1 = timed {
          pairJoin(dir).select(lit(1).as("one")).agg(count(lit(1))).head()
        }
        val t2 = timed {
          pairJoin(dir)
            .agg(sum(dotD(col("vl"), col("vr")))).head()
        }
        val t3 = timed {
          pairJoin(dir)
            .filter(dotD(col("vl"), col("vr")) / (col("nl") * col("nr"))
              >= 0.42)
            .agg(count(lit(1))).head()
        }
        val t4 = timed {
          operators.Similarity.q34CosinePairs(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        println(f"[prof] $label%-10s join $t1%7.1f  join+dot $t2%7.1f  " +
          f"join+cos-filter $t3%7.1f  full-q34 $t4%7.1f")
      }
    spark.stop()
  }
}
