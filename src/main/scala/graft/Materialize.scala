package graft

import org.apache.spark.sql.DataFrame

/** Lineage-cutting materialization of a reused intermediate, with a
  * DEPLOYMENT SEAM instead of a hard-coded mechanism.
  *
  * The dedup/similarity operators all self-join a derived frame
  * (tokenized corpus, prefix index, per-round CC labels): without
  * materialization every join branch re-scans the parquet and
  * re-derives it (measured: 6 scans, zero ReusedExchange in q33), and
  * iterative loops grow an unbounded plan. Materializing computes it
  * once and cuts the lineage. HOW it is materialized is a deployment
  * decision:
  *
  *  - `local` (default): `localCheckpoint(eager)` — blocks live in
  *    executor storage (MEMORY_AND_DISK), zero distributed-FS traffic.
  *    Right for local[n] and for clusters where re-running the job on
  *    rare executor loss is acceptable. The known liability: lineage
  *    is CUT, so a lost executor loses blocks with NO recompute path —
  *    tasks fail with BlockNotFound and the job must be re-run.
  *  - `reliable`: `checkpoint(eager)` into
  *    `spark.graft.checkpoint.dir` (set it to an HDFS/S3 path on a
  *    cluster) — blocks are files on fault-tolerant storage, executor
  *    loss is recoverable, the 1000-executor default. Costs one write
  *    + read of the (small, derived) frame per materialization.
  *
  * Both modes produce byte-identical results (the gate's MaterializeSpec
  * pins a full dedup pipeline across modes); only failure recovery and
  * IO cost differ.
  */
object Materialize {

  /** "local" (default) or "reliable". Runtime conf — switchable per
    * session without rebuilding. */
  val ModeKey = "spark.graft.materialize.mode"

  /** Reliable-mode checkpoint root (HDFS/S3/... on a cluster). Falls
    * back to the SparkContext's already-set checkpoint dir. */
  val DirKey = "spark.graft.checkpoint.dir"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.getOption(DirKey).getOrElse(
            throw new IllegalStateException(
              s"$ModeKey=reliable needs $DirKey (or an existing " +
                "SparkContext checkpoint dir) pointing at fault-tolerant " +
                "storage"))
          sc.setCheckpointDir(dir)
        }
        df.checkpoint(eager = true)
      case "local" => df.localCheckpoint(true)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be local or reliable, got: $other")
    }
  }
}
