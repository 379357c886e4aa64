package graft.query

import org.apache.spark.sql.DataFrame

/** Lineage-cut policy for the engine's iterative loops
  * ([[BipartiteExpand]], [[ConnectedComponents]], [[KMeans]]).
  *
  * Default (`checkpointDir = None`): `localCheckpoint` — eager, cheap,
  * blocks live in executor storage. Correct on a healthy cluster, but
  * executor-local blocks do NOT survive executor loss, and after a
  * loss the truncated lineage cannot recompute them: the job fails.
  * Acceptable for interactive / short loops.
  *
  * Durable (`checkpointDir = Some(dir)`): reliable `checkpoint()` to
  * the given directory (any Hadoop-visible filesystem — HDFS/object
  * store on a cluster). Each cut costs one write + read of the
  * checkpointed frame, and in exchange a lost executor replays from
  * storage instead of killing the job — the knob a 1000-executor
  * 100 TB run turns on, because at that scale executor loss is an
  * expectation, not an anomaly. The loops only ever cut SMALL frames
  * (frontiers, label tables, k×dim centroids), so the per-iteration
  * write is bounded by the frontier size, not the corpus.
  */
object Checkpoints {

  /** Cut `df`'s lineage eagerly: executor-local by default, reliable
    * when `checkpointDir` is given (the directory is installed as the
    * context's checkpoint dir on first use). */
  def cut(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir creates dir/<uuid> and getCheckpointDir
        // returns THAT path — compare by prefix or every cut would
        // reinstall (and spawn a fresh uuid subdirectory).
        if (!sc.getCheckpointDir.exists(_.startsWith(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
