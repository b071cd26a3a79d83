package graft.operators

import org.apache.spark.sql.DataFrame

/** Stage-boundary materialization behind ONE switch (optimization
  * guide §5; VERDICT r17 "What's wrong" #5).
  *
  * Iterative operators (connected components, PageRank, perceptron
  * rounds, BPE merge rounds) and the curate pipeline cut lineage at
  * stage boundaries. The default primitive is `localCheckpoint`:
  * cheapest (executor-local storage, no extra I/O path), exactly right
  * for gate scale and for any cluster with stable executors. Its known
  * limit is durability — executor-local blocks disappear with the
  * executor (node loss, dynamic-allocation downscale), which at the
  * 100 TB design point can kill a long lineage mid-round.
  *
  * `spark.graft.checkpoint.mode=reliable` flips EVERY such
  * materialization to a reliable `checkpoint()` written under
  * `spark.graft.checkpoint.dir` (or the context's already-set
  * checkpoint dir) — the production stance where intermediates must
  * survive executor churn. One config, no call-site changes, identical
  * results either way: a checkpoint only materializes rows, it never
  * changes them.
  */
object Materialize {

  /** `df` materialized with a cut lineage: `localCheckpoint(eager)` by
    * default, a reliable `checkpoint(eager)` when
    * `spark.graft.checkpoint.mode=reliable`. */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get("spark.graft.checkpoint.mode", "local") match {
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          // explicit dir wins; otherwise a per-context temp dir (tests /
          // local runs) — a real deployment sets a cluster-visible path
          val dir = spark.conf.get("spark.graft.checkpoint.dir",
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
          sc.setCheckpointDir(dir)
        }
        df.checkpoint(eager)
      case "local" => df.localCheckpoint(eager)
      case other => throw new IllegalArgumentException(
        s"spark.graft.checkpoint.mode must be local|reliable, got '$other'")
    }
  }
}
