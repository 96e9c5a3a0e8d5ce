package graft.operators

import org.apache.spark.sql.DataFrame

/** Pin a reused small intermediate — the ONE materialization seam for
  * every query-path "compute once, consume N times" table (supplier
  * edge lists, quantile cuts, exact-truth sides, cluster labels).
  *
  * Modes (session conf `spark.graft.pin`):
  *  - "local" (default): `localCheckpoint()` — executor-local blocks,
  *    GC-cleaned, no configuration. Right for local mode and the bench:
  *    per-call `persist` inside a query fn is NEVER unpersisted (the fn
  *    returns a lazy frame, so there is no post-consumption hook),
  *    accumulates in the CacheManager and degrades monotonically across
  *    calls (measured 7.6 → 19.6 s over five calls, r21); localCheckpoint
  *    RDDs are reference-tracked and collected instead. PinSpec pins the
  *    CacheManager-empty invariant so a bare persist cannot sneak back.
  *  - "reliable": `checkpoint()` to the context's checkpoint dir. For
  *    cluster reality (VERDICT r21 #7): localCheckpoint trades away
  *    lineage recovery — an executor loss makes the job unrecoverable
  *    instead of recomputable — so a deployment that cares sets
  *    `spark.graft.pin=reliable` plus a durable checkpoint dir. Requires
  *    `SparkContext.setCheckpointDir` (fails loudly if unset — silently
  *    checkpointing to a default /tmp on a cluster would be local-disk,
  *    i.e. not reliable at all).
  */
object Pin {
  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.get("spark.graft.pin", "local") match {
      case "local" => df.localCheckpoint()
      case "reliable" =>
        if (df.sparkSession.sparkContext.getCheckpointDir.isEmpty)
          throw new IllegalStateException(
            "spark.graft.pin=reliable needs SparkContext.setCheckpointDir " +
              "(a durable path — that is the point of the mode)")
        df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"spark.graft.pin must be local or reliable, got '$other'")
    }

  /** `.pin()` chain syntax, so call sites read like the
    * `.localCheckpoint()` they replace. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Pin(df)
  }
}
