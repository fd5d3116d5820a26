package graft

import org.apache.spark.sql.SparkSession

/** THE engine session config, in one place. Bench (the timed runs),
  * Verify (the correctness gate) and the dev plan dumper (`DevPlan`,
  * the committed before/after plan evidence) must all run the same
  * session — round 9 duplicated the config across the three and the
  * advisor caught the drift risk: DevPlan was missing the two
  * shuffled-hash-join knobs, so committed plan evidence could show a
  * different join strategy than the bench actually executes.
  *
  * Knobs (all env-overridable, local defaults keep the driver's bench
  * comparable; production values are a cluster submit's concern):
  *
  *  - `spark.sql.shuffle.partitions` = the session's core count — the
  *    scale-adaptive part is AQE coalescing, on everywhere.
  *  - shuffled hash join allowed where its size conditions hold
  *    (guide §3.1/§9): SHJ skips sort-merge's per-partition sort; the
  *    planner's size conditions still gate the choice and the AQE
  *    rewrite only fires under the 64m local-map threshold, so
  *    build-side memory stays bounded at any scale. Measured at sf0.1
  *    (round 9): join-heavy stats/graph queries ~5–10% faster, none
  *    slower.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
