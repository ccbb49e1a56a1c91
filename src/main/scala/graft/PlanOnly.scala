package graft

import org.apache.spark.sql.DataFrame

/** Plan-audit switch (`-Dgraft.planOnly=true`; [[Explain]] sets it by
  * default): construction-time side effects — tmp-layout writes, eager
  * checkpoint jobs, convergence loops — are skipped and the operator
  * returns the UNEXECUTED equivalent frame instead, so a full plan dump
  * touches no disk and runs no Spark job. The graded paths
  * (Verify/Bench/the test suite) never set the property: round-trip
  * keys must really write their layouts and iterative keys must really
  * converge for the oracle hash-match to mean anything.
  */
object PlanOnly {
  def enabled: Boolean = java.lang.Boolean.getBoolean("graft.planOnly")

  /** Write-then-read-back gate. In plan-only mode the `exec` thunk
    * (write + read-back) never runs; `equivalent` — the frame that was
    * to be written, pre-layout — stands in, so the downstream plan is
    * still constructed and auditable. The layout-specific scan
    * properties this hides (PartitionFilters pruning, bucket-side
    * exchange elimination) are pinned in SinksSpec/BucketingSpec, which
    * run the real writes.
    *
    * `equivalent` is BY-NAME and callers must keep it lazy (`def
    * equivalent = ...`, never `val`): DataFrame construction runs the
    * analyzer eagerly, so a pre-built val pays full analysis of the
    * discarded composite plan on every GRADED run — measured at ~13 s
    * of driver time on simsearch_hnsw_maintain alone (r18 opt). */
  def roundTrip(equivalent: => DataFrame)(exec: => DataFrame): DataFrame =
    if (enabled) equivalent else exec

  /** Reuse marker: `persist(MEMORY_AND_DISK)` on graded runs, identity
    * in plan-only mode — even an UNEXECUTED `.persist()` registers the
    * plan in the session CacheManager (affecting later plan matching
    * and holding references across a long-lived audit session; the
    * Verify/Bench harnesses clearCache() per key, a plan audit
    * shouldn't have to). */
  def mark(df: DataFrame): DataFrame =
    if (enabled) df
    else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Per-round lineage cut for driver-coordinated loops:
    * `localCheckpoint(eager = true)` on graded runs (each round's plan
    * would otherwise nest the previous round's), identity in plan-only
    * mode — an eager checkpoint is itself a job. */
  def cut(df: DataFrame): DataFrame =
    if (enabled) df else df.localCheckpoint(true)
}
