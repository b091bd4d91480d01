package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Bound guard for the engine's driver-side collect-then-iterate
  * sites (round-12 verdict ask #6). A handful of operators legally
  * pull a CONSTANT-size table to the driver — trained classifier
  * weights (O(d)), the Bradley–Terry wins matrix (≤ |langs|²) — and
  * run a fixpoint there because iterating a ≤25-row recurrence as ~35
  * distributed stages is pure scheduler latency. The legality rests
  * entirely on the bound being structural (vocabulary / dimension /
  * bin count), not data-proportional; a fixture or schema change that
  * silently widened the collected domain would turn a sound design
  * into a driver OOM at 100 TB without failing any test.
  *
  * `collectBounded` makes the bound load-bearing: it collects at most
  * `bound + 1` rows (so the DRIVER never materializes an unbounded
  * result even when the assertion is about to fire) and fails loudly
  * the moment the declared bound is exceeded. Every future
  * collect-then-iterate operator must come through here with its
  * declared bound — DriverStateSpec enforces the two current sites
  * and documents the contract.
  */
object DriverState {
  /** Collect `df`, asserting it holds at most `bound` rows. The scan
    * itself is capped at `bound + 1` rows via limit(), so a violation
    * costs one extra row of driver memory, not the whole violation.
    */
  def collectBounded(df: DataFrame, bound: Int, what: String): Array[Row] = {
    val rows = df.limit(bound + 1).collect()
    require(rows.length <= bound,
      s"$what: driver-side state exceeded its declared bound of " +
        s"$bound rows — the collected domain is no longer " +
        "vocabulary-bounded; fix the upstream aggregate, do not raise " +
        "the bound without re-deriving it from the domain")
    rows
  }
}
