package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Single-partition windows over PROVABLY BOUNDED inputs, without the
  * `WindowExec: No Partition Defined` warning.
  *
  * Several operators legitimately run a global ordered window — but only
  * over tables that are bounded by construction (a top-200 vocabulary, a
  * distinct-day calendar spine, a ≤shards offset table), never over fact
  * rows. A bare `Window.orderBy(...)` is correct there, but it spams the
  * single-partition warning through every bench/driver log, burying the
  * one case the warning exists to catch: an UNBOUNDED global window
  * sneaking into a fact-scale plan.
  *
  * `keyed(c)` partitions by a constant derived NON-FOLDABLY from a data
  * column (`isnull(c)::int * 0` — always 0, even for NULL input, and not
  * constant-folded away the way `partitionBy(lit(0))` is). Execution is
  * identical to the empty partition spec — one hash exchange of the
  * bounded table to a single partition — but WindowExec sees a
  * partition key, so the warning stays reserved for real regressions.
  */
object BoundedWindow {

  /** Constant-0 partition key derived non-foldably from `c`; NULL-proof
    * (`hash` never returns NULL). NOTE: must depend on the column's VALUE
    * in a form no simplification rule collapses — `isnull(c)` folds when
    * `c` is non-nullable, and even `expr * 0` gets identity-folded on a
    * non-null child, after which EliminateWindowPartitions strips the
    * spec and the warning returns (plan-change-log verified on
    * corpus_mix). `pmod(hash(c), 1)` survives Spark 4.1's optimizer. */
  def zeroKey(c: Column): Column = pmod(hash(c), lit(1))

  /** Window spec pinned to one partition via a bounded table's column
    * `c`; chain `.orderBy(...)`/`.rowsBetween(...)` as usual. */
  def keyed(c: Column): WindowSpec = Window.partitionBy(zeroKey(c))
}
