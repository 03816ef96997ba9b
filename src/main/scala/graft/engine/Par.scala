package graft.engine

import org.apache.spark.sql.{Column, Dataset}

/** Fan-out for CPU-bound per-row kernels over LOW-PARALLELISM inputs —
  * the input-skew remedy of the optimization playbook (guide §2.5
  * "repartition immediately after the read"), applied to the shape this
  * engine actually hits: a tiny single-row-group parquet file (or an
  * AQE-coalesced exchange) hands an expensive kernel — window hashing,
  * codec decode, token encoding, per-query vector scoring — to ONE task
  * while the rest of the machine idles. Parquet cannot split inside a
  * row group, so `maxPartitionBytes`/`minPartitionNum` cannot recover
  * the parallelism; an explicit hash exchange on the row key can.
  *
  * The partition count is pinned to `defaultParallelism` (cluster-wide
  * core count — scale-adaptive, never a local constant) because an
  * UNPINNED `repartition(col)` is fair game for AQE partition
  * coalescing, which would fold the kernel's input right back into one
  * sub-`minPartitionSize` partition — exactly the state being escaped.
  *
  * Cost discipline: the exchange moves the kernel's INPUT rows once.
  * Every call site sits where the kernel's own downstream volume
  * dominates that exchange at any scale (a window-key table is ~24
  * bytes per input CHARACTER; a per-query scored candidate set is
  * |queries| × the corpus), or where the fanned result is persisted and
  * reused by several passes. Do not use it in front of cheap
  * projections — the exchange would be the most expensive operator in
  * the plan.
  */
object Par {
  /** Hash-repartition `df` across the session's full core count on
    * `key` (deterministic under retries — never derive from rand()). */
  def fanOut[T](df: Dataset[T], key: Column): Dataset[T] =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
