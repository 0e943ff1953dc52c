package graft

/** Cluster-adaptive partition count for keyed repartitions that exist
  * to SPREAD CPU-heavy per-row work (tokenization, shingle hashing,
  * per-doc windows, thresholded-DP verifies).
  *
  * A bare `repartition(col)` is subject to AQE's byte-based partition
  * coalescing, whose `minPartitionSize` floor (1 MiB) collapses a
  * small exchange to ONE partition even though the expensive work runs
  * AFTER the exchange — measured round 14: q107's whole thresholded-DP
  * verify serialized into a single 6 s task behind a 60 KB exchange,
  * and the classifier feature build into a 27 s task behind 830 KB.
  * AQE respects USER-SPECIFIED partition counts, and
  * `defaultParallelism` is the cluster's core count — scale-adaptive
  * by construction, never a constant tuned to one box. At production
  * byte sizes the count is irrelevant (exchanges exceed the advisory
  * size and split anyway); at small sizes it keeps the CPU-bound stage
  * parallel.
  */
object Par {
  def n: Int = org.apache.spark.sql.SparkSession.active
    .sparkContext.defaultParallelism
}
