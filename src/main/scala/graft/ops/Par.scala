package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism repair for narrow-parallelism inputs (guide §2.5 "input
  * skew": one unsplittable / single-row-group file = one scan task).
  *
  * The driver testdata tables are single parquet files written as one row
  * group, so every scan is ONE partition — and any expensive per-row stage
  * (minhash signatures, simhash, PNG/WAV synthesis, nested-loop pair
  * generation) that runs before the first exchange executes on one core of
  * the 32. `fanOut` hash-repartitions such a frame to the cluster's default
  * parallelism FIRST, so the heavy map stage runs wide.
  *
  * Scale-adaptive by construction: when the scan already has >= the
  * cluster's parallelism (the 100 TB case — thousands of splits), this is a
  * no-op and no shuffle is added. The repartition key must be provided
  * (deterministic hash partitioning; keyless round-robin pays a
  * sort-before-repartition pass and is retry-fragile per guide §2.5).
  */
object Par {

  def fanOut(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
