package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism for CPU-heavy narrow scans (guide §2/§6).
  *
  * A small input — at bench scale, a single-row-group parquet file — plans
  * ONE working scan task, so a per-row-expensive projection (levenshtein,
  * clipped n-gram counting, per-token digests) runs on one core however
  * many the session has. [[fanOut]] redistributes round-robin to the
  * session's default parallelism, but ONLY when the planned scan has fewer
  * partitions than that: at production scale the input carries ≥ cores
  * splits already and the call is a no-op (no Exchange in the plan).
  *
  * This is deliberately NOT a constant repartition(n): the decision is
  * derived per-input from the planned partition count vs the session's
  * core count, so the same code is an Exchange-free pass-through on a
  * 100 TB input and a 1-shuffle fan-out on a one-row-group one. The
  * round-robin exchange moves each row once; every call site guards a
  * projection whose per-row CPU dwarfs one row move (guide §1.2: fix the
  * distributed shape first — a single-task stage IS the wrong shape).
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
