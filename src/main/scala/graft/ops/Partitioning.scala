package graft.ops

import org.apache.spark.sql.DataFrame

/** Partition-shape guards for compute-heavy operators. */
object Partitioning {

  /** Ensure at least default-parallelism partitions before heavy per-row
    * work (hash signatures, gram pipelines, distance kernels). A small
    * input file arrives as ONE scan partition — without this, per-row
    * compute runs on a single core while the rest idle. At scale the
    * input already has more partitions than cores and this is a no-op.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
