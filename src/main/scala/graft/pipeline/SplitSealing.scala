package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Commit-trigger split sealing (T1) — the reference's indexer seals the
  * in-progress split when it hits the num-docs target, the commit timeout,
  * or source drain (quickwit-indexing/src/actors/indexer.rs:578-608; test
  * shape indexer.rs:733-870: with a target of 4 docs the 5th doc opens a
  * second split and the first records `NumDocsLimit`).
  *
  * Batch analog: a deterministic assignment of rows to sealed splits —
  * within each routed partition, rows in stable (conv_id, turn_idx) order
  * fill a split until the num-docs target, then the next split opens. The
  * final partial split records the `Drained` trigger (AvailableNow end of
  * input); a real commit-timeout seal only exists on the streaming path,
  * where Trigger.ProcessingTime plays that role (StreamingPipeline).
  */
object SplitSealing {

  val NumDocsLimit = "num_docs_limit" // indexer.rs CommitTrigger::NumDocsLimit
  val Drained = "drained"             // indexer.rs CommitTrigger::Drained

  /** Assign every row a `split_seq` within its partition. The window sorts
    * by the BASELINE's stable turn order so assignment is deterministic and
    * parallelism-invariant. */
  def withSplitSeq(df: DataFrame, partitionCol: Column, numDocsTarget: Long): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(col("conv_id"), col("turn_idx"))
    df.withColumn("split_seq",
      ((row_number().over(w) - 1) / numDocsTarget).cast("long"))
  }

  /** Sealed-split accounting: docs per split + the recorded commit trigger.
    * A split with exactly `numDocsTarget` docs sealed on the doc limit; the
    * partition's tail split sealed on drain. */
  def sealedSplits(df: DataFrame, partitionCol: Column, numDocsTarget: Long): DataFrame =
    withSplitSeq(df, partitionCol, numDocsTarget)
      .groupBy(partitionCol.as("partition_id"), col("split_seq"))
      .agg(count(lit(1)).as("num_docs"))
      .withColumn("commit_trigger",
        when(col("num_docs") === numDocsTarget, NumDocsLimit).otherwise(Drained))
}
