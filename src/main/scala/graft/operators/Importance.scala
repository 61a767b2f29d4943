package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KernelExpressions

/** DSIR-style data selection with importance resampling (Xie et al. '23):
  * score every document by how much its hashed-token distribution looks
  * like a TARGET slice of the corpus versus the corpus at large, so
  * curation can up-weight target-like documents without a trained
  * classifier.
  *
  * Made INTEGER-EXACT for cross-engine replay (same device as
  * [[NgramLm]]): instead of summing float log-ratios, each token
  * occurrence contributes the add-one-smoothed frequency ratio of its
  * hashed bucket as a 1e-6-scaled integer,
  * `term(b) = ((target_count(b) + 1) * 1e6) div (raw_count(b) + 1)`, and
  * the document score is the integer mean of its occurrences' terms —
  * monotone in the same direction as the DSIR log-likelihood ratio.
  *
  * Scale shape (100 TB): the model is ONE map-side-combinable aggregation
  * into `width` buckets (KBs, independent of corpus size — the conditional
  * count rides the same shuffle as the raw count via a `when` sum), the
  * scoring join is broadcast under the size gate, and the corpus text is
  * read once per phase with only (id, bucket) rows ever shuffled.
  */
object Importance {

  /** Score scale: terms are ratio × 1e6, floored. */
  val Scale = 1000000L

  /** Hashed unigram bucket: 30-bit poly hash of the surface token mod
    * `width` — reproducible in the DuckDB oracle.
    */
  private def bucketed(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, width: Int): DataFrame =
    docs.select(col(idCol).as("id"), isTarget.as("tgt"),
        explode(KernelExpressions.wordNgramStrings(col(textCol), 1)).as("tok"))
      .select(col("id"), col("tgt"),
        pmod(Dedup.shingleHash(col("tok")), lit(width)).as("b"))

  /** Per-document importance scores against the target slice defined by
    * `isTarget` (a boolean Column over `docs`' columns). Token-less
    * documents score (n_tokens = 0, dsir_score = 0).
    *
    * @return (id, n_tokens, dsir_score)
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, width: Int = 1024,
      broadcastGateBytes: Long = graft.transform.Transforms.BroadcastGateBytes): DataFrame = {
    val occ = bucketed(docs, idCol, textCol, isTarget, width)
    val model = occ.groupBy(col("b"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("tc"))
      .select(col("b"), expr(s"(tc + 1) * $Scale div (rc + 1)").as("term"))
    val m =
      if (model.queryExecution.optimizedPlan.stats.sizeInBytes <=
          BigInt(broadcastGateBytes)) broadcast(model)
      else model
    // every observed bucket is in the model by construction => inner join
    val scored = occ.join(m, Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("term")).as("s"))
      .select(col("id"), col("n_tokens"), expr("s div n_tokens").as("dsir_score"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dsir_score"), lit(0L)).as("dsir_score"))
  }
}
