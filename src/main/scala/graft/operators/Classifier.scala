package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed trained quality classifier — batch logistic regression by
  * full-gradient descent, the Spark-native shape of the fasttext-style
  * "model-based quality filter" used by large-scale corpus pipelines
  * (CCNet/GPT-3-style weak supervision: cheap deterministic labels train a
  * model that then scores every document).
  *
  * Scale contract (the 100 TB lens): the FEATURE FRAME stays distributed;
  * each of the `iterations` steps is ONE aggregation job whose map-side
  * partial combine reduces to a single (k+1)-element gradient row — the
  * driver only ever receives `iterations × (k+1)` doubles (the weight
  * vector), never data rows. Scoring is a pure codegen'd column expression
  * (no UDF, no model broadcast — the weights inline as literals).
  *
  * Determinism: full-batch gradients (no sampling, no shuffling-dependent
  * minibatches) make training a pure function of the dataset, so the DuckDB
  * oracle can replay the exact iteration chain.
  */
object Classifier {

  /** Train logistic weights `[bias, w1..wk]` on `featureCols` against the
    * 0/1 `labelCol`. Full-batch GD: `w -= lr * Σ(σ(w·x) - y)·x / n`,
    * starting from zeros. `df` is evaluated `iterations` times — persist or
    * localCheckpoint upstream if featurization is expensive.
    */
  def trainLogistic(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iterations: Int = 5, learningRate: Double = 0.5): Array[Double] = {
    require(iterations >= 1 && featureCols.nonEmpty)
    val k = featureCols.size
    val n = df.count().toDouble
    require(n > 0, "cannot train on an empty frame")
    var w = Array.fill(k + 1)(0.0)
    for (_ <- 1 to iterations) {
      val margin = this.margin(featureCols.map(col), w)
      val resid = (lit(1.0) / (lit(1.0) + exp(-margin))) - col(labelCol)
      // one job: k+1 map-side-combined sums -> a single driver row
      val grads = df.agg(
        sum(resid).as("g0"),
        featureCols.zipWithIndex.map { case (c, i) =>
          sum(resid * col(c)).as(s"g${i + 1}") }: _*)
        .head()
      w = Array.tabulate(k + 1)(i => w(i) - learningRate * grads.getDouble(i) / n)
    }
    w
  }

  /** `σ(w·x)` as a column over `featureCols` — weights inline as literals,
    * so the score stays inside whole-stage codegen.
    */
  def scoreLogistic(featureCols: Seq[Column], weights: Array[Double]): Column = {
    require(weights.length == featureCols.size + 1,
      s"${featureCols.size} features need ${featureCols.size + 1} weights (bias first)")
    lit(1.0) / (lit(1.0) + exp(-margin(featureCols, weights)))
  }

  private def margin(featureCols: Seq[Column], weights: Array[Double]): Column =
    featureCols.zipWithIndex.foldLeft(lit(weights(0))) {
      case (acc, (c, i)) => acc + c * lit(weights(i + 1))
    }
}
