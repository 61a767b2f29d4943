package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("one GD iteration matches the hand-computed full-batch gradient") {
    // two rows, one feature: x=1 y=1, x=-1 y=0; w starts (0,0) so σ(0)=0.5
    // residuals: (0.5-1)=-0.5 and (0.5-0)=0.5
    // g_bias = (-0.5 + 0.5) = 0; g_x = (-0.5*1 + 0.5*(-1)) = -1
    // w after one step (lr=0.5, n=2): bias 0, w_x = 0 - 0.5*(-1)/2 = 0.25
    val df = Seq((1.0, 1.0), (-1.0, 0.0)).toDF("x", "y")
    val w = Classifier.trainLogistic(df, Seq("x"), "y", iterations = 1, learningRate = 0.5)
    assert(w(0) === 0.0)
    assert(math.abs(w(1) - 0.25) < 1e-12, w.toSeq)
  }

  test("training separates separable data and scoring ranks by class") {
    val df = (1 to 50).map(i => (2.0 + (i % 5) * 0.1, 1.0)) ++
      (1 to 50).map(i => (-2.0 - (i % 5) * 0.1, 0.0))
    val feats = df.toDF("x", "y")
    val w = Classifier.trainLogistic(feats, Seq("x"), "y", iterations = 20)
    val scored = feats.select(col("y"),
      Classifier.scoreLogistic(Seq(col("x")), w).as("s"))
      .groupBy("y").agg(avg("s").as("avg_s")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(scored(1.0) > 0.6 && scored(0.0) < 0.4,
      s"no separation after training: $scored")
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("weight/feature arity mismatch is rejected") {
    intercept[IllegalArgumentException](
      Classifier.scoreLogistic(Seq(col("x")), Array(0.0, 1.0, 2.0)))
    intercept[IllegalArgumentException](
      Classifier.trainLogistic(Seq((1.0, 1.0)).toDF("x", "y"), Seq.empty, "y"))
  }
}
