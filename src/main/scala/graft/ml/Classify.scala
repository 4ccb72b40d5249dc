package graft.ml

import org.apache.spark.ml.classification.{LinearSVC, OneVsRest, OneVsRestModel}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML operators (SURVEY §2.9): the reference's one-vs-all multiclass
  * SVM (SVMMultiClass.scala:88-111) is exactly `OneVsRest(LinearSVC)` —
  * the replacement the reference itself names
  * (TestClassifierSVM.scala:14). Reference knobs kept: 100 iterations,
  * reg 0.01 (TestClassifierSVM.scala:46-48), 60/40 split seed 11
  * (TestClassifierSVM.scala:41).
  */
object Classify {

  /** M6/P4: features column from an ARRAY<FLOAT> embedding. */
  def toFeatures(df: DataFrame, arrayCol: String): DataFrame =
    df.withColumn("features", array_to_vector(col(arrayCol)))
      .withColumn("label", col("label").cast("double"))

  /** M1: reference split. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(0.6, 0.4), seed = 11)
    (train, test)
  }

  /** M2: train OVA linear SVM. The per-class submodels are independent
    * (reference trains them in a sequential loop,
    * SVMMultiClass.scala:88-111) — parallelism 8 trains them
    * concurrently without changing any result. */
  def train(train: DataFrame): OneVsRestModel = {
    // Reference caps at 100 iterations (TestClassifierSVM.scala:46);
    // tol 1e-4 stops earlier once converged — same cap, less wasted work.
    val svc = new LinearSVC().setMaxIter(100).setRegParam(0.01).setTol(1e-4)
    // Iterative optimizers pay one treeAggregate round per iteration;
    // with small-per-executor data the round cost is per-partition job
    // overhead, so size partitions to the data (AQE doesn't reach
    // ml's internal RDD aggregations).
    val parts = math.max(2, math.min(train.rdd.getNumPartitions, 8))
    val cached = train.coalesce(parts).cache()
    try new OneVsRest().setClassifier(svc).setParallelism(8).fit(cached)
    finally cached.unpersist()
  }

  /** M3/M4: predict + accuracy. */
  def evaluate(model: OneVsRestModel, test: DataFrame): (DataFrame, Double) = {
    val pred = model.transform(test)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(pred)
    (pred, acc)
  }

  /** M5: persistence — same parquet + JSON metadata layout idea as
    * GLMClassificationMultiClassOVAModel.scala:17-51. */
  def save(model: OneVsRestModel, path: String): Unit = model.write.overwrite().save(path)
  def load(path: String): OneVsRestModel = OneVsRestModel.load(path)

  /** End-to-end train/predict on the embeddings table; returns the
    * per-class confusion counts (deterministic enough for a rows-only
    * gate; exact boundary predictions are float-order sensitive). */
  def trainPredictCounts(df: DataFrame): DataFrame = {
    val data = toFeatures(df, "embedding")
    val (tr, te) = split(data)
    val model = train(tr)
    val (pred, _) = evaluate(model, te)
    pred.groupBy(col("label"), col("prediction")).agg(count(lit(1)).as("n"))
  }
}
