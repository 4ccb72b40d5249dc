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

  /** Partition count sized to the data volume: ~16 MiB of vector rows
    * per partition (min 2, capped at 10k for treeAggregate sanity).
    * Iterative optimizers pay one treeAggregate round per iteration, so
    * partition count is the per-iteration task overhead — a constant cap
    * would either waste rounds on tiny data or strangle a 100x training
    * set; sizing by bytes scales both ways. */
  def sizedPartitions(rows: Long, bytesPerRow: Long, targetBytes: Long = 16L << 20): Int = {
    val rowsPerPart = math.max(1L, targetBytes / math.max(1L, bytesPerRow))
    math.max(1L, math.min(10000L, (rows + rowsPerPart - 1) / rowsPerPart)).toInt
  }

  /** M2: train OVA linear SVM. The per-class submodels are independent
    * (reference trains them in a sequential loop,
    * SVMMultiClass.scala:88-111) — parallelism 8 trains them
    * concurrently without changing any result. */
  def train(train: DataFrame): OneVsRestModel = {
    // Reference caps at 100 iterations (TestClassifierSVM.scala:46);
    // tol 1e-4 stops earlier once converged — same cap, less wasted work.
    val svc = new LinearSVC().setMaxIter(100).setRegParam(0.01).setTol(1e-4)
    // one sizing job: <1% of a 100-iteration fit, and AQE doesn't reach
    // ml's internal RDD aggregations so we must size explicitly. Each
    // treeAggregate round pays a barrier per partition, so tiny data
    // trains fastest on ONE partition (measured: 1 part 8.6s vs 8 parts
    // 22.8s at sf0.1) while a 100x training set gets 16 MiB partitions.
    val sz = train.agg(count(lit(1)), first(col("features"))).head()
    val rows = sz.getLong(0)
    val dim = sz.getAs[org.apache.spark.ml.linalg.Vector](1).size
    val parts = sizedPartitions(rows, 8L * dim + 32)
    val sized = if (parts < train.rdd.getNumPartitions) train.coalesce(parts)
                else if (parts == train.rdd.getNumPartitions) train
                else train.repartition(parts)
    val cached = sized.cache()
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
    // transform only — the evaluator's accuracy pass is a separate full
    // aggregation job and this query's consumers never read it
    model.transform(te)
      .groupBy(col("label"), col("prediction")).agg(count(lit(1)).as("n"))
  }
}
