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

  /** M2/M3 deterministic trainer twin (the oracled counterpart of the
    * SGD gate): one-vs-all LINEAR classifier trained in CLOSED FORM —
    * per class, independent univariate least squares on four fixed
    * Walsh ±1 sign-projections of the embedding (the diagonal
    * approximation of the normal equations; Walsh rows are orthogonal,
    * so for mean-free random-projection features the diagonal IS the
    * solution up to sampling noise). Same train/predict/confusion
    * surface as the reference's OVA SVM loop (SVMMultiClass.scala:
    * 88-111) but every number is reproducible bit-for-bit:
    *
    *  - features: f_k = Σ_i emb[i]·(1−2·bit_k(i)) as a strict
    *    left-fold (the s_ann_brute discipline), then quantized with
    *    FLOOR(f·p) into a BIGINT, where the scale p ∈ {1000, 100, 10,
    *    1} is picked from the train count by thresholds BOTH engines
    *    state (n·33·p < 2^26.5 keeps every moment under 2^53);
    *  - moments per (class, k): exact integer sums (n, ΣF, ΣF², n_c,
    *    ΣF_c) — under 2^53 by the p rule (and still asserted), so
    *    later int→double casts are exact in any engine;
    *  - weights: w = s·A/D, b = Σy/n − A·ΣF/(D·n) with A = n·ΣFy −
    *    ΣF·Σy, D = n·ΣF² − (ΣF)² — evaluated as a FIXED IEEE op tree
    *    (each step one correctly-rounded op), so the oracle rebuilds
    *    identical doubles;
    *  - prediction: argmax over the 10 class scores with min-class
    *    tiebreak (max of (score, −class) structs ≡ ORDER BY score
    *    DESC, class).
    *
    * Scale shape: train = ONE groupBy(label) over the train split
    * (map-side combinable, 3·K numbers per class); the collect is
    * bounded by the class count; predict = a pure map over the test
    * split with the 10×K coefficients inlined as literals — zero
    * shuffle on the corpus side, only the final confusion groupBy
    * (≤ classes² rows) exchanges. */
  def fixedPointConfusion(df: DataFrame): DataFrame = {
    import graft.sim.Similarity
    val K = 4
    def signs(k: Int): Seq[Double] =
      (0 until 64).map(i => if (((i >> k) & 1) == 0) 1.0 else -1.0)
    val bkt = graft.text.TextOps.hashBucket(col("vec_id"), 10)
    // Scale-adaptive quantization (round-8 sf10 finding): the exact
    // integer moments d = n·Σf² − (Σf)² grow as n²·(33·p)², so a fixed
    // p = 1000 blows the 2^53 exact-cast bound near n ≈ 3k train rows'
    // worst case (first tripped at the 100x probe's 180k). Both engines
    // derive p from the SAME train count with the SAME thresholds
    // (n·33·p < 2^26.5 guarantees the bound), and quantize with
    // FLOOR(dot·p) — the bit-portable quantizer (the dsum/psi lesson) —
    // instead of a double→DECIMAL cast whose rounding is DuckDB-build
    // dependent. Past 2.8M train rows the Long algebra would need
    // BigInt weights: loud error, documented cap.
    val nTrain = df.where(bkt =!= 9).count()
    val p: Double =
      if (nTrain <= 2800L) 1000.0
      else if (nTrain <= 28000L) 100.0
      else if (nTrain <= 280000L) 10.0
      else if (nTrain <= 2800000L) 1.0
      else throw new IllegalArgumentException(
        s"fixed-point trainer beyond exact-Long range at n=$nTrain: use BigInt weights")
    val feats = df.select(
      Seq(col("vec_id"), col("label"), bkt.as("bkt")) ++
        (1 to K).map { k =>
          val sarr = array(signs(k - 1).map(lit): _*)
          floor(Similarity.dot(col("embedding"), sarr) * lit(p)).as(s"f$k")
        }: _*)
    val train = feats.where(col("bkt") =!= 9)
    val test = feats.where(col("bkt") === 9)

    // one aggregation; globals derived by exact Long sums over the
    // per-class rows (collect bounded by the class count)
    val byClass = train.groupBy(col("label"))
      .agg(count(lit(1)).as("nc"),
        (1 to K).map(k => sum(col(s"f$k")).as(s"sf$k")) ++
          (1 to K).map(k => sum(col(s"f$k") * col(s"f$k")).as(s"sff$k")): _*)
      .collect()
    def sumExact(xs: Iterable[Long]): Long =
      xs.foldLeft(0L)(java.lang.Math.addExact)
    val n = sumExact(byClass.map(_.getAs[Long]("nc")))
    val sf = (1 to K).map(k => sumExact(byClass.map(_.getAs[Long](s"sf$k"))))
    val sff = (1 to K).map(k => sumExact(byClass.map(_.getAs[Long](s"sff$k"))))
    require(n > 0, "empty training split")

    // per (class, k): exact integer A, D then the fixed double op tree
    val params: Seq[(Int, Seq[(Double, Double, Double)])] = byClass.toSeq.map { r =>
      val cls = r.getAs[Int]("label")
      val nc = r.getAs[Long]("nc")
      val sy = 2L * nc - n
      val per = (1 to K).map { k =>
        val sfc = r.getAs[Long](s"sf$k")
        val sfk = sf(k - 1); val sffk = sff(k - 1)
        // exact-or-throw integer moment algebra: a silent Long wrap
        // here would train wrong weights while the oracle computes the
        // same expression exactly in HUGEINT — a loud error beats a
        // silent divergence (review finding, round 7)
        import java.lang.Math.{addExact, multiplyExact, subtractExact}
        val a = subtractExact(
          multiplyExact(n, subtractExact(multiplyExact(2L, sfc), sfk)),
          multiplyExact(sfk, sy))
        val d = subtractExact(multiplyExact(n, sffk), multiplyExact(sfk, sfk))
        require(d > 0, s"degenerate feature f$k (zero train variance)")
        require(d < (1L << 53) && math.abs(a) < (1L << 53),
          s"A/D exceed 2^53 (exact int→double cast bound): requantize")
        // const = Sy/n − A·ΣF/(D·n): one op per step, oracle-identical
        val c = sy.toDouble / n.toDouble -
          (a.toDouble * sfk.toDouble) / (d.toDouble * n.toDouble)
        (a.toDouble, d.toDouble, c)
      }
      (cls, per)
    }.sortBy(_._1)

    // score_c = ((s1 + s2) + s3) + s4, s_k = (A·F)/D + const — same
    // parenthesization as the oracle SQL
    val scoreCols = params.map { case (cls, per) =>
      val sks = per.zipWithIndex.map { case ((a, d, c), i) =>
        (lit(a) * col(s"f${i + 1}").cast("double")) / lit(d) + lit(c)
      }
      (cls, sks.reduceLeft(_ + _))
    }
    val best = greatest(scoreCols.map { case (cls, sc) =>
      struct(sc.as("s"), lit(-cls).as("nc"))
    }: _*)
    test.withColumn("pred", -best.getField("nc"))
      .groupBy(col("label"), col("pred")).agg(count(lit(1)).as("n"))
  }

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
