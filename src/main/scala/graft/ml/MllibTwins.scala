package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, NaiveBayes}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH, Tokenizer}
import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** MLlib twins of the deterministic §2.12 formulations — the production
  * ML path ("MLlib algorithms replacing MapReduce implementations"). No
  * oracle: MLlib solvers are iterative; tests assert fixed-seed
  * determinism, quality floors, and agreement with the closed-form twins.
  */
object MllibTwins {

  /** embeddings → (features vector, binary label: label < 5). */
  def embeddingFeatures(spark: SparkSession, sf: String): DataFrame = {
    val toVec = udf((a: Seq[Float]) => MlVectors.dense(a.map(_.toDouble).toArray))
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), toVec(col("embedding")).as("features"),
        when(col("label") < 5, 1.0).otherwise(0.0).as("binary_label"),
        col("label"))
  }

  /** Binary logistic regression on the embedding vectors (label < 5). */
  def logistic(spark: SparkSession, sf: String): (DataFrame, Double) = {
    val data = embeddingFeatures(spark, sf)
    val model = new LogisticRegression()
      .setLabelCol("binary_label").setMaxIter(20).setRegParam(0.01)
      .fit(data)
    val scored = model.transform(data)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("binary_label").setMetricName("areaUnderROC")
      .evaluate(scored)
    (scored, auc)
  }

  /** K-Means k=10 with fixed seed — the iterative twin of q_kmeans_step. */
  def kmeans(spark: SparkSession, sf: String, seed: Long = 42L): DataFrame = {
    val data = embeddingFeatures(spark, sf)
    new KMeans().setK(10).setSeed(seed).setMaxIter(5)
      .fit(data).transform(data)
      .select(col("vec_id"), col("prediction"))
  }

  /** Multinomial Naive Bayes over token counts — twin of
    * q_naivebayes_train/predict (class = lang).
    */
  def naiveBayes(spark: SparkSession, sf: String): DataFrame = {
    val docs = Tables.documents(spark, sf)
      .withColumn("lang_idx",
        array_position(lit(Array("de", "en", "es", "fr", "zh")), col("lang")).cast("double") - 1)
    val tokenized = new Tokenizer().setInputCol("text").setOutputCol("words").transform(docs)
    val vectorized = new CountVectorizer().setInputCol("words").setOutputCol("features")
      .fit(tokenized).transform(tokenized)
    new NaiveBayes().setLabelCol("lang_idx").setModelType("multinomial")
      .fit(vectorized).transform(vectorized)
      .select(col("doc_id"), col("lang_idx"), col("prediction"))
  }

  /** Closed-form linear regression twin (normal equations inside MLlib). */
  def linreg(spark: SparkSession, sf: String): (Double, Double) = {
    val toVec = udf((q: Double) => MlVectors.dense(Array(q)))
    val data = Tables.lineitem(spark, sf)
      .select(toVec(col("l_quantity")).as("features"),
        (col("l_extendedprice") * 100).as("label"))
    val model = new LinearRegression().setSolver("normal").fit(data)
    (model.coefficients(0), model.intercept)
  }

  /** MinHashLSH near-dup at scale — approx similarity join on binarized
    * token vectors; recall vs the exact q_neardup_jaccard is test-gated.
    */
  def minhashNeardup(spark: SparkSession, sf: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, sf)
    val tokenized = new Tokenizer().setInputCol("text").setOutputCol("words").transform(docs)
    val vectorized = new CountVectorizer().setInputCol("words").setOutputCol("features")
      .setBinary(true)
      .fit(tokenized).transform(tokenized)
      .filter(udf((v: org.apache.spark.ml.linalg.Vector) => v.numNonzeros > 0).apply(col("features")))
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(42L)
      .fit(vectorized)
    // approxSimilarityJoin keeps dist < threshold STRICTLY; nudge the bound
    // so pairs at exactly J = threshold are kept (dist <= 1-threshold)
    model.approxSimilarityJoin(vectorized, vectorized, 1.0 - threshold + 1e-9, "jaccard_dist")
      .select(col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"),
        (lit(1.0) - col("jaccard_dist")).as("jaccard"))
      .filter(col("d1") < col("d2"))
  }

  /** Random-projection LSH ANN — approx nearest neighbors for a query
    * vector; recall vs exact brute-force cosine is test-gated.
    */
  def annNeighbors(spark: SparkSession, sf: String, queryVecId: Long, k: Int): DataFrame = {
    val data = embeddingFeatures(spark, sf)
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(0.5).setNumHashTables(4).setSeed(42L)
      .fit(data)
    val key = data.filter(col("vec_id") === queryVecId)
      .select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    model.approxNearestNeighbors(data.filter(col("vec_id") =!= queryVecId), key, k)
      .select(col("vec_id"), col("distCol"))
  }
}
