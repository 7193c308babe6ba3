package graft.ops

import graft.functions.{GraftUnaryCodegen, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Trained quality classifier — the supervised complement of the heuristic
  * batteries (qualityScore, Gopher rules) and the distribution-matching
  * scorer ([[Dsir]]): a logistic-regression filter over hashed word
  * n-grams, the same shape as the fastText classifiers CCNet-style
  * pipelines train on "reference corpus vs raw crawl" labels (Wenzek et
  * al., "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data", LREC 2020).
  *
  * Scale shape mirrors BPE/centroid training: the LABELED sets are
  * curated and small by nature, so a deterministic hash-ordered sample of
  * each collects to the driver for the (inherently sequential)
  * gradient-descent loop; SCORING the 100 TB corpus is a single codegen'd
  * scan — the weight table rides as a reference object, per-doc cost is
  * one hash + one table add per gram, no shuffle, no join.
  *
  * Determinism: sampling is hash-of-id ordered, training is full-batch GD
  * with fixed iterations (no RNG, no data-order dependence), scoring is a
  * pure projection. Same inputs → bit-identical model and scores.
  */
object QualityClassifier {

  /** Feature grams of a text column: word unigrams + bigrams of the
    * normalized text (the engine-wide shingle semantics).
    */
  def featureGrams(c: Column): Column =
    concat(TextFunctions.wordShingles(c, 1), TextFunctions.wordShingles(c, 2))

  /** A trained model: hashed-bucket weights + bias. */
  case class Model(weights: Array[Double], bias: Double) {
    def dims: Int = weights.length

    /** P(quality) of a text column — codegen'd single-pass projection. */
    def score(text: Column): Column =
      ColumnBridge.column(HashedLogitExpr(
        ColumnBridge.expression(featureGrams(text)), weights, bias))
  }

  /** Train on labeled positives/negatives (e.g. a curated reference corpus
    * vs raw crawl). Each side contributes a deterministic sample of
    * `samplePerClass` docs.
    */
  def train(
      positives: DataFrame,
      negatives: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int = 1024,
      samplePerClass: Int = 4096,
      iters: Int = 200,
      lr: Double = 0.5,
      l2: Double = 1e-4,
  ): Model = {
    require(dims >= 2, "dims must be >= 2")
    def sampleGrams(df: DataFrame): Array[Array[String]] = df
      .select(xxhash64(col(idCol)).as("__h"), featureGrams(col(textCol)).as("__g"))
      .orderBy(col("__h"))
      .limit(samplePerClass)
      .select(col("__g"))
      .collect()
      .map(_.getSeq[String](0).toArray)
    val pos = sampleGrams(positives)
    val neg = sampleGrams(negatives)
    require(pos.nonEmpty && neg.nonEmpty, "both classes need at least one document")

    // sparse L1-normalized bucket features per sampled doc
    val xs = (pos ++ neg).map { grams =>
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      grams.foreach { g =>
        val b = QualityClassifierImpl.bucket(g, dims)
        m.update(b, m.getOrElse(b, 0.0) + 1.0)
      }
      val n = math.max(1, grams.length).toDouble
      // sorted for deterministic accumulation order
      m.iterator.map { case (j, c) => (j, c / n) }.toArray.sortBy(_._1)
    }
    val ys = Array.fill(pos.length)(1.0) ++ Array.fill(neg.length)(0.0)
    val n  = xs.length

    val w = new Array[Double](dims)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](dims)
      var gb = 0.0
      var i  = 0
      while (i < n) {
        var z = b
        xs(i).foreach { case (j, v) => z += w(j) * v }
        val p   = 1.0 / (1.0 + math.exp(-z))
        val err = p - ys(i)
        xs(i).foreach { case (j, v) => gw(j) += err * v }
        gb += err
        i += 1
      }
      var j = 0
      while (j < dims) {
        w(j) -= lr * (gw(j) / n + l2 * w(j))
        j += 1
      }
      b -= lr * (gb / n)
      it += 1
    }
    Model(w, b)
  }

  /** Persist a model as a `(idx, weight)` table (idx = dims is the bias). */
  def saveModel(spark: SparkSession, model: Model, table: graft.model.Table): Unit = {
    import spark.implicits._
    val rows = model.weights.zipWithIndex.map { case (v, i) => (i, v) } :+ (model.dims, model.bias)
    TableIO.overwrite(spark, rows.toSeq.toDF("idx", "weight"), table)
  }

  /** Load a model persisted by [[saveModel]]. */
  def loadModel(spark: SparkSession, table: graft.model.Table): Model = {
    val rows = spark.table(table.qualifiedName)
      .orderBy(col("idx"))
      .collect()
      .map(r => (r.getInt(r.fieldIndex("idx")), r.getDouble(r.fieldIndex("weight"))))
    val dims = rows.length - 1
    Model(rows.take(dims).map(_._2), rows.last._2)
  }
}

object QualityClassifierImpl {
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Feature bucket of a gram: first 4 md5 bytes (big-endian, masked
    * non-negative) mod dims — stable across JVMs and engines.
    */
  def bucket(gram: String, dims: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = ((d(0) & 0x7f) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    h % dims
  }

  /** σ(mean-bucket-weight + bias) over a gram array, one pass. */
  def score(grams: ArrayData, weights: Array[Double], bias: Double): Double = {
    var acc = 0.0
    var i   = 0
    val n   = grams.numElements()
    while (i < n) {
      acc += weights(bucket(grams.getUTF8String(i).toString, weights.length))
      i += 1
    }
    val z = bias + (if (n > 0) acc / n else 0.0)
    1.0 / (1.0 + math.exp(-z))
  }
}

/** Hashed-n-gram logistic score as a single codegen'd tree node; the weight
  * table rides as a reference object.
  */
case class HashedLogitExpr(child: Expression, weights: Array[Double], bias: Double)
    extends GraftUnaryCodegen {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    QualityClassifierImpl.score(input.asInstanceOf[ArrayData], weights, bias)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qcWeights", weights, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.ops.QualityClassifierImpl.score($c, $ref, $bias)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): HashedLogitExpr =
    copy(child = newChild)
}
