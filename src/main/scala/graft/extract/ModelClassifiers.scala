package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** C3/C4 model-classifier plumbing — the Spark-side shape of the reference's
  * GPU-bound classifiers, with the model behind a pluggable scorer trait.
  *
  * The scorers here are STUBS (clearly marked): no transformer runtime
  * exists in this sandbox, so they produce deterministic pseudo-predictions
  * from portable integer hashes. Everything around them is real and
  * load-bearing at scale: fixed-size batching inside mapPartitions (the
  * reference's predict-batch-of-32, targets.py:120-127 /
  * bert_token_classifier.py:468-508), one scorer handle per partition (the
  * "load model once per container" pattern, inference.py:929-941), the
  * whole-text-span contract for sequence classification
  * (targets.py:96-142: prob >= threshold, default 0.524, emits ONE span
  * (0, len(text))), and BIO-token span reconstruction via BioSpans
  * (bert_token_classifier.py:119-193). Swapping a stub for a real ONNX/JNI
  * scorer changes no plan shape.
  *
  * mapPartitions is deliberate here (one of the two sanctioned uses in this
  * codebase): batched model inference is genuinely per-partition imperative
  * work — a column expression cannot amortize a model forward pass across
  * rows.
  */
object ModelClassifiers {

  /** Passage-level sequence classifier: one probability per text (C3). */
  trait SequenceScorer extends Serializable {
    def scoreBatch(texts: Seq[String]): Seq[Double]
  }

  /** Token-level classifier: per text, aligned (BIO label, predicted-label
    * probability, (startChar, endChar)) arrays — the shape of a fast
    * tokenizer's offset_mapping plus a token-classification head (C4). */
  trait TokenScorer extends Serializable {
    def scoreBatch(texts: Seq[String]): Seq[(Array[Int], Array[Double], Array[(Int, Int)])]
  }

  @transient private lazy val digestTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** JVM twin of Dedup.portableTokenHash: first 15 hex chars of md5 as a
    * 60-bit long — shared with the DuckDB oracle dialect. Assembled from the
    * first 7.5 digest BYTES directly (big-endian, top nibble of byte 7) —
    * equal to parsing the 15-hex-char prefix, without per-token hex
    * formatting; the digest is thread-local (this runs per token inside
    * mapPartitions). */
  private[extract] def portableHash(tok: String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(tok.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** STUB sequence scorer — deterministic and SQL-replicable: probability =
    * (sum over whitespace tokens of portableHash(tok) mod 1000003, mod 1000)
    * / 1000. Pure integer arithmetic, so the DuckDB oracle reproduces every
    * probability bit-exactly. NOT a model; the plumbing around it is. */
  final class StubSequenceScorer extends SequenceScorer {
    def scoreBatch(texts: Seq[String]): Seq[Double] =
      texts.map { t =>
        var acc = 0L
        t.split(" ", -1).foreach { tok => acc = (acc + portableHash(tok) % 1000003L) % 1000003L }
        (acc % 1000L).toDouble / 1000.0
      }
  }

  /** STUB token scorer — a whitespace "fast tokenizer" (char offsets per
    * token) plus deterministic BIO labels: B on trigger tokens, I on
    * continuation tokens immediately following a non-O token, O otherwise;
    * the predicted-label probability is hash-derived in [0.5, 1.0). A
    * leading (0,0) special token exercises the reference's special-token
    * skip branch. NOT a model; the offsets and the reconstruction are real. */
  final class StubTokenScorer(triggers: Set[String], continuations: Set[String]) extends TokenScorer {
    def scoreBatch(texts: Seq[String]): Seq[(Array[Int], Array[Double], Array[(Int, Int)])] =
      texts.map { text =>
        val labels = scala.collection.mutable.ArrayBuffer(BioSpans.OLabel)
        val probs = scala.collection.mutable.ArrayBuffer(1.0)
        val offs = scala.collection.mutable.ArrayBuffer((0, 0)) // [CLS]-style special token
        var i = 0
        val n = text.length
        var prevLabel = BioSpans.OLabel
        while (i < n) {
          if (text.charAt(i) == ' ') i += 1
          else {
            var j = i
            while (j < n && text.charAt(j) != ' ') j += 1
            val tok = text.substring(i, j)
            val lower = tok.toLowerCase
            val label =
              if (triggers(lower)) BioSpans.BLabel
              else if (continuations(lower) && prevLabel != BioSpans.OLabel) BioSpans.ILabel
              else BioSpans.OLabel
            labels += label
            // single division (500+m)/1000 rather than 0.5 + m/1000: the
            // latter double-rounds and can differ from the SQL twin's value
            // in the last ulp
            probs += (500L + portableHash(tok) % 500L).toDouble / 1000.0
            offs += ((i, j))
            prevLabel = label
            i = j
          }
        }
        (labels.toArray, probs.toArray, offs.toArray)
      }
  }

  /** Shared loader for the integer-quantized linear models behind the
    * real-weights scorers (trained offline by tools/train_c3c4_models.py;
    * weights ship as classpath resources). Parsed once per JVM and cached —
    * scorer instances serialize only the resource name. */
  private[extract] object LinearWeights {
    final case class Seq1(dim: Int, scale: Long, bias: Long, w: Array[Long])
    final case class Tok3(dim: Int, scale: Long, biases: Array[Long], w: Array[Array[Long]])

    private val cache = scala.collection.concurrent.TrieMap.empty[String, AnyRef]

    private def lines(resource: String): Array[String] = {
      val in = getClass.getResourceAsStream(resource)
      require(in != null, s"missing model resource $resource")
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    }
    private def kv(header: String): Map[String, Long] =
      header.split(" ").map { p => val Array(k, v) = p.split("="); k -> v.toLong }.toMap

    def seq1(resource: String): Seq1 = cache.getOrElseUpdate(resource, {
      val ls = lines(resource)
      val h = kv(ls(0))
      Seq1(h("dim").toInt, h("scale"), h("bias"), ls(1).trim.split(" ").map(_.toLong))
    }).asInstanceOf[Seq1]

    def tok3(resource: String): Tok3 = cache.getOrElseUpdate(resource, {
      val ls = lines(resource)
      val h = kv(ls(0))
      Tok3(h("dim").toInt, h("scale"),
        ls(1).trim.split(" ").map(_.toLong),
        Array(2, 3, 4).map(i => ls(i).trim.split(" ").map(_.toLong)))
    }).asInstanceOf[Tok3]
  }

  /** REAL-WEIGHTS sequence scorer (C3): hashed bag-of-words logistic
    * regression executed in pure JVM. The logit is EXACT integer arithmetic
    * (z_int = sum of quantized bucket weights + bias, scale 2^16), shared
    * bit-for-bit with the offline trainer that emitted the parity fixture;
    * probability = sigmoid(z_int / scale). This is a genuinely LEARNED model
    * (81% accuracy approximating a non-linear target rule), proving the
    * SequenceScorer seam carries real model weights, not a hash. */
  final class LogisticSequenceScorer(resource: String = "/graft/c3_weights.txt") extends SequenceScorer {
    def scoreBatch(texts: Seq[String]): Seq[Double] = {
      val m = LinearWeights.seq1(resource)
      texts.map { t =>
        var z = m.bias
        t.split(" ", -1).foreach { tok =>
          z += m.w((portableHash(tok.toLowerCase) % m.dim).toInt)
        }
        1.0 / (1.0 + math.exp(-(z.toDouble / m.scale)))
      }
    }
  }

  /** REAL-WEIGHTS token scorer (C4): 3-class (O/B/I) linear token classifier
    * over two-hot features [current-token bucket | dim + previous-token
    * bucket] + class bias. Class scores are exact integers, so the argmax
    * label (ties -> lowest class id, matching np.argmax) is bit-reproducible
    * against the trainer; the predicted-label probability is the softmax of
    * the integer scores / scale. Tokenization mirrors StubTokenScorer:
    * whitespace tokens with char offsets plus a leading (0,0) special token. */
  final class SoftmaxTokenScorer(resource: String = "/graft/c4_weights.txt") extends TokenScorer {
    def scoreBatch(texts: Seq[String]): Seq[(Array[Int], Array[Double], Array[(Int, Int)])] = {
      val m = LinearWeights.tok3(resource)
      val bos = (portableHash("") % m.dim).toInt
      texts.map { text =>
        val labels = scala.collection.mutable.ArrayBuffer(BioSpans.OLabel)
        val probs = scala.collection.mutable.ArrayBuffer(1.0)
        val offs = scala.collection.mutable.ArrayBuffer((0, 0))
        var prevB = bos
        var i = 0
        val n = text.length
        while (i < n) {
          if (text.charAt(i) == ' ') i += 1
          else {
            var j = i
            while (j < n && text.charAt(j) != ' ') j += 1
            val curB = (portableHash(text.substring(i, j).toLowerCase) % m.dim).toInt
            val z = Array.tabulate(3)(c => m.w(c)(curB) + m.w(c)(m.dim + prevB) + m.biases(c))
            var lab = 0
            if (z(1) > z(lab)) lab = 1
            if (z(2) > z(lab)) lab = 2
            // softmax of the predicted class with max-shift, matching the
            // trainer's fold: exp(z_lab - z_max) / sum(exp(z_c - z_max))
            val zf = z.map(_.toDouble / m.scale)
            val zm = zf.max
            val exps = zf.map(v => math.exp(v - zm))
            labels += lab
            probs += exps(lab) / (exps(0) + exps(1) + exps(2))
            offs += ((i, j))
            prevB = curB
            i = j
          }
        }
        (labels.toArray, probs.toArray, offs.toArray)
      }
    }
  }

  /** C3: passage-level classification -> whole-text spans
    * (targets.py:96-142). Output: (passage_id, start, end, concept_id,
    * probability) for passages scoring >= threshold. */
  def predictSequence(
      spark: SparkSession,
      passages: DataFrame,
      scorer: SequenceScorer,
      conceptId: String,
      threshold: Double = 0.524,
      batchSize: Int = 32
  ): DataFrame = {
    import spark.implicits._
    passages
      .select(col("passage_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val probs = scorer.scoreBatch(batch.map(_._2))
          batch.lazyZip(probs).collect {
            case ((id, text), p) if p >= threshold => (id, 0, text.length, p)
          }
        }
      }
      .toDF("passage_id", "start", "end", "probability")
      .select(
        col("passage_id"),
        col("start"),
        col("end"),
        org.apache.spark.sql.functions.lit(conceptId).as("concept_id"),
        col("probability")
      )
  }

  /** C4: token-level classification -> sub-passage spans via BIO
    * reconstruction (bert_token_classifier.py:468-508). Output one row per
    * surviving span: (passage_id, start, end, concept_id, probability). */
  def predictTokenSpans(
      spark: SparkSession,
      passages: DataFrame,
      scorer: TokenScorer,
      conceptId: String,
      threshold: Option[Double] = None,
      batchSize: Int = 32
  ): DataFrame = {
    import spark.implicits._
    passages
      .select(col("passage_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val scored = scorer.scoreBatch(batch.map(_._2))
          batch.lazyZip(scored).flatMap { case ((id, _), (labels, probs, offs)) =>
            val spans = BioSpans.reconstruct(labels, probs, offs)
            val kept = threshold match {
              case Some(t) => spans.filter(_.probability >= t)
              case None    => spans
            }
            kept.map(s => (id, s.start, s.end, s.probability))
          }
        }
      }
      .toDF("passage_id", "start", "end", "probability")
      .select(
        col("passage_id"),
        col("start"),
        col("end"),
        org.apache.spark.sql.functions.lit(conceptId).as("concept_id"),
        col("probability")
      )
  }
}
