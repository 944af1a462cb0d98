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
