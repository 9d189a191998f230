package graft.functions

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Corpus extraction-quality metric as a typed partial+final Aggregator —
  * the direct graft of the reference's RecMetric (exact-match accuracy +
  * 1 − normalized Levenshtein, accumulated as `correct_num/all_num` partials
  * then finalized; ppocr/metrics/rec_metric.py:23-78). The buffer is tiny and
  * mergeable, so the metric computes in one pass with map-side combine — the
  * shape Spark's Aggregator exists for (SURVEY.md §2.11).
  */
object MetricsAggregator {

  final case class Pair(got: String, want: String)
  final case class Buf(correct: Long, total: Long, normEditSum: Double)
  final case class QaMetric(exactMatch: Double, meanNormEdit: Double, total: Long)

  /** Iterative two-row Levenshtein (no external deps; O(len_a·len_b)).
    * Equal strings short-circuit to 0 and a shared prefix/suffix is trimmed
    * first — in the QA use the common case is byte-identical extraction, and
    * O(n²) DP on equal multi-KB texts was the whole cost of the metric
    * (measured 9.5 s of the x08 query). */
  def levenshtein(a0: String, b0: String): Int = {
    if (a0 == b0) return 0
    // trim common prefix/suffix (cannot change the distance)
    var lo = 0
    val maxLo = math.min(a0.length, b0.length)
    while (lo < maxLo && a0.charAt(lo) == b0.charAt(lo)) lo += 1
    var aHi = a0.length
    var bHi = b0.length
    while (aHi > lo && bHi > lo && a0.charAt(aHi - 1) == b0.charAt(bHi - 1)) {
      aHi -= 1; bHi -= 1
    }
    val a = a0.substring(lo, aHi)
    val b = b0.substring(lo, bHi)
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  val qa: Aggregator[Pair, Buf, QaMetric] = new Aggregator[Pair, Buf, QaMetric] {
    override def zero: Buf = Buf(0L, 0L, 0.0)
    override def reduce(b: Buf, p: Pair): Buf = {
      val exact = if (p.got == p.want) 1L else 0L
      val maxLen = math.max(p.got.length, p.want.length)
      val norm =
        if (maxLen == 0) 0.0
        else levenshtein(p.got, p.want).toDouble / maxLen
      Buf(b.correct + exact, b.total + 1L, b.normEditSum + norm)
    }
    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.correct + b.correct, a.total + b.total, a.normEditSum + b.normEditSum)
    override def finish(b: Buf): QaMetric =
      if (b.total == 0) QaMetric(0.0, 0.0, 0L)
      else QaMetric(b.correct.toDouble / b.total, b.normEditSum / b.total, b.total)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[QaMetric] = Encoders.product[QaMetric]
  }

  /** Corpus-level QA: extraction output vs golden expectation. */
  def extractionQa(pairs: Dataset[Pair]): Dataset[QaMetric] =
    pairs.select(qa.toColumn)

  // ------------------------------------------------------------------
  // DetMetric analog: block-label detection precision/recall/hmean
  // ------------------------------------------------------------------

  final case class LabelPair(pred: Seq[String], gt: Seq[String])
  final case class DetBuf(matched: Long, det: Long, gt: Long)
  final case class DetMetric(precision: Double, recall: Double, hmean: Double,
                             matched: Long, det: Long, gt: Long)

  /** Detection-quality metric over extraction spans — the graft of the
    * reference's DetMetric (ppocr/metrics/det_metric.py:24-77 +
    * eval_det_iou.py combine_results): per document, predicted block labels
    * are matched against the golden label sequence, matched/det/gt counts are
    * summed GLOBALLY across the corpus, and precision = matched/det,
    * recall = matched/gt, hmean = 2PR/(P+R) — exactly combine_results'
    * global-sum semantics, not a per-doc mean.
    *
    * The match rule recasts IoU≥0.5 box pairing for the discrete domain:
    * blocks are emitted in document order on both sides, so pred[i] pairs
    * with gt[i] (index alignment IS the geometry) and a pair matches when
    * the labels are equal. Partial+final aggregation with a 3-long buffer —
    * map-side combine, one pass, same shape as [[qa]]. */
  val det: Aggregator[LabelPair, DetBuf, DetMetric] =
    new Aggregator[LabelPair, DetBuf, DetMetric] {
      override def zero: DetBuf = DetBuf(0L, 0L, 0L)
      override def reduce(b: DetBuf, p: LabelPair): DetBuf = {
        val n = math.min(p.pred.length, p.gt.length)
        var m = 0L
        var i = 0
        while (i < n) { if (p.pred(i) == p.gt(i)) m += 1; i += 1 }
        DetBuf(b.matched + m, b.det + p.pred.length, b.gt + p.gt.length)
      }
      override def merge(a: DetBuf, b: DetBuf): DetBuf =
        DetBuf(a.matched + b.matched, a.det + b.det, a.gt + b.gt)
      override def finish(b: DetBuf): DetMetric = {
        val p = if (b.det == 0) 0.0 else b.matched.toDouble / b.det
        val r = if (b.gt == 0) 0.0 else b.matched.toDouble / b.gt
        val h = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
        DetMetric(p, r, h, b.matched, b.det, b.gt)
      }
      override def bufferEncoder: Encoder[DetBuf] = Encoders.product[DetBuf]
      override def outputEncoder: Encoder[DetMetric] = Encoders.product[DetMetric]
    }

  /** Corpus-level detection QA: span labels vs golden block labels. */
  def detectionQa(pairs: Dataset[LabelPair]): Dataset[DetMetric] =
    pairs.select(det.toColumn)
}
