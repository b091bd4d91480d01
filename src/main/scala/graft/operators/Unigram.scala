package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer (the SentencePiece model family;
  * Kudo 2018), completing the engine's tokenizer triad: BPE learns by
  * greedy pair MERGING, WordPiece applies a vocab by greedy
  * longest-match, Unigram learns piece PROBABILITIES and segments by
  * best likelihood — the form that can score alternative
  * segmentations. This implementation is hard-EM (Viterbi counts
  * rather than forward-backward expectations — the standard
  * simplification; each round re-estimates piece probabilities from
  * the best segmentations), which keeps every count an exact integer
  * and the whole training loop deterministic.
  *
  * Scale shape — the bpeTrain discipline applied to EM: the corpus is
  * touched ONCE to build the pooled distinct-word frequency table;
  * every EM round is then one mapPartitions Viterbi sweep over that
  * COMPRESSED table (per-word work × vocabulary size, independent of
  * corpus size) emitting integer (piece, count·word_freq) partials,
  * one map-side-combined groupBy, and a vocabulary-sized collect to
  * the driver for the M-step — the legal driver-plane size, same as
  * the BPE merge table and the WordPiece piece inventory. The model
  * broadcasts once per round.
  *
  * Determinism: seed counts, Viterbi counts, and corpus totals are
  * Longs (summation-order-free); probabilities only ever form inside
  * an executor as count/total of two Longs; Viterbi ties break
  * deterministically (longest final piece wins). Coverage is
  * guaranteed by keeping every single character in the vocabulary at
  * all times (a zero-count char gets a count-1 floor — the standard
  * smoothing — so any word always has at least its char-by-char
  * segmentation).
  */
object Unigram {

  private val MaxPieceLen = 4

  /** Trained model: piece → count, with `total` the count sum. */
  private final case class Model(counts: Map[String, Long], total: Long) {
    def logp(piece: String): Double =
      math.log(counts(piece).toDouble / total)
  }

  /** Viterbi best segmentation of `word` under `m` (restricted to
    * vocabulary pieces, ≤ MaxPieceLen chars). Ties prefer the longer
    * final piece — deterministic. Returns the pieces in order and the
    * best path's log-likelihood.
    */
  private def viterbi(word: String, m: Model): (List[String], Double) = {
    val n = word.length
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1) // start index of the piece ending at i
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        val piece = word.substring(j, i)
        if (m.counts.contains(piece) && score(j) != Double.NegativeInfinity) {
          val s = score(j) + m.logp(piece)
          // strict > : the FIRST qualifying j (the longest piece) wins
          // score ties, so segmentation is deterministic
          if (s > score(i)) { score(i) = s; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    var pieces = List.empty[String]
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      pieces = word.substring(j, pos) :: pieces
      pos = j
    }
    (pieces, score(n))
  }

  /** One distributed hard-EM E-step: Viterbi-segment every distinct
    * word under the broadcast model and sum integer piece counts
    * weighted by word frequency, plus the corpus Viterbi
    * log-likelihood (the objective the monotonicity assertion
    * tracks). One shuffle of vocabulary-sized partials per round.
    */
  private def countStep(words: DataFrame, m: Model)
      : (Map[String, Long], Double) = {
    import words.sparkSession.implicits._
    val bc = words.sparkSession.sparkContext.broadcast(m)
    val pieceCounts = words.select(col("word"), col("n"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val model = bc.value
        it.flatMap { case (word, n) =>
          val (pieces, ll) = viterbi(word, model)
          pieces.groupBy(identity).map { case (p, ps) =>
            (p, ps.size * n, 0.0)
          } ++ Seq(("", 0L, ll * n)) // ll rides the same pass
        }
      }
      .toDF("piece", "cnt", "ll")
    val agg = pieceCounts.groupBy("piece")
      .agg(sum(col("cnt")).as("cnt"), sum(col("ll")).as("ll"))
      .collect()
    val counts = agg.collect {
      case r if r.getString(0).nonEmpty => r.getString(0) -> r.getLong(1)
    }.toMap
    val ll = agg.collectFirst {
      case r if r.getString(0).isEmpty => r.getDouble(2)
    }.getOrElse(0.0)
    (counts, ll)
  }

  /** Character coverage floor: every single character present with
    * count ≥ 1, so Viterbi always completes. */
  private def withCharFloor(counts: Map[String, Long],
      chars: Set[String]): Model = {
    val floored = chars.foldLeft(counts) { (c, ch) =>
      if (c.getOrElse(ch, 0L) > 0) c else c.updated(ch, 1L)
    }
    Model(floored, floored.values.sum)
  }

  /** Train on the pooled word table: seed with frequent substrings,
    * run `emRounds` of hard EM, prune to ≤ `vocabTarget` pieces
    * (all single chars always kept). Returns the model, the per-round
    * corpus log-likelihoods (seed round included), and the char set.
    */
  private def train(s: SparkSession, dir: String, vocabTarget: Int,
      emRounds: Int): (Model, Seq[Double], Set[String], DataFrame) = {
    import s.implicits._
    val words = TextAnalysis.wordFreq(s, dir)
    // seed inventory: every substring up to MaxPieceLen, corpus
    // frequency >= 2 (weighted by word freq) or single char; capped
    // at 4x the target by (freq desc, piece asc) so the driver-side
    // model stays vocabulary-bounded from the first round
    val subsDf = words.as[(String, Long)]
      .flatMap { case (w, n) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(MaxPieceLen, w.length - i)
        } yield (w.substring(i, i + l), n)
      }
      .toDF("piece", "n")
      .groupBy("piece").agg(sum(col("n")).as("cnt"))
    // only the CAPPED top of the substring inventory ever reaches the
    // driver (deterministic (freq desc, piece asc) order) plus the
    // alphabet — driver traffic stays vocabulary-bounded even when
    // the corpus's distinct-substring count is not
    val charRows = subsDf.filter(length(col("piece")) === 1).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val chars = charRows.map(_._1).toSet
    val seed = (subsDf
      .filter(col("cnt") >= 2)
      .orderBy(desc("cnt"), asc("piece"))
      .limit(vocabTarget * 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)) ++ charRows)
      .toMap
    var model = withCharFloor(seed, chars)
    val lls = Seq.newBuilder[Double]
    for (_ <- 1 to emRounds) {
      val (counts, ll) = countStep(words, model)
      lls += ll
      model = withCharFloor(counts, chars)
    }
    // prune: all single chars + the top multi-char pieces by
    // (count desc, piece asc) until the target size
    val multi = model.counts.toSeq
      .filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabTarget - chars.size))
    model = withCharFloor(multi.toMap, chars)
    // one more count pass under the pruned vocab re-normalizes the
    // surviving pieces' probabilities. Its ll is NOT appended: pruning
    // removes pieces, so likelihood legitimately drops across it —
    // the monotonicity law covers the EM rounds only
    val (finalCounts, _) = countStep(words, model)
    (withCharFloor(finalCounts, chars), lls.result(), chars, words)
  }

  /** Spec probe: trained-model shape without exposing the private
    * model type — (vocab size, multi-char piece count, per-round EM
    * log-likelihoods). */
  private[operators] def modelSummary(s: SparkSession, dir: String,
      vocabTarget: Int = 256, emRounds: Int = 3)
      : (Int, Int, Seq[Double]) = {
    val (m, lls, _, _) = train(s, dir, vocabTarget, emRounds)
    (m.counts.size, m.counts.count(_._1.length > 1), lls)
  }

  /** `text_unigram_lm`: train + apply through the correctness gate as
    * an assertion form. Exact columns (n_words, n_distinct_words,
    * n_chars) replay in DuckDB from the same tokenization; the
    * booleans are deterministic model laws:
    *  - `all_words_reconstruct` — every word's Viterbi pieces
    *    concatenate back to the word (segmentation is a partition,
    *    never lossy), checked DISTRIBUTED over every distinct word;
    *  - `fertility_in_range` — corpus piece count within
    *    [n_words, n_chars] (≥ 1 piece and ≤ one-per-char per word);
    *  - `vocab_at_target` — pruned vocabulary ≤ target and covering
    *    every character;
    *  - `em_ll_monotone` — the hard-EM objective (corpus Viterbi
    *    log-likelihood) never decreased across the EM rounds (the
    *    post-prune refit is excluded: removing pieces legitimately
    *    lowers likelihood), the law that fails first if the E/M
    *    steps drift.
    */
  def unigramLm(s: SparkSession, dir: String, vocabTarget: Int = 256,
      emRounds: Int = 3): DataFrame = {
    import s.implicits._
    val (model, lls, chars, words) = train(s, dir, vocabTarget, emRounds)
    val bc = s.sparkContext.broadcast(model)
    val perWord = words.as[(String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (w, n) =>
          val (pieces, _) = viterbi(w, m)
          (n, w.length * n, pieces.size * n, pieces.mkString == w)
        }
      }
      .toDF("n", "nchars", "npieces", "reconstructs")
      .agg(sum(col("n")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        sum(col("nchars")).as("n_chars"),
        sum(col("npieces")).as("n_pieces"),
        min(col("reconstructs")).as("all_words_reconstruct"))
    val llMonotone = lls.zip(lls.tail).forall { case (a, b) =>
      b >= a - 1e-6 * math.abs(a)
    }
    val vocabOk =
      model.counts.size <= math.max(vocabTarget, chars.size) &&
        chars.forall(model.counts.contains)
    perWord.select(col("n_words"), col("n_distinct_words"), col("n_chars"),
      col("all_words_reconstruct"),
      (col("n_pieces") >= col("n_words") &&
        col("n_pieces") <= col("n_chars")).as("fertility_in_range"),
      lit(vocabOk).as("vocab_at_target"),
      lit(llMonotone).as("em_ll_monotone"))
  }
}
