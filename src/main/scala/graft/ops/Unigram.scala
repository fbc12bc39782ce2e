package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, the SentencePiece
  * unigram model) — BPE's companion family: where [[Bpe]] GROWS a
  * vocabulary by greedy pair merges, the unigram model SEEDS a large
  * candidate vocabulary and EM-PRUNES it down, segmenting by maximum
  * piece-likelihood (Viterbi) instead of merge replay.
  *
  * Deterministic hard-EM variant. Kudo's E-step sums expected piece
  * counts over ALL segmentations (forward–backward) — an inherently
  * float log-sum-exp whose partition-order-dependent accumulation can
  * never be bit-identical across engines (the repo's exactness
  * contract, see [[TextAnalysis.lmUnigramScore]]). This implementation
  * uses VITERBI (hard) EM: each word contributes integer counts along
  * its single best segmentation, weighted by its exact corpus
  * frequency. Every model quantity is then either a BIGINT count or
  * `⌊10⁶·ln(int/int)⌋` — one fixed-order IEEE `ln` from identical
  * integers on both engines, the established micro-nat discipline —
  * so the full training TRACE hash-checks against a DuckDB replay.
  * Hard EM is the classic tractable approximation of the soft E-step
  * (and the unigram analogue of what SentencePiece's own pruning does
  * with Viterbi path counts); the prune criterion below (drop
  * lowest-usage pieces) is likewise the hard-count analogue of Kudo's
  * likelihood-loss ranking.
  *
  * Training schedule (fixed, mirrored CTE-for-CTE by the SQL
  * generators): seed → `emBeforePrune` Viterbi-EM rounds → ONE prune
  * to `keepMultiChar` multi-character pieces → `emAfterPrune` more EM
  * rounds. Single-character pieces are NEVER pruned — they are the
  * coverage guarantee (every word remains segmentable), exactly
  * SentencePiece's required-character set.
  *
  * Scale shape (the [[Bpe.bpeTrain]] charter): the loop state is the
  * DISTINCT-WORD frequency table — vocabulary-sized, not corpus-sized
  * (the corpus is scanned once to build it) — and the model is the
  * piece table, a driver-scale artifact like the BPE merge table or
  * the IVF codebooks. Each EM round is: one broadcast join of the
  * piece table onto word substrings (edge generation), one map-only
  * Viterbi DP per word (a single Catalyst `aggregate` expression —
  * no UDF, no driver loop over words), one hash aggregate of piece
  * usage. No window functions, no single-partition stages; rounds are
  * `localCheckpoint`-fenced like BPE's merge chain so plan depth stays
  * bounded.
  *
  * Determinism of ties: the DP maximizes `struct(score, pieces)` —
  * among equal-score segmentations the winner is the one whose piece
  * array compares lexicographically greatest AT EACH DP STEP. That
  * step-local tiebreak is applied identically by Spark's `array_max`
  * and DuckDB's `list_aggregate(…, 'max')` (both compare structs
  * field-by-field, arrays element-wise, strings bytewise), so the
  * chosen segmentation is a pure function of the vocabulary on both
  * engines; the SCORE is globally optimal regardless of ties.
  *
  * Words longer than `maxWordLen` are EXCLUDED from training on both
  * engines (a policy filter, not a silent truncation — SentencePiece
  * has the same `max_sentence(piece)_length` family of caps); the DP
  * replay unrolls one CTE per character position, so the cap also
  * bounds the oracle SQL. Encoding a word that was filtered (or any
  * novel word) goes through [[viterbiSegments]] directly, or fails
  * loudly in the [[Bpe.bpeEncode]] join path — never silently.
  */
object Unigram {

  /** Unreachable-position sentinel: far below any real score sum
    * (scores are ≥ −10⁶·ln(total+V) per piece ≈ −40·10⁶, words are
    * ≤ maxWordLen pieces), far above BIGINT overflow territory.
    */
  val Unreach: Long = -(1L << 60)

  private def checkedWords(words: DataFrame, maxWordLen: Int): DataFrame = {
    val cols = words.columns
    require(cols.length == 2, s"words needs exactly (word, freq) columns, got ${cols.toSeq}")
    words.select(col(cols(0)).as("word"), col(cols(1)).cast("long").as("freq"))
      .filter(col("word").isNotNull && col("word") =!= "" &&
        length(col("word")) <= maxWordLen)
  }

  /** Seed candidate counts: every substring of length 1..maxPieceLen
    * of every word, weighted by word frequency — one explode + hash
    * aggregate (the corpus itself is NOT rescanned; `words` is the
    * distinct-word table).
    */
  def substringCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("__s"))
      .select(col("word"), col("freq"), col("__s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("__l"))
      .filter(col("__s") + col("__l") - 1 <= length(col("word")))
      .select(col("word").substr(col("__s"), col("__l")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Add-one-smoothed micro-nat piece scores from counts:
    * `logp_unat = ⌊10⁶·ln((cnt+1)/(total+|V|))⌋` — the
    * [[TextAnalysis.lmUnigramScore]] formula, one IEEE `ln` of a
    * single integer-over-integer division. The (total,|V|) stats row
    * broadcasts; the vocab is model-sized.
    */
  def rescore(counts: DataFrame): DataFrame = {
    val stats = counts.agg(sum("cnt").as("__total"), count(lit(1)).as("__nv"))
    counts.crossJoin(broadcast(stats))
      .select(col("piece"), col("cnt"),
        floor(log((col("cnt") + 1).cast("double") /
          (col("__total") + col("__nv")).cast("double")) * 1e6)
          .cast("long").as("logp_unat"))
  }

  /** Seed vocabulary: ALL single characters plus the `seedMultiChar`
    * highest-count multi-character substrings (count DESC, piece ASC —
    * a total order, so the seed is engine-stable). orderBy+limit, not
    * a global row_number window: the candidate table is small but the
    * no-single-partition-window rule is free to keep.
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int, seedMultiChar: Int): DataFrame = {
    val cnts = substringCounts(words, maxPieceLen)
    val singles = cnts.filter(length(col("piece")) === 1)
    val multi = cnts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedMultiChar)
    singles.unionByName(multi)
  }

  /** Viterbi segmentation of every word under a scored vocabulary —
    * the tokenizer's decode step and the hard-EM E-step. One broadcast
    * join builds the per-word edge list (all vocab substrings with
    * their scores); one `aggregate` expression runs the DP left to
    * right carrying `best(position) = struct(score, pieces)`; no UDF,
    * no driver loop, no window. Words NOT coverable by the vocabulary
    * (a character outside it) fail loudly via raise_error — with any
    * corpus-derived vocab the single-char coverage set makes that
    * impossible, but a hand-supplied vocab must not silently drop
    * words. Returns `(word, freq, pieces, score_unat)`.
    */
  def viterbiSegments(words0: DataFrame, scoredVocab: DataFrame, maxPieceLen: Int): DataFrame = {
    // Loud refusal on null/empty words: sequence(1, 0) helpfully
    // counts DOWN in Spark (the TextAnalysis.packChunks lesson), so an
    // empty word would silently produce an empty segmentation instead
    // of an error.
    val words = words0.withColumn("word",
      when(col("word").isNull || col("word") === "",
        raise_error(lit("viterbiSegments: null/empty word")))
        .otherwise(col("word")))
    val edges = words
      .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("__s"))
      .select(col("word"), col("__s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("__l"))
      .filter(col("__s") + col("__l") - 1 <= length(col("word")))
      .select(col("word"), col("__s"), (col("__s") + col("__l") - 1).as("__e"),
        col("word").substr(col("__s"), col("__l")).as("piece"))
      .join(broadcast(scoredVocab.select(col("piece"), col("logp_unat").as("__unat"))),
        Seq("piece"))
      .groupBy("word")
      .agg(collect_list(struct(col("__s").as("s"), col("__e").as("e"),
        col("__unat").as("unat"), col("piece").as("piece"))).as("__el"))
    val emptyPieces = array().cast("array<string>")
    val sentinel = struct(lit(Unreach).as("score"), emptyPieces.as("pieces"))
    // best(j) for positions 0..n as a growing 1-based array; the order
    // of __el is irrelevant (max is commutative), so collect_list's
    // nondeterministic ordering cannot leak into the result.
    val dp = aggregate(
      sequence(lit(1), length(col("word"))),
      array(struct(lit(0L).as("score"), emptyPieces.as("pieces"))),
      (acc, j) => concat(acc, array(coalesce(
        array_max(transform(
          filter(col("__el"), x => x.getField("e") === j &&
            element_at(acc, x.getField("s")).getField("score") > lit(Unreach / 2)),
          x => struct(
            (element_at(acc, x.getField("s")).getField("score") +
              x.getField("unat")).as("score"),
            concat(element_at(acc, x.getField("s")).getField("pieces"),
              array(x.getField("piece"))).as("pieces")))),
        sentinel))))
    words
      .join(edges, Seq("word"), "left")
      .withColumn("__el", coalesce(col("__el"),
        array().cast("array<struct<s:int,e:int,unat:bigint,piece:string>>")))
      .withColumn("__fin", element_at(dp, length(col("word")) + 1))
      .select(col("word"), col("freq"),
        when(col("__fin.score") <= lit(Unreach / 2),
          raise_error(concat(
            lit("viterbiSegments: word not coverable by the vocabulary: "),
            col("word"))))
          .otherwise(col("__fin.pieces")).as("pieces"),
        col("__fin.score").as("score_unat"))
  }

  /** Hard-EM M-step counts: piece usage along each word's Viterbi
    * segmentation, frequency-weighted, with UNUSED vocab pieces kept
    * at count 0 (add-one smoothing keeps them alive until a prune —
    * the vocabulary only shrinks at prune steps, like SentencePiece).
    */
  def emCounts(words: DataFrame, scoredVocab: DataFrame, maxPieceLen: Int): DataFrame = {
    val used = viterbiSegments(words, scoredVocab, maxPieceLen)
      .select(explode(col("pieces")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("__used"))
    scoredVocab.select("piece").join(used, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("__used"), lit(0L)).as("cnt"))
  }

  /** Prune to `keepMultiChar` multi-character pieces by (cnt DESC,
    * piece ASC); single characters always survive (coverage).
    */
  def prune(scoredVocab: DataFrame, keepMultiChar: Int): DataFrame = {
    val singles = scoredVocab.filter(length(col("piece")) === 1).select("piece", "cnt")
    val multi = scoredVocab.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(keepMultiChar)
      .select("piece", "cnt")
    singles.unionByName(multi)
  }

  /** Train the unigram LM tokenizer. Returns `(trace, finalVocab)`:
    * `trace` is `(round, piece, cnt, logp_unat)` for every model state
    * — round 0 the scored seed, rounds 1..emBeforePrune the EM
    * states, round emBeforePrune+1 the prune-rescored state, then the
    * emAfterPrune final EM states — the whole training trajectory as
    * one hash-checkable frame (the [[Bpe.bpeSql]] merge-trace
    * discipline); `finalVocab` is the last round's `(piece, cnt,
    * logp_unat)`.
    *
    * Kudo's ACTUAL soft E-step (forward–backward expected counts) is
    * [[unigramTrainSoft]] — spec-gated rather than oracle-hashed; its
    * scaladoc states exactly when the two schedules diverge.
    */
  /** Loud envelope for the driver-side vocab loop state: singles are
    * bounded by the corpus alphabet (≤ #Unicode code points ≈ 1.11M)
    * plus `seedMultiChar` — model-scale by construction, but the
    * collect refuses loudly (the EM.scala `take(max+1)` discipline)
    * rather than OOM the driver if a caller feeds non-words.
    */
  private val MaxDriverVocab: Int = 2 * 1024 * 1024

  /** One scored vocab state held on the driver: `(piece, cnt,
    * logp_unat)` — ≤ alphabet + seedMultiChar rows by construction.
    */
  private final case class DriverPiece(piece: String, cnt: Long, logpUnat: Long)

  /** Driver-side [[rescore]] — the identical micro-nat arithmetic on
    * the identical integers: `(cnt+1)` and `(total+|V|)` cast to
    * double, ONE IEEE division, ONE `StrictMath.log` (what Spark's
    * `log` expression calls — verified against the catalyst bytecode),
    * `⌊·10⁶⌋`. Bit-identical to the Spark column by construction, so
    * the training trace's hash contract is untouched.
    */
  private def rescoreDriver(counts: Seq[(String, Long)]): Seq[DriverPiece] = {
    val total = counts.iterator.map(_._2).sum
    val nv = counts.size.toLong
    counts.map { case (p, c) =>
      DriverPiece(p, c,
        math.floor(StrictMath.log((c + 1).toDouble / (total + nv).toDouble) * 1e6).toLong)
    }
  }

  /** UTF-8 binary string order — Spark's UTF8String / DuckDB VARCHAR
    * comparison, which differs from Java's UTF-16 `compareTo` above
    * the BMP; the prune/seed tie-breaks sort in THIS order on both
    * engines, so the driver-side prune must too.
    */
  private val Utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var r = 0
    while (r == 0 && i < n) { r = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
    if (r != 0) r else x.length - y.length
  }

  def unigramTrain(
      words0: DataFrame,
      maxPieceLen: Int = 4,
      seedMultiChar: Int = 64,
      keepMultiChar: Int = 24,
      emBeforePrune: Int = 2,
      emAfterPrune: Int = 1,
      maxWordLen: Int = 12): (DataFrame, DataFrame) = {
    require(maxPieceLen >= 1 && seedMultiChar >= 0 && keepMultiChar >= 0 &&
      emBeforePrune >= 1 && emAfterPrune >= 1 && maxWordLen >= 1,
      "unigramTrain: all schedule parameters must be positive")
    val spark = words0.sparkSession
    import spark.implicits._
    val words = checkedWords(words0, maxWordLen).localCheckpoint(true)

    // Round-15: the vocab loop state lives on the DRIVER. The model is
    // ≤ alphabet + seedMultiChar rows by construction — the IVF-
    // codebook class of driver-scale state (SURVEY S6) — yet carrying
    // it as a checkpointed DataFrame cost ~8 AQE shuffle stages + one
    // localCheckpoint action PER EM ROUND of pure scheduling overhead
    // on a ~100-row frame (measured: q_unigram_encode ran 54 jobs with
    // no stage over 0.2 s). Each round is now ONE distributed job —
    // the Viterbi usage aggregate over the (static, checkpointed) word
    // table under a broadcast local-relation vocab — plus one bounded
    // collect; seed/rescore/prune arithmetic runs on the driver with
    // the identical integer/StrictMath operations (the DuckDB hash
    // contract is over VALUES, which are unchanged bit-for-bit).
    def collectBounded(df: DataFrame, what: String): Seq[(String, Long)] = {
      val rows = df.select(col("piece"), col("cnt")).take(MaxDriverVocab + 1)
      require(rows.length <= MaxDriverVocab,
        s"unigramTrain: $what exceeds the $MaxDriverVocab-row driver vocab envelope")
      rows.iterator.map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    def vocabDf(v: Seq[DriverPiece]): DataFrame =
      v.map(p => (p.piece, p.cnt, p.logpUnat)).toDF("piece", "cnt", "logp_unat")
    // Hard-EM round, driver-state form: Viterbi usage counts along the
    // single best segmentations (one job), zero-kept pieces filled on
    // the driver ([[emCounts]]' smoothing contract).
    def emRound(v: Seq[DriverPiece]): Seq[DriverPiece] = {
      val used = viterbiSegments(words, vocabDf(v), maxPieceLen)
        .select(explode(col("pieces")).as("piece"), col("freq"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
      val usedMap = collectBounded(used, "EM usage counts").toMap
      rescoreDriver(v.map(p => (p.piece, usedMap.getOrElse(p.piece, 0L))))
    }
    // Driver-side [[prune]]: singles always survive; multi-char pieces
    // ranked (cnt DESC, piece ASC in UTF-8 binary order — the engines'
    // shared collation).
    def pruneDriver(v: Seq[DriverPiece]): Seq[DriverPiece] = {
      // single = ONE code point: Spark `length` and DuckDB `len` both
      // count code points, not UTF-16 units.
      val (singles, multi) =
        v.partition(p => p.piece.codePointCount(0, p.piece.length) == 1)
      val kept = multi.sortBy(p => (-p.cnt, p.piece))(
        Ordering.Tuple2(Ordering.Long, Utf8Order)).take(keepMultiChar)
      rescoreDriver((singles ++ kept).map(p => (p.piece, p.cnt)))
    }

    var vocab = rescoreDriver(
      collectBounded(seedVocab(words, maxPieceLen, seedMultiChar), "seed vocab"))
    val states = scala.collection.mutable.ArrayBuffer[Seq[DriverPiece]](vocab)
    (1 to emBeforePrune).foreach { _ => vocab = emRound(vocab); states += vocab }
    vocab = pruneDriver(vocab)
    states += vocab
    (1 to emAfterPrune).foreach { _ => vocab = emRound(vocab); states += vocab }
    val trace = states.zipWithIndex.flatMap { case (v, i) =>
      v.map(p => (i.toLong, p.piece, p.cnt, p.logpUnat))
    }.toSeq.toDF("round", "piece", "cnt", "logp_unat")
    (trace, vocabDf(vocab))
  }

  // ---- soft EM (Kudo 2018 §3's actual E-step; spec-gated) -----------

  /** Unreachable sentinel for the FLOAT log-space DPs: far below any
    * real log-probability sum (bounded by maxWordLen · ln(1/(total+V))
    * ≈ −10³), far above double-overflow territory, and `exp` of
    * anything near it is EXACTLY 0.0 — so unreachable edges contribute
    * nothing to posteriors without special-casing.
    */
  val SoftUnreach: Double = -1e18

  /** log-sum-exp of a double-array column, empty → [[SoftUnreach]];
    * the max is factored out so the exponentials never all underflow.
    */
  private def lse(cands: Column): Column = {
    val m = array_max(cands)
    when(size(cands) === 0, lit(SoftUnreach))
      .otherwise(m + log(aggregate(cands, lit(0.0), (a, x) => a + exp(x - m))))
  }

  /** Per-word edge lists under a FLOAT-scored vocabulary (`(piece,
    * logp double)`) — the [[viterbiSegments]] edge build with the
    * micro-nat integer replaced by the soft path's double.
    */
  private def softEdges(words: DataFrame, scoredVocab: DataFrame,
      maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("__s"))
      .select(col("word"), col("__s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("__l"))
      .filter(col("__s") + col("__l") - 1 <= length(col("word")))
      .select(col("word"), col("__s"), (col("__s") + col("__l") - 1).as("__e"),
        col("word").substr(col("__s"), col("__l")).as("piece"))
      .join(broadcast(scoredVocab
        .select(col("piece"), col("logp").cast("double").as("__lp"))), Seq("piece"))
      .groupBy("word")
      .agg(collect_list(struct(col("__s").as("s"), col("__e").as("e"),
        col("__lp").as("lp"), col("piece").as("piece"))).as("__el"))

  /** Forward–backward EXPECTED piece counts — Kudo 2018 §3's actual
    * soft E-step, which [[unigramTrain]]'s Viterbi hard EM
    * approximates: every segmentation of every word contributes its
    * posterior mass, so a word with competing segmentations splits its
    * frequency fractionally instead of winner-take-all. Returns
    * `(piece, ecnt double)` with unused vocab pieces kept at 0.0 (the
    * [[emCounts]] smoothing contract).
    *
    * SPEC-GATED, NOT ORACLE-HASHED — deliberately: α/β are float
    * log-sum-exp chains whose accumulation order is engine- and
    * partition-dependent, so cross-engine bit-identity is impossible
    * (the reason [[unigramTrain]] is the hash-checked path; see its
    * scaladoc). UnigramSpec checks this against an independent
    * driver-side forward–backward within float tolerance — the
    * EM.scala discipline for float-valued model math.
    *
    * Same distributed shape as the hard E-step: one broadcast vocab
    * join builds vocabulary-sized edge lists, TWO map-side `aggregate`
    * DPs per word (forward α, backward β — no UDF, no window, no
    * driver loop), one posterior explode (≤ maxPieceLen · |word| rows
    * per word type), one hash aggregate. Unreachable DP cells carry
    * [[SoftUnreach]]; their posteriors `exp` to exactly 0.0, so no
    * reachability filtering is needed on the posterior side.
    */
  def softEmExpectedCounts(words0: DataFrame, scoredVocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val words = words0.select(col("word"), col("freq").cast("long").as("freq"))
    val edges = softEdges(words, scoredVocab, maxPieceLen)
    val n = length(col("word"))
    // α as a growing 1-based array: element_at(__a, j+1) = α(j), α(0)=0.
    val alpha = aggregate(
      sequence(lit(1), n),
      array(lit(0.0)),
      (acc, j) => concat(acc, array(lse(transform(
        filter(col("__el"), x => x.getField("e") === j &&
          element_at(acc, x.getField("s")) > lit(SoftUnreach / 2)),
        x => element_at(acc, x.getField("s")) + x.getField("lp"))))))
    // β REVERSED: after step i the array is [β(n), β(n−1), …, β(n−i)],
    // so β(j) = element_at(__brev, n − j + 1); β(n) = 0.
    val brev = aggregate(
      sequence(lit(1), n),
      array(lit(0.0)),
      (acc, i) => concat(acc, array(lse(transform(
        filter(col("__el"), x => x.getField("s") === n - i + 1 &&
          element_at(acc, n - x.getField("e") + 1) > lit(SoftUnreach / 2)),
        x => x.getField("lp") + element_at(acc, n - x.getField("e") + 1))))))
    val post = words.join(edges, Seq("word"), "left")
      .withColumn("__el", coalesce(col("__el"),
        array().cast("array<struct<s:int,e:int,lp:double,piece:string>>")))
      .withColumn("__a", alpha)
      .withColumn("__brev", brev)
      // Z = α(n); loud refusal on uncoverable words (the
      // viterbiSegments contract — impossible with a corpus-derived
      // vocab, mandatory for a hand-supplied one).
      .withColumn("__z",
        when(element_at(col("__a"), n + 1) <= lit(SoftUnreach / 2),
          raise_error(concat(
            lit("softEmExpectedCounts: word not coverable by the vocabulary: "),
            col("word"))))
          .otherwise(element_at(col("__a"), n + 1)))
      .select(col("word"), col("freq"), col("__a"), col("__brev"), col("__z"),
        explode(col("__el")).as("__x"))
      .select(col("__x.piece").as("piece"),
        (col("freq").cast("double") * exp(
          element_at(col("__a"), col("__x.s")) + col("__x.lp") +
            element_at(col("__brev"), length(col("word")) - col("__x.e") + 1) -
            col("__z"))).as("__p"))
    val used = post.groupBy("piece").agg(sum("__p").as("__used"))
    scoredVocab.select("piece").join(used, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("__used"), lit(0.0)).as("ecnt"))
  }

  /** Float analogue of [[rescore]]: `logp = ln((ecnt+1)/(total+|V|))`
    * over expected counts — same add-one smoothing, no micro-nat floor
    * (the soft path is float end-to-end).
    */
  def rescoreSoft(counts: DataFrame): DataFrame = {
    val stats = counts.agg(sum("ecnt").as("__total"), count(lit(1)).as("__nv"))
    counts.crossJoin(broadcast(stats))
      .select(col("piece"), col("ecnt"),
        log((col("ecnt") + 1.0) / (col("__total") + col("__nv"))).as("logp"))
  }

  /** [[unigramTrain]] with the SOFT E-step — identical schedule (seed
    * → emBeforePrune EM rounds → one prune to keepMultiChar multi-char
    * pieces, singles never pruned → emAfterPrune EM rounds), Kudo's
    * forward–backward expected counts in place of Viterbi path counts.
    * Trace rows are `(round, piece, ecnt double, logp double)`.
    *
    * WHEN THE TWO SCHEDULES DIVERGE: whenever any word has more than
    * one segmentation with non-negligible posterior mass. Hard EM
    * hands the word's whole frequency to the single best path (ties
    * broken lexicographically), so competing pieces see 0; soft EM
    * splits the frequency by posterior, so both see fractional counts
    * — which can flip the prune's count ranking and therefore the
    * final vocabulary, not just its probabilities. On a corpus whose
    * words all segment essentially one way the two agree (UnigramSpec
    * pins both behaviors). This is the SentencePiece-faithful
    * semantics; [[unigramTrain]] remains the oracle-hashed path.
    */
  def unigramTrainSoft(
      words0: DataFrame,
      maxPieceLen: Int = 4,
      seedMultiChar: Int = 64,
      keepMultiChar: Int = 24,
      emBeforePrune: Int = 2,
      emAfterPrune: Int = 1,
      maxWordLen: Int = 12): (DataFrame, DataFrame) = {
    require(maxPieceLen >= 1 && seedMultiChar >= 0 && keepMultiChar >= 0 &&
      emBeforePrune >= 1 && emAfterPrune >= 1 && maxWordLen >= 1,
      "unigramTrainSoft: all schedule parameters must be positive")
    val words = checkedWords(words0, maxWordLen).localCheckpoint(true)
    def ck(df: DataFrame): DataFrame = df.localCheckpoint(true) // model-sized
    def pruneSoft(v: DataFrame): DataFrame = {
      val singles = v.filter(length(col("piece")) === 1).select("piece", "ecnt")
      val multi = v.filter(length(col("piece")) > 1)
        .orderBy(col("ecnt").desc, col("piece").asc).limit(keepMultiChar)
        .select("piece", "ecnt")
      singles.unionByName(multi)
    }
    var vocab = ck(rescoreSoft(seedVocab(words, maxPieceLen, seedMultiChar)
      .select(col("piece"), col("cnt").cast("double").as("ecnt"))))
    val states = scala.collection.mutable.ArrayBuffer[DataFrame](vocab)
    (1 to emBeforePrune).foreach { _ =>
      vocab = ck(rescoreSoft(softEmExpectedCounts(words, vocab, maxPieceLen)))
      states += vocab
    }
    vocab = ck(rescoreSoft(pruneSoft(vocab)))
    states += vocab
    (1 to emAfterPrune).foreach { _ =>
      vocab = ck(rescoreSoft(softEmExpectedCounts(words, vocab, maxPieceLen)))
      states += vocab
    }
    val trace = states.zipWithIndex.map { case (v, i) =>
      v.select(lit(i.toLong).as("round"), col("piece"), col("ecnt"), col("logp"))
    }.reduce(_ unionByName _)
    (trace, vocab)
  }

  // ---- DuckDB mirrors (chained CTEs, the bpeSqlRounds discipline) ---

  private def sqlStructEmpty(score: String): String =
    s"{'score': CAST($score AS BIGINT), 'pieces': CAST([] AS VARCHAR[])}"

  /** Viterbi DP as chained CTEs for one round tag: `{tag}el` (edge
    * lists), `{tag}d0..{tag}d{maxWordLen}` (one position per CTE —
    * the maxWordLen cap is what bounds the unroll), `{tag}seg`. The
    * step expression is the EXACT lambda the Spark `aggregate` runs:
    * filter reachable edges ending at j, map to candidate
    * `struct(score, pieces)`, take the struct max, sentinel when
    * unreachable.
    */
  def viterbiSqlRounds(tag: String, wordsCte: String, vocabCte: String,
      maxPieceLen: Int, maxWordLen: Int): String = {
    val el =
      s"""${tag}el AS MATERIALIZED (
         |  SELECT w.word, w.freq,
         |    list({'s': CAST(t.s AS INTEGER), 'e': CAST(t.s + l.l - 1 AS INTEGER),
         |          'unat': v.logp_unat, 'piece': substr(w.word, t.s, l.l)}) AS el
         |  FROM $wordsCte w,
         |       unnest(generate_series(1, len(w.word))) AS t(s),
         |       unnest(generate_series(1, $maxPieceLen)) AS l(l),
         |       $vocabCte v
         |  WHERE t.s + l.l - 1 <= len(w.word)
         |    AND v.piece = substr(w.word, t.s, l.l)
         |  GROUP BY w.word, w.freq)""".stripMargin
    val d0 =
      s"""${tag}d0 AS MATERIALIZED (
         |  SELECT word, freq, el, len(word) AS n,
         |    [${sqlStructEmpty("0")}] AS best
         |  FROM ${tag}el)""".stripMargin
    val steps = (1 to maxWordLen).map { j =>
      s"""${tag}d$j AS MATERIALIZED (
         |  SELECT word, freq, el, n,
         |    CASE WHEN n >= $j THEN list_append(best, coalesce(
         |      list_aggregate(list_transform(list_filter(el,
         |          x -> x.e = $j AND best[x.s].score > ${Unreach / 2}),
         |        x -> {'score': best[x.s].score + x.unat,
         |              'pieces': list_append(best[x.s].pieces, x.piece)}), 'max'),
         |      ${sqlStructEmpty(Unreach.toString)}))
         |    ELSE best END AS best
         |  FROM ${tag}d${j - 1})""".stripMargin
    }
    val seg =
      s"""${tag}seg AS MATERIALIZED (
         |  SELECT word, freq, best[n + 1].pieces AS pieces
         |  FROM ${tag}d$maxWordLen)""".stripMargin
    (Seq(el, d0) ++ steps :+ seg).mkString(",\n")
  }

  /** `⌊10⁶·ln((cnt+1)/(total+|V|))⌋` rescore of a `(piece, cnt)` CTE. */
  def rescoreSql(name: String, src: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT piece, cnt,
       |    CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) /
       |      CAST(st.total + st.nv AS DOUBLE)) * 1e6) AS BIGINT) AS logp_unat
       |  FROM $src, (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS nv
       |              FROM $src) st)""".stripMargin

  /** One hard-EM round: Viterbi under `vocabCte`, usage counts with
    * zero-kept pieces, rescore → CTE `outVocab`.
    */
  def emRoundSql(tag: String, wordsCte: String, vocabCte: String, outVocab: String,
      maxPieceLen: Int, maxWordLen: Int): String = {
    val viterbi = viterbiSqlRounds(tag, wordsCte, vocabCte, maxPieceLen, maxWordLen)
    val cnt =
      s"""${tag}c AS MATERIALIZED (
         |  SELECT v.piece, CAST(coalesce(u.cnt, 0) AS BIGINT) AS cnt
         |  FROM $vocabCte v LEFT JOIN (
         |    SELECT p.piece, CAST(sum(s.freq) AS BIGINT) AS cnt
         |    FROM ${tag}seg s, unnest(s.pieces) AS p(piece)
         |    GROUP BY 1) u USING (piece))""".stripMargin
    Seq(viterbi, cnt, rescoreSql(outVocab, s"${tag}c")).mkString(",\n")
  }

  /** The full training replay: expects a prior CTE `wordsCte(word,
    * freq)` ALREADY filtered to `len(word) <= maxWordLen` (the same
    * policy filter [[checkedWords]] applies), emits CTEs ending in
    * scored vocab states `v0..v{R}` where R = emBeforePrune + 1 +
    * emAfterPrune, plus everything [[viterbiSqlRounds]] needs along
    * the way. Compose with a final trace UNION (see the q_unigram_lm
    * oracle) or join `u{R}seg`-equivalents for encoding.
    */
  def trainSqlRounds(wordsCte: String, maxPieceLen: Int = 4, seedMultiChar: Int = 64,
      keepMultiChar: Int = 24, emBeforePrune: Int = 2, emAfterPrune: Int = 1,
      maxWordLen: Int = 12): String = {
    val seed =
      s"""s0 AS MATERIALIZED (
         |  SELECT substr(w.word, t.s, l.l) AS piece, CAST(sum(w.freq) AS BIGINT) AS cnt
         |  FROM $wordsCte w,
         |       unnest(generate_series(1, len(w.word))) AS t(s),
         |       unnest(generate_series(1, $maxPieceLen)) AS l(l)
         |  WHERE t.s + l.l - 1 <= len(w.word)
         |  GROUP BY 1),
         |v0c AS MATERIALIZED (
         |  SELECT piece, cnt FROM s0 WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
         |    FROM s0 WHERE len(piece) > 1)
         |  WHERE rn <= $seedMultiChar),
         |${rescoreSql("v0", "v0c")}""".stripMargin
    val emBefore = (1 to emBeforePrune).map { r =>
      emRoundSql(s"u$r", wordsCte, s"v${r - 1}", s"v$r", maxPieceLen, maxWordLen)
    }
    val pruneRound = emBeforePrune + 1
    val pruneSql =
      s"""vpc AS MATERIALIZED (
         |  SELECT piece, cnt FROM v$emBeforePrune WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
         |    FROM v$emBeforePrune WHERE len(piece) > 1)
         |  WHERE rn <= $keepMultiChar),
         |${rescoreSql(s"v$pruneRound", "vpc")}""".stripMargin
    val emAfter = (1 to emAfterPrune).map { k =>
      val r = pruneRound + k
      emRoundSql(s"u$r", wordsCte, s"v${r - 1}", s"v$r", maxPieceLen, maxWordLen)
    }
    (Seq(seed) ++ emBefore ++ Seq(pruneSql) ++ emAfter).mkString(",\n")
  }

  /** Final SELECT of the training-trace oracle over
    * [[trainSqlRounds]]'s vocab states.
    */
  def traceSelectSql(emBeforePrune: Int = 2, emAfterPrune: Int = 1): String = {
    val last = emBeforePrune + 1 + emAfterPrune
    (0 to last).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, piece, cnt, logp_unat FROM v$r"
    }.mkString("\nUNION ALL\n")
  }
}
