package graft.functions

/** Byte-pair-encoding tokenizer over whitespace words (the real subword
  * counter behind token-budget curation; replaces the regex approximation
  * [[TextAnalysis.bpeishTokenCount]] where true counts matter).
  *
  * Tokenization contract — BOTH engines replay it verbatim:
  *  - words = trim(text) split on `\s+` (the same tokens as
  *    [[TextAnalysis.tokens]]); empty words skipped; empty text → 0;
  *  - a word starts as its code-point symbols;
  *  - merges apply IN RANK ORDER; one rank merges every non-overlapping
  *    occurrence of its pair left-to-right over the symbol list;
  *  - a word's token count is its final symbol count; the text's count is
  *    the sum over words.
  *
  * The DuckDB oracle replays this as a recursive CTE whose step merges the
  * LEFTMOST occurrence of the current rank's pair (advancing rank when none
  * remains). Repeated-leftmost equals the single left-to-right scan: merging
  * at position j can only create the pairs (prev, ab) and (ab, next), and
  * neither can equal (a, b) again — `b` and `a` are strict substrings of
  * `ab` — so no new occurrence ever appears at or before j. (A flat
  * string-replace over separator-joined symbols is NOT equivalent: its
  * pattern can match a symbol-boundary straddle, e.g. symbols `[bc, ab]`
  * joined as `bc␁ab` match the pair (c, a) — which is why both engines do
  * real symbol-list surgery.)
  *
  * Training is classic greedy BPE (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): count symbol-pair
  * frequencies over the word-frequency table, merge the argmax, repeat.
  * Ties break by (count desc, pair lexicographic asc) — fully
  * deterministic. Scale note: at 100 TB the word-frequency table is ONE
  * distributed groupBy over the corpus; training then runs driver-side over
  * the bounded vocabulary (standard practice — the vocab, not the corpus,
  * bounds the work), and the frozen merge table ships as a small versioned
  * artifact ([[TrainedBpeMerges]]) exactly like the IVF centroids.
  */
object Bpe {

  /** (lefts, rights) arrays of the merge pairs in rank order — the flat
    * shape the codegen'd kernel consumes.
    */
  def compiled(merges: Seq[(String, String)]): (Array[String], Array[String]) =
    (merges.map(_._1).toArray, merges.map(_._2).toArray)

  private def symbols(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One rank applied to a symbol list: merge every non-overlapping
    * occurrence of `p` left-to-right.
    */
  private def mergeOnce(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Naive reference tokenizer for one word: explicit symbol-list merging.
    * Pins the kernel's replace-based semantics in the property test.
    */
  def tokenizeWordNaive(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(symbols(word))((syms, m) => mergeOnce(syms, m))

  /** Greedy BPE training over a word-frequency table; stops early when no
    * pair is left to merge.
    */
  def train(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words = wordFreqs.map { case (w, f) => (symbols(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (mergeOnce(syms, best), f) }
        k += 1
      }
    }
    merges.result()
  }
}
