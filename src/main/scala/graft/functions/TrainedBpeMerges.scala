package graft.functions

/** Frozen BPE merge table trained on the sf0.01 documents corpus by
  * `runMain graft.TrainBpeMerges /root/testdata/sf0.01 40` (greedy BPE,
  * ties by count desc then pair lexicographic — see [[Bpe.train]]).
  * Compile-time constants so the DuckDB oracles replay the identical table
  * and deployments ship the tokenizer as a versioned artifact.
  */
object TrainedBpeMerges {
  // 31 vocabulary words, 40 merges
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow")
  )
}
