package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Byte-pair-encoding merge-table training ("Neural Machine Translation
  * of Rare Words with Subword Units", Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer-TRAINING step of a training-data
  * pipeline (the vocab the llm_token_stats/packing ops assume comes
  * from somewhere; this is the somewhere).
  *
  * Algorithm (the paper's): start from characters (plus the `</w>`
  * end-of-word marker), repeatedly find the most frequent adjacent
  * symbol pair across the corpus and merge it into one symbol; the
  * ranked merge list IS the tokenizer model.
  *
  * Scale plan — the classic BPE trick, distributed: ONE corpus pass
  * builds the word-frequency table (map-side explode → partial-agg
  * word-count shuffle); every iteration after that runs over the
  * VOCABULARY-bounded (Zipf: ≪ corpus) word table, never the corpus.
  * Each of the `nMerges` iterations is one small aggregate (adjacent
  * symbol pairs weighted by word freq — partial agg absorbs hot pairs
  * map-side; the argmax is a 1-row TakeOrdered, not a global sort) plus
  * one narrow map (apply the merge greedily left-to-right). The word
  * table is lazily localCheckpoint'ed every iteration so the plan stays
  * flat across iterations (the connectedComponents lineage discipline),
  * and each materialized round releases its predecessor's blocks.
  * Determinism: argmax ties break on (left, right) lexicographically —
  * same corpus, same merges, every run and partitioning.
  *
  * @return (rank, left, right, merged, freq) — rank 1..nMerges in
  *         learn order; freq = the pair's corpus frequency when merged
  */
object Bpe {

  private[graft] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
        out += (a + b) // greedy left-to-right, non-overlapping (the paper's rule)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  def bpeMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // one corpus pass: word frequencies (the only corpus-sized shuffle)
    val wordFreq = df.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)]
    // symbolize: characters + end-of-word marker
    var words = wordFreq
      .map { case (w, f) => (w.toCharArray.map(_.toString).toSeq :+ "</w>", f) }
      .localCheckpoint(false)
    // the predecessor checkpoint still feeding `words`' (lazy) lineage:
    // releasable only AFTER an action materializes `words` — unpersisting
    // a lazy localCheckpoint's parent first would strand the child
    // (truncated lineage, dropped blocks: the CheckpointRelease hazard)
    var prev: org.apache.spark.sql.Dataset[(Seq[String], Long)] = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // pair counts over the vocab-bounded table; 1-row deterministic
      // argmax (TakeOrdered, no global sort). This action materializes
      // `words`, after which its predecessor's blocks are releasable.
      val top = words.flatMap { case (syms, f) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, f))
        }
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = top(0)
        rank += 1
        merges += ((rank.toLong, a, b, a + b, cnt))
        val next = words
          .map { case (syms, f) => (applyMerge(syms, a, b), f) }
          .localCheckpoint(false) // flat lineage per iteration
        prev = words
        words = next
      }
    }
    if (prev != null) prev.unpersist()
    words.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "merged", "freq")
      .select(col("rank").cast(LongType).as("rank"), col("left"), col("right"),
        col("merged"), col("freq").cast(LongType).as("freq"))
  }
}
