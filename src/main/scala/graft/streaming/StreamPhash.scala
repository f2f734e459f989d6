package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING perceptual near-dup pairs — the streaming twin of
  * [[graft.ml.Dedup.hammingBandedPairs]] (and thus of llm_phash_pairs):
  * fingerprints are computed row-locally per micro-batch (decode + dHash
  * need nothing but the row), each print explodes into its pigeonhole
  * block keys, and cross-batch keyed state per (block, key) bucket holds
  * the prints seen in that bucket. An arriving print emits a pair with
  * every stored bucket-mate within the Hamming radius.
  *
  * Exactly-once pair emission WITHOUT a second stateful operator: a pair
  * within radius k can share up to `blocks` bucket keys, and each shared
  * bucket's state fn would see both members — so a pair is emitted only
  * from its MINIMUM matching block index, which each state fn computes
  * locally from the two signatures it already holds (no cross-bucket
  * coordination, no chained dropDuplicates with its multiple-stateful-op
  * restrictions). Emission order is arrival order, but the emitted SET
  * is arrival-order independent (pair (a,b) fires when the second of
  * them arrives, whichever that is) — so unlike stream_semdedup this
  * twin needs NO ordering fixture to equal its batch counterpart; only
  * the batch bucket cap (retroactive, not replicable in a stream) must
  * stay unbound, which gate SF satisfies.
  *
  * State: one (id, sig) per print per block — 8×16 bytes per corpus row,
  * the TTL'd-dedup-window shape; `evictBucketAfterMs` ages out buckets
  * untouched for the horizon (a near-dup arriving more than the horizon
  * after its twin is missed — the standard streaming-dedup recall
  * trade). Deploy on RocksDB as with the other keyed-state twins. */
object StreamPhash {

  case class BucketState(ids: Seq[Long], sigs: Seq[Long])

  /** Block count for a streaming deploy, fed by the INGEST METER: the
    * batch [[graft.ml.Dedup.chooseBlocks]] rule applied to `nHint`, the
    * expected fingerprint population over the dedup horizon (metered
    * ingest rate × eviction horizon; the known corpus size for a
    * backfill). A stream cannot count its population up front the way
    * the batch auto form does, and the geometry must be FIXED for the
    * life of the query — state keys embed the block index and the
    * upstream explode must agree — so the choice happens ONCE at
    * topology build time from the meter's estimate. Same trade as
    * batch: past the population where the guaranteed geometry's
    * buckets saturate, block width falls back and the recall GUARANTEE
    * narrows (candidates are still Hamming-verified at the full
    * radius). Uniformity assumption documented at chooseBlocks — and
    * it is the ESTIMATE-ONLY fallback, not the deploy default: a
    * deploy that can stage a fingerprint sample should size via
    * [[autoBlocksMeasured]] (SCALING r18 §3 measured the uniform pick
    * losing 6.6% of true pairs on skewed prints). */
  def autoBlocks(nHint: Long, maxHamming: Int, maxBucketSize: Int = 1000): Int =
    graft.ml.Dedup.chooseBlocks(nHint, maxHamming, maxBucketSize)

  /** [[autoBlocks]] from a measured fingerprint SAMPLE instead of the
    * uniform closed form — the streaming analog of
    * chooseBlocksMeasured, for skewed fingerprint families where the
    * uniform estimate under-sizes (SCALING r18 §3 measured that miss
    * live: at the true 10× population the uniform pick's hot buckets
    * saturated the storage cap and lost pairs). A deploy that can
    * stage a representative sample — the backfill corpus, or the first
    * horizon's ingest — sizes from the measured over-cap occupancy
    * share at topology build time; the geometry then stays fixed for
    * the query's life exactly like the nHint form. Cache or checkpoint
    * the sample if it is expensive to recompute: the rule may probe
    * more than one geometry (one aggregation each). `nHint`
    * extrapolates the sample measurement to the metered population
    * (stationary-distribution proportional bucket growth) — the
    * composition of the two meters: the sample supplies the SHAPE of
    * the fingerprint distribution, the hint its SIZE. */
  def autoBlocksMeasured(sample: DataFrame, idCol: String, sigCol: String,
                         maxHamming: Int, maxBucketSize: Int = 1000,
                         nHint: Option[Long] = None): Int =
    graft.ml.Dedup.chooseBlocksMeasured(
      sample.select(col(idCol).as("_id"), col(sigCol).as("_sim")),
      maxHamming, maxBucketSize, scaleTo = nHint)

  /** The pigeonhole block-explode for the streaming topology — ONE
    * implementation shared by the gates (explicit geometry), the auto
    * form and the scale probe, so the exploded keys and the state fn's
    * min-matching-block rule can never disagree on the geometry.
    * Input: (id, sig64) columns; output the (id, sig, block, key)
    * occurrence stream [[candidatePairs]] consumes. */
  def blockOccurrences(sigs: DataFrame, idCol: String, sigCol: String,
                       blocks: Int): Dataset[(Long, Long, Int, Long)] = {
    import sigs.sparkSession.implicits._
    val bits = 64 / blocks
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    sigs.select(col(idCol), col(sigCol),
        posexplode(array((0 until blocks).map(i =>
          shiftright(col(sigCol), i * bits).bitwiseAND(lit(mask))): _*))
          .as(Seq("_blk", "_key")))
      .toDF("_1", "_2", "_3", "_4").as[(Long, Long, Int, Long)]
  }

  /** [[candidatePairs]] with the block geometry derived from the ingest
    * meter ([[autoBlocks]]) instead of passed explicitly — the
    * streaming twin of hammingBandedPairsAuto's nHint path. Explicit
    * overrides remain: gates and callers wanting a pinned geometry use
    * [[blockOccurrences]] + [[candidatePairs]] directly.
    *
    * THE DEPLOY DEFAULT IS MEASURED SIZING: pass `sample` (a staged
    * representative fingerprint frame — the backfill corpus or the
    * first horizon's ingest) and the geometry comes from
    * [[autoBlocksMeasured]] over it, extrapolated to `nHint`. Without
    * a sample the uniform closed form is all a stream can do, and it
    * measurably under-recalls on skewed fingerprint families (SCALING
    * r18 §3: the uniform pick at the true 10× phash population lost
    * 6.6% of true pairs to storage-cap saturation; the measured pick
    * recovers them all at the same wall) — recall loss is a
    * correctness property for a dedup pipeline, so a deploy that CAN
    * stage a sample should. */
  def candidatePairsAuto(sigs: DataFrame, idCol: String, sigCol: String,
                         nHint: Long, maxHamming: Int,
                         evictBucketAfterMs: Option[Long] = None,
                         maxBucketSize: Int = 1000,
                         sample: Option[DataFrame] = None): DataFrame = {
    val blocks = sample match {
      case Some(df) => autoBlocksMeasured(df, idCol, sigCol, maxHamming,
        maxBucketSize, nHint = Some(nHint))
      case None => autoBlocks(nHint, maxHamming, maxBucketSize)
    }
    candidatePairs(blockOccurrences(sigs, idCol, sigCol, blocks),
      maxHamming, blocks, evictBucketAfterMs, maxBucketSize)
  }

  /** (id, sig64, block, key) occurrence stream → (id_a, id_b, hamming)
    * near-dup pairs, each emitted exactly once (min-matching-block rule).
    * `blocks` must match the upstream explode (64/blocks-bit keys).
    *
    * `maxBucketSize` is the streaming analog of the batch machinery's
    * degenerate-bucket cap (hammingBandedPairs): a bucket that reaches
    * the cap stops STORING — per-bucket state stays O(cap) and
    * per-arrival work O(cap) instead of quadratic-total on a degenerate
    * key. Arrivals at a saturated bucket still compare-and-emit against
    * the stored prints (emission costs no state), so the only
    * saturation loss is a pair whose min matching block filled before
    * EITHER member arrived — the other shared blocks hold both members
    * but refuse under the min-block rule. The cap is PROSPECTIVE where
    * batch's is retroactive (emitted pairs cannot be taken back), so
    * batch==stream equality holds exactly while no bucket crosses the
    * cap — and the crossing is DETECTABLE, not silent: a WARN logs the
    * saturated bucket the moment it fills. */
  def candidatePairs(occ: Dataset[(Long, Long, Int, Long)],
                     maxHamming: Int, blocks: Int,
                     evictBucketAfterMs: Option[Long] = None,
                     maxBucketSize: Int = 1000): DataFrame = {
    import occ.sparkSession.implicits._
    val bits = 64 / blocks
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    val timeoutConf =
      if (evictBucketAfterMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    occ.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (bucket: (Int, Long), it: Iterator[(Long, Long, Int, Long)],
         state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val block = bucket._1
            def minMatchingBlock(a: Long, b: Long): Int = {
              var i = 0
              while (i < blocks) {
                if (((a >>> (i * bits)) & mask) == ((b >>> (i * bits)) & mask)) return i
                i += 1
              }
              blocks // unreachable for true bucket-mates
            }
            val st = if (state.exists) state.get else BucketState(Nil, Nil)
            var ids = st.ids.toList
            var sigs = st.sigs.toList
            var n = ids.length
            val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Int)]
            it.foreach { case (id, sig, _, _) =>
              // compare-and-emit runs UNCONDITIONALLY: emission costs no
              // state, so an arrival pairs with every already-STORED
              // bucket-mate even once the bucket is saturated — only
              // STORAGE is capped. The residual saturation loss is pairs
              // whose min matching block saturated before EITHER member
              // arrived (neither stored there, and the other shared
              // blocks hold both but refuse under the min-block rule) —
              // that loss is what the WARN below makes detectable.
              var is = ids
              var ss = sigs
              while (is.nonEmpty) {
                val pid = is.head
                val psig = ss.head
                val h = java.lang.Long.bitCount(sig ^ psig)
                if (h <= maxHamming && minMatchingBlock(sig, psig) == block)
                  out += ((math.min(id, pid), math.max(id, pid), h))
                is = is.tail
                ss = ss.tail
              }
              if (n < maxBucketSize) {
                ids ::= id
                sigs ::= sig
                n += 1
                if (n == maxBucketSize)
                  org.slf4j.LoggerFactory.getLogger(StreamPhash.getClass).warn(
                    s"StreamPhash bucket (block=${bucket._1}, key=${bucket._2}) hit " +
                      s"maxBucketSize=$maxBucketSize: storage frozen (arrivals still " +
                      "pair with stored prints; pairs min-blocked here between two " +
                      "post-saturation arrivals are missed) — batch equality no " +
                      "longer exact for this bucket")
              }
            }
            state.update(BucketState(ids, sigs))
            evictBucketAfterMs.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
      .toDF("id_a", "id_b", "hamming")
  }
}
