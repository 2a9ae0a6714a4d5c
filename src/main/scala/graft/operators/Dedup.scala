package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), exact n-gram Jaccard, MinHash+LSH near-dup,
  * SimHash near-dup, and embedding-cosine near-dup.
  *
  * Scale posture: everything is keyed aggregation + equi-join — no
  * driver-side state. The MinHash path is the 100 TB route (candidates
  * via band buckets, exact Jaccard verification only on candidates);
  * the all-pairs shingle join is the small/exact route and the oracle
  * for the approximate one.
  */
object Dedup {

  /** Exact dedup: group by md5 of normalized text, keep the smallest id.
    * Output: (fp, keep_id, dup_count).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(md5(TextStats.normalized(col(textCol))).as("fp"),
        col(idCol).as("doc_id"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct word n-gram shingles per document.
    * Output: (doc_id, s). Shorter-than-n docs yield one whole-text shingle
    * (greatest(...,1) guard — also keeps Spark's `sequence` from running
    * backwards when size-n+1 < 1).
    */
  def shingles(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val t = split(col(textCol), " ")
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(t, i, lit(n)))))).as("s"))
  }

  /** Exact n-gram Jaccard near-dup pairs with PREFIX FILTERING
    * (ppjoin-style): jaccard = |A∩B| / (|A|+|B|-|A∩B|); emits
    * doc_a < doc_b with jaccard >= threshold.
    * Output: (doc_a, doc_b, jac).
    *
    * Exactness-preserving pruning: any pair with jac >= t must
    *  (1) satisfy the size filter t·|A| <= |B| <= |A|/t, and
    *  (2) share at least one shingle within each side's prefix — the
    *      floor((1-t)·n)+1 globally-RAREST shingles of the doc (from
    *      jac >= t follows |A∩B| >= ceil(t·|A|), so the complement of
    *      the intersection cannot cover A's whole prefix).
    * Candidates therefore join only on prefix shingles (rare by
    * construction — hot shingles never generate candidate pairs), and
    * every candidate is then verified with the full exact Jaccard.
    * Same output as the naive all-pairs join, orders of magnitude fewer
    * join rows on skewed shingle distributions.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
                        n: Int = 3): DataFrame = {
    // consumed 4× (candidate join ×2, verify ×2) — materialize once
    val sh = shingles(docs, n).persist()
    jaccardVerifySized(sh, candidatesByPrefix(sh, threshold), threshold)
  }

  /** Union-find over an edge list; returns id → min-id-of-component for
    * every id that appears in an edge (isolated ids map to themselves
    * and are omitted). Generic in the id type: `lt` must agree with
    * Spark's `min()` ordering for that type (it defines which member
    * becomes the component label). */
  private def unionFindMinLabels(edges: Array[(Any, Any)])
                                (lt: (Any, Any) => Boolean): Map[Any, Any] = {
    val parent = scala.collection.mutable.Map.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.map(id => id -> find(id)).toMap
  }

  /** `<` matching Spark's `min()` ordering for the id types the driver
    * union-find supports; None → unsupported type, use the distributed
    * label-propagation path (whose min() defines the ordering natively).
    * Strings compare through Spark's own UTF8String (UTF-8 byte order):
    * Java's UTF-16 `<` diverges for supplementary-plane code points
    * (U+10000+) mixed with U+E000–U+FFFF, which would let the driver
    * path pick a different canonical label than a distributed min(). */
  private def idLessThan(
      t: org.apache.spark.sql.types.DataType): Option[(Any, Any) => Boolean] = {
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    t match {
      case LongType => Some((a, b) =>
        a.asInstanceOf[Long] < b.asInstanceOf[Long])
      case IntegerType => Some((a, b) =>
        a.asInstanceOf[Int] < b.asInstanceOf[Int])
      case StringType => Some((a, b) =>
        UTF8String.fromString(a.asInstanceOf[String])
          .compareTo(UTF8String.fromString(b.asInstanceOf[String])) < 0)
      case _ => None
    }
  }

  /** Prefix-filtered candidate pairs (see [[ngramJaccardPairs]]).
    * Output carries both shingle-set sizes (doc_a, doc_b, na, nb) so the
    * verify phase needs no size re-aggregation. The per-doc size comes
    * from a window count over the SAME doc_id partitioning the prefix
    * rank already shuffles for — one exchange serves both, instead of a
    * separate groupBy + join-back (measured ~25% of the query on the
    * shuffle-latency-dominated sf0.1 profile). */
  private[graft] def candidatesByPrefix(sh: DataFrame,
                                 threshold: Double): DataFrame = {
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("s_df"))
    val wDoc = Window.partitionBy("doc_id")
    val w = Window.partitionBy("doc_id")
      .orderBy(col("s_df").asc, col("s").asc)
    // Epsilon guard: t*n in binary fp can land just above the exact
    // product (0.8*10 = 8.000000000000002), shaving one element off the
    // prefix / wrongly failing the >= size check for pairs at exactly
    // jac == t. 1e-6 absolute slack is far above fp error for any real
    // shingle count and far below the next integer.
    val eps = 1e-6
    val prefixes = sh
      .join(dfreq, "s")
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        col("n") - ceil(lit(threshold) * col("n") - eps) + 1)
      .select("doc_id", "s", "n")
    val a = prefixes.as("a")
    val b = prefixes.as("b")
    a.join(b, col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("b.n") >= lit(threshold) * col("a.n") - eps &&
        col("a.n") >= lit(threshold) * col("b.n") - eps)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
  }

  /** Exact Jaccard verification for candidates that already carry their
    * shingle-set sizes (doc_a, doc_b, na, nb) — the [[candidatesByPrefix]]
    * output shape. Skips [[jaccardOnPairs]]' two size joins; the sizes
    * ride through the common-shingle aggregation as grouping keys. */
  private[graft] def jaccardVerifySized(sh: DataFrame, pairs: DataFrame,
                                        threshold: Double): DataFrame =
    pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("common"))
      .select(col("doc_a"), col("doc_b"),
        (col("common") / (col("na") + col("nb") - col("common")))
          .as("jac"))
      .filter(col("jac") >= threshold)

  /** Exact Jaccard for a given candidate-pair set, from shingle sets. */
  private[graft] def jaccardOnPairs(sh: DataFrame, pairs: DataFrame,
                             threshold: Double,
                             carryCols: Seq[String] = Nil): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val keys = Seq("doc_a", "doc_b") ++ carryCols
    val common = pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select((keys.map(col) :+
        (col("common") / (col("za.n") + col("zb.n") - col("common")))
          .as("jac")): _*)
      .filter(col("jac") >= threshold)
  }

  /** MinHash + LSH near-dup pairs — the at-scale path.
    *
    * numPerm permutations approximated by seeded xxhash64 family
    * h_p(s) = xxhash64(p, s); signature = per-p minimum over the doc's
    * shingles. LSH: `bands` bands of numPerm/bands rows each; docs
    * sharing any (band, band-signature) bucket become candidates; each
    * candidate pair is then verified with EXACT Jaccard over its shingle
    * sets, so false positives are eliminated and the only approximation
    * is the candidate miss probability (1-j^r)^b for a pair at jaccard
    * j. Defaults r=4, b=32: ≈5e-8 at j=0.8, ≈2e-13 at j=0.9 — narrow
    * bands keep pairs AT the threshold reliable (r=8 would miss a
    * j=0.8 pair ~5% of the time); the extra false-positive candidates
    * narrower bands admit are discarded by the exact verification.
    * Output: (doc_a, doc_b, jac) — same surface as [[ngramJaccardPairs]],
    * which is its oracle.
    */
  /** MinHash band signatures from a shingle frame: one-pass signatures
    * ((doc) → Array[Long](numPerm) of per-perm mins; shingles
    * pre-hashed to longs with codegen'd xxhash64 so the aggregation
    * exchange carries the hash, not the string), then per-band slice
    * hashes. Keys travel as strings (doc_id can be any type — ANSI
    * long-casts would throw on wikitext string ids) and map back to
    * the original ids after. Output: (doc_id, band, sig).
    */
  private[graft] def bandSignatures(sh: DataFrame, numPerm: Int,
                                    bands: Int): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    val spark = sh.sparkSession
    import spark.implicits._
    val sigsByKey = sh.select(col("doc_id").cast("string").as("k"),
        xxhash64(col("s")).as("h0"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(new graft.functions.MinHashAgg(numPerm).toColumn.name("sig"))
      .toDF("k", "sig")
    val ids = sh.select(col("doc_id")).distinct()
      .withColumn("k", col("doc_id").cast("string"))
    val sigs = sigsByKey.join(ids, "k").select("doc_id", "sig")
    sigs
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        xxhash64(slice(col("sig"), col("band") * rowsPerBand + 1,
          lit(rowsPerBand))).as("sig"))
  }

  def minHashLsh(docs: DataFrame, threshold: Double = 0.8, n: Int = 3,
                 numPerm: Int = 128, bands: Int = 32): DataFrame = {
    // consumed 4× (signatures, sizes, verify ×2) — materialize once.
    // NOT eagerly warmed (unlike the Graph iteration caches, r13):
    // measured on dedup_incremental/dedup_index_artifact, the eager
    // cache-fill jobs cost more than the concurrent-consumer
    // redundancy they prevent at these frame sizes.
    val sh = shingles(docs, n).persist()
    // persist: the band self-join reads this twice; unpersisted it
    // would run the MinHash aggregation once per side
    val bandSigs = bandSignatures(sh, numPerm, bands).persist()
    // r14 re-measure of the r13 "no eager warm here" note: profiled
    // through pipe_curate, the one-action plan evaluated the shingle
    // chain SEVEN times (~0.75 s each) through its racing exchange
    // subtrees (sizes + both verify sides + both band sides). One
    // count materializes bandSigs AND sh (bandSigs consumes every sh
    // row on the way — the prSetup warm-deg device)
    bandSigs.count()
    val l = bandSigs.as("l")
    val r = bandSigs.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    jaccardOnPairs(sh, candidates, threshold)
  }

  /** Incremental (delta-vs-corpus) MinHash dedup — the daily-ingestion
    * pattern at 100 TB: a new batch must dedup against the existing
    * corpus WITHOUT re-pairing corpus×corpus. Candidates come from two
    * band equi-joins — delta→corpus and delta→delta (smaller-id-first)
    * — so the join work is delta-sized on the probe side; in
    * production the corpus band signatures are a persisted lake table
    * built once per batch cycle (here both sides derive in-plan from
    * the same frame, split by the deterministic `doc_id % deltaMod`
    * membership so the oracle can replay the partition).
    *
    * Every candidate is exact-Jaccard verified (LSH false positives
    * die there; miss probability at the planted jac≈0.98 pairs is
    * ~1e-13 with 32×4 bands — the dedup_minhash_lsh argument). A delta
    * doc is kept iff it matches no corpus doc and no SMALLER-id delta
    * doc (first-wins within the batch, the same min-id convention as
    * assignCanonical).
    * Output: (doc_id, n_corpus_dups, n_delta_dups, keep) — one row per
    * delta doc.
    */
  def incrementalMinHash(docs: DataFrame, threshold: Double = 0.8,
                         n: Int = 3, numPerm: Int = 128, bands: Int = 32,
                         deltaMod: Int = 5): DataFrame = {
    val isDelta = pmod(col("doc_id"), lit(deltaMod)) === 0
    // shingles feed signatures + two verifies — materialize once (not
    // eagerly: the minHashLsh measurement, r13)
    val sh = shingles(docs, n).persist()
    val bandSigs = bandSignatures(sh, numPerm, bands).persist()
    incrementalTail(docs.filter(isDelta).select(col("doc_id")), sh,
      bandSigs.filter(isDelta), bandSigs.filter(!isDelta), threshold)
  }

  /** The candidate-then-verify tail shared VERBATIM by
    * [[incrementalMinHash]] (both sides in-plan) and
    * [[incrementalMinHashFromIndex]] (corpus side re-read from the
    * persisted index) — the ivfServe discipline: build-then-serve is
    * bit-identical to build-and-serve by construction. `sh` must cover
    * the shingles of BOTH sides (the exact-Jaccard verify reads
    * them). */
  private def incrementalTail(deltaDocs: DataFrame, sh: DataFrame,
                              deltaB: DataFrame, corpusB: DataFrame,
                              threshold: Double): DataFrame = {
    val candCorpus = deltaB.as("l")
      .join(corpusB.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val candDelta = deltaB.as("l")
      .join(deltaB.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    // ONE exact-Jaccard verify over the tagged union of both candidate
    // sets (disjoint by construction: corpus ids never appear as a
    // delta doc_b) — per-pair verification is pair-local, so verifying
    // the union equals verifying each set, and the corpus-sized shingle
    // `sizes` aggregation + the pairs⋈shingles join run ONCE instead of
    // twice (round-14, guide §1.2/§2.3; the verify side is the only
    // corpus-sized work in this tail)
    val cand = candCorpus.withColumn("is_c", lit(true))
      .unionByName(candDelta.withColumn("is_c", lit(false)))
    val ver = jaccardOnPairs(sh, cand, threshold, carryCols = Seq("is_c"))
    // a corpus dup counts against the delta member doc_a; an in-batch
    // dup counts against the LARGER id (doc_b): the smaller-id member
    // stays the batch canonical
    val n = ver
      .select(when(col("is_c"), col("doc_a")).otherwise(col("doc_b"))
        .as("doc_id"), col("is_c"))
      .groupBy("doc_id")
      .agg(sum(when(col("is_c"), 1L).otherwise(0L)).as("nc"),
        sum(when(col("is_c"), 0L).otherwise(1L)).as("nd"))
    deltaDocs
      .join(n, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nc"), lit(0L)).as("n_corpus_dups"),
        coalesce(col("nd"), lit(0L)).as("n_delta_dups"))
      .withColumn("keep",
        col("n_corpus_dups") === 0 && col("n_delta_dups") === 0)
  }

  /** Persist the near-dup index as a parquet artifact — the
    * "persisted lake table built once per batch cycle" the
    * [[incrementalMinHash]] scaladoc describes, made real (the
    * ivfIndexWrite pattern applied to dedup). Layout under `dir`:
    *  - `bands/` — (doc_id, sig, band), PARTITIONED BY band: the LSH
    *    buckets as physical directories, so a band-keyed probe prunes
    *    at the scan;
    *  - `shingles/` — (doc_id, s): the exact-verify side.
    * The LSH parameters are part of the index contract — pass the same
    * (n, numPerm, bands) to the readers. */
  def dedupIndexWrite(corpus: DataFrame, dir: String, n: Int = 3,
                      numPerm: Int = 128, bands: Int = 32): Unit = {
    val sh = shingles(corpus, n).persist()
    sh.write.mode("overwrite").parquet(s"$dir/shingles")
    bandSignatures(sh, numPerm, bands)
      // cluster by the partition column before the partitioned write:
      // without it every upstream task opens a file in every band dir
      // (≈ tasks × bands tiny files — measured r13: the band-index
      // write dominated dedup_index_artifact at 11.3 s); AQE rebalance
      // keeps file sizing scale-adaptive instead of pinning 1 file per
      // band (guide §6)
      .hint("rebalance", col("band"))
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$dir/bands")
    sh.unpersist()
  }

  /** APPEND a deduped delta's signatures and shingles to the stored
    * index — the nightly-cycle maintenance step: band signatures are
    * per-doc independent given fixed parameters, so append-then-probe
    * equals a full index rebuild over the union (the ivfIndexAppend
    * argument). Call with the KEPT delta docs. */
  def dedupIndexAppend(keptDelta: DataFrame, dir: String, n: Int = 3,
                       numPerm: Int = 128, bands: Int = 32): Unit = {
    val sh = shingles(keptDelta, n).persist()
    sh.write.mode("append").parquet(s"$dir/shingles")
    bandSignatures(sh, numPerm, bands)
      .hint("rebalance", col("band")) // see dedupIndexWrite (guide §6)
      .write.mode("append").partitionBy("band")
      .parquet(s"$dir/bands")
    sh.unpersist()
  }

  /** Dedup a delta against the persisted [[dedupIndexWrite]] index:
    * the identical [[incrementalTail]] with the corpus side arriving
    * from the artifact — the raw corpus is never re-shingled, the
    * probe joins are delta-sized, and the verify touches only the
    * stored shingles of banded candidates.
    * Output: (doc_id, n_corpus_dups, n_delta_dups, keep). */
  def incrementalMinHashFromIndex(delta: DataFrame, dir: String,
                                  threshold: Double = 0.8, n: Int = 3,
                                  numPerm: Int = 128,
                                  bands: Int = 32): DataFrame =
    incrementalMinHashFromIndexOpen(delta, dir, threshold, n, numPerm,
      bands)._1

  /** [[incrementalMinHashFromIndex]] with the batch's shingle and
    * band-signature frames EXPOSED, so a streaming ingest can append
    * the surviving subset back to the index without recomputing either
    * (see [[dedupIndexAppendFrom]]). Both auxiliary frames arrive
    * persisted; the caller owns their lifecycle.
    * Returns (result, batchShingles, batchBandSigs). */
  private[graft] def incrementalMinHashFromIndexOpen(
      delta: DataFrame, dir: String, threshold: Double = 0.8,
      n: Int = 3, numPerm: Int = 128,
      bands: Int = 32): (DataFrame, DataFrame, DataFrame) = {
    val spark = delta.sparkSession
    val shDelta = shingles(delta, n).persist()
    val deltaB = bandSignatures(shDelta, numPerm, bands).persist()
    val corpusB = spark.read.parquet(s"$dir/bands")
      .select(col("doc_id"), col("band").cast("int").as("band"),
        col("sig"))
    val shAll = shDelta
      .unionByName(spark.read.parquet(s"$dir/shingles"))
    (incrementalTail(delta.select(col("doc_id")), shAll, deltaB,
      corpusB, threshold), shDelta, deltaB)
  }

  /** [[dedupIndexAppend]] served from the ALREADY-COMPUTED whole-batch
    * shingle and band-signature frames, filtered to the kept ids:
    * shingles and band signatures are per-doc functions (every
    * aggregation key is doc-scoped), so filtering the batch frames to
    * the survivors is bit-identical to recomputing both from the
    * survivors' text — and the append skips a second shingle explode
    * AND a second numPerm-permutation MinHash aggregation per
    * micro-batch (round-14: stream_neardup_dedup's cost was per-batch
    * job count, guide §1.2 "don't compute things twice"). */
  private[graft] def dedupIndexAppendFrom(keptIds: DataFrame,
                                          sh: DataFrame,
                                          bandSigs: DataFrame,
                                          dir: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val ids = broadcast(keptIds.select("doc_id"))
    // the two appends read only cached frames and write disjoint dirs —
    // run them as concurrent jobs so the second doesn't pay a full
    // driver round-trip after the first's tail (guide §2.6)
    val shF = Future {
      sh.join(ids, "doc_id").write.mode("append")
        .parquet(s"$dir/shingles")
    }
    val bandF = Future {
      bandSigs.join(ids, "doc_id")
        // REBALANCE only resolves under AQE, and foreachBatch closures
        // run on the micro-batch's CLONED session where AQE is forced
        // off — the r13 hint was silently dropped here ("Unrecognized
        // hint" in the logs), landing tasks × bands tiny files per
        // append. A hash repartition by the partition column works
        // without AQE and the frame is delta-sized, so the extra
        // exchange is one tiny shuffle (guide §6 small-files)
        .repartition(col("band"))
        .write.mode("append").partitionBy("band")
        .parquet(s"$dir/bands")
    }
    Await.result(shF, Duration.Inf)
    Await.result(bandF, Duration.Inf)
  }

  /** SimHash near-dup pairs. 64-bit signature: bit j is the sign of the
    * count-weighted sum of (±1 per token, + when bit j of the md5-based
    * [[graft.functions.SimHashAgg.wordBasis]] is set — engine-portable,
    * so a SQL oracle recomputes identical signatures).
    * Pairs within `maxHamming` found via 4×16-bit band join
    * (a pair within hamming distance 3 must agree exactly on at least one
    * of the 4 bands — pigeonhole), then verified with bit_count(xor).
    * Output: (doc_a, doc_b, hamming).
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 63, "maxHamming in [0, 62]")
    val sigs = simHash(docs, idCol, textCol)
    // pigeonhole: maxHamming differing bits cannot touch all
    // maxHamming+1 bands, so a qualifying pair agrees exactly on >= 1
    // band. Band widths divide the 64 bits as evenly as possible.
    val nBands = maxHamming + 1
    val base = 64 / nBands
    val rem = 64 % nBands
    val bands = (0 until nBands).scanLeft((0, 0)) { case ((off, w), b) =>
      (off + w, base + (if (b < rem) 1 else 0))
    }.tail // (offset, width) per band
    val bandCols = bands.zipWithIndex.map { case ((off, w), b) =>
      // (1L << 64) wraps to 1 in Scala, so a full-width band (maxHamming
      // = 0 → one 64-bit band) needs the all-bits mask spelled as -1L —
      // the wrap would otherwise mask every chunk to 0 and degrade the
      // candidate join to all-pairs (correct output via the bit_count
      // verify, but the pruning silently lost)
      val mask = if (w == 64) -1L else (1L << w) - 1
      struct(lit(b).as("band"),
        expr(s"shiftrightunsigned(simhash, $off) & $mask").as("chunk"))
    }
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bc"))
      .select(col("doc_id"), col("simhash"),
        col("bc.band").as("band"), col("bc.chunk").as("chunk"))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") &&
        col("l.chunk") === col("r.chunk") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit SimHash signature per document over normalized word unigrams,
    * via the one-pass [[graft.functions.SimHashAgg]] (no 64× explode).
    * Output: (doc_id, simhash).
    */
  def simHash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = WikiText.tokens(docs, idCol, textCol)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
    // string-keyed for id-type generality (see minHashLsh)
    val byKey = counts
      .select(col("doc_id").cast("string").as("k"), col("word"), col("cnt"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .agg(new graft.functions.SimHashAgg().toColumn.name("simhash"))
      .toDF("k", "simhash")
    val ids = counts.select(col("doc_id")).distinct()
      .withColumn("k", col("doc_id").cast("string"))
    byKey.join(ids, "k").select("doc_id", "simhash")
  }

  /** Benchmark decontamination — the eval-leak check of a training-data
    * pipeline: flags every corpus document sharing at least one distinct
    * word n-gram with any benchmark document. Pure keyed equi-join on
    * the shingle (the benchmark shingle set is DISTINCT and usually
    * broadcast-sized; the corpus side streams) — no all-pairs anything,
    * the 100 TB shape. Output: (doc_id, n_shared) — flagged docs only,
    * with the count of distinct contaminated n-grams.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    n: Int = 5): DataFrame =
    shingles(docs, n)
      .join(shingles(benchmark, n).select("s").distinct(), "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))

  /** [[decontaminate]] with a Bloom prefilter on the corpus side — the
    * semi-join-reduction shape for benchmark sets too large to
    * broadcast: a 2^log2Bits-bit Bloom filter is built over the
    * benchmark shingles with a distributed bit_or aggregation, collected
    * as a bounded model artifact (m/64 longs — 32 KiB at the 2^21
    * default, independent of data size; same bounded-collect reasoning
    * as the IVF codebook), and embedded as an array literal so the
    * membership test is a pure per-row codegen'd expression: no UDF, no
    * join — it evaluates right above the corpus scan and drops clean
    * shingles before they reach the exchange. False positives survive
    * the prefilter and are eliminated by the exact equi-join, so the
    * output is BIT-IDENTICAL to [[decontaminate]] (the gate runs both
    * against one oracle). One xxhash64 per shingle; the k positions are
    * disjoint log2Bits-bit slices of the 64-bit hash;
    * fpp ≈ (1-e^(-kn/m))^k. The hash base deliberately does NOT need
    * engine portability: false positives are erased by the exact join,
    * so the filter can use the fastest native hash (xxhash64 is a
    * codegen'd long op; the previous md5-hex + conv(…,16,10) digest
    * spent more per corpus shingle on string decimal conversion than
    * the whole exact join's exchange cost locally).
    *
    * WHEN IT WINS — measured (tools/BloomProbe, K=30 clones, broadcast
    * disabled, 4-gram shingles, ~7M corpus shingle rows): the prefilter
    * cuts bytes crossing the exchange 90% (170 MB → 17 MB) but spends
    * extra per-shingle CPU, so on local[32] — where the "exchange" is
    * memory/local disk — the exact join still wins on wall clock. The
    * implied crossover is the probe's `bytes_saved / extra_seconds`:
    * below that effective per-node exchange bandwidth (congested
    * cluster networks, cloud object-store shuffle), the prefilter wins;
    * see BASELINE.md's probe row for the stamped number. Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter` did NOT inject on this
    * join (creation-side heuristics; measured equal bytes with it on) —
    * this explicit variant exists exactly because a decontamination
    * pipeline KNOWS the benchmark side is the small one. Keep
    * [[decontaminate]] for single-node / broadcastable benchmarks.
    */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame,
                         n: Int = 5, log2Bits: Int = 21,
                         numHashes: Int = 3): DataFrame = {
    requireBloomParams(log2Bits, numHashes)
    val benchShingles = shingles(benchmark, n).select("s").distinct()
    val words = denseBloomWords(
      bloomSparseWords(benchShingles, log2Bits, numHashes).collect(),
      log2Bits) // bounded: ≤ m/64 rows by construction
    bloomVerifyTail(docs, benchShingles, words, n, log2Bits, numHashes)
  }

  private def requireBloomParams(log2Bits: Int, numHashes: Int): Unit = {
    require(log2Bits >= 6 && log2Bits <= 24,
      s"log2Bits out of [6, 24]: $log2Bits")
    require(numHashes >= 1 && numHashes * log2Bits <= 63,
      s"numHashes*log2Bits must fit in 63 bits: $numHashes × $log2Bits")
  }

  // ONE native 64-bit hash per shingle; the k bit positions are
  // disjoint log2Bits-bit slices (the per-row hash IS the prefilter's
  // cost at scale — see the decontaminateBloom scaladoc)
  private def bloomDigest(s: Column): Column = xxhash64(lit("bf|"), s)

  private def bloomPositions(h: Column, log2Bits: Int,
                             numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      shiftrightunsigned(h, log2Bits * i)
        .bitwiseAND(lit((1L << log2Bits) - 1))
    }

  /** Distributed Bloom build: explode the k positions, OR the bits per
    * 64-bit word — both stages partial-aggregate map-side.
    * Output: (widx, bits), ≤ m/64 rows. */
  private def bloomSparseWords(benchShingles: DataFrame, log2Bits: Int,
                               numHashes: Int): DataFrame =
    benchShingles
      .select(explode(array(
        bloomPositions(bloomDigest(col("s")), log2Bits, numHashes): _*))
        .as("pos"))
      .select(shiftright(col("pos"), 6).as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
          .as("bit"))
      .groupBy("widx").agg(bit_or(col("bit")).as("bits"))

  private def denseBloomWords(rows: Array[org.apache.spark.sql.Row],
                              log2Bits: Int): Array[Long] = {
    val words = new Array[Long](((1L << log2Bits) >> 6).toInt)
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** The shared prefilter-then-exact-verify tail: embed the dense
    * words as an array literal (pure codegen'd membership test above
    * the corpus scan), then the exact shingle equi-join erases false
    * positives. */
  private def bloomVerifyTail(docs: DataFrame, benchShingles: DataFrame,
                              words: Array[Long], n: Int, log2Bits: Int,
                              numHashes: Int): DataFrame = {
    val bf = lit(words)
    def isSet(p: Column): Column =
      call_function("shiftright",
        element_at(bf, shiftright(p, 6).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    shingles(docs, n)
      .withColumn("_hx", bloomDigest(col("s")))
      .filter(bloomPositions(col("_hx"), log2Bits, numHashes)
        .map(isSet).reduce(_ && _))
      .drop("_hx")
      .join(benchShingles, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Persist the decontamination index as a parquet artifact — the
    * benchmark-suite reality: the suite is FROZEN, so its shingle set
    * and Bloom filter are built once and every corpus refresh reads
    * the index, never the raw benchmark. Layout under `dir`:
    * `shingles/` (the distinct benchmark n-gram set, the exact-verify
    * side) and `bloom/` ((widx, bits) sparse filter words). The Bloom
    * parameters are part of the index contract — pass the same
    * (n, log2Bits, numHashes) to [[decontaminateFromIndex]]. */
  def decontamIndexWrite(benchmark: DataFrame, dir: String, n: Int = 5,
                         log2Bits: Int = 21, numHashes: Int = 3): Unit = {
    requireBloomParams(log2Bits, numHashes)
    val benchShingles = shingles(benchmark, n).select("s").distinct()
      .persist()
    benchShingles.write.mode("overwrite").parquet(s"$dir/shingles")
    bloomSparseWords(benchShingles, log2Bits, numHashes)
      .write.mode("overwrite").parquet(s"$dir/bloom")
    benchShingles.unpersist()
  }

  /** Decontaminate a corpus against a persisted [[decontamIndexWrite]]
    * artifact: the identical [[bloomVerifyTail]] over the re-read
    * filter words and shingle set — bit-identical to
    * [[decontaminateBloom]] (and therefore to [[decontaminate]]) by
    * the shared-tail construction; the raw benchmark is never
    * touched. */
  def decontaminateFromIndex(docs: DataFrame, dir: String, n: Int = 5,
                             log2Bits: Int = 21,
                             numHashes: Int = 3): DataFrame = {
    requireBloomParams(log2Bits, numHashes)
    val spark = docs.sparkSession
    val words = denseBloomWords(
      spark.read.parquet(s"$dir/bloom").collect(), log2Bits)
    bloomVerifyTail(docs, spark.read.parquet(s"$dir/shingles"), words,
      n, log2Bits, numHashes)
  }

  /** Full dedup ASSIGNMENT pipeline — the 100 TB shape. Emitting all
    * near-dup pairs is quadratic in the clone multiplicity (10× cloning
    * → 45× the pairs; measured 64s vs 3s in tools/ScaleProbe), so
    * production pipelines assign every doc a canonical id instead:
    *
    *  1. exact-collapse: md5(normalized text) groups → one representative
    *     per clone set (kills the quadratic blowup before it exists);
    *  2. near-dup edges among representatives only (MinHash+LSH,
    *     exact-verified);
    *  3. connected components over those edges via iterative min-label
    *     propagation (clusters are tiny — converges in a few rounds);
    *  4. every doc inherits its representative's component label.
    *
    * Shingles here are over the NORMALIZED text, so exact clones have
    * identical shingle sets and collapsing them first provably preserves
    * the components of the naive all-docs graph.
    * Output: (doc_id, canonical_id) — canonical_id = min doc_id of the
    * doc's (exact ∪ near-dup) connected component.
    */
  def assignCanonical(docs: DataFrame, threshold: Double = 0.8,
                      n: Int = 3, maxIter: Int = 20,
                      exactEdges: Boolean = false,
                      driverCcMaxEdges: Long = 1000000L): DataFrame = {
    // the normalize regex is the expensive half of this projection and
    // BOTH the fingerprint branch and the representative-text branch
    // consume it — materialize once (r14 profile: two identical 0.77 s
    // map jobs per pipe_curate/dedup_assign action). One repExact
    // count fills the normed cache on the way (fp reads every row)
    val normed = docs.select(col("doc_id"),
      TextStats.normalized(col("text")).as("text")).persist()
    val fp = normed.select(col("doc_id"), md5(col("text")).as("fp"))
    val repExact = fp.groupBy("fp").agg(min("doc_id").as("rep")).persist()
    repExact.count()
    val docRep = fp.join(repExact, "fp").select("doc_id", "rep")
    val repDocs = normed.join(repExact.select(col("rep")),
      col("doc_id") === col("rep")).select("doc_id", "text")
    // Edges among representatives: MinHash+LSH candidates by default —
    // candidates are exact-Jaccard-verified, so the only approximation is
    // the candidate miss probability, ~5e-8 for a pair AT j=0.8 and
    // ~1e-13 at j≈0.98 (the regime clone clusters live in). The exact
    // prefix-filtered ppjoin remains available (exactEdges=true) as the
    // deterministic twin, but it is 3-4× the cost at equal output — the
    // measured cost center of the whole pipeline.
    val pairs = (if (exactEdges) ngramJaccardPairs(repDocs, threshold, n)
                 else minHashLsh(repDocs, threshold, n))
      .select(col("doc_a"), col("doc_b"))
    // Near-dup components are tiny even on huge corpora — when the edge
    // set is bounded, a driver-side union-find beats the distributed
    // iteration outright (the edge LIST is small even when the corpus
    // isn't; this is the same small-side reasoning as a broadcast join).
    // 1M edges ≈ 16 MB of id pairs on the driver — broadcast-sized.
    val pairsPersisted = pairs.persist()
    val pairCount = pairsPersisted.count()
    val idType = docRep.schema("rep").dataType
    val lt = idLessThan(idType)
    if (pairCount <= driverCcMaxEdges && lt.isDefined) {
      val remap = unionFindMinLabels(pairsPersisted.collect()
        .map(r => (r.get(0), r.get(1))))(lt.get)
      val spark0 = docs.sparkSession
      val remapSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rid", idType),
        org.apache.spark.sql.types.StructField("rlabel", idType)))
      val remapRows = remap.toSeq.map { case (a, b) =>
        org.apache.spark.sql.Row(a, b)
      }
      import scala.jdk.CollectionConverters._
      val remapDf = spark0.createDataFrame(remapRows.asJava, remapSchema)
      return docRep
        .join(broadcast(remapDf), col("rep") === col("rid"), "left")
        .select(col("doc_id"),
          coalesce(col("rlabel"), col("rep")).as("canonical_id"))
    }
    // Distributed min-label propagation fallback (unbounded edge sets or
    // id types without a driver-side ordering). The loop runs on a
    // CLONED session scoped to 8 shuffle partitions: the label table is
    // tiny relative to the corpus (one row per representative), so
    // batch-sized shuffle parallelism would make iteration overhead
    // dominate — and mutating the shared session's conf (the previous
    // approach) races against concurrent queries on the same session.
    val parentSession = docs.sparkSession
    val cc = parentSession.newSession()
    cc.conf.set("spark.sql.shuffle.partitions", "8")
    // re-bind the (already materialized) small frames to the scoped
    // session via their RDDs — RDDs are context-level, not session-level
    def rebind(df: DataFrame): DataFrame =
      cc.createDataFrame(df.rdd, df.schema)
    // symmetric edge list for label propagation
    val edgesParent = pairsPersisted.unionByName(
      pairsPersisted.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
    val edges = rebind(edgesParent).persist()
    // localCheckpoint (not persist): the pointer-jump step references
    // `labels` twice, so lineage would DOUBLE per iteration — the logical
    // plan alone OOMs after ~20 rounds; checkpointing truncates it.
    var labels = rebind(repExact.select(col("rep")))
      .select(col("rep").as("id"))
      .withColumn("label", col("id")).localCheckpoint()
    var iter = 0
    var converged = edges.isEmpty // no near-dup edges → labels are final
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels, col("doc_b") === col("id"))
        .groupBy(col("doc_a")).agg(min("label").as("nmin"))
      val hopped = labels
        .join(neighborMin, col("id") === col("doc_a"), "left")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label"))
      // pointer jumping: label := label(label) — doubles the effective
      // propagation distance per round, so convergence is O(log diameter)
      // rather than O(diameter)
      val l2 = labels.select(col("id").as("jid"), col("label").as("jlabel"))
      val next = hopped
        .join(l2, col("label") === col("jid"), "left")
        .select(col("id"), col("prev"),
          least(col("label"), coalesce(col("jlabel"), col("label")))
            .as("label"))
        .localCheckpoint()
      // changed-row count as the convergence test: overflow-free
      // (a label SUM overflows Long under ANSI at ~1e9 large ids)
      converged = next.filter(col("label") =!= col("prev")).isEmpty
      Graph.releaseCheckpoint(labels) // superseded (round-8 ADVICE)
      labels = next.select("id", "label")
      iter += 1
    }
    if (!converged && iter == maxIter)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"assignCanonical: label propagation hit maxIter=$maxIter before " +
          "convergence — canonical ids may split oversized components")
    // the final label table is small — hand it back to the parent
    // session so the caller's plan is single-session
    val labelsParent = parentSession.createDataFrame(labels.rdd,
      labels.schema)
    docRep.join(labelsParent, col("rep") === col("id"))
      .select(col("doc_id"), col("label").as("canonical_id"))
  }

  /** Embedding-cosine near-dup pairs over (vec_id, embedding float[]).
    * Cosine computed in double precision. Output: (vec_a, vec_b).
    *
    * Default path — the 100 TB shape: byte-equal vectors collapse to
    * one representative first (exact-collapse-first, as in
    * [[assignCanonical]] — candidate volume scales with distinct
    * vectors, not rows), then banded random-hyperplane LSH candidates
    * (equi-join on (band, band-signature) buckets; every shuffle is
    * keyed, no BroadcastNestedLoopJoin anywhere), then exact cosine
    * verification of candidates only — the same
    * candidates-then-verify pattern as [[minHashLsh]]. The only
    * approximation is the candidate miss probability
    * (1 - p^r)^(nPlanes/r) with p = 1 - acos(cos)/π; rows-per-band r is
    * chosen from the threshold so a pair AT the threshold is missed with
    * probability < 1e-8 (t=0.5 → r=2, b=32 → 6.6e-9; higher pairs are
    * exponentially safer). Hyperplanes are a fixed seeded Gaussian
    * family — fully deterministic, no runtime RNG.
    *
    * `allPairs = true` keeps the exact quadratic twin (test-scale oracle
    * for the LSH path — its join is non-equi and does NOT scale).
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double = 0.5,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       allPairs: Boolean = false,
                       nPlanes: Int = 64,
                       bandMissProb: Double = 1e-8): DataFrame = {
    if (allPairs) {
      val n = Similarity.withNorm(emb, idCol, vecCol)
      val a = n.as("a")
      val b = n.as("b")
      return a.join(b, col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          (Similarity.dot(col("a.vec"), col("b.vec"))
            / nullif(col("a.norm") * col("b.norm"), lit(0.0))).as("cos"))
        .filter(col("cos") >= threshold)
        .select("vec_a", "vec_b")
    }
    // EXACT-COLLAPSE-FIRST (same insight as assignCanonical): identical
    // vectors are cosine-1 duplicates for every threshold ≤ 1, so
    // byte-equal clones collapse to one representative BEFORE the LSH —
    // the candidate/verify volume then scales with DISTINCT vectors,
    // not rows (clone-heavy corpora are the norm in dedup workloads;
    // K× cloning would otherwise multiply candidate pairs by K²).
    // Emitted pair count is still quadratic in clone multiplicity —
    // inherent to pair EMISSION; assignCanonical is the linear-output
    // 100 TB surface.
    val base = emb.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val rep = base.groupBy("vec").agg(min("vec_id").as("rep"))
    // consumed 3× (intra self-join, inter expansion ×2) and feeds the
    // 4×-consumed rep subtree below — materialize once, or every
    // consumer re-runs the groupBy + array-key join shuffles
    // (measured 4× the query time at sf0.1 without these persists)
    val withRep = base.join(rep, "vec").persist() // (vec, vec_id, rep)
    val reps = withRep.filter(col("vec_id") === col("rep"))
      .select("vec_id", "vec")
    // consumed 4× (banding self-join l/r, verify x/y)
    val n = Similarity.withNorm(reps, "vec_id", "vec").persist()
    // rows-per-band from the threshold: largest r (dividing nPlanes)
    // whose miss probability for a pair AT the threshold stays under
    // bandMissProb — bigger r prunes harder, smaller r recalls better.
    // The default budget (1e-8) forces r=2 at t=0.5, whose per-band
    // random-pair collision rate (~2^-2) admits most DISTINCT pairs as
    // candidates — the price of near-exactness at a 60° threshold, paid
    // only on distinct vectors thanks to the collapse. Production dedup
    // at t≥0.85 with a 1e-3 budget derives r=4 at 64 planes (random-
    // pair candidate rate ~0.64); REAL pruning needs r=8, which the
    // miss budget only admits at nPlanes=256 (rate ~0.12) — raise
    // nPlanes alongside the threshold (tools/BandProbe sweeps this).
    val p = 1.0 - math.acos(math.min(1.0, threshold)) / math.Pi
    val r = Seq(16, 8, 4, 2, 1).filter(nPlanes % _ == 0).find { rr =>
      math.pow(1.0 - math.pow(p, rr), nPlanes.toDouble / rr) < bandMissProb
    }.getOrElse(1)
    val banded = hyperplaneBands(n, nPlanes, r)
    val l = banded.as("l")
    val rr = banded.as("r")
    val candidates = l.join(rr,
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
      .distinct()
    val repPairs = candidates
      .join(n.as("x"), col("vec_a") === col("x.vec_id"))
      .join(n.as("y"), col("vec_b") === col("y.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        (Similarity.dot(col("x.vec"), col("y.vec"))
          / nullif(col("x.norm") * col("y.norm"), lit(0.0))).as("cos"))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b")
    // expansion back to member ids. Intra-group: every id pair sharing a
    // vector qualifies — EXCEPT zero vectors, whose cosine is NaN and
    // fails `>= threshold` on the all-pairs path (0/0); the same rows
    // must stay excluded here. Inter-group: a qualifying rep pair
    // qualifies every cross pair (identical cosine); member ids may
    // interleave across groups, hence least/greatest.
    val nz = withRep.filter(Similarity.dot(col("vec"), col("vec")) > 0)
      .select("rep", "vec_id")
    val intra = nz.as("ia").join(nz.as("ib"),
        col("ia.rep") === col("ib.rep") &&
          col("ia.vec_id") < col("ib.vec_id"))
      .select(col("ia.vec_id").as("vec_a"), col("ib.vec_id").as("vec_b"))
    val members = withRep.select("rep", "vec_id")
    val inter = repPairs
      .join(members.as("ma"), col("vec_a") === col("ma.rep"))
      .join(members.as("mb"), col("vec_b") === col("mb.rep"))
      .select(least(col("ma.vec_id"), col("mb.vec_id")).as("vec_a"),
        greatest(col("ma.vec_id"), col("mb.vec_id")).as("vec_b"))
    intra.unionByName(inter)
  }

  /** Exact duplicated-SPAN coverage per document — the distributed
    * analogue of suffix-array substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * length-`w` token window is a duplicated span iff its w-gram occurs
    * >= 2 times in the corpus (another doc OR an intra-doc repeat; the
    * suffix-array method counts both). Per doc we report window counts
    * and the EXACT token count covered by the union of duplicated
    * windows: with equal-length intervals sorted by start, the union
    * length is sum(min(w, start - previous_start)) — one lag() per row.
    * Output: (doc_id, n_windows, dup_windows, dup_tokens, dup_frac)
    * for every input document (zeroes when nothing is duplicated).
    *
    * Scale posture: windows are a per-row explode (no shuffle); the
    * global w-gram count is one keyed aggregation; only grams with
    * count >= 2 — the duplicated minority — survive to the join-back,
    * so the join's build side is bounded by actual duplication, not
    * corpus size. The interval-union window function partitions by
    * doc_id and carries one lag row of state. At 100 TB, w is ~50 and
    * grams should be hashed to fixed-width before the shuffle
    * (xxhash64 — false merges die out as 2^-64 noise in a coverage
    * STATISTIC, unlike in a pair-emitting dedup); the gate keeps raw
    * strings because the DuckDB oracle must reproduce the grouping
    * byte-for-byte.
    */
  def duplicatedSpans(docs: DataFrame, w: Int = 5,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(w >= 1, s"window must be >= 1 token: $w")
    val t = split(col(textCol), " ")
    val nWindows = greatest(size(t) - (w - 1), lit(1))
    // (start, gram) pairs; shorter-than-w docs yield one whole-text
    // window (same degenerate-doc rule as [[shingles]])
    val win = transform(sequence(lit(1), nWindows),
      i => struct(i.as("i"), concat_ws(" ", slice(t, i, lit(w))).as("s")))
    val grams = docs
      .select(col(idCol).as("doc_id"), size(t).as("n_toks"),
        explode(win).as("g"))
      .select(col("doc_id"), col("n_toks"),
        col("g.i").as("i"), col("g.s").as("s"))
      .persist() // two consumers: global counts + join-back
    val dupGrams = grams.groupBy("s")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select("s")
    val byPos = Window.partitionBy("doc_id").orderBy("i")
    val covered = grams.join(dupGrams, "s")
      // first window of a doc: gap defaults to w => full w tokens
      .withColumn("gap",
        col("i") - coalesce(lag("i", 1).over(byPos), col("i") - w))
      .withColumn("covered", least(lit(w), col("gap")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dup_windows"),
        sum("covered").cast("long").as("dup_tokens_raw"))
    docs
      .select(col(idCol).as("doc_id"), size(t).as("n_toks"),
        nWindows.cast("long").as("n_windows"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        // the degenerate whole-text window covers w > n_toks: clamp
        least(coalesce(col("dup_tokens_raw"), lit(0L)),
          col("n_toks").cast("long")).as("dup_tokens"),
        graft.functions.Fns.round2(
          least(coalesce(col("dup_tokens_raw"), lit(0L)),
            col("n_toks").cast("long")).cast("double") /
            nullif(col("n_toks"), lit(0)).cast("double")).as("dup_frac"))
  }

  /** (vec_id, band, sig) rows: `nPlanes` random-hyperplane sign bits,
    * packed `rowsPerBand` bits per band. Hyperplanes come from a fixed
    * seeded Gaussian so the signature family is deterministic across
    * runs and engines; sign-of-dot-product is the classic SRP-LSH
    * family (collision prob 1 - θ/π per bit). Dot products via the
    * codegen'd [[graft.functions.VecDotF]]. */
  private def hyperplaneBands(withNorm: DataFrame, nPlanes: Int,
                              rowsPerBand: Int): DataFrame = {
    // one-row metadata lookup (vector dimensionality isn't in the
    // schema); an empty input yields dims=1, whose empty band frame is
    // still correct
    val dims = withNorm.select(size(col("vec"))).take(1)
      .headOption.map(_.getInt(0)).getOrElse(1)
    val rng = new scala.util.Random(0x5eed5eedL)
    val planes = Array.fill(nPlanes)(
      Array.fill(dims)(rng.nextGaussian().toFloat).toSeq)
    val bits = planes.map(pl =>
      when(Similarity.dot(col("vec"), typedLit(pl)) > 0, 1L).otherwise(0L))
    // uniformity guard: `dims` was sampled from ONE row, and a vector of
    // any other length would silently mismatch the hyperplane family and
    // degrade recall in a way the exact verify cannot recover (missed
    // candidates are never scored). Raising beats silence; folded into
    // band 0's signature so column pruning cannot drop the check (one
    // size() compare per row, stays in codegen).
    val chk = when(size(col("vec")) === dims, lit(0L))
      .otherwise(raise_error(concat(
        lit(s"embeddingNearDup: non-uniform embedding dims (expected $dims, got "),
        size(col("vec")).cast("string"), lit(")"))).cast("long"))
    val nBands = nPlanes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      val sig = (0 until rowsPerBand)
        .map(i => bits(b * rowsPerBand + i) * (1L << i))
        .reduce(_ + _)
      struct(lit(b).as("band"),
        (if (b == 0) sig + chk else sig).as("sig"))
    }
    withNorm.select(col("vec_id"),
        explode(array(bandCols: _*)).as("bc"))
      .select(col("vec_id"), col("bc.band").as("band"),
        col("bc.sig").as("sig"))
  }

  /** Record-linkage fuzzy key matching via the SymSpell deletion
    * neighborhood: two strings are within edit distance 1 IFF they
    * share a member of each other's {self} ∪ {one-char-deletion}
    * sets, so candidate generation is an EQUI-join on the variant
    * string (len+1 variants per key, bounded by key length) instead
    * of an O(V²) all-pairs distance scan. Distance-2 pairs can share
    * a variant too (two different chars inserted into one stem), so
    * candidates get an exact `levenshtein ≤ 1` verify — the same
    * candidates-then-verify shape as every dedup family here.
    *
    * Scale posture: the join runs over DISTINCT keys (entity
    * vocabularies are corpus-sublinear; `minCount` prunes noise
    * further), and a deletion-variant bucket is alphabet-bounded —
    * at most |Σ|·(len+1)+1 keys can share one variant — so no
    * quadratic hot bucket exists. Everything is codegen'd string
    * expressions + one equi-join; no UDFs.
    * Output: (key_a, key_b, dist, cnt_a, cnt_b), key_a < key_b.
    */
  def editDistancePairs(df: DataFrame, strCol: String,
                        minCount: Long = 1): DataFrame = {
    val vocab = df
      .select(lower(trim(col(strCol))).as("key"))
      .filter(length(col("key")) > 0)
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    // i = 0 keeps the key itself (covers pure insert/delete pairs);
    // i in 1..len deletes the i-th char (substr is 1-based). The
    // when/otherwise keeps i = 0 off the deletion concat.
    val variants = vocab
      .select(col("key"), col("cnt"),
        explode(transform(sequence(lit(0), length(col("key"))),
          i => when(i === 0, col("key"))
            .otherwise(concat(
              col("key").substr(lit(1), i - 1),
              col("key").substr(i + 1, length(col("key")) - i)))))
          .as("variant"))
    // consumed by both sides of the self-join (invariant 9) — and the
    // exact verify runs BEFORE the pair dedup, so the distinct's
    // exchange carries only true pairs (each ≤ a handful of shared
    // variants), not the full candidate expansion: levenshtein on a
    // short key is far cheaper than shuffling the occurrence
    val variants0 = variants.persist()
    val a = variants0.select(col("variant"), col("key").as("key_a"),
      col("cnt").as("cnt_a"))
    val b = variants0.select(col("variant"), col("key").as("key_b"),
      col("cnt").as("cnt_b"))
    a.join(b, Seq("variant"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("dist", levenshtein(col("key_a"), col("key_b"))
        .cast("long"))
      .filter(col("dist") <= 1)
      .select("key_a", "key_b", "dist", "cnt_a", "cnt_b").distinct()
  }

  /** Entity resolution end-to-end: [[editDistancePairs]] blocking +
    * verify produces the match graph, k-step min-label propagation
    * ([[Graph.minLabelPropagate]] — the distributed union-find arm)
    * groups transitively-linked keys, and one keyed aggregate rolls
    * each group up to a golden record. The canonical id is the
    * lexicographic min key within propagation distance ≤ `iters` —
    * deterministic in both engines whether or not the graph has
    * converged, which is what makes a fixed-k gate oracle-expressible.
    *
    * Singleton keys (no fuzzy match) survive as their own entity, so
    * the output is a total entity table, not just the matched slice.
    *
    * Scale posture: every stage is keyed — the SymSpell equi-join over
    * the distinct-key vocabulary, the edge-sized propagation joins,
    * the final groupBy — and each propagation step's state is one
    * label row per key. No all-pairs scan, no driver-side structure.
    * Output: (entity_id, n_names, n_records) — distinct raw keys and
    * total source rows folded into each entity.
    */
  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding space, then call two points duplicates only
    * if they are cosine-close WITHIN the same cluster — the cluster is
    * the candidate-blocking structure, so the quadratic pair search
    * runs per cluster, never globally. Per vector the verdict is a
    * keep/drop bit: drop iff some SAME-cluster neighbor with a smaller
    * id has cosine >= `threshold` (lowest id is the kept exemplar —
    * pinned, invariant 4). Cross-cluster near-dups are missed BY DESIGN
    * (that is SemDeDup's accuracy/cost trade; [[embeddingNearDup]]'s
    * banded LSH is the miss-bounded alternative surface).
    *
    * The clustering here is the same engine-reproducible stand-in as
    * [[Similarity.ivfTopK]]: nearest of the `nClusters` lowest-id
    * vectors by cosine (ties to the lowest centroid id) — production
    * would broadcast a k-means codebook through the identical plumbing
    * ([[Similarity.trainCodebook]]). Scale posture: assignment is one
    * map-side-combined aggregation against the broadcast constant
    * codebook; the pair join is a keyed equi-join on cluster id, so
    * its cost is Σ|cluster|² — bounded by cluster balance, the knob
    * being nClusters ∝ N (SemDeDup runs k≈100k at web scale). Zero
    * vectors have no defined cosine and are excluded. Output:
    * (vec_id, cid, keep).
    */
  def semanticDedup(emb: DataFrame, threshold: Double = 0.5,
                    nClusters: Int = 16, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val assigned = semanticAssign(emb, nClusters, idCol, vecCol)
    val a = assigned.select(col("cid"), col("vec_id").as("ia"),
      col("vec").as("va"), col("norm").as("na"))
    val b = assigned.select(col("cid"), col("vec_id").as("ib"),
      col("vec").as("vb"), col("norm").as("nb"))
    // verify in the join condition itself (invariant 10: no distinct()
    // over an unverified expansion); norms are > 0 upstream
    val drops = a.join(b, Seq("cid"))
      .filter(col("ia") < col("ib") &&
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))
          >= threshold)
      .select(col("ib").as("vec_id")).distinct()
    assigned
      .join(drops.withColumn("hit", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("hit").isNull.as("keep"))
  }

  /** The cluster-assignment front shared by [[semanticDedup]] and
    * [[semanticDedupBest]]: nearest of the nClusters lowest-id vectors
    * by cosine (ties to the lowest centroid id) via one struct-max
    * aggregation against the broadcast codebook — no window over the
    * N×C rows. Returned frame is persisted (both pair-join sides + the
    * output join consume it). */
  /** Codebook size for a corpus of `n` vectors at a constant target
    * cluster population: max(floor, ⌈n / targetPop⌉). This is the
    * SemDeDup scaling rule (k ∝ N — web-scale runs use k ≈ 100k): it
    * pins the MEAN cluster population at ≤ targetPop whatever the
    * corpus size, so the within-cluster duel's Σ sz² expansion grows
    * LINEARLY in N (≈ N·targetPop at balance) instead of quadratically
    * (N²/k at fixed k) — the round-11 verdict's cost-cliff fix. */
  def derivedClusters(n: Long, targetPop: Int = 64,
                      floor: Int = 16): Int = {
    require(targetPop >= 1 && floor >= 1,
      s"need targetPop >= 1 and floor >= 1: $targetPop/$floor")
    math.max(floor,
      math.ceil(n.toDouble / targetPop).toInt)
  }

  private def semanticAssign(emb: DataFrame, nClusters: Int,
                             idCol: String, vecCol: String,
                             targetPop: Int = 0): DataFrame = {
    val cand = Similarity.withNorm(emb, idCol, vecCol)
      .filter(col("norm") > 0)
    // targetPop > 0 derives the codebook size from the corpus (one
    // exact count job — an 8-byte driver scalar, needed because
    // limit() takes a literal; the TakeOrdered codebook pick stays
    // sort-free). 0 keeps the caller's fixed nClusters.
    val k = if (targetPop > 0)
      derivedClusters(cand.count(), targetPop, nClusters)
    else nClusters
    val cent = cand.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cid"), col("vec").as("cvec"),
        col("norm").as("cnorm"))
    cand.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("vec"), col("norm"),
        struct((Similarity.dot(col("vec"), col("cvec"))
          / (col("norm") * col("cnorm"))).as("cos"),
          (-col("cid")).as("ncid")).as("sc"))
      .groupBy("vec_id")
      .agg(first(col("vec")).as("vec"), first(col("norm")).as("norm"),
        max(col("sc")).as("best"))
      .select(col("vec_id"), col("vec"), col("norm"),
        (-col("best.ncid")).as("cid"))
      .persist()
  }

  /** Cross-source near-dup contamination MATRIX — the corpus-analysis
    * table behind "which feeds mirror each other": for every source
    * pair (src_a ≤ src_b), the number of verified near-dup pairs with
    * one endpoint in each (diagonal = within-source near-dups). This
    * is the report that turns a flat dup RATE ([[graft.operators
    * .TextStats.corpusCard]]) into an actionable dedup ORDER — drop
    * the mirror, keep the origin.
    *
    * Pairs come from [[minHashLsh]] UNCHANGED (banded candidates,
    * exact-Jaccard verify), so the matrix inherits its miss bound; the
    * source attach is two broadcast-sized joins on the pair endpoints
    * and the rollup groups on a source-pair key (≤ |sources|² rows —
    * enum-sized). least/greatest orders the pair so (a,b) and (b,a)
    * fold into one cell. Output: (src_a, src_b, n_pairs).
    */
  def crossSourceMatrix(docs: DataFrame, threshold: Double = 0.8,
                        n: Int = 3, srcCol: String = "source"): DataFrame = {
    val src = docs.select(col("doc_id"), col(srcCol).as("_src"))
    minHashLsh(docs, threshold, n)
      .select(col("doc_a"), col("doc_b"))
      .join(src.select(col("doc_id").as("doc_a"),
        col("_src").as("sa")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"),
        col("_src").as("sb")), Seq("doc_b"))
      .groupBy(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Quality-aware SemDeDup — [[semanticDedup]] with the exemplar
    * choice real curation stacks actually make: within a near-identical
    * group, keep the HIGHEST-QUALITY member, not the lowest id. The
    * rule stays PAIRWISE (so no transitive-closure recursion enters the
    * plan): drop a vector iff some same-cluster neighbor at
    * cosine >= `threshold` strictly beats it on (quality, then lower id
    * on ties) — the winner of every such duel survives its own duels by
    * the same total order, so each near-dup group keeps exactly its
    * best member. `quality` is any (idCol, q) frame — the gate feeds
    * document length; production feeds an LM/classifier score
    * ([[TextStats.lmScore]] / gopher flags). Vectors with no quality
    * row rank at q = 0 (worst, dropped first on any duel they lose).
    *
    * Scale posture: one broadcast codebook assignment, one cid-keyed
    * pair join, plus ONE extra broadcast-sized quality join — and
    * unlike [[semanticDedup]]'s fixed 16-cluster gate arm, the
    * codebook size here DERIVES from the corpus by default
    * ([[derivedClusters]]: k = max(nClusters, ⌈N/targetClusterPop⌉),
    * the round-11 verdict's cost-cliff fix), so the duel's Σ sz²
    * expansion stays linear in N at a constant mean population
    * instead of quadratic at fixed k. `targetClusterPop = 0` restores
    * the legacy fixed-k arm; [[semanticDedupKnn]] remains the
    * component-bounded alternative whose blocks are independent of
    * cluster balance. Output: (vec_id, cid, keep). */
  def semanticDedupBest(emb: DataFrame, quality: DataFrame,
                        threshold: Double = 0.5, nClusters: Int = 16,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        qCol: String = "q",
                        targetClusterPop: Int = 64): DataFrame = {
    // The quality column is named, never positional (ADVICE r10: a
    // caller passing (vec_id, label, q) would silently duel on label
    // under columns(1)); a missing column fails in analysis, loudly.
    require(quality.columns.contains(qCol),
      s"semanticDedupBest: quality frame has no column '$qCol' " +
        s"(columns: ${quality.columns.mkString(", ")})")
    val q = quality.select(col(idCol).as("vec_id"),
      col(qCol).cast("double").as("q"))
    // scale-safe DEFAULT (VERDICT r11 task 3): the codebook size
    // derives from the corpus at a constant target population —
    // nClusters is the floor, so small gate corpora keep their
    // historical 16-cluster behavior while the duel's quadratic term
    // stays corpus-size-independent per cluster. Pass
    // targetClusterPop = 0 for the legacy fixed-k arm.
    val assigned = semanticAssign(emb, nClusters, idCol, vecCol,
        targetClusterPop)
      .join(q, Seq("vec_id"), "left")
      .select(col("vec_id"), col("vec"), col("norm"), col("cid"),
        coalesce(col("q"), lit(0.0)).as("q"))
      .persist()
    val a = assigned.select(col("cid"), col("vec_id").as("ia"),
      col("vec").as("va"), col("norm").as("na"), col("q").as("qa"))
    val b = assigned.select(col("cid"), col("vec_id").as("ib"),
      col("vec").as("vb"), col("norm").as("nb"), col("q").as("qb"))
    val drops = a.join(b, Seq("cid"))
      .filter((col("qa") > col("qb") ||
          (col("qa") === col("qb") && col("ia") < col("ib"))) &&
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))
          >= threshold)
      .select(col("ib").as("vec_id")).distinct()
    assigned
      .join(drops.withColumn("hit", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("hit").isNull.as("keep"))
  }

  /** SemDeDup over the IVF-routed reciprocal-kNN clusters — the
    * round-10 "built the better blocking, now act on it" composition:
    * block near-identical content by
    * [[Similarity.knnComponentsIvf]]'s density components (measured
    * recall 2.6–4.7× the sign buckets, cluster purity 0.446 vs 0.366 —
    * tools/IvfKnnProbe, tools/ClusterProbe tables in BASELINE.md) and
    * within each component run [[semanticDedupBest]]'s keep-best
    * pairwise duel: drop a member iff some SAME-COMPONENT member at
    * cosine >= `threshold` strictly beats it on (quality, then lower
    * id) — the cosine verify keeps the collapse rule identical to the
    * centroid-bucket arm, only the BLOCKING changes, which is what
    * makes the two arms' measured dup-pairs-found / false-collapse
    * rates comparable (tools/SemDedupProbe table in BASELINE.md).
    * Vectors with no mutual edge are singletons by construction and
    * are implicitly kept — they do not appear in the output (the graph
    * rows are the dup signal; the [[Similarity.knnComponentsIvf]]
    * contract).
    *
    * `quality` is any (idCol, `qCol`) frame — the gate feeds document
    * length; production feeds an LM/classifier score. Members missing
    * a quality row rank at q = 0 (worst). Ids must be non-negative
    * (the duel's total order ties to the LOWEST id, and downstream
    * consumers share the graph ops' non-negative-id contract).
    *
    * Scale posture: the component build is the already-bounded IVF
    * kNN machinery (16-of-128 routing, k·n edge list, min-label
    * fixpoint); the duel is a component-keyed self-join whose
    * expansion is bounded by component size — reciprocal-kNN
    * components at k=2 stay small by construction (tools/KnnProbe),
    * orders tighter than the centroid arm's 1/nClusters-of-corpus
    * buckets. Verification happens IN the join condition (invariant
    * 10: no distinct over an unverified expansion).
    * Output: (vec_id, component, keep). */
  def semanticDedupKnn(emb: DataFrame, quality: DataFrame,
                       threshold: Double = 0.5,
                       k: Int = 2, nCentroids: Int = 128,
                       nProbe: Int = 16, maxRounds: Int = 14,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       qCol: String = "q"): DataFrame = {
    require(quality.columns.contains(qCol),
      s"semanticDedupKnn: quality frame has no column '$qCol' " +
        s"(columns: ${quality.columns.mkString(", ")})")
    val q = quality.select(col(idCol).as("vec_id"),
      col(qCol).cast("double").as("q"))
    val members = Similarity.knnComponentsIvf(emb, k, nCentroids,
        nProbe, maxRounds)
      .join(q, Seq("vec_id"), "left")
      // enforce the non-negative-id contract in-plan (same guard
      // family as labelPropagate: raises instead of silently wrong
      // exemplars on an inverted tie)
      .select(when(col("vec_id") < 0, raise_error(concat(
          lit("semanticDedupKnn requires non-negative ids; got "),
          col("vec_id").cast("string"))))
          .otherwise(col("vec_id")).as("vec_id"),
        col("component"), coalesce(col("q"), lit(0.0)).as("q"))
      .join(Similarity.withNorm(emb, idCol, vecCol), Seq("vec_id"))
      .persist()
    val a = members.select(col("component"), col("vec_id").as("ia"),
      col("vec").as("va"), col("norm").as("na"), col("q").as("qa"))
    val b = members.select(col("component"), col("vec_id").as("ib"),
      col("vec").as("vb"), col("norm").as("nb"), col("q").as("qb"))
    val drops = a.join(b, Seq("component"))
      .filter((col("qa") > col("qb") ||
          (col("qa") === col("qb") && col("ia") < col("ib"))) &&
        Similarity.dot(col("va"), col("vb"))
          / nullif(col("na") * col("nb"), lit(0.0)) >= threshold)
      .select(col("ib").as("vec_id")).distinct()
    members
      .join(drops.withColumn("hit", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("component"),
        col("hit").isNull.as("keep"))
  }

  def resolveEntities(df: DataFrame, strCol: String,
                      iters: Int = 3): DataFrame = {
    val vocab = df
      .select(lower(trim(col(strCol))).as("key"))
      .filter(length(col("key")) > 0)
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .persist()
    val pairs = editDistancePairs(df, strCol).persist()
    // force both spines NOW (the Graph.warm device): the label-prop
    // round-1 checkpoint and the final rollup reach them through
    // separate exchange subtrees that otherwise race the SymSpell
    // delete-join cold — profiled r14: two identical 1.1 s 32-task
    // jobs per action (guide §5)
    vocab.count(); pairs.count()
    val edges = pairs
      .select(col("key_a").as("src"), col("key_b").as("dst"))
      .unionAll(pairs
        .select(col("key_b").as("src"), col("key_a").as("dst")))
    val labels0 = vocab
      .select(col("key").as("node"), col("key").as("lbl"))
    Graph.minLabelPropagate(labels0, edges, iters)
      .join(vocab, col("node") === col("key"))
      .groupBy(col("lbl").as("entity_id"))
      .agg(count(lit(1)).as("n_names"), sum("cnt").as("n_records"))
  }

  /** Chunk-level duplication profile — the reason content-defined
    * chunking exists: per document, how much of it is made of chunks
    * that also appear in OTHER documents ([[TextStats.cdcChunk]]
    * boundaries make chunk identity insertion-robust, so this survives
    * edits that shift byte offsets). A chunk is duplicated when its
    * md5 occurs in ≥2 distinct docs; dup_frac = round2 of one IEEE
    * division. Scale shape: chunk-md5-keyed count (map-side combined)
    * joined back to the chunk table, then a doc-keyed rollup — all
    * keyed equi-joins, linear in total chunks; the chunk table is
    * persisted for its two consumers (invariant 9). Output: (doc_id,
    * n_chunks, n_dup_chunks, dup_frac).
    */
  // URL canonicalization regexes — shared with the DuckDB twin (the
  // HtmlText constant-sharing discipline). Replacement strings differ
  // per engine ($1 vs \1) and live at each call site.
  val UrlPrefixRe = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
  val UrlDefaultPortHttpRe = "^(http://[^/?#:]*):80([/?#]|$)"
  val UrlDefaultPortHttpsRe = "^(https://[^/?#:]*):443([/?#]|$)"
  val UrlFragmentRe = "#.*$"
  val UrlTrackingRe = "([?&])(utm_[a-zA-Z0-9_]*|gclid|fbclid)=[^&#]*"
  val UrlDelimRunRe = "([?&])[?&]+"
  val UrlTrailingJunkRe = "[?&]+$"
  val UrlTrailingSlashRe = "/+$"

  /** URL canonicalization — the dedup key a CommonCrawl-scale pipeline
    * groups fetches by before any content hashing (the same page is
    * crawled under scheme/host case variants, default ports, tracking
    * params, fragments, and trailing slashes):
    *  1. lowercase scheme://host[:port] (the case-insensitive parts;
    *     path/query case is preserved — they are case-sensitive);
    *  2. drop the default port (:80 for http, :443 for https);
    *  3. drop the #fragment (never sent to the server);
    *  4. drop utm_* / gclid / fbclid tracking params, then collapse the
    *     delimiter runs the removal leaves ("?&&x" → "?x") and any
    *     trailing "?"/"&";
    *  5. drop trailing slashes (uniformly, including the root — a
    *     pinned convention; both engines agree by construction).
    * Schemeless strings pass through steps 3-5 only (step 1's prefix
    * match is empty). Pure chained regexp_replace — codegen'd,
    * map-only, the twin replays the same patterns.
    */
  def canonicalUrl(u: Column): Column = {
    val pfx = regexp_extract(u, UrlPrefixRe, 1)
    val c0 = concat(lower(pfx), u.substr(length(pfx) + 1, length(u)))
    val c1 = regexp_replace(c0, UrlDefaultPortHttpRe, "$1$2")
    val c2 = regexp_replace(c1, UrlDefaultPortHttpsRe, "$1$2")
    val c3 = regexp_replace(c2, UrlFragmentRe, "")
    val c4 = regexp_replace(c3, UrlTrackingRe, "$1")
    val c5 = regexp_replace(c4, UrlDelimRunRe, "$1")
    val c6 = regexp_replace(c5, UrlTrailingJunkRe, "")
    regexp_replace(c6, UrlTrailingSlashRe, "")
  }

  def chunkDupStats(docs: DataFrame, avgTokens: Int = 16): DataFrame = {
    val chunks = TextStats.cdcChunk(docs, avgTokens)
      .select("doc_id", "chunk_md5").persist()
    val freq = chunks.groupBy("chunk_md5")
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunks.join(freq, "chunk_md5")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        graft.functions.Fns.round2(col("n_dup_chunks") / col("n_chunks"))
          .as("dup_frac"))
  }

  /** Duplicated-chunk REMOVAL with document reconstruction — the
    * rewrite counterpart of [[duplicatedSpans]]/[[chunkDupStats]]
    * (which only profile duplication): tile each document into
    * consecutive non-overlapping `w`-token chunks, keep only the
    * corpus-wide FIRST occurrence of every distinct chunk text
    * (lexicographic min over (doc_id, chunk_idx) — within-doc repeats
    * collapse too), and reassemble each document from its surviving
    * chunks in order. This is the production shape of exact substring
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): the duplicated boilerplate is CUT from
    * all but one occurrence, not merely counted. Documents that lose
    * every chunk stay in the output with empty text (the downstream
    * length filter decides their fate, not this operator).
    *
    * Scale posture: chunking is a per-row explode (no shuffle); the
    * first-occurrence argmin is ONE hash aggregation keyed on chunk
    * text (`min(struct(doc_id, idx))` — no window over the corpus-wide
    * chunk table); the join-back is an equi-join on the same key, so
    * the whole plan is two exchanges of the chunk table. Reassembly
    * sorts only WITHIN a document (collect_list + array_sort over a
    * doc's own ≤⌈n/w⌉ chunks), never globally. At 100 TB the chunk key
    * should be a 128-bit hash with the text resolved on collision; the
    * gate keys on raw text because the DuckDB twin must reproduce the
    * grouping byte-for-byte.
    * Output: (doc_id, n_chunks, n_dropped, text_clean) for every
    * document with ≥ 1 token.
    */
  def chunkDedupRewrite(docs: DataFrame, w: Int = 32,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val chunks = chunkTiles(docs, w, idCol, textCol)
      .persist() // two consumers: first-occurrence argmin + join-back
    val firstOcc = chunks.groupBy("ctext")
      .agg(min(struct(col("doc_id"), col("ci"))).as("fo"))
    chunks.join(firstOcc, "ctext")
      .withColumn("kept",
        col("doc_id") === col("fo.doc_id") && col("ci") === col("fo.ci"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        // collect_list skips the NULL (dropped) entries; array_sort on
        // (ci, ctext) structs restores document order — ci is unique
        // within a doc, so the order is total and deterministic
        array_join(transform(
          array_sort(collect_list(
            when(col("kept"), struct(col("ci"), col("ctext"))))),
          x => x("ctext")), " ").as("text_clean"))
  }

  /** The non-overlapping w-token tiling shared by [[chunkDedupRewrite]]
    * and [[boilerplateRewrite]]: (doc_id, ci, ctext) per chunk, every
    * document with ≥ 1 token emits ⌈n/w⌉ chunks (integer ceil-div via
    * floor on the positive double division — the
    * [[graft.operators.TextStats.chunk]] idiom, shared by the twins).
    * Pure codegen'd array expressions, no shuffle. */
  private def chunkTiles(docs: DataFrame, w: Int, idCol: String,
                         textCol: String): DataFrame = {
    require(w >= 1, s"chunk width must be >= 1 token: $w")
    val toks = filter(split(trim(col(textCol)), "\\s+"), x => x =!= "")
    val n = size(col("t"))
    val nChunks = floor((n + lit(w - 1)) / lit(w))
    docs.select(col(idCol).as("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), nChunks - 1)).as("ci"))
      .select(col("doc_id"), col("ci"),
        concat_ws(" ", slice(col("t"),
          (col("ci") * w + 1).cast("int"), lit(w))).as("ctext"))
  }

  /** BOILERPLATE removal — the frequency-threshold sibling of
    * [[chunkDedupRewrite]] (MassiveText's "repeated passages" filter /
    * RefinedWeb's line-dedup, at token-chunk granularity): a chunk
    * whose text occurs in ≥ `minDocs` DISTINCT documents is boilerplate
    * (cookie banner, license footer, navigation crumb) and EVERY
    * occurrence is cut — where keep-first dedup preserves one copy
    * because the content is legitimate somewhere, the boilerplate
    * filter removes all copies because the content is template, not
    * prose. Within-doc repetition alone never triggers it (the
    * distinct-doc count is the boilerplate signal; [[chunkDupStats]]'
    * nd ≥ 2 profiling is the same basis). Documents that lose every
    * chunk stay in the output with empty text — the downstream length
    * filter decides their fate, not this operator.
    *
    * Scale posture: tiling is a per-row explode (no shuffle); the
    * frequency table is ONE hash aggregation keyed on chunk text
    * (count-distinct over (ctext, doc_id) — partial-agg friendly);
    * the join-back is an equi-join on the same key; reassembly sorts
    * only WITHIN a document. Two exchanges of the chunk table, same
    * as the keep-first rewrite. At 100 TB key on a 128-bit chunk hash
    * with text resolved on collision; the gate keys on raw text
    * because the DuckDB twin must reproduce the grouping
    * byte-for-byte.
    * Output: (doc_id, n_chunks, n_boiler, boiler_frac, text_clean)
    * for every document with ≥ 1 token; boiler_frac round2.
    */
  def boilerplateRewrite(docs: DataFrame, w: Int = 8, minDocs: Int = 2,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(minDocs >= 2,
      s"minDocs must be >= 2 (a chunk is its own document's content): $minDocs")
    val chunks = chunkTiles(docs, w, idCol, textCol)
      .persist() // two consumers: the frequency agg + the join-back
    val freq = chunks.groupBy("ctext")
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunks.join(freq, "ctext")
      .withColumn("kept", col("nd") < minDocs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_boiler"),
        // ci is unique within a doc → total deterministic order
        array_join(transform(
          array_sort(collect_list(
            when(col("kept"), struct(col("ci"), col("ctext"))))),
          x => x("ctext")), " ").as("text_clean"))
      .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
        graft.functions.Fns.round2(col("n_boiler") / col("n_chunks"))
          .as("boiler_frac"),
        col("text_clean"))
  }

  /** CDC-boundary dedup REWRITE — [[chunkDedupRewrite]]'s keep-first
    * collapse on CONTENT-DEFINED chunk boundaries
    * ([[TextStats.cdcTiles]] — a token is a boundary when its md5
    * slice ≡ 0 mod avgTokens) instead of fixed w-token tiles: an
    * insertion or deletion shifts only the chunk it lands in, where
    * fixed tiling re-phases every chunk after the edit — so shared
    * passages keep deduping across lightly-edited near-copies (the
    * rsync/LBFS robustness argument, applied to corpus curation).
    * Semantics otherwise identical to the fixed-tile rewrite: the
    * corpus-wide FIRST occurrence of each distinct chunk text survives
    * (lexicographic min over (doc_id, chunk_id) — within-doc repeats
    * collapse too), documents reassemble from surviving chunks in
    * order.
    *
    * Scale posture: tiling is one per-doc window + one keyed agg
    * (cdcTiles); the first-occurrence argmin is ONE hash aggregation
    * keyed on chunk text (min(struct), no corpus window); the
    * join-back is an equi-join on the same key; reassembly sorts only
    * WITHIN a document. At 100 TB key on the 128-bit chunk hash with
    * text resolved on collision; the gate keys on raw text because the
    * twin must reproduce the grouping byte-for-byte.
    * Output: (doc_id, n_chunks, n_dropped, text_clean) for every
    * document with ≥ 1 token. */
  def cdcDedupRewrite(docs: DataFrame, avgTokens: Int = 16,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val tiles = TextStats.cdcTiles(docs, avgTokens, idCol, textCol)
      .persist() // two consumers: first-occurrence argmin + join-back
    val firstOcc = tiles.groupBy("ctext")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("fo"))
    tiles.join(firstOcc, "ctext")
      .withColumn("kept",
        col("doc_id") === col("fo.doc_id") &&
          col("chunk_id") === col("fo.chunk_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        // chunk_id is unique within a doc → total deterministic order
        array_join(transform(
          array_sort(collect_list(
            when(col("kept"), struct(col("chunk_id"), col("ctext"))))),
          x => x("ctext")), " ").as("text_clean"))
  }

  /** WINNOW-driven span REWRITE — the acted-on artifact the winnow
    * family feeds (VERDICT r11 task 6; the MOSS pipeline's "now do
    * something about the match"): take the VERIFIED winnow candidate
    * pairs ([[TextStats.winnowPairsVerified]], n_common_kgrams ≥ 1),
    * and for each pair CUT from the LATER document (doc_b — keep-first
    * by id, the [[exact]]/[[chunkDedupRewrite]] convention) every
    * k-token span it shares verbatim with any of its earlier partners.
    * A token of doc_b survives iff NO shared k-gram occurrence covers
    * it; the earlier partner keeps its full text (it is the canonical
    * carrier of the shared passage). Donors contribute their ORIGINAL
    * grams even when they are themselves rewritten against still
    * earlier docs — single-pass parallel semantics, no sequential
    * chain (documented trade vs an iterate-to-fixpoint variant).
    *
    * Candidate-bounded cost contract (the winnowPairsVerified
    * discipline carried to the rewrite): only documents appearing in a
    * verified pair re-tokenize (two semi joins); the shared-span
    * search joins b's positioned grams against its PARTNERS' distinct
    * gram sets only — |pairs| × per-doc grams, never corpus×corpus;
    * coverage explode is k rows per shared occurrence; reassembly
    * sorts only within a document. The corpus-sized input is touched
    * once, inside winnowPairsVerified's capped pairing.
    *
    * Tokens are the winnow normalization ([[TextStats.normalized]] —
    * the spans being cut are exactly the spans the fingerprints
    * signaled). Output: one row per REWRITTEN document (a doc_b of ≥ 1
    * verified pair): (doc_id, n_tokens, n_cut, cut_frac, text_clean),
    * cut_frac round2, text_clean '' when everything was shared. */
  def winnowRewrite(docs: DataFrame, k: Int = 5, window: Int = 4,
                    minShared: Int = 2, maxBucket: Int = 50,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val pairs = TextStats.winnowPairsVerified(docs, k, window,
        minShared, maxBucket, idCol, textCol)
      .filter(col("n_common_kgrams") >= 1)
      .select("doc_a", "doc_b").persist() // spine of 3 joins below
    winnowRewriteTail(docs, pairs, k, idCol, textCol)
  }

  /** Persist the VERIFIED winnow pair set once — the index half of the
    * artifact-served rewrite (round-12 verdict task 3; the
    * dedupIndexWrite precedent). The in-plan [[winnowRewrite]] re-runs
    * the whole winnow→pairs→verify chain inside every action — worse,
    * the rewrite tail consumes the pair spine through THREE join
    * consumers whose broadcast sub-jobs each evaluate an unmaterialized
    * persist independently, so the chain can run more than once per
    * action (the rel_hits lazy-persist lesson). Writing the
    * candidate-bounded pair table (two longs per verified pair) forces
    * it to run EXACTLY once, and every downstream rewrite serves from
    * the store. */
  def winnowPairsWrite(docs: DataFrame, dir: String, k: Int = 5,
                       window: Int = 4, minShared: Int = 2,
                       maxBucket: Int = 50, idCol: String = "doc_id",
                       textCol: String = "text"): Unit =
    TextStats.winnowPairsVerified(docs, k, window, minShared,
        maxBucket, idCol, textCol)
      .filter(col("n_common_kgrams") >= 1)
      .select("doc_a", "doc_b")
      .write.mode("overwrite").parquet(dir)

  /** The span rewrite served from a [[winnowPairsWrite]] store —
    * bit-identical to the in-plan [[winnowRewrite]] (pinned by
    * Round26Spec): the tail is the same code over the re-read pair
    * table; only the pair-derivation cost moves out of the plan. */
  def winnowRewriteFromIndex(docs: DataFrame, dir: String, k: Int = 5,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame =
    winnowRewriteTail(docs,
      docs.sparkSession.read.parquet(dir).select("doc_a", "doc_b"),
      k, idCol, textCol)

  private def winnowRewriteTail(docs: DataFrame, pairs: DataFrame,
                                k: Int, idCol: String,
                                textCol: String): DataFrame = {
    val t = split(TextStats.normalized(col(textCol)), " ")
    val toks = docs.select(col(idCol).as("doc_id"), t.as("t"))
    val bDocs = pairs.select(col("doc_b").as("doc_id")).distinct()
    // the rewritten docs' token arrays feed TWO consumers (positioned
    // k-grams + the final reassembly) — materialize the candidate-
    // bounded semi-join once instead of re-scanning + re-normalizing
    // the corpus for each (r14; the frame is pair-member-sized, never
    // corpus-sized, so the cache is bounded at any scale)
    val bToks = toks.join(bDocs, Seq("doc_id"), "left_semi").persist()
    // positioned k-grams of the affected (rewritten) docs only
    val bGrams = bToks
      .filter(size(col("t")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - (k - 1)),
          i => struct(i.cast("long").as("i"),
            concat_ws(" ", slice(col("t"), i, lit(k))).as("g"))))
          .as("s"))
      .select(col("doc_id"), col("s.i").as("i"), col("s.g").as("g"))
    // distinct k-grams of the donor docs only
    val aGrams = toks
      .join(pairs.select(col("doc_a").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .filter(size(col("t")) >= k)
      .select(col("doc_id").as("doc_a"),
        explode(transform(sequence(lit(1), size(col("t")) - (k - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(k))))).as("g"))
      .distinct()
    // shared shingle starts in b: b's gram occurs in a paired donor
    val starts = bGrams
      .join(pairs, bGrams("doc_id") === pairs("doc_b"))
      .join(aGrams, Seq("doc_a", "g"))
      .select(col("doc_id"), col("i")).distinct()
    // each shared start covers tokens i..i+k-1
    val covered = starts.select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (k - 1))).as("p"))
      .distinct().withColumn("cut", lit(true))
    bToks
      .select(col("doc_id"), posexplode(col("t")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("tok"))
      .join(covered, Seq("doc_id", "p"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cut"), 1L).otherwise(0L)).as("n_cut"),
        // p is unique within a doc → total deterministic order
        array_join(transform(
          array_sort(collect_list(
            when(col("cut").isNull, struct(col("p"), col("tok"))))),
          x => x("tok")), " ").as("text_clean"))
      .select(col("doc_id"), col("n_tokens"), col("n_cut"),
        graft.functions.Fns.round2(col("n_cut") / col("n_tokens"))
          .as("cut_frac"),
        col("text_clean"))
  }

  /** Sentence-level dedup REWRITE — the fine-grained layer real
    * curation stacks run between exact-document and token-chunk dedup
    * (round-9 verdict #6; the Lee-et-al substring argument at a
    * linguistically meaningful granularity): segment every document
    * with [[TextStats.sentences]], keep only the corpus-wide FIRST
    * occurrence of each distinct sentence (lexicographic min over
    * (doc_id, sent_idx) — within-doc repeats collapse too), and
    * reassemble each document from its surviving sentences in order.
    * This is how repeated boilerplate sentences (cookie banners,
    * license footers, navigation crumbs) are CUT from all but one
    * occurrence while the documents that carried them survive.
    *
    * Scale posture: identical to [[chunkDedupRewrite]] — segmentation
    * is a per-row regexp explode (no shuffle); the first-occurrence
    * argmin is ONE hash aggregation keyed on sentence text
    * (min(struct), no corpus-wide window); the join-back is an
    * equi-join on the same key; reassembly sorts only WITHIN a
    * document. At 100 TB key on a 128-bit sentence hash with text
    * resolved on collision; the gate keys on raw text because the
    * DuckDB twin must reproduce the grouping byte-for-byte.
    * Output: (doc_id, n_sentences, n_dropped, text_clean) for every
    * document with ≥ 1 non-empty sentence.
    */
  def sentenceDedupRewrite(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val sents = TextStats.sentences(docs, idCol, textCol)
      .select("doc_id", "sent_idx", "sentence")
      .persist() // two consumers: first-occurrence argmin + join-back
    val firstOcc = sents.groupBy("sentence")
      .agg(min(struct(col("doc_id"), col("sent_idx"))).as("fo"))
    sents.join(firstOcc, "sentence")
      .withColumn("kept", col("doc_id") === col("fo.doc_id") &&
        col("sent_idx") === col("fo.sent_idx"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        // sent_idx is unique within a doc → total deterministic order
        array_join(transform(
          array_sort(collect_list(
            when(col("kept"), struct(col("sent_idx"), col("sentence"))))),
          x => x("sentence")), " ").as("text_clean"))
  }
}
