package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), n-gram Jaccard (exact all-pairs), MinHash+LSH
  * (shingle→minhash→band→bucket-join), SimHash (pigeonhole banding).
  * Embedding-cosine near-dup lives in [[Similarity]].
  *
  * All thresholds are calibrated on the synthetic corpus: it contains 25
  * planted near-dup pairs at Jaccard ≈ 0.97-0.99 with the next pair below
  * 0.1, so t=0.5 separates cleanly.
  *
  * Scale design (100 TB):
  *  - exact dedup groups on md5(text), not text — shuffle keys are 16
  *    bytes instead of whole documents;
  *  - shingles are hashed to 60-bit longs ONCE, immediately after
  *    shingling; every downstream op (self-join keys, set intersections,
  *    minhash folds) works on 8-byte longs, never strings — smaller
  *    shuffles and codegen-friendly comparisons;
  *  - MinHash signatures are computed with array folds (no row explosion:
  *    one row per doc throughout), then only 8 small band rows per doc
  *    shuffle; candidate verification touches pairs, which LSH keeps tiny;
  *  - SimHash banding is pigeonhole-exact: 6 blocks of 10 bits banded on
  *    every 2-block pair (15 bands of 20-bit keys) — hamming ≤ 4 leaves
  *    ≥ 2 blocks untouched, so some band key matches exactly and the
  *    banded join finds exactly the brute-force pairs, with ~10^6-way
  *    bucket spread instead of the 4096-way a single 12-bit chunk gives;
  *  - the exact all-pairs form (dd_ngram_jaccard) is the oracle/baseline —
  *    at scale you run the LSH form.
  */
object Dedup {
  import Hashing.{duckHash, sparkHash}

  // minhash signature length — the ONE definition lives next to the
  // native expression so SQL registration and operator library agree
  private val K = graft.expr.MinHashSig.K
  private val B = 8  // bands
  private val R = 4  // rows per band (K = B*R)
  // jaccard threshold — package-visible so the streaming probe and the
  // specs share the ONE literal the oracles are built from
  private[graft] val JT = "0.5"
  /** Deterministic seen/new corpus split for the incremental-dedup family
    * (batch query, streaming probe, oracles, and specs must all agree):
    * seen = doc_id % SEEN_MOD != 0; the new batch is the held-out rest
    * plus exact copies of seen docs with doc_id % COPY_MOD == 0,
    * re-labeled doc_id + COPY_OFFSET.
    */
  private[graft] val SEEN_MOD = 5
  private[graft] val COPY_MOD = 97
  /** Relabel offset for injected copies. ASSUMES max(doc_id) < COPY_OFFSET
    * (true for every testdata SF; PropertySpec pins it) — on a corpus with
    * larger ids the synthetic copy ids would collide with genuine held-out
    * ids. Kept a shared literal (not max(doc_id)+1) so the Spark paths,
    * DuckDB oracles, and specs interpolate the SAME constant without an
    * extra driver action.
    */
  private[graft] val COPY_OFFSET = 1000000L
  private val HAM = 4     // simhash hamming threshold
  private val BLOCKS = 6  // simhash pigeonhole blocks (10 bits each)
  private val BBITS = 10  // bits per block (BLOCKS * BBITS = 60)

  /** 2^40 modulus for the arithmetic minhash family: one md5 per shingle,
    * then h_i = ((2i+1)·base + i·2654435761) mod 2^40 — every intermediate
    * stays < 2^47, safe for DuckDB's overflow-trapping BIGINT.
    */
  private val M40 = graft.expr.MinHashSig.M.toString

  /** (doc_id, shashes): lowercase word-3-gram shingles hashed to 60-bit
    * longs, distinct per doc. All dedup set math runs on these longs.
    */
  private def shingled(s: SparkSession, d: String): DataFrame =
    shingledOf(Tables.spread(Tables.documents(s, d))) // md5 is CPU-bound

  /** [[shingled]] over an arbitrary (doc_id, text, …) frame — the same
    * stage the incremental path runs on just the new batch.
    */
  def shingledOf(docs: DataFrame): DataFrame =
    // NOTE: no spread here — batch-scale pipeline legs (e2e incremental,
    // corpus-clean) pass tiny mid-pipeline frames where a repartition is
    // pure tax; CORPUS-scale callers spread their raw scan themselves
    docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      // 3-grams via two shifted zip_with passes: O(n) per doc, vs the
      // naive transform+slice which copies a subarray per position (O(n²)).
      // The overhanging positions zip against null and concat propagates
      // the null, so a trailing filter trims to exactly n-2 shingles.
      .select(col("doc_id"), expr(
        """filter(
          |  zip_with(
          |    zip_with(ws, slice(ws, 2, size(ws) - 1), (x, y) -> concat(x, ' ', y)),
          |    slice(ws, 3, size(ws) - 2), (x, y) -> concat(x, ' ', y)),
          |  v -> v IS NOT NULL)""".stripMargin).as("shingles"))
      .select(col("doc_id"), expr(
        s"array_distinct(transform(shingles, sh -> ${sparkHash("sh")}))"
      ).as("shashes"))

  /** Exact dedup via hash-groupBy. The corpus has no exact dups, so dups
    * are injected by unioning the table with itself; the dedup then picks
    * the minimum doc_id per md5(text) group (deterministic representative).
    */
  def exactDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionByName(docs)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("text_md5"))
      .orderBy(col("keep_id"))
  }

  /** Per-source cost accounting of exact dedup — the dataset-card row a
    * curation run publishes next to [[exactDedup]]'s survivor list: rows
    * and whitespace tokens before vs after, and the dedup rate each
    * source pays (sources differ: boilerplate-heavy sources lose far
    * more than long-tail ones, which is what this table is for). Same
    * doubled-corpus convention as [[exactDedup]] so the rates are
    * non-trivial on the dup-free fixture (every source reads ≥ 50%).
    *
    * Scale shape: survivor election is the same md5-keyed groupBy as
    * [[exactDedup]] (fixed-width 32-char keys, map-side combined);
    * attribution joins survivors back on the 8-byte keep_id; both
    * before/after rollups collapse to |sources| rows before the final
    * broadcast-sized join. A source whose every text also lives in a
    * lower-id source can lose ALL its rows — the left join + zero-fill
    * keeps its row with dedup_rate 1.0 instead of silently dropping it.
    */
  def dedupImpact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val doubled = docs.unionByName(docs)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val before = doubled.groupBy(col("source"))
      .agg(count(lit(1)).as("rows_before"), sum(col("toks")).as("tokens_before"))
    val survivors = doubled.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    val after = survivors
      .join(docs.select(col("doc_id").as("keep_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks")), Seq("keep_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("rows_after"), sum(col("toks")).as("tokens_after"))
    before.join(after, Seq("source"), "left")
      .na.fill(0L, Seq("rows_after", "tokens_after"))
      .withColumn("row_dedup_rate",
        lit(1.0) - col("rows_after").cast("double") / col("rows_before").cast("double"))
      .withColumn("token_dedup_rate",
        lit(1.0) - col("tokens_after").cast("double") / col("tokens_before").cast("double"))
      .select(col("source"), col("rows_before"), col("tokens_before"),
        col("rows_after"), col("tokens_after"),
        col("row_dedup_rate"), col("token_dedup_rate"))
      .orderBy(col("source"))
  }

  /** Exact n-gram Jaccard near-dup: all pairs sharing ≥1 shingle hash,
    * scored inter/(|A|+|B|-inter), kept at ≥ 0.5. The explode self-join on
    * long keys is the exact baseline; LSH below reproduces it at scale.
    */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    // set size rides along with every exploded row, so no extra sizes
    // join is needed; shingled is checkpointed (a few hundred bytes/doc)
    // so the shingle+hash pass runs once, not once per join side + once
    // for the final sort's range sampling
    val sh = shingled(s, d).localCheckpoint()
      .select(col("doc_id"), size(col("shashes")).as("n"),
        explode(col("shashes")).as("sh"))
    sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= expr(JT))
      .select(col("ia"), col("ib"), col("inter"), col("jaccard"))
      .orderBy(col("ia"), col("ib"))
  }

  /** Asymmetric CONTAINMENT C(a→b) = |A∩B| / |A| — the doc-inside-doc
    * detector symmetric Jaccard structurally misses: a short document
    * quoted wholesale inside a long one has tiny Jaccard (|A∪B| is
    * dominated by B) but containment ≈ 1. Same inverted-index
    * intersection as [[ngramJaccard]] with the divisor switched to the
    * CONTAINED side's set size, emitted directionally (both a→b and
    * b→a when both clear the bar). NOTE: Jaccard-banded MinHash canNOT
    * supply candidates here — banding finds high-Jaccard pairs, and
    * doc-inside-doc pairs have tiny Jaccard by construction. The scale
    * path is [[containmentBanded]] (prefix-filtered, df-capped inverted
    * index); this exact all-pairs form is its verification baseline
    * (quadratic in hot shingles — do not run it at 100 TB).
    */
  def containment(s: SparkSession, d: String): DataFrame =
    containmentExactOf(shingled(s, d))

  /** Exact containment over an arbitrary shingled frame — the Θ(Σ df²)
    * baseline, factored out so the DF_CAP pressure spec can run it on a
    * hot-shingle fixture corpus.
    */
  private[graft] def containmentExactOf(shing: DataFrame): DataFrame = {
    val sh = shing.localCheckpoint()
      .select(col("doc_id"), size(col("shashes")).as("n"),
        explode(col("shashes")).as("sh"))
    sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh")
        && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        col("a.n").as("na"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment", col("inter").cast("double") / col("na"))
      .filter(col("containment") >= 0.5)
      .select(col("ia"), col("ib"), col("inter"), col("containment"))
      .orderBy(col("ia"), col("ib"))
  }

  /** Document frequency above which a shingle is a STOP SHINGLE and is
    * pruned from [[containmentBanded]]'s inverted index: boilerplate
    * n-grams ("terms of service", license headers) appear in a constant
    * fraction of any web-scale corpus and are exactly the keys whose
    * index postings go quadratic. Package-visible so the recall spec and
    * the DuckDB oracle interpolate the same literal. On the synthetic
    * corpus max df = 7, so nothing is pruned and recall vs the exact
    * baseline is provably 1.0 (ExtensionSpec pins it); at 100 TB the cap
    * is what bounds the join fanout.
    */
  private[graft] val DF_CAP = 16

  /** Containment-aware candidate generation at scale — the answer to
    * "banded MinHash can't find asymmetric pairs". PREFIX FILTERING
    * (Chaudhuri et al., SSJoin; Xiao et al., PPJoin): if C(a→b) ≥ t,
    * then A shares at least one of its ⌊(1−t)·|A|⌋+1 rarest shingles
    * with B — order A's shingles by ascending global df and probe ONLY
    * that prefix against a df-capped inverted index of the corpus.
    * Probe volume is ~|A|/2+1 rows per doc (t = 0.5), per-shingle join
    * fanout ≤ [[DF_CAP]], so candidates are O(corpus · cap) — linear,
    * vs the exact form's Θ(Σ df²) hot-shingle blowup. Miss condition,
    * stated precisely: a qualifying pair (a→b) is missed iff EVERY
    * prefix shingle of `a` that is SHARED with `b` has df > cap (unshared
    * prefix shingles under the cap don't help — they probe postings that
    * don't contain b). In particular two documents whose only common
    * content is high-df boilerplate WILL be missed even if each doc also
    * carries rare unshared shingles; recall degrades exactly on
    * boilerplate-only overlap, which for dedup purposes is usually the
    * overlap you want to ignore. Rarest-first prefix ordering makes the
    * probed shingles the least likely to be capped. Every candidate is verified
    * with the EXACT containment score (array_intersect on the full
    * shingle sets), so output ⊆ exact baseline always; the spec pins
    * recall. The df pass is one extra count-aggregate over the exploded
    * shingles — at 100 TB it is itself the Zipf-head report you want
    * before any dedup run.
    */
  def containmentBanded(s: SparkSession, d: String): DataFrame =
    containmentBandedOf(shingled(s, d).localCheckpoint())

  /** The prefix-filtered candidate pairs (ia, ib), before exact
    * verification — exposed so the DF_CAP pressure spec can assert the
    * candidate-volume bound (≤ Σ_doc prefix_len · DF_CAP) directly.
    */
  private[graft] def containmentCandidatesOf(shing: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shing.select(col("doc_id"), size(col("shashes")).as("n"),
      explode(col("shashes")).as("sh"))
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // NOT checkpointed: a materialization barrier here measured SLOWER
    // (3.80 → 4.18 s in-suite) than letting exchange reuse carry the
    // probe and index sides — the exploded frame is wide enough that
    // writing it once costs more than the reused re-read saves.
    val withDf = sh.join(dfreq, Seq("sh"))
    val probe = withDf
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .filter(col("rn") <= expr("n DIV 2 + 1"))
      .select(col("doc_id").as("ia"), col("sh"))
    val idx = withDf.filter(col("df") <= DF_CAP)
      .select(col("doc_id").as("ib"), col("sh"))
    probe.join(idx, Seq("sh"))
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib")).distinct()
  }

  /** [[containmentBanded]] over an arbitrary (pre-checkpointed) shingled
    * frame: capped-index candidates + exact verification.
    */
  private[graft] def containmentBandedOf(shing: DataFrame): DataFrame = {
    val cand = containmentCandidatesOf(shing)
    cand
      .join(shing.select(col("doc_id").as("ia"), col("shashes").as("sa")), Seq("ia"))
      .join(shing.select(col("doc_id").as("ib"), col("shashes").as("sb")), Seq("ib"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("containment", col("inter").cast("double") / size(col("sa")))
      .filter(col("containment") >= 0.5)
      .select(col("ia"), col("ib"), col("inter"), col("containment"))
      .orderBy(col("ia"), col("ib"))
  }

  /** Adds the K-wide minhash signature to a shingled frame: K arithmetic
    * hashes folded elementwise-min over the shingle hashes — one row per
    * doc, no explosion. Runs the native fused [[graft.expr.MinHashSig]]
    * expression (codegen, one long[K] per doc) rather than the HOF fold
    * below — identical Long arithmetic, so bit-for-bit the same signature
    * (ExtensionSpec pins the equality; the DuckDB oracles are untouched).
    */
  def signaturesOf(shingles: DataFrame): DataFrame = {
    graft.expr.VectorExprs.register(shingles.sparkSession)
    shingles.withColumn("sig", expr("graft_minhash(shashes)"))
  }

  /** The declarative HOF formulation [[signaturesOf]] replaced — kept as
    * the executable spec of the signature arithmetic (interpreted
    * lambdas, one K-array allocation per shingle).
    */
  private[graft] def signaturesOfHof(shingles: DataFrame): DataFrame =
    shingles.withColumn("sig", expr(
      s"""aggregate(
         |  transform(shashes, h -> transform(sequence(0, ${K - 1}),
         |    i -> ((2*i + 1) * (h % $M40) + i * 2654435761) % $M40)),
         |  array_repeat(CAST(9223372036854775807 AS BIGINT), $K),
         |  (acc, x) -> zip_with(acc, x, (p, q) -> least(p, q)))""".stripMargin))

  /** LSH band rows for a signature frame — fixed-width (doc_id, band, bh)
    * ONLY: the shingle sets never ride through the band shuffle;
    * candidates join back to them by doc_id for verification.
    */
  def bandsOf(sig: DataFrame): DataFrame = bandsCarrying(sig)

  /** [[bandsOf]] with extra carried columns. The streaming probe carries
    * the shingle set on its (small, batch-sized) side because a join-back
    * to the stream would be a stream-stream self-join; batch callers
    * carry nothing.
    */
  def bandsCarrying(sig: DataFrame, carry: String*): DataFrame =
    sig.select(col("doc_id") +: carry.map(col) :+
      explode(expr(
        s"""transform(sequence(0, ${B - 1}), b -> struct(b as band,
           |  ${sparkHash(s"concat(cast(b as string), '|', concat_ws(',', transform(slice(sig, b*$R+1, $R), v -> cast(v as string))))")} as bh))""".stripMargin
      )).as("bb"): _*)
      .select(col("doc_id") +: carry.map(col) :+
        col("bb.band").as("band") :+ col("bb.bh").as("bh"): _*)

  /** MinHash + LSH near-dup: K=32 arithmetic hashes folded elementwise-min
    * over shingle hashes (one row per doc — no explosion), banded B=8 × R=4,
    * bucket-join for candidates, exact-Jaccard verification at ≥ 0.5.
    */
  def minhashLsh(s: SparkSession, d: String): DataFrame =
    lshPairsOf(Tables.spread(Tables.documents(s, d))).orderBy(col("ia"), col("ib"))

  /** WHERE the duplication flows from — [[minhashLsh]]'s verified pairs
    * aggregated into a (source, source) matrix with pair counts and mean
    * Jaccard (in exact milli-units, the [[Similarity.sourceDiversity]]
    * discipline: floor-quantize BEFORE the sum so the mean is
    * summation-order-free). Heavy off-diagonal cells are mirror/scraper
    * relationships between sources — the diagnostic that tells a
    * curation pipeline whether to dedup within or ACROSS source slices,
    * and which feeds to cap. Two broadcast-sized joins attach sources to
    * the (already small) verified pair set; the matrix rollup is
    * |sources|² bounded.
    */
  def dupSources(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    lshPairsOf(Tables.spread(Tables.documents(s, d)))
      .join(docs.select(col("doc_id").as("ia"), col("source").as("sa")), "ia")
      .join(docs.select(col("doc_id").as("ib"), col("source").as("sb")), "ib")
      .withColumn("source_a", least(col("sa"), col("sb")))
      .withColumn("source_b", greatest(col("sa"), col("sb")))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(floor(col("jaccard") * 1000.0).cast("long")).as("jacc_milli_sum"))
      .withColumn("mean_jacc_milli",
        col("jacc_milli_sum").cast("double") / col("n_pairs").cast("double"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Verified near-dup pairs (ia < ib, inter, jaccard ≥ 0.5) of an
    * arbitrary (doc_id, text, …) frame — the unordered core of
    * [[minhashLsh]], reused by the corpus-clean pipeline on its
    * quality-filtered survivor set.
    */
  def lshPairsOf(docs: DataFrame): DataFrame = {
    // localCheckpoint: this frame (doc_id, shashes, sig — a few hundred
    // bytes per doc) feeds FOUR consumers (two band-join sides + two
    // verification joins) plus the final sort's range-sampling pass; a
    // broadcast self-join defeats exchange reuse, so without the
    // checkpoint the shingle+fold subplan executes up to 5×. Per-doc
    // sketches are exactly what you'd persist on a real cluster too.
    val sig = signaturesOf(shingledOf(docs)).localCheckpoint()
    val bands = bandsOf(sig)
    val candIds = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band")
        && col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .dropDuplicates("ia", "ib")
    val sets = sig // checkpointed above — reuse, don't re-shingle
    val cand = candIds
      .join(sets.select(col("doc_id").as("ia_k"), col("shashes").as("sha")),
        col("ia") === col("ia_k"))
      .join(sets.select(col("doc_id").as("ib_k"), col("shashes").as("shb")),
        col("ib") === col("ib_k"))
    cand
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double")
          / (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jaccard") >= expr(JT))
      .select(col("ia"), col("ib"), col("inter"), col("jaccard"))
  }

  /** Duplicate-cluster resolution: connected components over the near-dup
    * pair graph via iterative min-label propagation (each node adopts the
    * smallest component id among itself and its neighbors until fixpoint).
    * The loop is driver-steered but all data stays distributed;
    * localCheckpoint truncates the growing lineage each round. At 100 TB
    * scale swap the propagation for the alternating large-star/small-star
    * algorithm — same join shapes, fewer rounds.
    *
    * Pairs come from the LSH path (the production pipeline); the oracle is
    * a DuckDB RECURSIVE CTE over the EXACT all-pairs graph — so this query
    * simultaneously verifies the clustering AND that LSH recall is total
    * on this corpus (a missed pair would change the components and fail
    * the hash compare).
    */
  def components(s: SparkSession, d: String): DataFrame = {
    val pairs = minhashLsh(s, d).select(col("ia"), col("ib"))
    val edges = pairs
      .unionByName(pairs.select(col("ib").as("ia"), col("ia").as("ib")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("ia").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val neigh = edges.join(labels, edges("ib") === labels("node"))
        .groupBy(edges("ia").as("n2")).agg(min(col("component")).as("ncomp"))
      val updated = labels.join(neigh, labels("node") === neigh("n2"), "left")
        .select(col("node"), col("component").as("old"),
          least(col("component"), coalesce(col("ncomp"), col("component")))
            .as("component"))
        .localCheckpoint()
      changed = updated.filter(col("component") =!= col("old")).count()
      labels = updated.select(col("node"), col("component"))
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"component propagation did not converge in $iter iterations " +
          "(graph diameter exceeds the cap) — raise the cap or switch to " +
          "large-star/small-star")
    val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("comp_size"))
    labels.join(sizes, Seq("component"))
      .select(col("node").as("doc_id"), col("component"), col("comp_size"))
      .orderBy(col("doc_id"))
  }

  /** Dup-cluster size histogram — "how big are my duplicate clusters" —
    * the one-page diagnostic a dedup run is judged by: a corpus whose
    * mass sits in a few giant components has template/boilerplate
    * contamination (and its LSH band join is about to skew); healthy
    * near-dup structure is many small clusters. Rolls the
    * [[componentsStars]] labeling (the O(log n) scale path) up to one
    * row per distinct (component, size) then one row per size — both
    * rollups are bounded by component count, so the histogram adds two
    * cheap keyed aggregations to the components run it shares.
    */
  def componentSizes(s: SparkSession, d: String): DataFrame =
    componentsStars(s, d)
      .select(col("component"), col("comp_size")).distinct()
      .groupBy(col("comp_size")).agg(count(lit(1)).as("n_components"))
      .withColumn("n_docs", col("comp_size") * col("n_components"))
      .orderBy(col("comp_size"))

  /** Connected components via alternating large-star/small-star (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
    * public algorithm): each round rewires edges toward neighborhood
    * minima, converging to one star per component centered at the
    * component's minimum node in O(log n) rounds — versus graph-DIAMETER
    * rounds for plain min-label propagation ([[components]], kept as the
    * teaching form). One driver sync (the convergence count) per round,
    * so a 100 TB pair graph costs ~log n cluster barriers, not
    * ~longest-chain-length.
    *
    *  - large-star(u): every neighbor v > u is re-pointed at
    *    m = min(N(u) ∪ u);
    *  - small-star(u): every neighbor v < u (and u itself) is re-pointed
    *    at m = min of u's smaller neighbors.
    *
    * Both emit canonical (hi, lo) edges, so the working set never holds
    * duplicates of an undirected edge in both orientations. Same output
    * and same recursive-CTE oracle as [[components]] — the two
    * implementations cross-validate each other.
    */
  def componentsStars(s: SparkSession, d: String): DataFrame = {
    // lshPairsOf, not minhashLsh: the pair sort the public query ends
    // with would be discarded by the distinct() reshuffle anyway
    val pairs = lshPairsOf(Tables.spread(Tables.documents(s, d))).select(col("ia"), col("ib"))
    // canonical (u > v) undirected edges; pairs arrive as ia < ib
    var edges = pairs.select(col("ib").as("u"), col("ia").as("v"))
      .distinct().localCheckpoint()
    // convergence detection via an order-independent (count, hash-xor)
    // fingerprint — ONE cheap aggregate per round instead of the two
    // anti-join shuffles a set-difference check costs. bit_xor never
    // overflows (sum would trap under ANSI mode); a collision masking a
    // real change needs a 64-bit xor tie across distinct edge sets
    // (~2^-64, and the oracle hash-compare would catch the fallout).
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var fp = fingerprint(edges)
    var changed = true
    var iter = 0
    while (changed && iter < 12) {
      val adj = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = adj.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = adj.filter(col("v") > col("u"))
        .join(minsL, "u")
        .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m → canonical
        .distinct()
      val adj2 = large.unionByName(large.select(col("v").as("u"), col("u").as("v")))
      val smallN = adj2.filter(col("v") < col("u"))
      val minsS = smallN.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = smallN.join(minsS, "u")
        .select(col("v").as("node"), col("m"))
        .filter(col("node") =!= col("m"))
        .unionByName(minsS.select(col("u").as("node"), col("m")))
        .distinct()
        .select(col("node").as("u"), col("m").as("v")) // node > m by min-ness
        .localCheckpoint()
      val fpNew = fingerprint(small)
      changed = fpNew != fp
      fp = fpNew
      edges = small
      iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"star contraction did not converge in $iter rounds")
    // fixpoint: edges = (member, center); centers label themselves
    val labels = edges.select(col("u").as("doc_id"), col("v").as("component"))
      .unionByName(edges.select(col("v").as("doc_id"), col("v").as("component"))
        .distinct())
    val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("comp_size"))
    labels.join(sizes, Seq("component"))
      .select(col("doc_id"), col("component"), col("comp_size"))
      .orderBy(col("doc_id"))
  }

  /** Duplicate-cluster canonicalization: production dedup KEEPS one
    * document per near-dup cluster — the best one, not an arbitrary
    * first (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" keeps one member per cluster; choosing by quality
    * beats choosing by luck). Clusters are [[componentsStars]] over the
    * LSH pair graph, singleton docs cluster with themselves; the survivor
    * is argmax by (text length DESC, doc_id ASC) — stand-in for any
    * quality score. The argmax runs on the NATIVE bounded-heap top-k
    * operator ([[graft.plans.TopKPerKey]], k = 1): no per-cluster sort,
    * and only (cluster, doc_id, text_len) rows ever shuffle — text stays
    * at the scan. Oracle: recursive-CTE clustering + window argmax.
    */
  def canonical(s: SparkSession, d: String): DataFrame = {
    val labels = componentsStars(s, d).select(col("doc_id"), col("component"))
    val clustered = Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
    val sizes = clustered.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
    graft.plans.TopKPerKey.topK(
      clustered.select(col("cluster"), col("doc_id"), col("text_len")),
      keyCols = Seq("cluster"),
      sortCols = Seq(("text_len", false), ("doc_id", true)), k = 1)
      .join(sizes, Seq("cluster"))
      .select(col("cluster"), col("doc_id").as("canonical_id"),
        col("text_len"), col("n_members"))
      .orderBy(col("cluster"))
  }

  /** Corpus snapshot diff: classify every doc_id across two corpus
    * versions as added / removed / changed / unchanged — the audit step
    * between pipeline runs (what did the recrawl actually change?) and
    * the input to incremental downstream recomputation (only added ∪
    * changed need re-sketching). Synthetic snapshots carved
    * deterministically from `documents`: old = id % 7 ≠ 0, new = id % 5
    * ≠ 0 with text reversed where id % 11 = 0. The content fingerprint
    * (md5) is computed BEFORE the join on each side, so the full-outer
    * exchange carries 16-byte digests, never text — at 100 TB the diff
    * shuffles ~0.1% of corpus bytes.
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val old = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("md5_old"))
    val neu = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), md5(when(col("doc_id") % 11 === 0,
        reverse(col("text"))).otherwise(col("text"))).as("md5_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("md5_old").isNull, lit("added"))
          .when(col("md5_new").isNull, lit("removed"))
          .when(col("md5_old") =!= col("md5_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select(col("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }

  /** Incremental dedup: classify a NEW batch of documents against an
    * already-seen corpus without ever re-processing the seen side. This is
    * the production shape of LLM-corpus dedup — the seen corpus is 100 TB
    * and static; the nightly batch is small — so the seen documents must
    * be represented by a persisted sketch store, not re-shingled per run:
    *
    *  - md5 store (doc_id, text_md5): exact-dup anti-join — 16-byte keys;
    *  - sketch store (doc_id, shashes, sig): candidate verification;
    *  - band store (doc_id, band, bh): the LSH probe index (bucket a new
    *    doc's 8 band keys against it; at scale this is the table you
    *    bucket-write on (band, bh) so the probe join is shuffle-free on
    *    the corpus side — BucketingSpec proves that machinery).
    *
    * Only the NEW batch is shingled/signed (DedupSpec asserts the probe
    * plan scans the seen corpus zero times). Verdict per new doc:
    * `exact_dup` (md5 seen), `near_dup_of` (smallest seen doc_id with
    * verified Jaccard ≥ 0.5 among band-bucket candidates), `kept`
    * (neither). The oracle replays the whole thing in DuckDB on the same
    * deterministic seen/new split.
    */
  def incremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, d)) // corpus-scale shingling
      .select(col("doc_id"), col("text"))
    val seen = docs.filter(col("doc_id") % SEEN_MOD =!= 0)
    // new batch: held-out docs plus injected exact copies of a few seen
    // docs (doc_id offset by 1e6) so the exact path has real positives
    val fresh = docs.filter(col("doc_id") % SEEN_MOD === 0)
      .unionByName(seen.filter(col("doc_id") % COPY_MOD === 0)
        .select((col("doc_id") + COPY_OFFSET).as("doc_id"), col("text")))
    val (md5s, sketches, bands) = sketchStore(seen)
    incrementalProbe(fresh, md5s, sketches, bands)
  }

  /** The persisted-side artifacts for [[incrementalProbe]]. In production
    * these are bucketed tables maintained across batches; here they are
    * derived on the fly (the spec derives them once, writes them to
    * parquet, and probes from there).
    */
  def sketchStore(seen: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val md5s = seen.select(col("doc_id"), md5(col("text")).as("text_md5"))
    val sketches = signaturesOf(shingledOf(seen)).localCheckpoint()
    (md5s, sketches, bandsOf(sketches))
  }

  /** Probe a new batch against a seen corpus's sketch store. Touches the
    * new batch's text exactly once and the seen corpus's text never.
    */
  def incrementalProbe(fresh: DataFrame, seenMd5: DataFrame,
      seenSketch: DataFrame, seenBands: DataFrame): DataFrame = {
    // one row per doc through shingle+sign; checkpoint because the frame
    // feeds both the band probe and candidate verification
    val newSig = signaturesOf(shingledOf(fresh)).localCheckpoint()
    val cand = bandsOf(newSig).as("a")
      .join(seenBands.as("b"), col("a.band") === col("b.band")
        && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("nid"), col("b.doc_id").as("sid"))
      .dropDuplicates("nid", "sid")
    val nearest = cand
      .join(newSig.select(col("doc_id").as("nid"), col("shashes").as("sha")), "nid")
      .join(seenSketch.select(col("doc_id").as("sid"), col("shashes").as("shb")), "sid")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double")
          / (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jaccard") >= expr(JT))
      .groupBy(col("nid")).agg(min(col("sid")).as("near_dup_of"))
    val exacts = fresh.select(col("doc_id"), md5(col("text")).as("text_md5"))
      .join(seenMd5.select(col("text_md5")).distinct(), Seq("text_md5"), "left_semi")
      .select(col("doc_id"), lit(true).as("e"))
    fresh.select(col("doc_id"))
      .join(exacts, Seq("doc_id"), "left")
      .join(nearest.withColumnRenamed("nid", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("e"), lit(false)).as("exact_dup"),
        col("near_dup_of"),
        (!coalesce(col("e"), lit(false)) && col("near_dup_of").isNull).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** 60-bit SimHash over distinct words, near-dup at hamming ≤ 4, found
    * via two-block pigeonhole banding: the 60 bits split into 6 blocks of
    * 10; ≤ 4 flipped bits touch ≤ 4 blocks, so every qualifying pair has
    * ≥ 2 untouched blocks and therefore matches exactly on at least one
    * of the C(6,2)=15 block-pair band keys. Same result as brute force.
    *
    * Scale: each band key is 20 bits (2^20 ≈ 1M buckets per band) versus
    * the single-chunk scheme's 2^12 = 4096 — at a billion docs that is
    * ~10^3 docs per bucket instead of ~2.5×10^5, turning the
    * within-bucket quadratic term from ~3×10^10 to ~5×10^5 pairs per
    * bucket. 15 band rows per doc (vs 5) is the linear price for the
    * 256× wider key space.
    */
  def simhash(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint: 12 bytes per doc, feeds both self-join sides and
    // the final sort's sampling pass — without it the word-explode
    // aggregation runs 3×  (broadcast self-join defeats exchange reuse).
    val sim = simhashValues(s, d).localCheckpoint()
    val mask = (1 << BBITS) - 1
    val combos = for { i <- 0 until BLOCKS; j <- i + 1 until BLOCKS } yield (i, j)
    val bandArr = combos.zipWithIndex.map { case ((i, j), c) =>
      s"""struct($c as band,
         |  (shiftright(sim, ${i * BBITS}) % ${mask + 1}) * ${mask + 1}
         |    + shiftright(sim, ${j * BBITS}) % ${mask + 1} as bk)""".stripMargin
    }.mkString("array(", ", ", ")")
    val banded = sim.select(col("doc_id"), col("sim"),
      explode(expr(bandArr)).as("cb"))
      .select(col("doc_id"), col("sim"),
        col("cb.band").as("band"), col("cb.bk").as("bk"))
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band")
        && col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        expr("bit_count(a.sim ^ b.sim)").cast("long").as("hamming"))
      // filter BEFORE the dedup shuffle: bit_count is free, and only
      // qualifying pairs (tiny) pay the dropDuplicates exchange
      .filter(col("hamming") <= HAM)
      .dropDuplicates("ia", "ib")
      .orderBy(col("ia"), col("ib"))
  }

  /** (doc_id, sim): the 60-bit simhash values. Votes are bit-count sums
    * over exploded word hashes (votes_j > 0 ⟺ 2·ones_j − n_words > 0),
    * PACKED 3-per-long into 20 accumulators: counter j (j = jj + 20·slot)
    * lives in bits [21·slot, 21·slot+21) of packed column p_jj. 21-bit
    * lanes cannot carry into each other while every doc has < 2^21
    * (~2M) distinct words — far above any real document. 20 agg columns
    * instead of 60 → a third of the aggregation-buffer width and shuffle
    * bytes, still one small shuffle, whole-stage codegen throughout.
    */
  def simhashValues(s: SparkSession, d: String): DataFrame = {
    val wordHashes = Tables.spread(Tables.documents(s, d)) // md5 per word
      .select(col("doc_id"),
        explode(expr("array_distinct(split(lower(text), ' '))")).as("w"))
      .select(col("doc_id"), expr(sparkHash("w")).as("h"))
    val packedSums = (0 until 20).map { jj =>
      sum(expr(
        s"""shiftright(h, $jj) % 2
           |  + shiftleft(shiftright(h, ${jj + 20}) % 2, 21)
           |  + shiftleft(shiftright(h, ${jj + 40}) % 2, 42)""".stripMargin))
        .as(s"p$jj")
    }
    val agg = wordHashes.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), packedSums: _*)
    val simExpr = (0 until 60).map { j =>
      val jj = j % 20
      val slot = j / 20
      s"""(CASE WHEN 2 * (shiftright(p$jj, ${21 * slot}) % 2097152) - nw > 0
         | THEN shiftleft(CAST(1 AS BIGINT), $j) ELSE CAST(0 AS BIGINT) END)""".stripMargin
    }.mkString(" + ")
    agg.select(col("doc_id"), expr(simExpr).as("sim"))
  }

  /** Eval-set modulus for the decontamination split (query ∥ oracle). */
  private[graft] val EVAL_MOD = 11

  /** Benchmark decontamination: flag TRAINING documents whose shingle
    * overlap with any EVAL document exceeds 20% of the eval doc's
    * shingles — the step that keeps benchmark text out of a training
    * corpus. The join is an inverted index on the 60-bit shingle hashes
    * (explode + equi-join): cost scales with shared-shingle volume, never
    * |train| × |eval|, and the eval side (small by definition) is the
    * broadcastable one at scale. Output = each contaminated train doc's
    * worst eval match (max overlap, tie → smallest eval id).
    */
  def contamination(s: SparkSession, d: String): DataFrame =
    contaminationOf(shingled(s, d))

  /** [[contamination]] over an arbitrary pre-shingled frame — the spec
    * feeds this the same fixtures as [[ngramContaminationOf]] to pin
    * where the two decontamination rules disagree.
    */
  private[graft] def contaminationOf(sh: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = sh.filter(col("doc_id") % EVAL_MOD === 0)
      .select(col("doc_id").as("eid"), size(col("shashes")).as("en"),
        explode(col("shashes")).as("sh"))
    val tr = sh.filter(col("doc_id") % EVAL_MOD =!= 0)
      .select(col("doc_id").as("tid"), explode(col("shashes")).as("sh"))
    val w = Window.partitionBy(col("tid")).orderBy(desc("overlap"), col("eid"))
    ev.join(tr, "sh")
      // shashes are distinct per doc, so the match count IS the shared-
      // shingle count
      .groupBy(col("tid"), col("eid"), col("en"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("overlap", col("shared").cast("double") / col("en"))
      .filter(col("overlap") >= 0.2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("tid").as("doc_id"), col("eid").as("contaminated_by"),
        col("shared"), col("overlap"))
      .orderBy(col("doc_id"))
  }

  /** 13-GRAM EXACT-MATCH DECONTAMINATION — the rule most published
    * eval-decontamination pipelines actually apply (GPT-3/PaLM/Llama
    * lineage): a training document is contaminated iff it shares ANY
    * exact 13-token n-gram with an eval document. This sits beside the
    * [[contamination]] shingle-overlap rule deliberately — the two
    * disagree in both directions (ExtensionSpec pins a fixture for each):
    * a 13-token verbatim quote inside a long train doc trips this rule
    * but stays under the 20% shingle-overlap bar, while a doc built from
    * an eval doc's 3-grams REARRANGED trips the overlap rule but never
    * assembles 13 consecutive matching tokens.
    *
    * Relational shape: tokenize once per doc, hash every 13-gram to a
    * 60-bit long (O(n·13) per doc — the window slide), explode, and
    * equi-join train grams against eval grams. The eval side is a
    * benchmark suite — small BY DEFINITION at any corpus scale — so it
    * broadcasts; cost is one scan of the corpus plus shared-gram volume,
    * never |train| × |eval|. Output = each contaminated train doc's worst
    * eval match (most shared 13-grams, tie → smallest eval id).
    */
  def ngramContamination(s: SparkSession, d: String): DataFrame =
    ngramContaminationOf(Tables.documents(s, d), 13)

  /** [[ngramContamination]] over an arbitrary (doc_id, text) frame with a
    * parameterized gram length — the spec feeds this the
    * quote-vs-rearrangement fixtures.
    */
  private[graft] def ngramContaminationOf(docs: DataFrame,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), w -> w <> '')").as("ws"))
      .filter(size(col("ws")) >= n)
      // greatest(…, 1): the size filter already excludes short docs, but
      // codegen subexpression elimination can evaluate this expression
      // EAGERLY (it is shared between the projection and the
      // explode-inferred non-empty constraint), i.e. on rows the filter
      // will drop — sequence(1, 0) would descend through 0 and blow up
      // slice(). The clamp makes the expression total; clamped rows never
      // survive the filter.
      //
      // gh is INTERNAL grouping state (never surfaced — the output is doc
      // ids and counts), so the engines only need identical GROUPINGS,
      // not identical hash values: Spark uses codegen'd xxhash64 over the
      // word slice (no string building) while the oracle md5-hashes the
      // joined words — the tx_dup_spans discipline, same collision bound.
      .select(col("doc_id"), expr(
        s"""array_distinct(transform(
           |  sequence(1, greatest(size(ws) - ${n - 1}, 1)),
           |  i -> xxhash64(slice(ws, i, $n))))""".stripMargin).as("ghashes"))
    val ev = grams.filter(col("doc_id") % EVAL_MOD === 0)
      .select(col("doc_id").as("eid"), explode(col("ghashes")).as("gh"))
    val tr = grams.filter(col("doc_id") % EVAL_MOD =!= 0)
      .select(col("doc_id").as("tid"), explode(col("ghashes")).as("gh"))
    val w = Window.partitionBy(col("tid"))
      .orderBy(desc("n_grams_shared"), col("eid"))
    tr.join(broadcast(ev), "gh")
      .groupBy(col("tid"), col("eid"))
      .agg(count(lit(1)).as("n_grams_shared"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("tid").as("doc_id"), col("eid").as("contaminated_by"),
        col("n_grams_shared"))
      .orderBy(col("doc_id"))
  }

  /** 13-GRAM DECONTAMINATION BY SPLICING — the surgical alternative to
    * [[ngramContamination]]'s doc-drop: instead of losing a whole train
    * document over one quoted benchmark passage, remove exactly the
    * contaminated token spans (every 13-gram colliding with an eval
    * doc, occurrences merged into maximal intervals) and keep the rest.
    * The report prices the policy choice: `removed_tokens` is what
    * splicing costs, `tokens_saved` is what doc-dropping would have
    * destroyed on top — the trade a curation review decides with. The
    * spliced text's md5 pins the surgery byte-for-byte cross-engine.
    *
    * Relational shape: positioned 13-gram hashes (O(13·n) per doc inside
    * the scan), eval grams broadcast, interval merge as the standard
    * gaps-and-islands window at doc grain (input = hit positions only),
    * splice as one codegen'd filter-by-span lambda — the corpus text
    * never shuffles, only hit positions and span lists do.
    */
  def decontamSplice(s: SparkSession, d: String): DataFrame =
    decontamSpliceOf(Tables.documents(s, d)).drop("clean_text")

  /** [[decontamSplice]] over an arbitrary (doc_id, text) frame, with the
    * spliced text carried alongside — the spec re-runs 13-gram detection
    * on it to pin that the surgery removes EVERY collision (idempotence).
    */
  private[graft] def decontamSpliceOf(docsIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = 13
    val toks = docsIn
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), w -> w <> '')").as("ws"))
      .filter(size(col("ws")) >= n)
    // greatest(…, 0): total under codegen CSE (the ngramContamination
    // lesson) — sequence(0, 0) on a to-be-filtered short row is harmless.
    // gh is internal join state: xxhash64 over the slice, no strings (the
    // tx_dup_spans discipline; the oracle groups on md5 of joined words).
    val grams = toks.select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, greatest(size(ws) - $n, 0)),
           |  i -> struct(CAST(i AS BIGINT) AS pos,
           |    xxhash64(slice(ws, i + 1, $n)) AS gh))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    val evalGh = grams.filter(col("doc_id") % EVAL_MOD === 0)
      .select(col("gh")).distinct()
    val hits = grams.filter(col("doc_id") % EVAL_MOD =!= 0)
      .join(broadcast(evalGh), Seq("gh"))
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = hits
      .withColumn("new_span",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= n, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("span_id", sum(col("new_span")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + n).as("e"))
    val spanList = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        collect_list(struct(col("s"), col("e"))).as("sp"))
    toks.join(spanList, Seq("doc_id")) // inner: only contaminated docs
      .withColumn("kept", expr(
        """filter(transform(ws, (w, i) -> struct(w, CAST(i AS BIGINT) AS i)),
          |  x -> NOT exists(sp, r -> x.i >= r.s AND x.i < r.e))"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        col("n_spans"),
        (size(col("ws")) - size(col("kept"))).cast("long")
          .as("removed_tokens"),
        size(col("kept")).cast("long").as("tokens_saved"),
        md5(expr("array_join(transform(kept, x -> x.w), ' ')"))
          .as("clean_md5"),
        expr("array_join(transform(kept, x -> x.w), ' ')").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** LSH band-bucket statistics — the tuning report for the (B, R)
    * banding parameters: per band, how many buckets exist, how big the
    * largest is, and how many candidate pairs Σ sz·(sz−1)/2 the band
    * contributes. Run this BEFORE a 100 TB dedup pass: a max_bucket in
    * the millions means a degenerate band key (candidate-pair blowup) and
    * the fix — more rows per band — is a constant change, not a rewrite.
    * Pure integer aggregation over the fixed-width band rows.
    */
  def bandStats(s: SparkSession, d: String): DataFrame =
    bandsOf(signaturesOf(shingled(s, d)))
      .groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("sz")).as("max_bucket"),
        sum(expr("sz * (sz - 1) DIV 2")).as("n_cand_pairs"))
      .orderBy(col("band"))

  /** MinHash accuracy report: for every LSH candidate pair, the sketch's
    * Jaccard ESTIMATE (matching signature positions / K) against the
    * EXACT shingle Jaccard, bucketed into a (est_decile, exact_decile)
    * confusion matrix — the calibration table that justifies (or
    * indicts) a K before a full-corpus run. Deciles are computed in pure
    * integer arithmetic ((10·m) DIV K, (10·∩) DIV ∪), so the report is
    * hash-verifiable and partitioning-independent; pair generation is the
    * same banded candidate path as dd_minhash_lsh — never all-pairs.
    */
  def minhashAccuracy(s: SparkSession, d: String): DataFrame = {
    val sig = signaturesOf(shingled(s, d)).localCheckpoint()
    val bands = bandsOf(sig)
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band")
        && col("a.bh") === col("b.bh")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .distinct()
    val left = sig.select(col("doc_id").as("ia"),
      col("shashes").as("sa"), col("sig").as("ga"))
    val right = sig.select(col("doc_id").as("ib"),
      col("shashes").as("sb"), col("sig").as("gb"))
    cand.join(left, Seq("ia")).join(right, Seq("ib"))
      .withColumn("m",
        expr("size(filter(zip_with(ga, gb, (x, y) -> x = y), v -> v))"))
      .withColumn("inter", expr("size(array_intersect(sa, sb))"))
      .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
      .withColumn("est_decile", expr(s"(10 * m) DIV $K").cast("long"))
      .withColumn("exact_decile", expr("(10 * inter) DIV uni").cast("long"))
      .groupBy(col("est_decile"), col("exact_decile"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("est_decile"), col("exact_decile"))
  }

  /** Blocked fuzzy record linkage (entity resolution) over the part
    * dimension — the Splink/Dedupe.io shape: candidate pairs come from a
    * BLOCKING key (here the head noun of the name), never from an
    * all-pairs cross join, and each candidate is scored with edit
    * distance. Two scale disciplines stack:
    *
    *  1. linkage runs on DISTINCT names, not rows — the dimension's
    *     attribute domain is orders of magnitude smaller than the table
    *     (64 names for 2 000 parts here; the same ratio holds for
    *     street/employer/name columns at 100 TB), and each name carries
    *     its row count so the pair report still quantifies row impact;
    *  2. within a block the pair join is (block key)-partitioned —
    *     O(Σ block²) on the distinct-value domain, and a skewed block is
    *     salt-able exactly like any hot join key.
    *
    * The match score 1 − dist/max(len) is ONE IEEE division of exact
    * ints, bit-equal cross-engine ([[graft.Det]] discipline); `x_fuzzy_match`
    * (AggJoinOps) is the all-pairs demo on a 25-row dim — THIS is the
    * form that survives a real dimension.
    */
  def recordLinkage(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(lower(col("p_name")).as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("noun", element_at(split(col("name"), " "), -1))
    val a = names.select(col("noun"), col("name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val b = names.select(col("noun"), col("name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    a.join(b, Seq("noun"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 2)
      .withColumn("score", lit(1.0) - col("dist").cast("double")
        / greatest(length(col("name_a")), length(col("name_b"))))
      .select(col("name_a"), col("name_b"), col("noun"), col("dist"),
        col("score"), col("n_parts_a"), col("n_parts_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Squaring chain for integer powers of two — the pow()-free way both
    * engines evaluate sⁿ in EXACTLY the same operation order (libm pow
    * is not correctly rounded and differs across engines; n-1 chained
    * multiplies in a fixed association are bit-identical everywhere).
    */
  private def powChain(e: String, n: Int): String =
    if (n == 1) e else { val h = powChain(e, n / 2); s"(($h) * ($h))" }

  private val plannerSims = Seq(0.5, 0.6, 0.7, 0.8, 0.9, 0.95)
  private val plannerConfigs = Seq((8, 4), (16, 2), (4, 8), (32, 1))

  /** LSH banding planner — the design table behind [[minhashLsh]]'s
    * B=8×R=4 choice: for each candidate (bands, rows) layout sharing the
    * 32-hash budget, the probability 1 − (1 − s^r)^b that a pair of true
    * Jaccard similarity s becomes a candidate. Reading down a column
    * shows each layout's S-curve (more rows/band → sharper threshold,
    * higher miss rate below it; more bands → more false candidates).
    * Pure closed-form math — no corpus scan — but published as a
    * verified query because pipelines read THIS table to pick a layout,
    * and both engines must agree on it: every power is an unrolled
    * squaring chain ([[powChain]]), so no libm pow runs anywhere and the
    * probabilities hash-verify bit-for-bit.
    */
  def bandPlanner(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val branches = plannerConfigs.map { case (b, r) =>
      val sr = powChain("s", r)
      val p = s"1.0D - ${powChain(s"(1.0D - $sr)", b)}"
      plannerSims.toDF("s")
        .select(lit(b.toLong).as("b"), lit(r.toLong).as("r"), col("s"),
          expr(p).as("p_candidate"))
    }
    branches.reduce(_ unionByName _).orderBy(col("b"), col("r"), col("s"))
  }

  /** BLOCKED EDIT-DISTANCE near-dup detection — the classic record-linkage
    * move (Levenshtein) made corpus-scale-safe by prefix blocking: docs
    * are bucketed by their first 16 characters, and the quadratic
    * Levenshtein comparison runs only WITHIN a block, on a fixed 60-char
    * head (cost per pair is O(60²) regardless of doc length). Catches the
    * edit-level near-dups (one word swapped/typo'd near the head) that
    * hash-exact dedup misses and set-based Jaccard underweights, at a
    * tiny fraction of all-pairs cost. Spark side uses the thresholded
    * `levenshtein(a, b, 4)` form — the computation abandons a pair the
    * moment its distance provably exceeds the cut, so a block of wildly
    * different suffixes costs O(len·threshold), not O(len²).
    *
    * Scale shape: only (doc_id, 60-char head) shuffles — never the
    * document; block sizes are data-dependent, so a production run caps
    * them (count-then-filter, same discipline as the banded containment
    * path) — at the planted-dup corpus the largest block is ~3 docs.
    */
  def editBlocked(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), substring(col("text"), 1, 16).as("blk"),
        substring(col("text"), 1, 60).as("head"))
    docs.as("a").join(docs.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", levenshtein(col("a.head"), col("b.head"), 4))
      .filter(col("dist") >= 0 && col("dist") <= 4)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("dist").cast("long").as("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SHINGLE-SIZE PLANNING SWEEP — the third sketch-parameter study
    * (bands: [[bandPlanner]]; CMS widths: CountMinAgg) — measures, on
    * the caller's own corpus, how shingle length k separates true
    * near-dups from background pairs: small k inflates background
    * Jaccard (common word pairs collide), large k deflates dup Jaccard
    * (one edit kills k shingles). Candidate classes come from cheap
    * deterministic rules — prefix-blocked pairs (where the planted dups
    * live) vs consecutive-id background pairs — and per-pair Jaccard is
    * exact set algebra over the shingle arrays, in integer micro-units.
    * The number this reports (separation at each k) is what justifies
    * the pipeline's k=3 everywhere else.
    *
    * Scale: the sweep runs on CANDIDATE pairs only (bounded by the
    * blocking rules), never all-pairs; shingle arrays ride inside rows.
    * Raw shingle strings are fine at candidate scale — the production
    * dedup path hashes them to 60-bit longs before anything shuffles.
    */
  def shingleSweep(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
      .select(col("doc_id"), substring(col("text"), 1, 16).as("blk"),
        split(lower(col("text")), " ").as("ws"))
    val blocked = docs.as("a").join(docs.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(lit("blocked").as("pair_class"),
        col("a.doc_id").as("ia"), col("a.ws").as("wsa"),
        col("b.doc_id").as("ib"), col("b.ws").as("wsb"))
    val background = docs.as("a").join(docs.as("b"),
        col("a.doc_id") + 1 === col("b.doc_id")
          && col("a.blk") =!= col("b.blk")
          && col("a.doc_id") % 10 === 0)
      .select(lit("background").as("pair_class"),
        col("a.doc_id").as("ia"), col("a.ws").as("wsa"),
        col("b.doc_id").as("ib"), col("b.ws").as("wsb"))
    val pairs = blocked.unionByName(background)
    val perK = Seq(2, 3, 5).map { k =>
      def sh(c: String) =
        s"""array_distinct(transform(sequence(1, size($c) - $k + 1),
           |  i -> array_join(slice($c, i, $k), ' ')))""".stripMargin
      pairs
        .filter(size(col("wsa")) >= k && size(col("wsb")) >= k)
        .withColumn("sa", expr(sh("wsa")))
        .withColumn("sb", expr(sh("wsb")))
        .withColumn("j_micro", expr(
          """(size(array_intersect(sa, sb)) * 1000000L)
            |div size(array_union(sa, sb))""".stripMargin))
        .groupBy(lit(k).as("k"), col("pair_class"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(j_micro) div count(1)").as("mean_j_micro"),
          max(col("j_micro")).as("max_j_micro"))
    }
    perK.reduce(_ unionByName _).orderBy(col("k"), col("pair_class"))
  }

  private val CDC_K = 3   // rolling window (words) for the boundary test
  private val CDC_DIV = 8 // boundary divisor → mean chunk ≈ CDC_DIV words

  /** CONTENT-DEFINED CHUNKING dedup (the rsync/FastCDC/casync family,
    * at word grain): a chunk boundary falls AFTER position i wherever
    * the rolling K-word window hash ≡ 0 (mod D) — so boundaries are a
    * function of local CONTENT, not position, and an insertion near a
    * doc's head shifts NO boundary beyond the window it touches. That
    * shift-resistance is what fixed-width chunking ([[graft.ext.TextOps
    * .chunkDedup]]) fundamentally lacks: there, one inserted word
    * re-frames every later chunk and dedup finds nothing. Emits each
    * chunk fingerprint seen ≥ 2 times with its document reach,
    * occurrence count, and width — the storage-dedup ledger (and the
    * sub-document near-dup signal gram sets blur away).
    *
    * At 100 TB: boundaries and chunks are per-row array work inside
    * codegen (no shuffle); only 8-byte chunk fingerprints + widths
    * shuffle to the groupBy — chunk TEXT never travels, the dup-gram
    * wire discipline. Mean chunk width is the divisor D: the knob that
    * trades ledger size against dedup resolution.
    */
  /** The per-document chunking pass of [[cdcChunks]], factored over any
    * (doc_id, text) frame so the spec can prove shift-resistance on
    * hand-built twins. Returns (doc_id, h, lw) chunk rows.
    */
  def cdcChunkify(docs: DataFrame): DataFrame = {
    val gramHash = sparkHash(s"concat_ws(' ', slice(ws, i - ${CDC_K - 1}, $CDC_K))")
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("bs", expr(
        s"filter(transform(sequence(1, size(ws)), i -> " +
          s"CASE WHEN i >= $CDC_K AND i < size(ws) AND $gramHash % $CDC_DIV = 0 " +
          "THEN i END), x -> x IS NOT NULL)"))
      .withColumn("starts", expr("concat(array(1), transform(bs, b -> b + 1))"))
      .withColumn("ends", expr("concat(bs, array(size(ws)))"))
      .withColumn("j", explode(expr("sequence(1, size(starts))")))
      .select(col("doc_id"),
        expr("concat_ws(' ', slice(ws, element_at(starts, j), " +
          "element_at(ends, j) - element_at(starts, j) + 1))").as("chunk"),
        expr("CAST(element_at(ends, j) - element_at(starts, j) + 1 AS BIGINT)")
          .as("lw"))
      .select(col("doc_id"), expr(sparkHash("chunk")).as("h"), col("lw"))
  }

  def cdcChunks(s: SparkSession, d: String): DataFrame =
    cdcChunkify(Tables.documents(s, d))
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"), max(col("lw")).as("len_words"))
      .filter(col("n_occ") >= 2)
      .orderBy(col("h"))

  /** URL CANONICALIZATION dedup — the crawl-frontier normalizer that
    * runs BEFORE any content dedup (the same page fetched as
    * `HTTP://Host:80/p/?b=2&a=1#frag` and `http://host/p?a=1&b=2` would
    * otherwise be crawled, stored, and deduped twice at full content
    * cost): scheme/host lowercasing, default-port stripping (:80 for
    * http, :443 for https), fragment removal, trailing-slash
    * normalization, and query-parameter sorting — each a pure string
    * rewrite both engines express identically (split_part / regexp
    * anchors / array sort). The fixture mints four deterministic
    * variants per URL group, three of which must collapse (case, port,
    * fragment, slash, param order) while the https variant must NOT
    * (scheme changes identity). Emits the canonical-URL ledger with raw
    * variant counts.
    *
    * At 100 TB: canonicalization is per-row codegen string work; only
    * canonical keys shuffle to the groupBy — the frontier-dedup shape.
    */
  def urlCanonical(s: SparkSession, d: String): DataFrame = {
    val urls = Tables.documents(s, d)
      .select(col("doc_id"), expr("CAST(doc_id div 7 AS STRING)").as("k"))
      .select(col("doc_id"), expr(
        """CASE CAST(doc_id % 4 AS INT)
          |  WHEN 0 THEN concat('http://www.example.com/Docs/', k, '/page?a=1&b=2')
          |  WHEN 1 THEN concat('HTTP://WWW.EXAMPLE.COM:80/Docs/', k, '/page?b=2&a=1#sec')
          |  WHEN 2 THEN concat('http://www.example.com:80/Docs/', k, '/page/?a=1&b=2')
          |  ELSE concat('https://www.example.com/Docs/', k, '/page?a=1&b=2')
          |END""".stripMargin).as("url"))
    urls
      .withColumn("nofrag", expr("split_part(url, '#', 1)"))
      .withColumn("scheme", expr("lower(split_part(nofrag, '://', 1))"))
      .withColumn("rest", expr(
        "substr(nofrag, length(split_part(nofrag, '://', 1)) + 4)"))
      .withColumn("hostport", expr("lower(split_part(rest, '/', 1))"))
      .withColumn("host", expr(
        """CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
          |     WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
          |     ELSE hostport END""".stripMargin))
      .withColumn("pathq", expr(
        "CASE WHEN length(rest) = length(hostport) THEN '/' " +
          "ELSE substr(rest, length(hostport) + 1) END"))
      .withColumn("path", expr("split_part(pathq, '?', 1)"))
      .withColumn("path2", expr(
        "CASE WHEN path <> '/' THEN regexp_replace(path, '/$', '') ELSE path END"))
      .withColumn("q", expr(
        "CASE WHEN instr(pathq, '?') = 0 THEN '' " +
          "ELSE substr(pathq, instr(pathq, '?') + 1) END"))
      .withColumn("q2", expr(
        "CASE WHEN q = '' THEN '' " +
          "ELSE array_join(array_sort(split(q, '&')), '&') END"))
      .withColumn("canonical", expr(
        "concat(scheme, '://', host, path2, " +
          "CASE WHEN q2 <> '' THEN concat('?', q2) ELSE '' END)"))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_raw_variants"))
      .orderBy(col("canonical"))
  }

  /** PER-HOST CRAWL POLITENESS audit — the scheduling half the crawl
    * family (WARC parse → URL canonicalization → CDC chunking) was
    * missing: given a request log, simulate each REGISTERED DOMAIN's
    * token bucket (capacity 3 requests, refill one per crawl-delay) and
    * report how many requests the budget would have served vs rejected.
    * Host → registered domain is the one-label strip the
    * [[urlCanonical]] split discipline gives (a production crawler
    * swaps in the public-suffix list); the per-domain crawl delay is
    * derived from the domain itself, standing in for robots.txt
    * `Crawl-delay`.
    *
    * The bucket is an integer FOLD in millisecond credits — capacity
    * 3·delay, refill = elapsed ms, serve costs `delay`, a request that
    * finds < delay credits is a violation and consumes nothing. All
    * arithmetic is BIGINT ms, so Spark's `aggregate()` fold and the
    * oracle's recursive CTE replay the same trajectory exactly; the
    * result is also tie-order invariant (equal timestamps contribute
    * identical gap sequences in any order).
    *
    * At 100 TB: requests shuffle ONCE at registered-domain grain; the
    * fold is O(requests per domain) sequential inside the group —
    * politeness state is inherently per-domain-sequential, and a
    * production scheduler bounds the group by simulating per
    * (domain, day) window with carry-in credits. Hot domains are the
    * skew axis; the day split is the salting.
    */
  def crawlPoliteness(s: SparkSession, d: String): DataFrame = {
    val reqs = Tables.events(s, d)
      .select(col("user_id"), expr("unix_millis(ts)").as("t"))
      .select(expr(
        """concat(CASE CAST(user_id % 3 AS INT)
          |          WHEN 0 THEN 'www' WHEN 1 THEN 'img' ELSE 'api' END,
          |        '.domain', CAST(user_id % 8 AS STRING), '.com')""".stripMargin)
        .as("host"), col("t"))
      .withColumn("reg_domain", expr("substr(host, instr(host, '.') + 1)"))
      .withColumn("delay_ms", expr(
        "CAST(600000 * (1 + CAST(regexp_replace(reg_domain, '[^0-9]', '') " +
          "AS BIGINT) % 5) AS BIGINT)"))
    crawlPolitenessOf(reqs, PolitenessSessionCap)
  }

  /** Documented bound on a single busy session's request count. A domain
    * whose traffic never pauses ≥ 3·delay (one unbounded session) is a
    * scheduler-design problem, not a fold-shape problem — the plan fails
    * LOUDLY (assert_true) instead of silently collecting an unbounded
    * array; shard such a domain upstream or raise the cap knowingly.
    */
  private[graft] val PolitenessSessionCap = 1 << 20

  /** The politeness simulation over an arbitrary (host, reg_domain,
    * delay_ms, t) request frame — SESSIONIZED so hot-domain state is
    * bounded (the r14 verdict's ask): a token bucket with cap 3·delay
    * provably REFILLS TO FULL across any idle gap ≥ 3·delay (refill =
    * min(cap, credits + gap) = cap whenever gap ≥ cap, for any credits ≥
    * 0), so the per-domain stream decomposes EXACTLY at those gaps —
    * each busy session folds independently from the full-bucket initial
    * state and violation counts simply add. Nothing approximate: the
    * output is bit-identical to the single-fold form (the oracle is
    * unchanged), but the collected array is now bounded by the longest
    * BUSY session instead of the domain's lifetime request count.
    *
    * Plumbing: session boundaries come from a lag + running-count window
    * at domain grain — sort-based, spillable, the right tool for
    * per-key ordering at scale (the thing a collect-then-sort single row
    * is not); the session groupBy and the domain rollup both reuse the
    * window's hash partitioning, so the whole chain still costs ONE
    * domain-grain exchange (PlanSpec pins it). Sessions above
    * [[PolitenessSessionCap]] fail the plan loudly.
    */
  private[graft] def crawlPolitenessOf(reqs: DataFrame,
      sessionCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = "3 * delay_ms"
    val refill = s"least($cap, acc.credits + (t - acc.last))"
    val w = Window.partitionBy(col("reg_domain")).orderBy(col("t"))
    val perSession = reqs
      .withColumn("gap", col("t") - lag(col("t"), 1).over(w))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") >= expr(cap), 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("reg_domain"), col("delay_ms"), col("sess"))
      // collect_set, not countDistinct: distinct-count planning expands
      // into a second (domain, host)-grain shuffle; the host set is ≤3
      // by construction, so one grouped pass carries it for free
      .agg(sort_array(collect_list(col("t"))).as("tss"),
        collect_set(col("host")).as("hosts"))
      .withColumn("viol", expr(
        s"""aggregate(tss,
           |  struct(CAST($cap AS BIGINT) AS credits,
           |         element_at(tss, 1) AS last,
           |         CAST(0 AS BIGINT) AS viol),
           |  (acc, t) -> struct(
           |    CASE WHEN $refill >= delay_ms THEN $refill - delay_ms
           |         ELSE $refill END AS credits,
           |    t AS last,
           |    acc.viol + CASE WHEN $refill >= delay_ms
           |      THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS viol),
           |  acc -> acc.viol)
           |+ CASE WHEN size(tss) <= $sessionCap THEN CAST(0 AS BIGINT)
           |       ELSE CAST(raise_error(concat(
           |         'politeness: busy session of ', CAST(size(tss) AS STRING),
           |         ' requests on ', reg_domain,
           |         ' exceeds the documented cap $sessionCap',
           |         ' — shard the domain or raise the cap')) AS BIGINT)
           |  END""".stripMargin))
    perSession.groupBy(col("reg_domain"), col("delay_ms"))
      .agg(sum(col("viol")).as("viol"),
        sum(expr("CAST(size(tss) AS BIGINT)")).as("n_requests"),
        min(expr("element_at(tss, 1)")).as("t0"),
        max(expr("element_at(tss, -1)")).as("t1"),
        expr(
          "CAST(size(array_distinct(flatten(collect_list(hosts)))) AS BIGINT)")
          .as("n_hosts"))
      .select(col("reg_domain"), col("delay_ms"), col("n_hosts"),
        col("n_requests"),
        (col("n_requests") - col("viol")).as("n_served"),
        col("viol").as("n_violations"),
        (col("t1") - col("t0")).as("span_ms"))
      .orderBy(col("reg_domain"))
  }

  /** ROBOTS.TXT RULE MATCHING (RFC 9309 / Google REP) — the admission
    * check between the frontier ([[urlCanonical]]) and the scheduler
    * ([[crawlPoliteness]]): per-domain robots.txt files are synthesized
    * as real `User-agent / Disallow / Allow` line protocol, PARSED back
    * line-by-line (split, prefix-strip — nothing consumed from the
    * generator side), and every candidate URL path is matched under the
    * standard's precedence: the LONGEST matching rule wins, Allow beats
    * Disallow at equal length, no match ⇒ allowed. The report counts
    * per (domain, verdict, winning rule) so a crawl operator can see
    * exactly which rule eats which share of the frontier.
    *
    * At 100 TB: rule sets are per-domain KBs (broadcast side);
    * frontier URLs stream partitioned and join rules on domain —
    * prefix match and argmax-by-length are per-row codegen; one
    * shuffle at (domain, rule) grain for the report.
    */
  def robotsRules(s: SparkSession, d: String): DataFrame = {
    val nl = "\n"
    // per-domain robots.txt: one disallowed subtree, one re-allowed
    // child, one disallowed file pattern — the shape real sites ship
    val robots = Tables.documents(s, d)
      .select(expr("doc_id % 8").as("dom")).distinct()
      .withColumn("txt", expr(
        s"""concat('User-agent: *', '$nl',
           |  'Disallow: /private', '$nl',
           |  'Allow: /private/pub', CAST(dom AS STRING), '$nl',
           |  'Disallow: /tmp', CAST(dom AS STRING), '/', '$nl',
           |  'Allow: ', '$nl')""".stripMargin))
    val rules = robots
      .select(col("dom"), posexplode(split(col("txt"), nl)).as(Seq("ln", "line")))
      .filter(col("line").startsWith("Disallow: ") || col("line").startsWith("Allow: "))
      .select(col("dom"),
        expr("split_part(line, ': ', 1)").as("verdict"),
        expr("split_part(line, ': ', 2)").as("prefix"))
      .filter(col("prefix") =!= "") // empty pattern matches nothing (REP)
    val urls = Tables.documents(s, d)
      .select(col("doc_id"), expr("doc_id % 8").as("dom"),
        expr("""CASE CAST(doc_id % 5 AS INT)
            |  WHEN 0 THEN concat('/private/pub', CAST(doc_id % 8 AS STRING), '/a')
            |  WHEN 1 THEN concat('/private/x', CAST(doc_id AS STRING))
            |  WHEN 2 THEN concat('/tmp', CAST(doc_id % 8 AS STRING), '/f')
            |  WHEN 3 THEN concat('/public/', CAST(doc_id AS STRING))
            |  ELSE '/'
            |END""".stripMargin).as("path"))
    val cand = urls.join(rules, Seq("dom"))
      .filter(expr("substr(path, 1, length(prefix)) = prefix"))
    val won = cand
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("dom"), col("doc_id"))
          .orderBy(expr("length(prefix)").desc,
            // 'Allow' < 'Disallow' lexically — Allow wins length ties (REP)
            col("verdict"), col("prefix"))))
      .filter(col("rk") === 1)
      .select(col("dom"), col("doc_id"),
        when(col("verdict") === "Allow", lit("allow")).otherwise(lit("block"))
          .as("decision"),
        concat(col("verdict"), lit(" "), col("prefix")).as("rule"))
    // URLs no rule matches are allowed by default (RFC 9309 §2.2.2)
    val defaults = urls
      .join(won.select(col("dom"), col("doc_id")), Seq("dom", "doc_id"),
        "left_anti")
      .select(col("dom"), col("doc_id"),
        lit("allow").as("decision"), lit("(default)").as("rule"))
    won.unionByName(defaults)
      .groupBy(col("dom"), col("decision"), col("rule"))
      .agg(count(lit(1)).as("n_urls"))
      .orderBy(col("dom"), col("decision"), col("rule"))
  }

  /** SITEMAP.XML PARSING — the crawl DISCOVERY leg between
    * [[robotsRules]] (admission) and [[urlCanonical]] (frontier):
    * per-domain sitemaps are synthesized as real
    * `<urlset><url><loc/><lastmod/><priority/></url>…</urlset>` XML and
    * parsed back FROM THE DOCUMENT ALONE — `<url>` blocks via a
    * non-greedy regexp_extract_all (lazy quantifiers work identically
    * in Java regex and RE2), fields via anchored group extracts,
    * priority decoded to an exact integer percentage. The per-domain
    * report carries URL counts, host-consistency checks, the lastmod
    * range, mean priority, and an order-canonical md5 fingerprint of
    * the URL set — what a crawl scheduler diffs between fetches to
    * detect sitemap churn.
    *
    * At 100 TB: sitemap documents are per-domain KBs; parsing is
    * per-row codegen regex; one shuffle at domain grain for the report
    * (the fingerprint collects only `loc` strings, never documents).
    */
  def sitemapParse(s: SparkSession, d: String): DataFrame = {
    val entries = Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), expr("doc_id % 8").as("dom"))
      .withColumn("entry", expr(
        """concat('<url><loc>https://domain', CAST(dom AS STRING), '.com/p/',
          |  CAST(doc_id AS STRING), '</loc><lastmod>2024-01-',
          |  lpad(CAST(2 + doc_id % 27 AS STRING), 2, '0'),
          |  '</lastmod><priority>0.', CAST(1 + doc_id % 9 AS STRING),
          |  '</priority></url>')""".stripMargin))
    val sitemaps = entries.groupBy(col("dom"))
      .agg(concat(lit("<?xml version=\"1.0\"?><urlset>"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(doc_id, entry))), x -> x.entry), '')"),
        lit("</urlset>")).as("xml"))
    // parse side: everything below reads only `xml`
    sitemaps
      .select(col("dom"), col("xml"),
        explode(expr("regexp_extract_all(xml, '<url>(.*?)</url>', 1)")).as("u"))
      .select(col("dom"),
        expr("regexp_extract(u, '<loc>([^<]*)</loc>', 1)").as("loc"),
        expr("regexp_extract(u, '<lastmod>([^<]*)</lastmod>', 1)").as("lastmod"),
        expr("CAST(split_part(regexp_extract(u, " +
          "'<priority>([^<]*)</priority>', 1), '.', 2) AS BIGINT) * 10")
          .as("prio_pct"))
      .groupBy(col("dom"))
      .agg(count(lit(1)).as("n_urls"),
        sum(expr(
          "CAST(substr(loc, 1, instr(loc, '/p/') - 1) = " +
            "concat('https://domain', CAST(dom AS STRING), '.com') AS BIGINT)"))
          .as("n_host_ok"),
        min(col("lastmod")).as("lastmod_min"),
        max(col("lastmod")).as("lastmod_max"),
        expr("sum(prio_pct) div count(1)").as("prio_mean_pct"),
        md5(expr("array_join(sort_array(collect_list(loc)), '|')"))
          .as("urlset_md5"))
      .orderBy(col("dom"))
  }

  /** REDIRECT-CYCLE DETECTION BY POINTER DOUBLING — the crawl-frontier
    * hygiene pass that finds HTTP-redirect loops (A→B→…→A chains a
    * fetcher would spin on) and, for every page, the loop its redirect
    * chain terminates in. Each page has exactly ONE redirect target, so
    * the page set under "follow the redirect" is a FUNCTIONAL GRAPH:
    * disjoint ρ-shapes — trees (redirect chains) hanging off cycles
    * (loops). Here the successor is the deterministic quadratic map
    * r → (r² + 17) mod n over the ranked page domain (the Pollard-rho
    * shape: realistic tail/cycle mixture), derived from `documents`.
    *
    * The algorithm is K=12 rounds of POINTER DOUBLING — the classic
    * list-ranking primitive (Wyllie '79), new in this repo next to
    * `dd_components`' O(log n) star-contraction: each round composes the
    * successor with itself (succ ← succ∘succ) while folding the minimum
    * rank seen along the traversed prefix (pmin ← min(pmin, pmin∘succ)),
    * so after K rounds succ = f^(2^K) and pmin = min over the first 2^K
    * orbit nodes. With 2^K = 4096 ≥ n (the page domain is capped at
    * 4096 by construction):
    *  - f^(2^K)(v) is always ON the cycle (any tail is shorter than n),
    *    and a node is cyclic IFF it is in the IMAGE of f^(2^K) — a tail
    *    node at depth d would need a preimage at depth d + 2^K > n;
    *  - pmin evaluated AT f^(2^K)(v) is the minimum over a full lap of
    *    the cycle — a canonical cycle id every member agrees on.
    * Report: one row per loop with its length, attached-tail mass
    * (pages whose chains drain into it), and basin total.
    *
    * At 100 TB (billions of URLs): each doubling round is ONE keyed
    * equi-join carrying 3 BIGINTs per node — log₂(diameter) rounds
    * total, vs. diameter rounds for naive frontier walking; state never
    * grows (contrast transitive-closure squaring, which explodes the
    * relation). The per-round localCheckpoint is the same
    * materialization discipline a cluster job would use to stop plan
    * blowup on iterated self-joins.
    */
  def redirectCycles(s: SparkSession, d: String): DataFrame = {
    val pages = Tables.documents(s, d)
      .select(expr("doc_id % 4096").as("pid")).distinct()
    val n1 = pages.agg(count(lit(1)).as("n"))
    val rk = pages
      .withColumn("r", expr("CAST(row_number() OVER (ORDER BY pid) - 1 AS BIGINT)"))
      .crossJoin(broadcast(n1))
      .localCheckpoint() // rank domain: read by t0 and the final report
    var t = rk.select(col("r").as("node"), expr("(r * r + 17) % n").as("succ"),
      col("r").as("pmin"))
    for (_ <- 1 to 12) {
      t = t.as("a")
        .join(t.select(col("node").as("s2"), col("succ").as("succ_n"),
          col("pmin").as("pmin_n")), col("a.succ") === col("s2"))
        .select(col("node"), col("succ_n").as("succ"),
          least(col("pmin"), col("pmin_n")).as("pmin"))
        .localCheckpoint() // stop 2^k plan blowup on the self-join
    }
    val cyc = t.select(col("succ").as("node")).distinct()
      .withColumn("is_c", lit(1L))
    val labeled = t.as("v")
      .join(t.select(col("node").as("s2"), col("pmin").as("cycle_rank")),
        col("v.succ") === col("s2"))
      .join(cyc, Seq("node"), "left").na.fill(0L, Seq("is_c"))
    labeled.groupBy(col("cycle_rank"))
      .agg(sum(col("is_c")).as("cycle_len"),
        sum(lit(1L) - col("is_c")).as("n_tail"))
      .join(rk.select(col("r").as("cycle_rank"), col("pid").as("cycle_pid")),
        Seq("cycle_rank"))
      .crossJoin(broadcast(n1.select(col("n").as("n_pages"))))
      .select(col("cycle_pid"), col("cycle_len"), col("n_tail"),
        (col("cycle_len") + col("n_tail")).as("basin"), col("n_pages"))
      .orderBy(desc("basin"), col("cycle_pid"))
  }

  /** OPIC FRONTIER PRIORITIZATION (Abiteboul et al., WWW'03 — "Adaptive
    * On-Line Page Importance Computation") — the crawl scheduler's
    * "what to fetch next", completing the family whose other legs
    * answer "may I" ([[robotsRules]]) and "how fast" ([[crawlPoliteness]]):
    * every host starts with equal CASH; a fetch banks the host's cash
    * into its HISTORY and redistributes it across out-links
    * proportionally to link weight; importance ≈ history + cash, and
    * the frontier is drained in that priority order. Unlike PageRank
    * (ExtraOps.pagerank — offline, normalized, iterate-to-convergence),
    * OPIC is ONLINE: cash is conserved, never normalized, and the
    * estimate is usable after any prefix of fetches — why crawlers use
    * it. Three synchronous fetch rounds here, host-grain, with
    * link weights from page counts.
    *
    * Integer-exact: cash/history are micro-units; each edge carries
    * cash·w DIV W (truncating), and the truncation REMAINDER stays at
    * the host — cash conservation holds exactly, so the DuckDB replay
    * is bit-identical and the total (64·10⁹) is auditable at any round.
    *
    * At 100 TB: page→host collapse is one map-side-combined rollup; each
    * round is one keyed join of host-grain cash against the host-graph
    * edge list (both tiny relative to the corpus) — the corpus is
    * touched exactly once, the iteration runs on the registered-domain
    * grain, same as every crawl-side operator in this family.
    */
  def frontierOpic(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val w = docs
      .select(expr("doc_id % 64").as("h"),
        expr("(doc_id div 64 * 7 + 3 + doc_id % 5) % 64").as("t"))
      .filter(col("h") =!= col("t"))
      .groupBy(col("h"), col("t")).agg(count(lit(1)).as("lw"))
      .localCheckpoint() // the host graph: read by every round twice
    val wh = w.groupBy(col("h").as("host")).agg(sum(col("lw")).as("wtot"))
    val nd = docs.select(expr("doc_id % 64").as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("n_pages"))
      .join(wh, Seq("host"), "left").na.fill(0L, Seq("wtot"))
    var st = nd.withColumn("cash", lit(1000000000L))
      .withColumn("hist", lit(0L))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val flows = st.join(w, st("host") === w("h"))
        .select(col("t"), col("h"), expr("cash * lw DIV wtot").as("f"))
        .localCheckpoint() // reused: inflow by target, outflow by source
      val inflow = flows.groupBy(col("t").as("host"))
        .agg(sum(col("f")).as("inf"))
      val outflow = flows.groupBy(col("h").as("host"))
        .agg(sum(col("f")).as("outf"))
      st = st
        .join(inflow, Seq("host"), "left").na.fill(0L, Seq("inf"))
        .join(outflow, Seq("host"), "left").na.fill(0L, Seq("outf"))
        .withColumn("hist2", col("hist") + col("cash"))
        // truncation remainder (cash − outf) stays home: conservation
        .withColumn("cash2", col("inf") + col("cash") - col("outf"))
        .select(col("host"), col("n_pages"), col("wtot"),
          col("cash2").as("cash"), col("hist2").as("hist"))
        .localCheckpoint()
    }
    st.select(col("host"), col("n_pages"), col("wtot").as("w_out"),
      col("hist").as("history_micro"), col("cash").as("cash_micro"),
      (col("hist") + col("cash")).as("priority"))
      .orderBy(desc("priority"), col("host"))
  }

  /** FELLEGI-SUNTER PROBABILISTIC RECORD LINKAGE — the decision-theoretic
    * layer above [[recordLinkage]]'s deterministic rules (Fellegi &
    * Sunter 1969, the model under Splink/dedupe.io): each blocked
    * candidate pair gets a comparison vector γ = (name within 2
    * edits, brand equal, type equal); every field contributes
    * lg(m/u) bits when it agrees and lg((1−m)/(1−u)) when it disagrees
    * (m = P(agree | match), u = P(agree | non-match)), and the summed
    * log-likelihood ratio classifies the pair. The fixture PLANTS
    * ground truth — every 10th record gets a twin with a last-character
    * name perturbation and controlled brand/type noise — so m is
    * estimated on the planted matches, u on the blocked non-matches
    * (the comparison space, standard practice), both Laplace-smoothed,
    * and the report at PATTERN grain (2³ rows) carries pair counts,
    * true-match counts, the fixed-point score, and the decision — the
    * operator audits its own confusion structure.
    *
    * All weights are [[FixLog]] fixed-point bits of integer-count
    * ratios (lg(n+1) − lg(d+2) differences), so the DuckDB oracle
    * replays estimation, scoring, and classification bit-identically —
    * an EM-free FS that is exactly the E-step scoring every EM round
    * performs.
    *
    * At 100 TB: blocking bounds the pair space (the [[recordLinkage]]
    * discipline); parameter estimation is ONE map-side-combined rollup
    * of the pair frame to a 1-row counts frame; scoring joins pairs to
    * broadcast weights — never a second pass over records.
    */
  def fellegiSunter(s: SparkSession, d: String): DataFrame = {
    val base = Tables.part(s, d).filter(col("p_partkey") <= 4000)
      .select(col("p_partkey").as("id"), lower(col("p_name")).as("name"),
        col("p_brand").as("brand"), col("p_type").as("typ"))
    val twins = base.filter(col("id") % 10 === 0)
      .select((col("id") + 100000).as("id"),
        expr("concat(substr(name, 1, length(name) - 1), 'x')").as("name"),
        when(col("id") % 30 === 0, lit("Brand#99")).otherwise(col("brand"))
          .as("brand"),
        when(col("id") % 20 === 0, lit("PERTURBED")).otherwise(col("typ"))
          .as("typ"))
    // block on the FIRST name word: the twin's last-character edit never
    // touches it, and unrelated same-block parts differ in the other
    // four words (edit distance >> 2) — a discriminative comparator
    val univ = base.unionByName(twins)
      .withColumn("blk", expr("split_part(name, ' ', 1)"))
      .localCheckpoint() // both sides of the blocked self-join
    val pairs = univ.select(col("blk"), col("id").as("id_a"),
        col("name").as("name_a"), col("brand").as("brand_a"),
        col("typ").as("typ_a"))
      .join(univ.select(col("blk"), col("id").as("id_b"),
        col("name").as("name_b"), col("brand").as("brand_b"),
        col("typ").as("typ_b")), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(
        (levenshtein(col("name_a"), col("name_b")) <= 2).as("g1"),
        (col("brand_a") === col("brand_b")).as("g2"),
        (col("typ_a") === col("typ_b")).as("g3"),
        (col("id_b") - col("id_a") === 100000).as("is_match"))
      .localCheckpoint() // read by estimation AND by the pattern report
    val counts = pairs.agg(
      sum(when(col("is_match"), 1L).otherwise(0L)).as("md"),
      sum(when(!col("is_match"), 1L).otherwise(0L)).as("ud"),
      sum(when(col("is_match") && col("g1"), 1L).otherwise(0L)).as("m1"),
      sum(when(col("is_match") && col("g2"), 1L).otherwise(0L)).as("m2"),
      sum(when(col("is_match") && col("g3"), 1L).otherwise(0L)).as("m3"),
      sum(when(!col("is_match") && col("g1"), 1L).otherwise(0L)).as("u1"),
      sum(when(!col("is_match") && col("g2"), 1L).otherwise(0L)).as("u2"),
      sum(when(!col("is_match") && col("g3"), 1L).otherwise(0L)).as("u3"))
    def lg(e: String) = FixLog.lgS(s"CAST($e AS BIGINT)")
    def wA(k: Int) =
      s"(${lg(s"m$k + 1")}) - (${lg("md + 2")}) - (${lg(s"u$k + 1")}) + (${lg("ud + 2")})"
    def wD(k: Int) =
      s"(${lg(s"md - m$k + 1")}) - (${lg("md + 2")}) - (${lg(s"ud - u$k + 1")}) + (${lg("ud + 2")})"
    val weights = counts.select(
      expr(wA(1)).as("wa1"), expr(wD(1)).as("wd1"),
      expr(wA(2)).as("wa2"), expr(wD(2)).as("wd2"),
      expr(wA(3)).as("wa3"), expr(wD(3)).as("wd3"))
    pairs.groupBy(col("g1"), col("g2"), col("g3"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_true_match"))
      .crossJoin(broadcast(weights)) // 1-row trained model
      .withColumn("score_fp", expr(
        "IF(g1, wa1, wd1) + IF(g2, wa2, wd2) + IF(g3, wa3, wd3)"))
      .withColumn("decision", col("score_fp") > 0)
      .select(col("g1"), col("g2"), col("g3"), col("n_pairs"),
        col("n_true_match"), col("score_fp"), col("decision"))
      .orderBy(col("g1"), col("g2"), col("g3"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_fellegi_sunter" -> fellegiSunter,
    "dd_frontier_opic" -> frontierOpic,
    "dd_redirect_cycles" -> redirectCycles,
    "dd_sitemap_parse" -> sitemapParse,
    "dd_robots_rules" -> robotsRules,
    "dd_crawl_politeness" -> crawlPoliteness,
    "dd_url_canonical" -> urlCanonical,
    "dd_cdc_chunks" -> cdcChunks,
    "dd_shingle_sweep" -> shingleSweep,
    "dd_edit_blocked" -> editBlocked,
    "dd_band_planner" -> bandPlanner,
    "dd_record_linkage" -> recordLinkage,
    "dd_minhash_accuracy" -> minhashAccuracy,
    "dd_band_stats" -> bandStats,
    "dd_contamination" -> contamination,
    "dd_contamination_ngram" -> ngramContamination,
    "dd_decontam_splice" -> decontamSplice,
    "dd_exact" -> exactDedup,
    "pipe_dedup_impact" -> dedupImpact,
    "dd_ngram_jaccard" -> ngramJaccard,
    "dd_containment" -> containment,
    "dd_containment_banded" -> containmentBanded,
    "dd_minhash_lsh" -> minhashLsh,
    "dd_dup_sources" -> dupSources,
    "dd_simhash" -> simhash,
    "dd_components" -> components,
    "dd_components_stars" -> componentsStars,
    "dd_component_sizes" -> componentSizes,
    "dd_canonical" -> canonical,
    "dd_snapshot_diff" -> snapshotDiff,
    "dd_incremental" -> incremental
  )

  /** DuckDB CTE builders parameterized by source relation, so the
    * incremental oracle can run the identical shingle/sign/band pipeline
    * on each side of the seen/new split.
    */
  private[graft] def shingCteFor(src: String, out: String): String =
    s"""$out AS (
       |  SELECT doc_id,
       |         list_distinct([${duckHash("sh")} for sh in
       |           list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)])]) AS shashes
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM $src)
       |  WHERE len(ws) >= 3)""".stripMargin

  private[graft] def sigCteFor(src: String, out: String): String =
    s"""$out AS (
       |  SELECT doc_id, shashes,
       |    [list_reduce(
       |       list_prepend(9223372036854775807::BIGINT,
       |         [((2*i + 1) * (h % $M40) + i * 2654435761) % $M40 for h in shashes]),
       |       (a, x) -> least(a, x)) for i in range(0, $K)] AS sig
       |  FROM $src)""".stripMargin

  private[graft] def bandCteFor(src: String, out: String): String =
    s"""$out AS (
       |  SELECT doc_id, shashes, b,
       |    ${duckHash(s"CAST(b AS VARCHAR) || '|' || array_to_string([CAST(v AS VARCHAR) for v in sig[b*$R+1:b*$R+$R]], ',')")} AS bh
       |  FROM $src CROSS JOIN (SELECT unnest(range(0, $B)) AS b))""".stripMargin

  private val shingCte = shingCteFor("documents", "shing")

  val oracle: Map[String, String] = Map(
    "dd_fellegi_sunter" -> {
      def lg(e: String) = FixLog.lgD(s"CAST($e AS BIGINT)")
      def wA(k: Int) =
        s"(${lg(s"m$k + 1")}) - (${lg("md + 2")}) - (${lg(s"u$k + 1")}) + (${lg("ud + 2")})"
      def wD(k: Int) =
        s"(${lg(s"md - m$k + 1")}) - (${lg("md + 2")}) - (${lg(s"ud - u$k + 1")}) + (${lg("ud + 2")})"
      s"""WITH base AS (
         |  SELECT p_partkey AS id, lower(p_name) AS name,
         |         p_brand AS brand, p_type AS typ
         |  FROM part WHERE p_partkey <= 4000),
         |twins AS (
         |  SELECT id + 100000 AS id,
         |         substr(name, 1, CAST(length(name) - 1 AS INT)) || 'x' AS name,
         |         CASE WHEN id % 30 = 0 THEN 'Brand#99' ELSE brand END AS brand,
         |         CASE WHEN id % 20 = 0 THEN 'PERTURBED' ELSE typ END AS typ
         |  FROM base WHERE id % 10 = 0),
         |univ AS (
         |  SELECT *, split_part(name, ' ', 1) AS blk FROM (
         |    SELECT * FROM base UNION ALL SELECT * FROM twins)),
         |pairs AS MATERIALIZED (
         |  SELECT levenshtein(a.name, b.name) <= 2 AS g1,
         |         a.brand = b.brand AS g2, a.typ = b.typ AS g3,
         |         b.id - a.id = 100000 AS is_match
         |  FROM univ a JOIN univ b ON a.blk = b.blk AND a.id < b.id),
         |counts AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS md,
         |    CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS ud,
         |    CAST(SUM(CASE WHEN is_match AND g1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
         |    CAST(SUM(CASE WHEN is_match AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
         |    CAST(SUM(CASE WHEN is_match AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS m3,
         |    CAST(SUM(CASE WHEN NOT is_match AND g1 THEN 1 ELSE 0 END) AS BIGINT) AS u1,
         |    CAST(SUM(CASE WHEN NOT is_match AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS u2,
         |    CAST(SUM(CASE WHEN NOT is_match AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS u3
         |  FROM pairs),
         |weights AS (
         |  SELECT ${wA(1)} AS wa1, ${wD(1)} AS wd1,
         |         ${wA(2)} AS wa2, ${wD(2)} AS wd2,
         |         ${wA(3)} AS wa3, ${wD(3)} AS wd3
         |  FROM counts),
         |pat AS (
         |  SELECT g1, g2, g3, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |         CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_true_match
         |  FROM pairs GROUP BY g1, g2, g3)
         |SELECT g1, g2, g3, n_pairs, n_true_match,
         |       CAST(CASE WHEN g1 THEN wa1 ELSE wd1 END
         |          + CASE WHEN g2 THEN wa2 ELSE wd2 END
         |          + CASE WHEN g3 THEN wa3 ELSE wd3 END AS BIGINT) AS score_fp,
         |       (CASE WHEN g1 THEN wa1 ELSE wd1 END
         |          + CASE WHEN g2 THEN wa2 ELSE wd2 END
         |          + CASE WHEN g3 THEN wa3 ELSE wd3 END) > 0 AS decision
         |FROM pat CROSS JOIN weights ORDER BY g1, g2, g3""".stripMargin
    },
    "dd_frontier_opic" -> {
      def round(prev: String, out: String): String =
        s"""$out AS MATERIALIZED (
           |  SELECT p.host, p.n_pages, p.wtot,
           |         COALESCE(i.inf, 0) + p.cash - COALESCE(o.outf, 0) AS cash,
           |         p.hist + p.cash AS hist
           |  FROM $prev p
           |  LEFT JOIN (SELECT w.t AS host, SUM(p2.cash * w.lw // p2.wtot) AS inf
           |             FROM $prev p2 JOIN w ON w.h = p2.host
           |             GROUP BY w.t) i USING (host)
           |  LEFT JOIN (SELECT w.h AS host, SUM(p2.cash * w.lw // p2.wtot) AS outf
           |             FROM $prev p2 JOIN w ON w.h = p2.host
           |             GROUP BY w.h) o USING (host))""".stripMargin
      s"""WITH l2 AS (
         |  SELECT doc_id % 64 AS h,
         |         (doc_id // 64 * 7 + 3 + doc_id % 5) % 64 AS t
         |  FROM documents),
         |w AS MATERIALIZED (
         |  SELECT h, t, CAST(COUNT(*) AS BIGINT) AS lw
         |  FROM l2 WHERE h <> t GROUP BY h, t),
         |wh AS (SELECT h AS host, CAST(SUM(lw) AS BIGINT) AS wtot
         |       FROM w GROUP BY h),
         |nd AS (
         |  SELECT hosts.host, hosts.n_pages, COALESCE(wh.wtot, 0) AS wtot
         |  FROM (SELECT doc_id % 64 AS host,
         |               CAST(COUNT(*) AS BIGINT) AS n_pages
         |        FROM documents GROUP BY 1) hosts
         |  LEFT JOIN wh USING (host)),
         |s0 AS MATERIALIZED (
         |  SELECT host, n_pages, wtot, CAST(1000000000 AS BIGINT) AS cash,
         |         CAST(0 AS BIGINT) AS hist
         |  FROM nd),
         |${round("s0", "s1")},
         |${round("s1", "s2")},
         |${round("s2", "s3")}
         |SELECT host, n_pages, wtot AS w_out,
         |       CAST(hist AS BIGINT) AS history_micro,
         |       CAST(cash AS BIGINT) AS cash_micro,
         |       CAST(hist + cash AS BIGINT) AS priority
         |FROM s3 ORDER BY priority DESC, host""".stripMargin
    },
    "dd_redirect_cycles" -> {
      // MATERIALIZED is load-bearing: each doubling round references its
      // predecessor twice, and DuckDB inlines plain CTEs — 12 rounds
      // would inline t0 (and its parquet scan) 2^12 times.
      def dbl(prev: String, out: String): String =
        s"""$out AS MATERIALIZED (SELECT a.node, b.succ, LEAST(a.pmin, b.pmin) AS pmin
           |FROM $prev a JOIN $prev b ON a.succ = b.node)""".stripMargin
      val rounds = (1 to 12)
        .map(k => dbl(s"t${k - 1}", s"t$k")).mkString(",\n")
      s"""WITH pages AS MATERIALIZED (SELECT DISTINCT doc_id % 4096 AS pid FROM documents),
         |rk AS MATERIALIZED (SELECT pid,
         |         CAST(row_number() OVER (ORDER BY pid) - 1 AS BIGINT) AS r,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM pages) AS n
         |       FROM pages),
         |t0 AS MATERIALIZED (SELECT r AS node, (r * r + 17) % n AS succ, r AS pmin FROM rk),
         |$rounds,
         |cyc AS MATERIALIZED (SELECT DISTINCT succ AS node FROM t12),
         |lab AS (
         |  SELECT v.node, b.pmin AS cycle_rank,
         |    CASE WHEN cyc.node IS NULL THEN 0 ELSE 1 END AS is_c
         |  FROM t12 v JOIN t12 b ON v.succ = b.node
         |  LEFT JOIN cyc ON cyc.node = v.node)
         |SELECT rk.pid AS cycle_pid,
         |       CAST(SUM(is_c) AS BIGINT) AS cycle_len,
         |       CAST(SUM(1 - is_c) AS BIGINT) AS n_tail,
         |       CAST(SUM(is_c) + SUM(1 - is_c) AS BIGINT) AS basin,
         |       CAST(MAX(rk.n) AS BIGINT) AS n_pages
         |FROM lab JOIN rk ON rk.r = lab.cycle_rank
         |GROUP BY rk.pid
         |ORDER BY basin DESC, cycle_pid""".stripMargin
    },
    "dd_sitemap_parse" ->
      """WITH e AS (
        |  SELECT doc_id, doc_id % 8 AS dom,
        |    '<url><loc>https://domain' || CAST(doc_id % 8 AS VARCHAR) ||
        |    '.com/p/' || CAST(doc_id AS VARCHAR) ||
        |    '</loc><lastmod>2024-01-' ||
        |    lpad(CAST(2 + doc_id % 27 AS VARCHAR), 2, '0') ||
        |    '</lastmod><priority>0.' || CAST(1 + doc_id % 9 AS VARCHAR) ||
        |    '</priority></url>' AS entry
        |  FROM documents WHERE doc_id % 3 = 0),
        |sm AS (
        |  SELECT dom,
        |    '<?xml version="1.0"?><urlset>' ||
        |    string_agg(entry, '' ORDER BY doc_id) || '</urlset>' AS xml
        |  FROM e GROUP BY 1),
        |u AS (
        |  SELECT dom,
        |    unnest(regexp_extract_all(xml, '<url>(.*?)</url>', 1)) AS b
        |  FROM sm),
        |f AS (
        |  SELECT dom,
        |    regexp_extract(b, '<loc>([^<]*)</loc>', 1) AS loc,
        |    regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod,
        |    CAST(split_part(regexp_extract(b, '<priority>([^<]*)</priority>', 1),
        |      '.', 2) AS BIGINT) * 10 AS prio_pct
        |  FROM u)
        |SELECT dom, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |  CAST(SUM(CASE WHEN substr(loc, 1, position('/p/' IN loc) - 1) =
        |    'https://domain' || CAST(dom AS VARCHAR) || '.com'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_host_ok,
        |  min(lastmod) AS lastmod_min, max(lastmod) AS lastmod_max,
        |  CAST(SUM(prio_pct) AS BIGINT) // COUNT(*) AS prio_mean_pct,
        |  md5(string_agg(loc, '|' ORDER BY loc)) AS urlset_md5
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_robots_rules" ->
      """WITH doms AS (SELECT DISTINCT doc_id % 8 AS dom FROM documents),
        |rob AS (
        |  SELECT dom,
        |    'User-agent: *' || chr(10) ||
        |    'Disallow: /private' || chr(10) ||
        |    'Allow: /private/pub' || CAST(dom AS VARCHAR) || chr(10) ||
        |    'Disallow: /tmp' || CAST(dom AS VARCHAR) || '/' || chr(10) ||
        |    'Allow: ' || chr(10) AS txt
        |  FROM doms),
        |lines AS (
        |  SELECT dom, unnest(string_split(txt, chr(10))) AS line FROM rob),
        |rules AS (
        |  SELECT dom, split_part(line, ': ', 1) AS verdict,
        |         split_part(line, ': ', 2) AS prefix
        |  FROM lines
        |  WHERE (line LIKE 'Disallow: %' OR line LIKE 'Allow: %')
        |    AND split_part(line, ': ', 2) <> ''),
        |urls AS (
        |  SELECT doc_id, doc_id % 8 AS dom,
        |    CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN '/private/pub' || CAST(doc_id % 8 AS VARCHAR) || '/a'
        |      WHEN 1 THEN '/private/x' || CAST(doc_id AS VARCHAR)
        |      WHEN 2 THEN '/tmp' || CAST(doc_id % 8 AS VARCHAR) || '/f'
        |      WHEN 3 THEN '/public/' || CAST(doc_id AS VARCHAR)
        |      ELSE '/'
        |    END AS path
        |  FROM documents),
        |cand AS (
        |  SELECT u.dom, u.doc_id, r.verdict, r.prefix
        |  FROM urls u JOIN rules r
        |    ON u.dom = r.dom AND substr(u.path, 1, length(r.prefix)) = r.prefix),
        |won AS (
        |  SELECT dom, doc_id,
        |         CASE WHEN verdict = 'Allow' THEN 'allow' ELSE 'block' END
        |           AS decision,
        |         verdict || ' ' || prefix AS rule
        |  FROM (SELECT *, row_number() OVER (PARTITION BY dom, doc_id
        |          ORDER BY length(prefix) DESC, verdict, prefix) AS rk
        |        FROM cand)
        |  WHERE rk = 1),
        |defaults AS (
        |  SELECT u.dom, u.doc_id, 'allow' AS decision, '(default)' AS rule
        |  FROM urls u ANTI JOIN won w
        |    ON u.dom = w.dom AND u.doc_id = w.doc_id),
        |allr AS (SELECT * FROM won UNION ALL SELECT * FROM defaults)
        |SELECT dom, decision, rule, CAST(COUNT(*) AS BIGINT) AS n_urls
        |FROM allr GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "dd_crawl_politeness" ->
      """WITH RECURSIVE req AS (
        |  SELECT concat(CASE CAST(user_id % 3 AS INT)
        |                  WHEN 0 THEN 'www' WHEN 1 THEN 'img' ELSE 'api' END,
        |                '.domain', CAST(user_id % 8 AS VARCHAR), '.com') AS host,
        |         epoch_ms(ts) AS t
        |  FROM events),
        |lab AS (
        |  SELECT host, substr(host, position('.' IN host) + 1) AS reg_domain, t
        |  FROM req),
        |del AS (
        |  SELECT reg_domain,
        |         CAST(600000 * (1 + CAST(regexp_replace(reg_domain, '[^0-9]', '', 'g')
        |           AS BIGINT) % 5) AS BIGINT) AS delay_ms,
        |         host, t
        |  FROM lab),
        |ordered AS (
        |  SELECT reg_domain, delay_ms, t,
        |         row_number() OVER (PARTITION BY reg_domain ORDER BY t) AS rn,
        |         count(*) OVER (PARTITION BY reg_domain) AS n
        |  FROM del),
        |sim AS (
        |  SELECT reg_domain, delay_ms, n, rn, t AS last,
        |         2 * delay_ms AS credits, CAST(0 AS BIGINT) AS viol
        |  FROM ordered WHERE rn = 1
        |  UNION ALL
  |  SELECT s.reg_domain, s.delay_ms, s.n, o.rn, o.t,
        |         CASE WHEN least(3 * s.delay_ms, s.credits + (o.t - s.last)) >= s.delay_ms
        |              THEN least(3 * s.delay_ms, s.credits + (o.t - s.last)) - s.delay_ms
        |              ELSE least(3 * s.delay_ms, s.credits + (o.t - s.last)) END,
        |         s.viol + CASE WHEN least(3 * s.delay_ms, s.credits + (o.t - s.last)) >= s.delay_ms
        |                       THEN 0 ELSE 1 END
        |  FROM sim s JOIN ordered o
        |    ON o.reg_domain = s.reg_domain AND o.rn = s.rn + 1),
        |hosts AS (
        |  SELECT reg_domain, CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
        |         min(t) AS t0, max(t) AS t1
        |  FROM del GROUP BY 1)
        |SELECT s.reg_domain, s.delay_ms, h.n_hosts,
        |       CAST(s.n AS BIGINT) AS n_requests,
        |       CAST(s.n - s.viol AS BIGINT) AS n_served,
        |       s.viol AS n_violations,
        |       h.t1 - h.t0 AS span_ms
        |FROM sim s JOIN hosts h USING (reg_domain)
        |WHERE s.rn = s.n
        |ORDER BY reg_domain""".stripMargin,
    "dd_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN 'http://www.example.com/Docs/'
        |        || CAST(doc_id // 7 AS VARCHAR) || '/page?a=1&b=2'
        |      WHEN 1 THEN 'HTTP://WWW.EXAMPLE.COM:80/Docs/'
        |        || CAST(doc_id // 7 AS VARCHAR) || '/page?b=2&a=1#sec'
        |      WHEN 2 THEN 'http://www.example.com:80/Docs/'
        |        || CAST(doc_id // 7 AS VARCHAR) || '/page/?a=1&b=2'
        |      ELSE 'https://www.example.com/Docs/'
        |        || CAST(doc_id // 7 AS VARCHAR) || '/page?a=1&b=2'
        |    END AS url
        |  FROM documents),
        |p1 AS (
        |  SELECT url, split_part(url, '#', 1) AS nofrag FROM u),
        |p2 AS (
        |  SELECT url, nofrag,
        |         lower(split_part(nofrag, '://', 1)) AS scheme,
        |         substr(nofrag, length(split_part(nofrag, '://', 1)) + 4)
        |           AS rest
        |  FROM p1),
        |p3 AS (
        |  SELECT url, scheme, rest,
        |         lower(split_part(rest, '/', 1)) AS hostport
        |  FROM p2),
        |p4 AS (
        |  SELECT url, scheme,
        |         CASE WHEN scheme = 'http'
        |                THEN regexp_replace(hostport, ':80$', '')
        |              WHEN scheme = 'https'
        |                THEN regexp_replace(hostport, ':443$', '')
        |              ELSE hostport END AS host,
        |         CASE WHEN length(rest) = length(hostport) THEN '/'
        |              ELSE substr(rest, length(hostport) + 1) END AS pathq
        |  FROM p3),
        |p5 AS (
        |  SELECT url, scheme, host,
        |         split_part(pathq, '?', 1) AS path,
        |         CASE WHEN instr(pathq, '?') = 0 THEN ''
        |              ELSE substr(pathq, CAST(instr(pathq, '?') + 1 AS INT))
        |         END AS q
        |  FROM p4),
        |p6 AS (
        |  SELECT url, scheme, host,
        |         CASE WHEN path <> '/' THEN regexp_replace(path, '/$', '')
        |              ELSE path END AS path2,
        |         CASE WHEN q = '' THEN ''
        |              ELSE array_to_string(list_sort(string_split(q, '&')), '&')
        |         END AS q2
        |  FROM p5),
        |c AS (
        |  SELECT url, scheme || '://' || host || path2
        |           || CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END
        |           AS canonical
        |  FROM p6)
        |SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants
        |FROM c GROUP BY 1 ORDER BY canonical""".stripMargin,
    "dd_cdc_chunks" ->
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE length(text) > 0),
         |b AS (
         |  SELECT doc_id, ws,
         |    list_filter([CASE WHEN i >= $CDC_K AND i < len(ws)
         |        AND ${duckHash(s"array_to_string(ws[CAST(i AS INT) - ${CDC_K - 1}:CAST(i AS INT)], ' ')")} % $CDC_DIV = 0
         |      THEN i END for i in range(1, len(ws) + 1)],
         |      x -> x IS NOT NULL) AS bs
         |  FROM w),
         |sp AS (
         |  SELECT doc_id, ws,
         |         list_prepend(CAST(1 AS BIGINT), [x + 1 for x in bs]) AS starts,
         |         list_append(bs, CAST(len(ws) AS BIGINT)) AS ends
         |  FROM b),
         |ch AS (
         |  SELECT doc_id,
         |         array_to_string(ws[CAST(starts[CAST(j AS INT)] AS INT):CAST(ends[CAST(j AS INT)] AS INT)], ' ') AS chunk,
         |         ends[CAST(j AS INT)] - starts[CAST(j AS INT)] + 1 AS lw
         |  FROM sp, unnest(range(1, len(starts) + 1)) AS t(j))
         |SELECT ${duckHash("chunk")} AS h,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(COUNT(*) AS BIGINT) AS n_occ,
         |       CAST(MAX(lw) AS BIGINT) AS len_words
         |FROM ch GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY h""".stripMargin,
    "dd_band_planner" -> {
      val simList = plannerSims.map(_.toString).mkString("[", ", ", "]")
      val branches = plannerConfigs.map { case (b, r) =>
        val sr = powChain("s", r)
        val p = s"1.0 - ${powChain(s"(1.0 - $sr)", b)}"
        s"""SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r, s,
           |       $p AS p_candidate FROM sims""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "\n")
      s"""WITH sims AS (SELECT CAST(unnest($simList) AS DOUBLE) AS s)
         |SELECT * FROM ($branches)
         |ORDER BY b, r, s""".stripMargin
    },
    "dd_record_linkage" ->
      """WITH names AS (
        |  SELECT lower(p_name) AS name, COUNT(*) AS n_parts,
        |         split_part(lower(p_name), ' ', -1) AS noun
        |  FROM part GROUP BY 1, 3)
        |SELECT a.name AS name_a, b.name AS name_b, a.noun,
        |       CAST(levenshtein(a.name, b.name) AS INT) AS dist,
        |       1.0 - CAST(levenshtein(a.name, b.name) AS DOUBLE)
        |         / GREATEST(length(a.name), length(b.name)) AS score,
        |       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        |FROM names a JOIN names b
        |  ON a.noun = b.noun AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "dd_minhash_accuracy" ->
      s"""WITH $shingCte,
         |${sigCteFor("shing", "sig")},
         |${bandCteFor("sig", "bands")},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT
         |    len(list_filter([sa.sig[i] = sb.sig[i] for i in range(1, $K + 1)],
         |        x -> x)) AS m,
         |    len(list_intersect(sa.shashes, sb.shashes)) AS inter,
         |    len(sa.shashes) + len(sb.shashes)
         |      - len(list_intersect(sa.shashes, sb.shashes)) AS uni
         |  FROM cand JOIN sig sa ON cand.ia = sa.doc_id
         |            JOIN sig sb ON cand.ib = sb.doc_id)
         |SELECT CAST((10 * m) // $K AS BIGINT) AS est_decile,
         |       CAST((10 * inter) // uni AS BIGINT) AS exact_decile,
         |       COUNT(*) AS n_pairs
         |FROM scored GROUP BY 1, 2 ORDER BY est_decile, exact_decile""".stripMargin,
    "dd_band_stats" ->
      s"""WITH $shingCte,
         |${sigCteFor("shing", "sig")},
         |${bandCteFor("sig", "bands")},
         |bk AS (SELECT b, bh, COUNT(*) AS sz FROM bands GROUP BY b, bh)
         |SELECT CAST(b AS INT) AS band,
         |       COUNT(*) AS n_buckets,
         |       CAST(MAX(sz) AS BIGINT) AS max_bucket,
         |       CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS n_cand_pairs
         |FROM bk GROUP BY b ORDER BY band""".stripMargin,
    "dd_contamination" ->
      s"""WITH ${shingCteFor("documents", "shing")},
         |ev AS (SELECT doc_id AS eid, len(shashes) AS en, unnest(shashes) AS sh
         |       FROM shing WHERE doc_id % $EVAL_MOD = 0),
         |tr AS (SELECT doc_id AS tid, unnest(shashes) AS sh
         |       FROM shing WHERE doc_id % $EVAL_MOD <> 0),
         |ov AS (
         |  SELECT tid, eid, en, COUNT(*) AS shared,
         |         CAST(COUNT(*) AS DOUBLE) / en AS overlap
         |  FROM ev JOIN tr USING (sh) GROUP BY 1, 2, 3),
         |best AS (
         |  SELECT tid AS doc_id, eid AS contaminated_by, shared, overlap,
         |         ROW_NUMBER() OVER (PARTITION BY tid
         |                            ORDER BY overlap DESC, eid) AS rn
         |  FROM ov WHERE overlap >= 0.2)
         |SELECT doc_id, contaminated_by, shared, overlap FROM best
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dd_contamination_ngram" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |         list_distinct([${duckHash("array_to_string(ws[i:i+12], ' ')")}
         |                        for i in range(1, len(ws) - 11)]) AS gh
         |  FROM t WHERE len(ws) >= 13),
         |ev AS (SELECT doc_id AS eid, unnest(gh) AS gh FROM g
         |       WHERE doc_id % $EVAL_MOD = 0),
         |tr AS (SELECT doc_id AS tid, unnest(gh) AS gh FROM g
         |       WHERE doc_id % $EVAL_MOD <> 0),
         |j AS (SELECT tid, eid, CAST(COUNT(*) AS BIGINT) AS n_grams_shared
         |      FROM tr JOIN ev USING (gh) GROUP BY 1, 2),
         |r AS (SELECT tid, eid, n_grams_shared,
         |             ROW_NUMBER() OVER (PARTITION BY tid
         |               ORDER BY n_grams_shared DESC, eid) AS rn
         |      FROM j)
         |SELECT tid AS doc_id, eid AS contaminated_by, n_grams_shared
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dd_decontam_splice" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
         |  FROM documents),
         |t2 AS (SELECT doc_id, ws FROM t WHERE len(ws) >= 13),
         |g AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |    ${duckHash("array_to_string(ws[CAST(i+1 AS INT):CAST(i+13 AS INT)], ' ')")} AS gh
         |  FROM t2, unnest(range(0, len(ws) - 12)) AS u(i)),
         |evg AS (SELECT DISTINCT gh FROM g WHERE doc_id % $EVAL_MOD = 0),
         |hits AS (SELECT doc_id, pos FROM g
         |         WHERE doc_id % $EVAL_MOD <> 0
         |           AND gh IN (SELECT gh FROM evg)),
         |sp0 AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |              <= 13 THEN 0 ELSE 1 END AS ns
         |  FROM hits),
         |sp1 AS (
         |  SELECT doc_id, pos,
         |    SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
         |                  ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM sp0),
         |spans AS (SELECT doc_id, sid, MIN(pos) AS s, MAX(pos) + 13 AS e
         |          FROM sp1 GROUP BY 1, 2),
         |sl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         |              list({'s': s, 'e': e}) AS sp
         |       FROM spans GROUP BY doc_id),
         |j AS (SELECT t2.doc_id, ws, n_spans, sp FROM t2 JOIN sl USING (doc_id)),
         |k AS (
         |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, n_spans,
         |    list_transform(list_filter(list_transform(range(1, len(ws)+1),
         |      i -> {'w': ws[i], 'j': CAST(i AS BIGINT) - 1}),
         |      x -> len([r for r in sp
         |                if x.j >= r.s AND x.j < r.e]) = 0), x -> x.w) AS kept
         |  FROM j)
         |SELECT doc_id, n_words, n_spans,
         |       CAST(n_words - len(kept) AS BIGINT) AS removed_tokens,
         |       CAST(len(kept) AS BIGINT) AS tokens_saved,
         |       md5(COALESCE(array_to_string(kept, ' '), '')) AS clean_md5
         |FROM k ORDER BY doc_id""".stripMargin,
    "dd_exact" ->
      """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies, md5(text) AS text_md5
        |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "dd_shingle_sweep" ->
      """WITH docs AS (
        |  SELECT doc_id, substring(text, 1, 16) AS blk,
        |         string_split(lower(text), ' ') AS ws
        |  FROM documents WHERE length(text) > 0),
        |blocked AS (
        |  SELECT 'blocked' AS pair_class, a.ws AS wsa, b.ws AS wsb
        |  FROM docs a JOIN docs b
        |    ON a.blk = b.blk AND a.doc_id < b.doc_id),
        |background AS (
        |  SELECT 'background' AS pair_class, a.ws AS wsa, b.ws AS wsb
        |  FROM docs a JOIN docs b
        |    ON a.doc_id + 1 = b.doc_id AND a.blk <> b.blk
        |       AND a.doc_id % 10 = 0),
        |pairs AS (SELECT * FROM blocked UNION ALL SELECT * FROM background),
        |ks AS (SELECT unnest([2, 3, 5]) AS k),
        |j AS (
        |  SELECT k, pair_class,
        |         (len(list_intersect(sa, sb)) * 1000000)
        |           // len(list_distinct(list_concat(sa, sb))) AS j_micro
        |  FROM (
        |    SELECT k, pair_class,
        |      list_distinct(list_transform(generate_series(1, len(wsa) - k + 1),
        |        i -> array_to_string(wsa[i:i+k-1], ' '))) AS sa,
        |      list_distinct(list_transform(generate_series(1, len(wsb) - k + 1),
        |        i -> array_to_string(wsb[i:i+k-1], ' '))) AS sb
        |    FROM pairs CROSS JOIN ks
        |    WHERE len(wsa) >= k AND len(wsb) >= k))
        |SELECT CAST(k AS INT) AS k, pair_class,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(j_micro) // COUNT(*) AS BIGINT) AS mean_j_micro,
        |       CAST(MAX(j_micro) AS BIGINT) AS max_j_micro
        |FROM j GROUP BY 1, 2 ORDER BY k, pair_class""".stripMargin,
    "dd_edit_blocked" ->
      """WITH d AS (
        |  SELECT doc_id, substring(text, 1, 16) AS blk,
        |         substring(text, 1, 60) AS head
        |  FROM documents WHERE length(text) > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    "pipe_dedup_impact" ->
      """WITH doubled AS (
        |  SELECT doc_id, source, md5(text) AS h,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, source, md5(text),
        |         CAST(len(string_split(text, ' ')) AS BIGINT)
        |  FROM documents),
        |bef AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS rows_before,
        |         CAST(SUM(toks) AS BIGINT) AS tokens_before
        |  FROM doubled GROUP BY 1),
        |surv AS (SELECT MIN(doc_id) AS keep_id FROM doubled GROUP BY h),
        |aft AS (
        |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS rows_after,
        |         CAST(SUM(d.toks) AS BIGINT) AS tokens_after
        |  FROM surv JOIN (
        |    SELECT doc_id, source,
        |           CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |    FROM documents) d ON d.doc_id = surv.keep_id
        |  GROUP BY 1)
        |SELECT b.source, b.rows_before, b.tokens_before,
        |       COALESCE(a.rows_after, 0) AS rows_after,
        |       COALESCE(a.tokens_after, 0) AS tokens_after,
        |       1.0 - CAST(COALESCE(a.rows_after, 0) AS DOUBLE)
        |             / CAST(b.rows_before AS DOUBLE) AS row_dedup_rate,
        |       1.0 - CAST(COALESCE(a.tokens_after, 0) AS DOUBLE)
        |             / CAST(b.tokens_before AS DOUBLE) AS token_dedup_rate
        |FROM bef b LEFT JOIN aft a USING (source)
        |ORDER BY source""".stripMargin,
    "dd_ngram_jaccard" ->
      s"""WITH $shingCte,
         |sh AS (SELECT doc_id, len(shashes) AS n, unnest(shashes) AS sh FROM shing),
         |inter AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb,
         |         COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT ia, ib, inter,
         |       CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
         |FROM inter
         |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $JT
         |ORDER BY ia, ib""".stripMargin,
    "dd_containment" ->
      s"""WITH $shingCte,
         |sh AS (SELECT doc_id, len(shashes) AS n, unnest(shashes) AS sh FROM shing),
         |inter AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2, 3)
         |SELECT ia, ib, inter, CAST(inter AS DOUBLE) / na AS containment
         |FROM inter
         |WHERE CAST(inter AS DOUBLE) / na >= 0.5
         |ORDER BY ia, ib""".stripMargin,
    "dd_containment_banded" ->
      s"""WITH $shingCte,
         |sh AS (SELECT doc_id, len(shashes) AS n, unnest(shashes) AS sh FROM shing),
         |df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
         |probe AS (
         |  SELECT doc_id, sh FROM (
         |    SELECT s.doc_id, s.sh, s.n,
         |           ROW_NUMBER() OVER (PARTITION BY s.doc_id
         |                              ORDER BY d.df, s.sh) AS rn
         |    FROM sh s JOIN df d USING (sh))
         |  WHERE rn <= n // 2 + 1),
         |idx AS (SELECT s.doc_id, s.sh FROM sh s JOIN df d USING (sh)
         |        WHERE d.df <= $DF_CAP),
         |cand AS (SELECT DISTINCT p.doc_id AS ia, i.doc_id AS ib
         |         FROM probe p JOIN idx i ON p.sh = i.sh
         |                                AND p.doc_id <> i.doc_id),
         |scored AS (
         |  SELECT ia, ib,
         |    CAST(len(list_intersect(sa.shashes, sb.shashes)) AS BIGINT) AS inter,
         |    CAST(len(list_intersect(sa.shashes, sb.shashes)) AS DOUBLE)
         |      / len(sa.shashes) AS containment
         |  FROM cand JOIN shing sa ON ia = sa.doc_id
         |            JOIN shing sb ON ib = sb.doc_id)
         |SELECT ia, ib, inter, containment FROM scored
         |WHERE containment >= 0.5 ORDER BY ia, ib""".stripMargin,
    "dd_minhash_lsh" ->
      s"""WITH $shingCte,
         |sig AS (
         |  SELECT doc_id, shashes,
         |    [list_reduce(
         |       list_prepend(9223372036854775807::BIGINT,
         |         [((2*i + 1) * (h % $M40) + i * 2654435761) % $M40 for h in shashes]),
         |       (a, x) -> least(a, x)) for i in range(0, $K)] AS sig
         |  FROM shing),
         |bands AS (
         |  SELECT doc_id, shashes, b,
         |    ${duckHash(s"CAST(b AS VARCHAR) || '|' || array_to_string([CAST(v AS VARCHAR) for v in sig[b*$R+1:b*$R+$R]], ',')")} AS bh
         |  FROM sig CROSS JOIN (SELECT unnest(range(0, $B)) AS b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT ia, ib,
         |    CAST(len(list_intersect(sa.shashes, sb.shashes)) AS BIGINT) AS inter,
         |    CAST(len(list_intersect(sa.shashes, sb.shashes)) AS DOUBLE)
         |      / (len(sa.shashes) + len(sb.shashes) - len(list_intersect(sa.shashes, sb.shashes))) AS jaccard
         |  FROM cand JOIN shing sa ON ia = sa.doc_id JOIN shing sb ON ib = sb.doc_id)
         |SELECT ia, ib, inter, jaccard FROM scored
         |WHERE jaccard >= $JT ORDER BY ia, ib""".stripMargin,
    "dd_dup_sources" ->
      s"""WITH $shingCte,
         |sig AS (
         |  SELECT doc_id, shashes,
         |    [list_reduce(
         |       list_prepend(9223372036854775807::BIGINT,
         |         [((2*i + 1) * (h % $M40) + i * 2654435761) % $M40 for h in shashes]),
         |       (a, x) -> least(a, x)) for i in range(0, $K)] AS sig
         |  FROM shing),
         |bands AS (
         |  SELECT doc_id, shashes, b,
         |    ${duckHash(s"CAST(b AS VARCHAR) || '|' || array_to_string([CAST(v AS VARCHAR) for v in sig[b*$R+1:b*$R+$R]], ',')")} AS bh
         |  FROM sig CROSS JOIN (SELECT unnest(range(0, $B)) AS b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT ia, ib,
         |    CAST(len(list_intersect(sa.shashes, sb.shashes)) AS DOUBLE)
         |      / (len(sa.shashes) + len(sb.shashes) - len(list_intersect(sa.shashes, sb.shashes))) AS jaccard
         |  FROM cand JOIN shing sa ON ia = sa.doc_id JOIN shing sb ON ib = sb.doc_id),
         |verified AS (SELECT * FROM scored WHERE jaccard >= $JT),
         |tagged AS (
         |  SELECT least(da.source, db.source) AS source_a,
         |         greatest(da.source, db.source) AS source_b,
         |         v.jaccard
         |  FROM verified v
         |  JOIN documents da ON da.doc_id = v.ia
         |  JOIN documents db ON db.doc_id = v.ib)
         |SELECT source_a, source_b, COUNT(*) AS n_pairs,
         |       CAST(SUM(CAST(floor(jaccard * 1000.0) AS BIGINT)) AS BIGINT) AS jacc_milli_sum,
         |       CAST(SUM(CAST(floor(jaccard * 1000.0) AS BIGINT)) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE) AS mean_jacc_milli
         |FROM tagged GROUP BY 1, 2
         |ORDER BY source_a, source_b""".stripMargin,
    "dd_incremental" ->
      s"""WITH docs_seen AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % $SEEN_MOD <> 0),
         |docs_new AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % $SEEN_MOD = 0
         |  UNION ALL
         |  SELECT doc_id + $COPY_OFFSET AS doc_id, text FROM docs_seen WHERE doc_id % $COPY_MOD = 0),
         |${shingCteFor("docs_seen", "shing_s")},
         |${shingCteFor("docs_new", "shing_n")},
         |${sigCteFor("shing_s", "sig_s")},
         |${sigCteFor("shing_n", "sig_n")},
         |${bandCteFor("sig_s", "bands_s")},
         |${bandCteFor("sig_n", "bands_n")},
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS nid, s.doc_id AS sid
         |  FROM bands_n n JOIN bands_s s ON n.b = s.b AND n.bh = s.bh),
         |nearest AS (
         |  SELECT nid, MIN(sid) AS near_dup_of FROM (
         |    SELECT cand.nid, cand.sid,
         |      CAST(len(list_intersect(a.shashes, b.shashes)) AS DOUBLE)
         |        / (len(a.shashes) + len(b.shashes) - len(list_intersect(a.shashes, b.shashes))) AS j
         |    FROM cand JOIN shing_n a ON cand.nid = a.doc_id
         |              JOIN shing_s b ON cand.sid = b.doc_id) sc
         |  WHERE j >= $JT GROUP BY nid),
         |exacts AS (
         |  SELECT DISTINCT n.doc_id FROM docs_new n
         |  JOIN docs_seen s ON md5(n.text) = md5(s.text))
         |SELECT n.doc_id,
         |  n.doc_id IN (SELECT doc_id FROM exacts) AS exact_dup,
         |  nearest.near_dup_of,
         |  (n.doc_id NOT IN (SELECT doc_id FROM exacts)
         |    AND nearest.near_dup_of IS NULL) AS kept
         |FROM docs_new n LEFT JOIN nearest ON n.doc_id = nearest.nid
         |ORDER BY n.doc_id""".stripMargin,
    "dd_components" -> componentsOracle,
    // same oracle as dd_components: both implementations must produce the
    // identical clustering of the identical (exact, non-LSH) pair graph
    "dd_components_stars" -> componentsOracle,
    "dd_component_sizes" ->
      s"""SELECT comp_size, CAST(COUNT(*) AS BIGINT) AS n_components,
         |       CAST(comp_size * COUNT(*) AS BIGINT) AS n_docs
         |FROM (SELECT DISTINCT component, comp_size FROM ($componentsOracle))
         |GROUP BY comp_size ORDER BY comp_size""".stripMargin,
    "dd_canonical" ->
      s"""WITH RECURSIVE
         |$shingCte,
         |sh AS (SELECT doc_id, len(shashes) AS n, unnest(shashes) AS sh FROM shing),
         |inter AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4),
         |pairs AS (
         |  SELECT ia, ib FROM inter WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $JT),
         |edges AS (SELECT ia AS src, ib AS dst FROM pairs UNION ALL SELECT ib, ia FROM pairs),
         |reach(node, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node),
         |comps AS (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY 1),
         |clusters AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster,
         |         CAST(length(d.text) AS BIGINT) AS text_len
         |  FROM documents d LEFT JOIN comps c ON d.doc_id = c.doc_id),
         |ranked AS (
         |  SELECT cluster, doc_id, text_len,
         |         row_number() OVER (PARTITION BY cluster
         |                            ORDER BY text_len DESC, doc_id) AS rn,
         |         COUNT(*) OVER (PARTITION BY cluster) AS n_members
         |  FROM clusters)
         |SELECT cluster, doc_id AS canonical_id, text_len, n_members
         |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin,
    "dd_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS md5_old FROM documents WHERE doc_id % 7 <> 0),
        |neu AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 11 = 0 THEN reverse(text) ELSE text END) AS md5_new
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
        |       CASE WHEN old.doc_id IS NULL THEN 'added'
        |            WHEN neu.doc_id IS NULL THEN 'removed'
        |            WHEN md5_old <> md5_new THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
        |ORDER BY doc_id""".stripMargin,
    "dd_simhash" ->
      s"""WITH hashed AS (
       |  SELECT doc_id,
       |    [${duckHash("w")} for w in list_distinct(string_split(lower(text), ' '))] AS hs
       |  FROM documents),
       |votes AS (
       |  SELECT doc_id,
       |    [list_reduce(list_prepend(0::BIGINT,
       |       [CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1
       |             THEN 1::BIGINT ELSE (-1)::BIGINT END for h in hs]),
       |       (a, x) -> a + x) for j in range(0, 60)] AS v
       |  FROM hashed),
       |sims AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0::BIGINT,
       |      [CASE WHEN v[j+1] > 0 THEN CAST(pow(2, j) AS BIGINT)
       |            ELSE 0::BIGINT END for j in range(0, 60)]),
       |      (a, x) -> a + x) AS sim
       |  FROM votes)
       |SELECT a.doc_id AS ia, b.doc_id AS ib,
       |       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $HAM
       |ORDER BY ia, ib""".stripMargin)

  /** Oracle for the streaming probe ([[graft.streaming.StreamOps
    * .incrementalProbeStream]]): the batch replay of the stream-static
    * band probe — held-out docs only (the stream carries no injected
    * copies), near-dup matches only (inner joins emit nothing for clean
    * docs).
    */
  private[graft] lazy val incrementalStreamOracle: String =
    s"""WITH docs_seen AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % $SEEN_MOD <> 0),
       |docs_new AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % $SEEN_MOD = 0),
       |${shingCteFor("docs_seen", "shing_s")},
       |${shingCteFor("docs_new", "shing_n")},
       |${sigCteFor("shing_s", "sig_s")},
       |${sigCteFor("shing_n", "sig_n")},
       |${bandCteFor("sig_s", "bands_s")},
       |${bandCteFor("sig_n", "bands_n")},
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS nid, s.doc_id AS sid
       |  FROM bands_n n JOIN bands_s s ON n.b = s.b AND n.bh = s.bh)
       |SELECT nid AS doc_id, MIN(sid) AS near_dup_of FROM (
       |  SELECT cand.nid, cand.sid,
       |    CAST(len(list_intersect(a.shashes, b.shashes)) AS DOUBLE)
       |      / (len(a.shashes) + len(b.shashes) - len(list_intersect(a.shashes, b.shashes))) AS j
       |  FROM cand JOIN shing_n a ON cand.nid = a.doc_id
       |            JOIN shing_s b ON cand.sid = b.doc_id) sc
       |WHERE j >= $JT GROUP BY nid ORDER BY doc_id""".stripMargin

  private lazy val componentsOracle: String =
      s"""WITH RECURSIVE
         |$shingCte,
         |sh AS (SELECT doc_id, len(shashes) AS n, unnest(shashes) AS sh FROM shing),
         |inter AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4),
         |pairs AS (
         |  SELECT ia, ib FROM inter WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $JT),
         |edges AS (SELECT ia AS src, ib AS dst FROM pairs UNION ALL SELECT ib, ia FROM pairs),
         |reach(node, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node),
         |comps AS (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY 1)
         |SELECT doc_id, component,
         |       (SELECT COUNT(*) FROM comps c2 WHERE c2.component = comps.component) AS comp_size
         |FROM comps ORDER BY doc_id""".stripMargin
}
