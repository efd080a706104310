package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER
  * production tokenizer family beside BPE ([[TextOps]]'s
  * pipe_bpe_merges / pipe_bpe_encode): seed a substring vocabulary,
  * VITERBI-segment every word type under unigram piece scores, re-count
  * piece usage from the segmentations (the hard-EM M-step), prune
  * unused pieces, and encode the corpus with the trained vocabulary.
  *
  * The whole computation is INTEGER-EXACT so DuckDB replays it
  * bit-for-bit, which demands one novel primitive: piece log-odds
  * without libm. [[lgS]]/[[lgD]] compute a 16-fractional-bit fixed-point
  * log2 by the classic square-and-shift algorithm — `length(bin(c))`
  * gives the integer part (the established bit-length idiom), then 16
  * unrolled rounds of "square the mantissa in 2^16 fixed point,
  * truncating-divide, emit a bit" extract the fraction. Every operation
  * is BIGINT multiply / truncating divide — verified identical in both
  * engines — so the two sides produce the same 22-bit score for every
  * count, and Viterbi comparisons agree exactly.
  *
  * Viterbi DP is unrolled over word positions (MAXW=8 covers the corpus;
  * longer words would be excluded by the mirrored guard): state per
  * position packs (64·score + (63 − pieces)) into ONE BIGINT so "max
  * score, then fewest pieces" is plain integer GREATEST — no struct
  * ordering needed, and both engines take the max identically. The
  * M-step needs the argmax segmentation itself, so a second unrolled
  * chain BACKTRACKS from the end of each word, re-testing candidate
  * piece lengths 1..4 in fixed order (first match wins — the same CASE
  * order in both engines) and emitting pieces.
  *
  * Scale shape: everything heavy runs at WORD-TYPE grain (distinct
  * words), which is Heaps-law sublinear in corpus size; the corpus
  * itself is touched only by the final tokenize — a broadcast join of
  * the per-type token counts onto exploded words, the same
  * merge-table-resident shape as the BPE encoder. The vocabulary and
  * its weights are KB-scale broadcast maps; the DP/backtrack chains are
  * fixed-depth codegen'd expressions, no shuffle at all.
  *
  * Reference scope: the reference has no tokenizer; this extends the
  * engine's LLM-curation surface (SURVEY.md §2.8) where fertility and
  * token budgets are first-class quantities.
  */
object UnigramLM {

  private val MAXW = 8   // max word length the unrolled DP covers
  private val PLEN = 4   // max piece length
  private val VTOP = 40  // seed vocab cap (single chars always kept)
  private val NEG = "CAST(-1000000000 AS BIGINT)" // not-in-vocab score

  // ---- fixed-point log2 (16 fractional bits) — shared in [[FixLog]] ----

  private def lgS(c: String): String = FixLog.lgS(c)

  /** Word types with corpus counts (the only pass over raw text). */
  private def wordTypes(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.documents(s, d))
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= MAXW)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Seed vocabulary: every substring of length 1..PLEN with its total
    * occurrence count, capped to the top VTOP by count (single chars
    * always survive — they guarantee every word stays encodable).
    */
  private def seedVocabOf(words: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seeds = words
      .select(col("cnt"), explode(expr(
        s"flatten(transform(sequence(1, $PLEN), l -> " +
          s"filter(transform(sequence(1, $MAXW), i -> " +
          s"CASE WHEN i + l - 1 <= length(w) THEN substring(w, i, l) END), " +
          "x -> x IS NOT NULL)))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
    // the seed table is vocabulary-grain (hundreds of rows) — the
    // single-partition rank window is bounded, not a scale risk
    val rn = row_number().over(Window.orderBy(desc("c"), col("piece")))
    seeds.withColumn("rn", rn)
      .filter(col("rn") <= VTOP || length(col("piece")) === 1)
      .select(col("piece"), col("c"))
  }

  /** One-column frame holding the piece→weight broadcast map, where
    * weight = lg(count) − lg(total) in 2^16 fixed point (≤ 0).
    */
  private def weightMap(vocab: DataFrame): DataFrame =
    // ONE aggregate: collect (piece, c) and Σc together, then compute
    // each entry's lg(c) − lg(t) inside the 1-row projection — the
    // crossJoin(broadcast(tot)) form cost two extra stages per call for
    // the same integers (r17 opt; the fold is vocabulary-grain).
    vocab
      .agg(collect_list(struct(col("piece"), col("c"))).as("pc"),
        sum(col("c")).as("t"))
      .select(expr(
        s"""map_from_entries(transform(pc,
           |  x -> struct(x.piece, (${lgS("x.c")}) - (${lgS("t")}))))"""
          .stripMargin).as("vm"))

  private def wtLookup(pos: String, l: Int): String =
    s"coalesce(element_at(vm, substring(w, $pos, $l)), $NEG)"

  /** Viterbi DP as ONE aggregate() fold over positions (a chained
    * withColumn per position would blow up exponentially under
    * CollapseProject inlining — the fold keeps the expression tree
    * constant-size and evaluation linear). State = the growing array of
    * packed scores, ca[j+1] = comb at prefix length j, where comb =
    * 64·score + (63 − k): integer GREATEST is exactly "max score, then
    * fewest pieces". Infeasible candidates take a sentinel far below
    * any feasible score instead of NULL (greatest-with-NULL semantics
    * differ across engines).
    */
  private def dpFold: String = {
    val cands = (1 to PLEN).map { l =>
      s"CASE WHEN j >= $l THEN element_at(acc, CAST(j AS INT) - $l + 1) + " +
        s"64L * ${wtLookup(s"CAST(j AS INT) - $l + 1", l)} - 1L " +
        s"ELSE CAST(-4000000000000 AS BIGINT) END"
    }
    s"aggregate(sequence(1, $MAXW), array(CAST(63 AS BIGINT)), (acc, j) -> " +
      s"CASE WHEN length(w) >= j THEN concat(acc, array(greatest(${cands.mkString(", ")}))) " +
      "ELSE acc END)"
  }

  private def dpChain(df: DataFrame): DataFrame =
    df.withColumn("ca", expr(dpFold))

  /** Token count of the word's Viterbi segmentation, from the packed
    * field: k = 63 − ((comb mod 64) normalized to [0,64)).
    */
  private val kExpr =
    "63L - ((element_at(ca, length(w) + 1) % 64L) + 64L) % 64L"

  /** Backtrack as a second fold: from pos = length(w), re-test piece
    * lengths 1..PLEN in FIXED order against the DP array (first match
    * wins — the same CASE order the oracle replays) and emit the
    * matching piece, stepping left. State = struct(p, ks).
    */
  private def backtrackFold: String = {
    def pieceCase: String = {
      val branches = (1 to PLEN).map { l =>
        s"WHEN st.p >= $l AND element_at(ca, CAST(st.p AS INT) + 1) = " +
          s"element_at(ca, CAST(st.p AS INT) + 1 - $l) + " +
          s"64L * ${wtLookup(s"CAST(st.p AS INT) - $l + 1", l)} - 1L " +
          s"THEN substring(w, CAST(st.p AS INT) - $l + 1, $l)"
      }.mkString(" ")
      s"CASE $branches END"
    }
    s"aggregate(sequence(1, $MAXW), " +
      "named_struct('p', CAST(length(w) AS BIGINT), 'ks', CAST(array() AS ARRAY<STRING>)), " +
      "(st, t) -> CASE WHEN st.p <= 0 THEN st ELSE named_struct(" +
      s"'p', st.p - CAST(length($pieceCase) AS BIGINT), " +
      s"'ks', concat(st.ks, array($pieceCase))) END).ks"
  }

  private def backtrackChain(df: DataFrame): DataFrame =
    // the walk emits right-to-left; reverse into reading order
    df.withColumn("pieces", expr(s"reverse($backtrackFold)"))

  /** Spec hook: each word type with its Viterbi segmentation under the
    * seed vocabulary (the E-step's raw output). */
  private[graft] def debugSegments(s: SparkSession, d: String): DataFrame = {
    val words = wordTypes(s, d)
    backtrackChain(dpChain(
      words.crossJoin(broadcast(weightMap(seedVocabOf(words))))))
      .select(col("w"), col("cnt"), col("pieces"))
  }

  /** Trained vocabulary after one hard-EM round: Viterbi-usage counts,
    * pruned to used pieces ∪ single chars (chars keep the corpus
    * encodable; unused chars carry usage 0). Takes the word-type frame
    * as input so the ONE corpus pass is shared across train/encode —
    * the unoptimized form re-derived it (scan + explode + groupBy) once
    * per consumer, 4 corpus scans per encode query.
    */
  private def trainedVocabOf(words: DataFrame): DataFrame = {
    val vocab0 = seedVocabOf(words)
    val segs = backtrackChain(dpChain(
      words.crossJoin(broadcast(weightMap(vocab0)))))
    val usage = segs.select(col("cnt"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("usage"))
    val chars = vocab0.filter(length(col("piece")) === 1)
    usage.unionByName(
      chars.join(usage, Seq("piece"), "left_anti")
        .select(col("piece"), lit(0L).as("usage")))
  }

  /** pipe_unigram_train — the trained tokenizer vocabulary: every
    * surviving piece with its hard-EM usage count and rank.
    */
  def unigramTrain(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // word types are Heaps-law sublinear in corpus size — the persisted
    // intermediate a production tokenizer train materializes anyway
    trainedVocabOf(wordTypes(s, d).localCheckpoint())
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("usage"), col("piece")))
          .cast("long"))
      .select(col("rank"), col("piece"), col("usage"))
      .orderBy(col("rank"))
  }

  /** pipe_unigram_encode — tokenize the corpus with the TRAINED
    * vocabulary (usage counts floored at 1 so zero-usage chars stay
    * scoreable): per-document word/token/char counts and fertility
    * (tokens per word), the metric a tokenizer swap is judged by.
    */
  def unigramEncode(s: SparkSession, d: String): DataFrame = {
    val words = wordTypes(s, d).localCheckpoint()
    val vf = trainedVocabOf(words)
      .select(col("piece"), greatest(col("usage"), lit(1L)).as("c"))
    val kmap = dpChain(
      words.crossJoin(broadcast(weightMap(vf))))
      .select(col("w"), expr(kExpr).as("k"))
    Tables.spread(Tables.documents(s, d))
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= MAXW)
      .join(broadcast(kmap), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("k")).as("n_tokens"),
        sum(length(col("w")).cast("long")).as("n_chars"))
      .withColumn("fertility",
        col("n_tokens").cast("double") / col("n_words"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_unigram_train" -> unigramTrain,
    "pipe_unigram_encode" -> unigramEncode
  )

  // ---- DuckDB replay ----------------------------------------------------

  private def lgD(c: String): String = FixLog.lgD(c)

  private def dWt(pos: String, l: Int): String =
    s"coalesce(vm[substr(w, $pos, $l)][1], $NEG)"

  /** Shared CTE prefix: word types → seed vocab → weights → DP →
    * backtrack → trained vocab (`vocabf(piece, usage)`), mirroring the
    * Spark construction block for block. `tag` disambiguates CTE names
    * when the prefix is instantiated twice in one statement.
    */
  private def dpCtes(vmCte: String, tag: String): String = {
    val dp = (1 to MAXW).map { j =>
      val cands = (1 to math.min(PLEN, j)).map { l =>
        s"(c${j - l} + 64 * ${dWt((j - l + 1).toString, l)} - 1)"
      }
      val g = if (cands.size == 1) cands.head
              else s"greatest(${cands.mkString(", ")})"
      s"""${tag}dp$j AS (
         |  SELECT *, CASE WHEN length(w) >= $j THEN $g END AS c$j
         |  FROM ${tag}dp${j - 1})""".stripMargin
    }.mkString(",\n")
    s"""${tag}dp0 AS (
       |  SELECT w, cnt, vm, CAST(63 AS BIGINT) AS c0
       |  FROM words CROSS JOIN $vmCte),
       |$dp,
       |${tag}ca AS (
       |  SELECT *, [${(0 to MAXW).map(j => s"c$j").mkString(", ")}] AS ca
       |  FROM ${tag}dp$MAXW)""".stripMargin
  }

  private def backtrackCtes(tag: String): String =
    (1 to MAXW).map { t =>
      val pc = s"p${t - 1}"
      val branches = (1 to PLEN).map { l =>
        s"WHEN $pc >= $l AND ca[CAST($pc AS INT) + 1] = " +
          s"ca[CAST($pc AS INT) + 1 - $l] + " +
          s"64 * ${dWt(s"CAST($pc AS INT) - $l + 1", l)} - 1 " +
          s"THEN substr(w, CAST($pc AS INT) - $l + 1, $l)"
      }.mkString(" ")
      s"""${tag}bg$t AS (
         |  SELECT *, CASE WHEN $pc <= 0 THEN NULL $branches END AS g$t
         |  FROM ${if (t == 1) s"(SELECT *, CAST(length(w) AS BIGINT) AS p0 FROM ${tag}ca)" else s"${tag}bp${t - 1}"}),
         |${tag}bp$t AS (
         |  SELECT *, $pc - CAST(coalesce(length(g$t), 0) AS BIGINT) AS p$t
         |  FROM ${tag}bg$t)""".stripMargin
    }.mkString(",\n")

  /** Everything through the trained vocabulary, as one CTE chain. */
  private def trainCtes: String =
    s"""words AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(list_filter(string_split(lower(text), ' '),
       |                  x -> x <> '' AND length(x) <= $MAXW)) AS w
       |    FROM documents) GROUP BY w),
       |seeds AS (
       |  SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) AS piece,
       |         CAST(SUM(cnt) AS BIGINT) AS c
       |  FROM words, unnest(range(1, ${PLEN + 1})) AS tl(l),
       |       unnest(range(1, ${MAXW + 1})) AS ti(i)
       |  WHERE i + l - 1 <= length(w) GROUP BY 1),
       |vocab0 AS (
       |  SELECT piece, c FROM (
       |    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
       |    FROM seeds) WHERE rn <= $VTOP OR length(piece) = 1),
       |wts AS (
       |  SELECT piece, ${lgD("c")} - ${lgD("t")} AS wt
       |  FROM vocab0 CROSS JOIN (SELECT CAST(SUM(c) AS BIGINT) AS t FROM vocab0)),
       |vmap AS (SELECT map(list(piece), list(wt)) AS vm FROM wts),
       |${dpCtes("vmap", "t")},
       |${backtrackCtes("t")},
       |usage AS (
       |  SELECT g AS piece, CAST(SUM(cnt) AS BIGINT) AS usage
       |  FROM tbp$MAXW, unnest(list_filter([${(1 to MAXW).map(t => s"g$t").mkString(", ")}],
       |       x -> x IS NOT NULL)) AS u(g)
       |  GROUP BY 1),
       |vocabf AS (
       |  SELECT piece, usage FROM usage
       |  UNION ALL
       |  SELECT v.piece, CAST(0 AS BIGINT) AS usage
       |  FROM vocab0 v ANTI JOIN usage u ON v.piece = u.piece
       |  WHERE length(v.piece) = 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "pipe_unigram_train" ->
      s"""WITH $trainCtes
         |SELECT CAST(row_number() OVER (ORDER BY usage DESC, piece) AS BIGINT) AS rank,
         |       piece, usage
         |FROM vocabf ORDER BY rank""".stripMargin,
    "pipe_unigram_encode" ->
      s"""WITH $trainCtes,
         |wts2 AS (
         |  SELECT piece, ${lgD("greatest(usage, 1)")} - ${lgD("t")} AS wt
         |  FROM vocabf CROSS JOIN
         |    (SELECT CAST(SUM(greatest(usage, 1)) AS BIGINT) AS t FROM vocabf)),
         |vmap2 AS (SELECT map(list(piece), list(wt)) AS vm FROM wts2),
         |${dpCtes("vmap2", "e")},
         |kmap AS (
         |  SELECT w, 63 - ((ca[CAST(length(w) AS INT) + 1] % 64) + 64) % 64 AS k
         |  FROM eca),
         |dwords AS (
         |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
         |                 x -> x <> '' AND length(x) <= $MAXW)) AS w
         |  FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(k) AS BIGINT) AS n_tokens,
         |       CAST(SUM(length(w)) AS BIGINT) AS n_chars,
         |       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS fertility
         |FROM dwords JOIN kmap USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
