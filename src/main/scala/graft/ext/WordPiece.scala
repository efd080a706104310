package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece-style GREEDY LONGEST-MATCH-FIRST encoding — the third
  * production tokenizer family beside BPE ([[TextOps]] pipe_bpe_*) and
  * unigram-LM ([[UnigramLM]]): BERT's tokenizer walks each word left to
  * right and always takes the LONGEST vocabulary piece that matches at
  * the cursor. Against the same corpus-derived vocabulary (the
  * [[UnigramLM]] seed policy: top-40 substrings of length ≤ 4 plus every
  * single character, which guarantees encodability without an [UNK]
  * path), the three families' fertilities become directly comparable —
  * the comparison a tokenizer bake-off actually runs. Simplification
  * kept deliberate: one shared vocabulary for initial and continuation
  * positions (real WordPiece trains separate ##-pieces; the greedy
  * SEARCH — the part that differs from BPE merges and unigram Viterbi —
  * is what this operator verifies).
  *
  * The greedy walk is one aggregate() fold over ≤ 8 steps with the
  * cursor and token count PACKED into a single BIGINT (16·pos + k), so
  * DuckDB's list_reduce replays it exactly (its accumulator must be a
  * scalar — the [[UnigramLM]] packing discipline). Each step tries piece
  * lengths 4→1 in fixed CASE order; both engines take the same branch.
  *
  * At 100 TB: encoding runs at WORD-TYPE grain (Heaps-law sublinear)
  * against a broadcast KB-scale vocabulary map; the corpus is touched
  * only by the final token-count join — the same merge-table-resident
  * shape as the BPE and unigram encoders.
  */
object WordPiece {

  private val MAXW = 8  // max word length covered (mirrors UnigramLM)
  private val PLEN = 4  // max piece length
  private val VTOP = 40 // seed vocab cap (single chars always kept)

  private def wordTypes(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= MAXW)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  private def seedVocab(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seeds = wordTypes(s, d)
      .select(col("cnt"), explode(expr(
        s"flatten(transform(sequence(1, $PLEN), l -> " +
          s"filter(transform(sequence(1, $MAXW), i -> " +
          s"CASE WHEN i + l - 1 <= length(w) THEN substring(w, i, l) END), " +
          "x -> x IS NOT NULL)))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
    // vocabulary-grain rank window — bounded, not a scale risk
    val rn = row_number().over(Window.orderBy(desc("c"), col("piece")))
    seeds.withColumn("rn", rn)
      .filter(col("rn") <= VTOP || length(col("piece")) === 1)
      .select(col("piece"))
  }

  /** Packed greedy fold: acc = 16·cursor + tokens; each step advances
    * the cursor by the longest matching piece (4→1, single chars always
    * match) and increments the count; past-the-end steps are no-ops.
    */
  private def foldExpr: String = {
    def tryLen(l: Int) =
      s"WHEN acc div 16 + ${l - 1} <= length(w) AND " +
        s"element_at(vm, substring(w, CAST(acc div 16 AS INT), $l)) IS NOT NULL THEN $l"
    s"""(aggregate(sequence(1, $MAXW), CAST(16 AS BIGINT), (acc, i) ->
       |  CASE WHEN acc div 16 > length(w) THEN acc
       |  ELSE acc + 16 * (CASE ${(PLEN to 2 by -1).map(tryLen).mkString(" ")}
       |                   ELSE 1 END) + 1
       |  END) % 16)""".stripMargin
  }

  def wordpieceEncode(s: SparkSession, d: String): DataFrame = {
    val vm = seedVocab(s, d)
      .agg(map_from_entries(collect_list(struct(col("piece"), lit(1L))))
        .as("vm"))
    val kmap = wordTypes(s, d).crossJoin(broadcast(vm))
      .select(col("w"), expr(foldExpr).as("k"))
    Tables.documents(s, d)
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
    "pipe_wordpiece_encode" -> wordpieceEncode)

  val oracle: Map[String, String] = Map(
    "pipe_wordpiece_encode" -> {
      def tryLen(l: Int) =
        s"WHEN s // 16 + ${l - 1} <= length(w) AND " +
          s"vm[substr(w, CAST(s // 16 AS INT), $l)][1] IS NOT NULL THEN $l"
      s"""WITH words AS (
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
         |  SELECT piece FROM (
         |    SELECT piece, row_number() OVER (ORDER BY c DESC, piece) AS rn
         |    FROM seeds) WHERE rn <= $VTOP OR length(piece) = 1),
         |vmap AS (SELECT map(list(piece), list(1)) AS vm FROM vocab0),
         |km AS (
         |  SELECT w,
         |    list_reduce(list_prepend(CAST(16 AS BIGINT),
         |        [CAST(0 AS BIGINT) for i in range($MAXW)]), (s, x) ->
         |      CASE WHEN s // 16 > length(w) THEN s
         |      ELSE s + 16 * (CASE ${(PLEN to 2 by -1).map(tryLen).mkString(" ")}
         |                     ELSE 1 END) + 1
         |      END) % 16 AS k
         |  FROM words CROSS JOIN vmap),
         |tok AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         |    FROM documents) WHERE w <> '' AND length(w) <= $MAXW),
         |per AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |         CAST(SUM(k) AS BIGINT) AS n_tokens,
         |         CAST(SUM(length(w)) AS BIGINT) AS n_chars
         |  FROM tok JOIN km USING (w) GROUP BY 1)
         |SELECT doc_id, n_words, n_tokens, n_chars,
         |       CAST(n_tokens AS DOUBLE) / n_words AS fertility
         |FROM per ORDER BY doc_id""".stripMargin
    })
}
