package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine Bloom filter, the membership-sketch sibling of
  * [[HyperLogLog]]: a 3840-bit filter (64 lanes × 60 bits — lanes stay
  * under 2^63 so DuckDB's overflow-trapping BIGINT replays every shift)
  * built with k=3 md5-derived hash positions per key and a `bit_or`
  * aggregate, then probed for membership. Both the build and the probe
  * are plain relational plans, so the ENTIRE sketch is hash-verified
  * against DuckDB — not just bounded like a black-box sketch.
  *
  * Scale shape: the build is one partial-aggregated groupBy over ≤64
  * lane rows (the map-side bit_or collapses each partition to ≤64 rows
  * before the shuffle); the probe broadcasts those 64 rows. This is the
  * join-pruning pattern AQE uses internally for runtime row-level
  * filtering: build on the small/filtered side, probe the big side
  * without shuffling it. Size M to the expected key count — a fixed
  * 3840-bit filter saturates (all-maybe, still correct, no pruning) once
  * keys × k approach M.
  */
object BloomFilter {
  private val LANES = 64         // 64 × 60 = 3840 bits
  private val BITS = LANES * 60
  private val OFFSETS = Seq(1, 5, 9) // three disjoint 4-hex-digit slices

  /** Spark SQL fragment: bit position of probe `off` for key expr `k`. */
  private def sparkPos(k: String, off: Int): String =
    s"${Hashing.sparkHashSlice(s"CAST($k AS STRING)", off, 4)} % $BITS"

  /** DuckDB twin of [[sparkPos]] — same value for the same key. */
  private def duckPos(k: String, off: Int): String =
    s"(${Hashing.duckHashSlice(s"CAST($k AS VARCHAR)", off, 4)} % $BITS)"

  /** Seen-set predicate — interpolated into query AND oracle. */
  private val SEEN = "l_returnflag = 'R' AND l_quantity >= 49 AND l_extendedprice >= 80000"

  /** Build a Bloom filter over the part keys of high-value returned
    * lineitems, probe every part: (bloom_maybe, is_member) per part.
    * min(hit) over the k probes = all-bits-set; a LEFT join to the lane
    * table keeps lanes with no set bits as miss (hit 0), and the verified
    * no-false-negative invariant is is_member=1 ⇒ bloom_maybe=1
    * (ExtensionSpec asserts it; the oracle hash-checks every row).
    */
  def bloomProbe(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint: the seen frame feeds the filter build AND the
    // ground-truth membership join — without it lineitem is scanned and
    // distinct-aggregated twice for an identical tiny frame
    val seen = Tables.lineitem(s, d)
      .filter(expr(SEEN))
      .select(col("l_partkey")).distinct().localCheckpoint()
    val build = seen
      .select(explode(array(OFFSETS.map(o => expr(sparkPos("l_partkey", o))): _*)).as("pos"))
      .select(expr("pos DIV 60").as("lane"),
        expr("shiftleft(1L, CAST(pos % 60 AS INT))").as("mask"))
      .groupBy(col("lane")).agg(bit_or(col("mask")).as("bits"))
    val tested = Tables.part(s, d).select(col("p_partkey"))
      .select(col("p_partkey"),
        explode(array(OFFSETS.map(o => expr(sparkPos("p_partkey", o))): _*)).as("pos"))
      .withColumn("lane", expr("pos DIV 60"))
      .withColumn("bit", expr("CAST(pos % 60 AS INT)"))
      .join(broadcast(build), Seq("lane"), "left")
      .withColumn("hit", coalesce(expr("shiftright(bits, bit) & 1L"), lit(0L)))
      .groupBy(col("p_partkey"))
      .agg(min(col("hit")).as("bloom_maybe"))
    tested
      .join(broadcast(seen.withColumn("m", lit(1))),
        tested("p_partkey") === col("l_partkey"), "left")
      .select(col("p_partkey"), col("bloom_maybe"),
        coalesce(col("m"), lit(0)).as("is_member"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bloom_probe" -> bloomProbe
  )

  val oracle: Map[String, String] = Map(
    "x_bloom_probe" ->
      s"""WITH seen AS (
         |  SELECT DISTINCT l_partkey FROM lineitem WHERE $SEEN),
         |pos AS (
         |  SELECT unnest([${OFFSETS.map(o => duckPos("l_partkey", o)).mkString(", ")}]) AS pos
         |  FROM seen),
         |build AS (
         |  SELECT pos // 60 AS lane,
         |         bit_or((1::BIGINT) << CAST(pos % 60 AS INT)) AS bits
         |  FROM pos GROUP BY 1),
         |probe AS (
         |  SELECT p_partkey,
         |         unnest([${OFFSETS.map(o => duckPos("p_partkey", o)).mkString(", ")}]) AS pos
         |  FROM part),
         |tested AS (
         |  SELECT p_partkey,
         |         COALESCE((bits >> CAST(pos % 60 AS INT)) & 1, 0) AS hit
         |  FROM probe LEFT JOIN build ON pos // 60 = lane)
         |SELECT t.p_partkey, CAST(MIN(hit) AS BIGINT) AS bloom_maybe,
         |       CASE WHEN s.l_partkey IS NOT NULL THEN 1 ELSE 0 END AS is_member
         |FROM tested t LEFT JOIN seen s ON t.p_partkey = s.l_partkey
         |GROUP BY 1, 3 ORDER BY p_partkey""".stripMargin
  )
}
