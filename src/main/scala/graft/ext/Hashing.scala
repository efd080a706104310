package graft.ext

/** A 60-bit string hash computable bit-identically in Spark AND DuckDB —
  * the foundation of every oracle-verified sketch (MinHash, SimHash,
  * banding, fingerprints).
  *
  *   Spark:  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
  *   DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
  *
  * 15 hex digits = 60 bits, always positive, no sign-extension issues.
  * md5 is identical everywhere; the engines only differ in hex→int
  * syntax. Salted family: h_i(x) = H(concat(i, ':', x)) — independent
  * enough for MinHash at k ≤ 64.
  *
  * Scale note: at 100 TB this hash runs inside whole-stage codegen (md5 +
  * conv are both codegen'd builtins); for pure-Spark pipelines where
  * cross-engine parity is not needed, xxhash64() is ~5× faster and the
  * drop-in alternative.
  */
object Hashing {
  /** Spark SQL fragment hashing the given SQL expression to a 60-bit long. */
  def sparkHash(e: String): String = sparkHashSlice(e, 1, 15)

  /** DuckDB SQL fragment — same value as [[sparkHash]] for the same input. */
  def duckHash(e: String): String = duckHashSlice(e, 1, 15)

  /** General md5 hex-digit slice → BIGINT (len ≤ 15 keeps it positive and
    * under 2^60); independent slices give the cheap hash family sketches
    * build on (e.g. the Bloom probe positions).
    */
  def sparkHashSlice(e: String, off: Int, len: Int): String =
    s"CAST(conv(substring(md5($e), $off, $len), 16, 10) AS BIGINT)"

  /** DuckDB twin of [[sparkHashSlice]] — same value for the same input. */
  def duckHashSlice(e: String, off: Int, len: Int): String =
    s"CAST('0x' || substr(md5($e), $off, $len) AS BIGINT)"
}
