package graft.ext

/** Exact 16-fractional-bit fixed-point log2 of a positive BIGINT,
  * computable BIT-IDENTICALLY in Spark and DuckDB — the primitive that
  * opens the logarithmic metric family (entropy, KL divergence,
  * log-likelihoods, log-survival) to hash verification, which `ln`/`exp`
  * never can (they are not correctly rounded and differ across libm
  * implementations; see the [[graft.Det]] float discipline).
  *
  * Algorithm (classic square-and-shift): `length(bin(c)) - 1` is
  * ⌊log2 c⌋ (the established bit-length idiom across the QC family);
  * the mantissa `c / 2^⌊log2 c⌋` is held in 2^16 fixed point and squared
  * 16 times — each squaring that reaches [2,4) emits a 1-bit and halves,
  * in [1,2) emits a 0-bit — extracting 16 fraction bits exactly. Every
  * step is a BIGINT multiply or truncating divide, i.e. engine-identical
  * integer arithmetic; the running (mantissa, bits) pair is packed into
  * one BIGINT (mantissa·2^32 + bits) so the whole loop is a fold over a
  * 16-element sequence.
  *
  * The result is lg(c) = ⌊65536·log2(c)⌋ exactly (truncated, never
  * rounded). Composite metrics must therefore be DEFINED over this
  * truncated primitive — e.g. entropy as lg(n) − (Σ cᵢ·lg(cᵢ)) div n —
  * rather than "the true metric, approximately": both engines then
  * compute the same well-defined integer, and a final int64→float64
  * cast (exemption-safe) yields a hash-stable double in bits.
  *
  * First built for the unigram tokenizer's piece log-odds
  * ([[UnigramLM]]); shared here for entropy/KL/survival metrics.
  * Contract: the argument expression must evaluate to a BIGINT ≥ 1.
  */
object FixLog {

  /** Spark SQL fragment: ⌊65536·log2(c)⌋ for BIGINT expression `c` ≥ 1. */
  def lgS(c: String): String = {
    val m0 = s"((($c) * 65536L) div shiftleft(CAST(1 AS BIGINT), length(bin($c)) - 1)) * 4294967296L"
    val sq = "((s div 4294967296L) * (s div 4294967296L)) div 65536L"
    s"((length(bin($c)) - 1) * 65536L + (aggregate(sequence(1, 16), CAST($m0 AS BIGINT), (s, i) -> " +
      s"CASE WHEN $sq >= 131072L THEN (($sq) div 2L) * 4294967296L + ((s % 4294967296L) * 2L + 1L) " +
      s"ELSE ($sq) * 4294967296L + (s % 4294967296L) * 2L END) % 4294967296L))"
  }

  /** DuckDB twin of [[lgS]] — same value for the same input. */
  def lgD(c: String): String = {
    val m0 = s"((($c) * 65536) // (1 << (length(bin($c)) - 1))) * 4294967296"
    val sq = "((s // 4294967296) * (s // 4294967296)) // 65536"
    s"((length(bin($c)) - 1) * 65536 + (list_reduce(list_prepend(CAST($m0 AS BIGINT), " +
      "[CAST(0 AS BIGINT) for i in range(16)]), (s, x) -> " +
      s"CASE WHEN $sq >= 131072 THEN (($sq) // 2) * 4294967296 + ((s % 4294967296) * 2 + 1) " +
      s"ELSE ($sq) * 4294967296 + (s % 4294967296) * 2 END) % 4294967296))"
  }
}
