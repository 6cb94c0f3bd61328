package graft.operators

/** Hash-family selector shared by the minhash / decontaminate /
  * fingerprint operators. A sealed type rather than a string because the
  * family changes the RESULT type in `fingerprint` (md5 → hex string,
  * xxhash64 → bigint): a producer/consumer pair built with different
  * families would join on nothing, silently. A compile-time mismatch is
  * the failure mode we want.
  */
sealed trait HashFamily
object HashFamily {

  /** Oracle form — DuckDB computes the identical digest, so oracle
    * queries pin this family.
    */
  case object Md5 extends HashFamily

  /** Production family — codegen'd 64-bit mix, no hex round-trip;
    * ~25% faster minhash and an 8-byte broadcast key in decontaminate
    * (A/B numbers in BASELINE.md).
    */
  case object XxHash64 extends HashFamily
}
