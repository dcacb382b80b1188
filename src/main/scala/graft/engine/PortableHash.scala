package graft.engine

/** The engine-portable 60-bit hash: the first 15 hex chars of an md5,
  * decoded as a BIGINT. DuckDB twin, restated verbatim in oracle SQL:
  * `('0x' || substring(md5(<expr>), 1, 15))::BIGINT`.
  *
  * This is THE load-bearing cross-engine primitive — minhash/simhash
  * signatures, HLL bucketing, sampling/sharding membership, gram
  * blocking all hash through it, and the DuckDB oracles hand-match the
  * 15-char prefix width. One definition so the Spark sites cannot
  * drift from each other (the oracle strings still restate the twin
  * per query, as they must — they ship to a different engine).
  */
object PortableHash {

  /** Spark SQL fragment hashing the STRING expression `e` (md5 runs on
    * its UTF-8 bytes — identical to DuckDB's `md5(VARCHAR)`). */
  def md5Prefix60(e: String): String =
    s"cast(conv(substring(md5(cast($e as binary)), 1, 15), 16, 10) as bigint)"
}
