package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL doorway to Spark's own bloom-filter sketch expressions —
  * `BloomFilterAggregate` (builds the sketch as a map-combinable
  * aggregate; merge is a bitwise OR, so the resulting bitset is
  * deterministic regardless of partitioning or row order) and
  * `BloomFilterMightContain` (codegen'd probe against a foldable sketch
  * literal). Spark itself only reaches these through the runtime
  * row-level-filtering optimizer rule; registering them as functions
  * lets an operator use the identical machinery declaratively — the
  * incremental-dedup prefilter ([[graft.ops.ext.Dedup.bloomDedup]])
  * builds one sketch over the history's fingerprints and probes each
  * incoming batch without shuffling it.
  *
  * Both functions take the 64-bit `xxhash64(...)` of the value (the
  * same pre-hash Spark's injected runtime filters use): the sketch
  * stores longs, so the probe side never ships strings into the
  * expression.
  */
object BloomSketch {
  /** `graft_bloom_agg(xxhash64(v), estItems, numBits)` → BINARY sketch;
    * `graft_bloom_might_contain(sketchLit, xxhash64(v))` → BOOLEAN. */
  def register(spark: SparkSession): Unit = {
    Registry.registerOnce(spark, "graft_bloom_agg")(exprs =>
      new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)))
    Registry.registerOnce(spark, "graft_bloom_might_contain")(exprs =>
      BloomFilterMightContain(exprs(0), exprs(1)))
  }

  /** Sketch-size ceiling: 2²⁶ bits = 8 MiB — Spark's own runtime-bloom
    * max (`spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
    * default), which `BloomFilterAggregate` enforces; a sketch also
    * rides plans as a literal, so it must stay executor-memory-trivial.
    * Past ~4M expected keys the bits-per-key ratio shrinks — FPP
    * rises, soundness doesn't move. */
  val MaxBits: Long = 1L << 26

  /** The engine's ONE bloom sizing policy (~16 bits per key, the
    * ~0.05% FPP point), shared by the API and SQL DFP paths so a
    * future tune cannot silently diverge the twins. `items` is floored
    * AGAINST the bits floor: `BloomFilterImpl` derives its
    * hash-function count as `round(bits/items × ln2)`, so a tiny
    * expected-key count under a fixed bits floor would otherwise buy
    * thousands of hash iterations PER PROBED ROW (review find —
    * `bloomKeys = 1` meant k ≈ 45k; flooring items at bits/16 pins
    * k ≈ 11 everywhere). Returns the agg Column; callers supply the
    * pre-hashed `xxhash64(...)` input. */
  def sizedSketchAgg(spark: SparkSession,
      hashed: org.apache.spark.sql.Column,
      expectedKeys: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{call_function, lit}
    register(spark)
    val items0 = math.max(1L, math.min(expectedKeys, 4000000L))
    val bits = math.max(1L << 10, math.min(MaxBits, items0 * 16L))
    val items = math.max(items0, bits / 16L)
    call_function("graft_bloom_agg", hashed, lit(items), lit(bits))
  }
}
