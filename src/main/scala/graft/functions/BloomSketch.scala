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
}
