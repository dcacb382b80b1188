package graft.ops.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting. AQE's skew-join split
  * handles most cases at runtime (enabled in Graft.configure); explicit
  * salting remains the tool when one key dominates so heavily that even
  * split partitions hot-spot a single executor — e.g. joining a 100 TB
  * event stream (5 distinct event types) against a per-type dim.
  *
  * The fact side gets a deterministic salt from a high-cardinality
  * column; the dim side is replicated `salts` ways, so the join key
  * becomes (key, salt) with `salts`× the parallelism. Semantics are
  * identical to the unsalted join for any fact⋈dim equi-join (each fact
  * row meets exactly one replica of its dim row) — SkewSpec asserts it.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int, joinType: String = "left_outer"): DataFrame = {
    // right/full joins would surface each unmatched dim row `salts` times
    require(Set("inner", "left", "leftouter", "leftsemi", "cross")
      .contains(joinType.toLowerCase.replaceAll("_", "")),
      s"saltedJoin supports inner/left join types, got $joinType")
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedFact
      .join(replicatedDim, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
