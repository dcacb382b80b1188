package graft.tools

import graft.ops.lake.Snapshots

/** IN-list manifest-prune cost receipt (builder QA, r13): the r13
  * rewrite replaced the per-literal anyOf range checks — O(keys) per
  * manifest entry — with one binary search over the sorted value list.
  * This probe times both forms on a synthetic manifest at the scale
  * the claim is about (10⁵ entries × 10⁴ keys; a 100 TB table is 10⁶+
  * entries), and checks they agree entry-for-entry. Pure driver-side —
  * no Spark session, exactly like the listFiles hot path it models. */
object InListProbe {
  def main(args: Array[String]): Unit = {
    val nEntries = args.headOption.map(_.toInt).getOrElse(100000)
    val nKeys = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val rnd = new scala.util.Random(42)
    // key-clustered entries over a 10⁸ key space: each file spans a
    // narrow range, like stageWithStats layouts
    val span = 100000000L
    val width = span / nEntries
    val entries = (0 until nEntries).map { i =>
      val lo = i * width
      Snapshots.Entry(s"__tag=t/p$i.parquet", "t",
        Map("min.k" -> lo.toDouble.toString,
          "max.k" -> (lo + width - 1).toDouble.toString))
    }
    val keys = IndexedSeq.fill(nKeys)(rnd.nextLong(span).toDouble)

    val linear = Snapshots.anyOf(keys.map(v =>
      Snapshots.rangeOverlap("k", v, v)): _*)
    val sorted = Snapshots.rangeOverlapAnySorted("k", keys.sorted)

    def timed(p: Snapshots.Entry => Boolean): (Int, Double) = {
      val t0 = System.nanoTime()
      val kept = entries.count(p)
      (kept, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once (JIT), then measure
    timed(sorted); timed(linear)
    val (kS, tS) = timed(sorted)
    val (kL, tL) = timed(linear)
    val agree = entries.forall(e => sorted(e) == linear(e))
    println(f"[inlist] entries=$nEntries%7d keys=$nKeys%6d | " +
      f"binary-search=$tS%8.3fs linear-anyOf=$tL%8.3fs " +
      f"(${tL / tS}%6.1fx) | kept $kS/$kL " +
      (if (agree && kS == kL) "(agree)" else "(MISMATCH!)"))
  }
}
