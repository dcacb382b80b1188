package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r17 optimization probe: where does q1_agg's time go?
  * Decomposes the TPC-H-Q1 shape into (a) bare scan, (b) double sums,
  * (c) the current DECIMAL(25,6) sums, (d) LONG fixed-point sums — all
  * through the noop sink (guide §1.4) so the full column set
  * materializes. Timings are medians of 3 after a warm run, same JVM.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.AggCostProbe
  */
object AggCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.configure(
      SparkSession.builder().master(s"local[${graft.engine.Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.engine.Tables(spark, dir).lineitem

    def time(name: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val ts = Seq.fill(3)(once()).sorted
      println(f"[probe] $name%-28s median=${ts(1)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("scan_only")(li.select("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus"))
    time("group_count_only")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n")))
    time("double_sums")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("a"),
        sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
        count(lit(1)).as("n")))
    time("decimal_sums_current")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(graft.engine.Exact.decSum(col("l_quantity")).as("a"),
        graft.engine.Exact.decSum(col("l_extendedprice")).as("b"),
        graft.engine.Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
        count(lit(1)).as("n")))
    time("decimal_sum_one")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(graft.engine.Exact.decSum(col("l_quantity")).as("a"),
        count(lit(1)).as("n")))
    time("decimal_sum_price_only")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(graft.engine.Exact.decSum(col("l_extendedprice")).as("b"),
        count(lit(1)).as("n")))
    time("decimal_sum_product_only")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(graft.engine.Exact.decSum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
        count(lit(1)).as("n")))
    // long fixed-point: round(x*1e6) as long, summed; rescaled at the end
    def lsum(c: org.apache.spark.sql.Column) =
      sum(round(c * lit(1e6)).cast("long"))
    time("long_fixedpoint_sums")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(lsum(col("l_quantity")).as("a"),
        lsum(col("l_extendedprice")).as("b"),
        lsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
        count(lit(1)).as("n")))
    // decimal sums fed by DECIMAL-cast inputs in a separate project
    // (same math, but the cast runs in the project, not the agg)
    time("decimal_sums_pre_project") {
      val pre = li.select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(DecimalType(25, 6)).as("qd"),
        col("l_extendedprice").cast(DecimalType(25, 6)).as("pd"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(25, 6)).as("dd"))
      pre.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("qd").cast(DecimalType(25, 6)).as("a"),
          sum("pd").cast(DecimalType(25, 6)).as("b"),
          sum("dd").cast(DecimalType(25, 6)).as("c"),
          count(lit(1)).as("n"))
    }
    // decimal(18,6) inputs: sum buffer stays in precision-28 range but
    // inputs are compact-long Decimals
    time("decimal18_sums")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 6))).as("a"),
        sum(col("l_extendedprice").cast(DecimalType(18, 6))).as("b"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))).as("c"),
        count(lit(1)).as("n")))
    // equality check: fixSum vs decSum on every fixture money column
    import graft.engine.Exact
    val ev = graft.engine.Tables(spark, dir).events
    val or = graft.engine.Tables(spark, dir).orders
    def eq(name: String, df: DataFrame, a: org.apache.spark.sql.Column,
           b: org.apache.spark.sql.Column, keys: Seq[String]): Unit = {
      val cmp = df.groupBy(keys.map(col): _*)
        .agg(a.as("dec"), b.as("fix"))
        .filter(col("dec") =!= col("fix") ||
          col("dec").isNull =!= col("fix").isNull)
        .count()
      println(s"[probe-eq] $name diffs=$cmp")
    }
    eq("qty_d2", li, Exact.decSum(col("l_quantity")), Exact.fixSum(col("l_quantity"), 2),
      Seq("l_returnflag", "l_linestatus"))
    eq("price_d2", li, Exact.decSum(col("l_extendedprice")), Exact.fixSum(col("l_extendedprice"), 2),
      Seq("l_returnflag", "l_linestatus"))
    eq("product_d4", li,
      Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
      Exact.fixSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4),
      Seq("l_returnflag", "l_linestatus"))
    eq("value_d2", ev, Exact.decSum(col("value")), Exact.fixSum(col("value"), 2),
      Seq("event_type"))
    eq("totalprice_d2", or, Exact.decSum(col("o_totalprice")), Exact.fixSum(col("o_totalprice"), 2),
      Seq("o_orderstatus"))
    eq("qty_sq_d4", li, Exact.decSum(col("l_quantity") * col("l_quantity")),
      Exact.fixSum(col("l_quantity") * col("l_quantity"), 4), Seq("l_returnflag"))
    time("fixsum_sums_q1_shape")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(Exact.fixSum(col("l_quantity"), 2).as("a"),
        Exact.fixSum(col("l_extendedprice"), 2).as("b"),
        Exact.fixSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("c"),
        count(lit(1)).as("n")))
    // decimal CAST cost without aggregation (projection only)
    time("decimal_cast_project")(li.select(
      col("l_quantity").cast(DecimalType(25, 6)).as("a"),
      col("l_extendedprice").cast(DecimalType(25, 6)).as("b"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(25, 6)).as("c")))
    spark.stop()
  }
}
