package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the correlation-kernel arithmetic (gen_correlation /
  * gen_spearman): times isolated variants of the moment aggregation so
  * "is it the decimal multiply, the decimal sum, or the scan" is a
  * printed number. Not part of the registry.
  */
object ProfileCorr {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(cols.map(c => round(col(c).cast("double") * 1000, 0).cast("long").as(c)): _*)
      .localCheckpoint()
    println(s"[profcorr] rows=${li.count()}")
    def time(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[profcorr] $name run $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size } yield (cols(i), cols(j))
    // variant A: the current kernel's shape — decimal multiply + decimal sum
    time("A decimalMul+decimalSum (37 aggs)") {
      val aggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
        val both = col(a).isNotNull && col(b).isNotNull
        def s(e: org.apache.spark.sql.Column, n: String) =
          sum(when(both, e).otherwise(lit(null))).cast("decimal(38,0)").as(s"${n}_$k")
        Seq(
          count(when(both, lit(1))).cast("long").as(s"n_$k"),
          s(expr(s"CAST($a AS DECIMAL(38,0))"), "sx"),
          s(expr(s"CAST($b AS DECIMAL(38,0))"), "sy"),
          s(expr(s"CAST($a AS DECIMAL(38,0)) * $a"), "sxx"),
          s(expr(s"CAST($b AS DECIMAL(38,0)) * $b"), "syy"),
          s(expr(s"CAST($a AS DECIMAL(38,0)) * $b"), "sxy"))
      }
      li.agg(aggs.head, aggs.tail: _*).write.format("noop").mode("overwrite").save()
    }
    // variant B: long multiply, decimal sum (same 37 aggs)
    time("B longMul+decimalSum (37 aggs)") {
      val aggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
        val both = col(a).isNotNull && col(b).isNotNull
        def s(e: org.apache.spark.sql.Column, n: String) =
          sum(when(both, e).otherwise(lit(null))).cast("decimal(38,0)").as(s"${n}_$k")
        Seq(
          count(when(both, lit(1))).cast("long").as(s"n_$k"),
          s(expr(s"CAST($a AS DECIMAL(38,0))"), "sx"),
          s(expr(s"CAST($b AS DECIMAL(38,0))"), "sy"),
          s(expr(s"CAST($a * $a AS DECIMAL(38,0))"), "sxx"),
          s(expr(s"CAST($b * $b AS DECIMAL(38,0))"), "syy"),
          s(expr(s"CAST($a * $b AS DECIMAL(38,0))"), "sxy"))
      }
      li.agg(aggs.head, aggs.tail: _*).write.format("noop").mode("overwrite").save()
    }
    // variant C: dense — no per-pair null masks (listwise contract), 15 aggs
    time("C dense decimalMul (15 aggs)") {
      val aggs =
        Seq(count(lit(1)).cast("long").as("n")) ++
          cols.map(a => sum(expr(s"CAST($a AS DECIMAL(38,0))")).cast("decimal(38,0)").as(s"sx_$a")) ++
          cols.map(a => sum(expr(s"CAST($a AS DECIMAL(38,0)) * $a")).cast("decimal(38,0)").as(s"sxx_$a")) ++
          pairs.zipWithIndex.map { case ((a, b), k) =>
            sum(expr(s"CAST($a AS DECIMAL(38,0)) * $b")).cast("decimal(38,0)").as(s"sxy_$k")
          }
      li.agg(aggs.head, aggs.tail: _*).write.format("noop").mode("overwrite").save()
    }
    // variant D: hi/lo long split — all per-row ops long, 2 long sums per moment
    time("D longMul hi/lo longSum (dense)") {
      val sh = 1L << 30
      def hilo(e: String, n: String) = Seq(
        sum(expr(s"($e) div $sh")).as(s"${n}_hi"),
        sum(expr(s"($e) % $sh")).as(s"${n}_lo"))
      val aggs =
        Seq(count(lit(1)).cast("long").as("n")) ++
          cols.flatMap(a => hilo(s"$a", s"sx_$a")) ++
          cols.flatMap(a => hilo(s"$a * $a", s"sxx_$a")) ++
          pairs.zipWithIndex.flatMap { case ((a, b), k) => hilo(s"$a * $b", s"sxy_$k") }
      li.agg(aggs.head, aggs.tail: _*).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
