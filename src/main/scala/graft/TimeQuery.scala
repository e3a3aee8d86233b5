package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one named query warm, N times in one JVM, then print its
  * formatted plan. Separates plan problems (slow every run) from machine
  * noise (slow once): `runMain graft.TimeQuery <name> [sfDir] [reps]`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.etl.NessusSynth(spark, sfDir)
    graft.etl.Docs.cached(spark, sfDir)
    for (name <- names) {
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[timequery] $name run $i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (names.size == 1) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
