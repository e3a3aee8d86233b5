package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the ANN build/tune paths: per-phase wall times plus a
  * driver-job census over the autotune_build query's constituent stages.
  * Not part of the registry.
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"[profann] $name ${(System.nanoTime() - t0) / 1e9}%.2f s  jobs=${jobs.get() - j0}")
      r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    println(s"[profann] corpus rows=${e.count()}")
    val qs = e.filter(col("vec_id") < 8).localCheckpoint()
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val work = s"${sys.props("java.io.tmpdir")}/graft_profann_${ProcessHandle.current().pid()}_$rep"
      val train = e.filter(col("vec_id") % 3 =!= 0)
      phase("exact_ground_truth") {
        graft.ops.Similarity.bruteForceTopK(qs, e, k = 5).localCheckpoint().count()
      }
      for (nc <- Seq(4, 8, 16)) {
        phase(s"writeIvfIndexTrained nc=$nc") {
          graft.ops.Similarity.writeIvfIndexTrained(e, train, s"$work/nc_$nc", nc, 3)
        }
      }
      phase("autoTuneIvfBuild (all rungs incl rebuilds)") {
        graft.ops.Similarity.autoTuneIvfBuild(
          spark, s"$work/tune", e, qs, k = 5,
          trainSet = Some(train)).count()
      }
    }
    spark.stop()
  }
}
