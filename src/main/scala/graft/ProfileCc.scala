package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the CC star-contraction kernel and the cc-store
  * removal path: per-phase wall times plus a driver-job census, so "where
  * do the cc rows' seconds go" is a printed table, not an argument.
  * Not part of the registry.
  */
object ProfileCc {
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
      println(f"[profcc] $name ${(System.nanoTime() - t0) / 1e9}%.2f s  jobs=${jobs.get() - j0}")
      r
    }
    val k = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey").cast("long").as("n")).distinct()
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val cbase = k
        .filter(col("n") % 10 <= 8)
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 10 <= 1).select(col("n").as("src"), (col("n") + 2).as("dst")))
      val und = phase("normalize+checkpoint") {
        val u = cbase
          .filter(col("src") =!= col("dst"))
          .select(
            least(col("src"), col("dst")).as("u"),
            greatest(col("src"), col("dst")).as("v"))
          .distinct()
          .localCheckpoint()
        u.count()
        u
      }
      val labels = phase("clusterPairs") {
        val l = graft.ops.Dedup.clusterPairs(und, "u", "v").localCheckpoint()
        l.count()
        l
      }
      println(s"[profcc] labels=${labels.count()}")
      // full store lifecycle for comparison
      phase("triangleSupport(base)") {
        graft.ops.Graph.triangleSupport(cbase).write.format("noop").mode("overwrite").save()
      }
      val cidx = s"${sys.props("java.io.tmpdir")}/graft_profcc2_${ProcessHandle.current().pid()}_$rep"
      phase("writeCcStore")(graft.ops.Graph.writeCcStore(cbase, cidx))
      val rem = k
        .filter(col("n") % 10 === 4 || col("n") % 10 === 0)
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 100 === 3).select(col("n").as("src"), (col("n") + 77).as("dst")))
      val liveAfter = cbase.join(
        rem.select(col("src").as("rs"), col("dst").as("rd")),
        col("src") === col("rs") && col("dst") === col("rd"),
        "left_anti")
      phase("removeFromCcStore")(graft.ops.Graph.removeFromCcStore(rem, liveAfter, cidx))
      phase("readCcLabels")(graft.ops.Graph.readCcLabels(spark, cidx).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
