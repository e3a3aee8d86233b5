package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the persisted-store lifecycles — the measurement
  * face behind SCALE.md's per-phase decompositions (write / append /
  * remove / read, and the cc removal chain). Not part of the registry:
  * it exists so "where does the store row's time go" is one `runMain`
  * instead of an argument.
  */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.etl.NessusSynth(spark, sfDir)
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
      println(f"[profile] $name ${(System.nanoTime() - t0) / 1e9}%.2f s  jobs=${jobs.get() - j0}")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val k = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_profile_${ProcessHandle.current().pid()}"
      val base = k
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 3 =!= 0).select(col("n").as("src"), (col("n") + 2).as("dst")))
      phase("write")(graft.ops.Graph.writeEdgeStore(base, idx))
      phase("append")(graft.ops.Graph.appendEdgeStore(
        k.filter(col("n") % 3 === 0).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx))
      phase("remove")(graft.ops.Graph.removeFromEdgeStore(
        k.filter(col("n") % 7 === 0).select(col("n").as("src"), (col("n") + 1).as("dst")),
        idx))
      phase("read")(graft.ops.Graph.readEdgeSupport(spark, idx).count())
      phase("tricount")(graft.ops.Graph.readTriangleCounts(spark, idx).count())
      // --- cc removal decomposition ---
      val cidx = s"${sys.props("java.io.tmpdir")}/graft_profcc_${ProcessHandle.current().pid()}"
      val cbase = k
        .filter(col("n") % 10 <= 8)
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 10 <= 1).select(col("n").as("src"), (col("n") + 2).as("dst")))
      phase("cc_write")(graft.ops.Graph.writeCcStore(cbase, cidx))
      val rem = k
        .filter(col("n") % 10 === 4 || col("n") % 10 === 0)
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 100 === 3).select(col("n").as("src"), (col("n") + 77).as("dst")))
      val liveAfter = cbase.join(
        rem.select(col("src").as("rs"), col("dst").as("rd")),
        col("src") === col("rs") && col("dst") === col("rd"),
        "left_anti")
      phase("cc_remove")(graft.ops.Graph.removeFromCcStore(rem, liveAfter, cidx))
      phase("cc_read")(graft.ops.Graph.readCcLabels(spark, cidx).count())
    }
    spark.stop()
  }
}
