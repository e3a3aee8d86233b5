package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the setjoin / token-edit index lifecycles: per-phase
  * wall times plus a driver-job census. Not part of the registry.
  */
object ProfileDedup {
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
      println(f"[profdd] $name ${(System.nanoTime() - t0) / 1e9}%.2f s  jobs=${jobs.get() - j0}")
      r
    }
    graft.etl.NessusSynth(spark, sfDir)
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val p = s"${sys.props("java.io.tmpdir")}/graft_profdd_${ProcessHandle.current().pid()}_$rep"
      val batch = d
        .filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionAll(
          d.filter(col("doc_id") % 10 === 5)
            .select(
              (col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" fresh crawl "), col("doc_id").cast("string"))
                .as("text")))
      val decoys = batch
        .filter(col("doc_id") >= 2000000L)
        .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
      phase("writeSetJoinIndex")(graft.ops.Dedup.writeSetJoinIndex(d, p))
      phase("appendSetJoinIndex")(graft.ops.Dedup.appendSetJoinIndex(decoys, p))
      phase("deleteFromIndex")(
        graft.ops.Similarity.deleteFromIndex(decoys.select("doc_id"), p, idCol = "doc_id"))
      phase("compactSetJoinIndex")(graft.ops.Dedup.compactSetJoinIndex(spark, p))
      phase("probeSetJoinIndex")(graft.ops.Dedup.probeSetJoinIndex(spark, p, batch).count())
      val tp = s"${sys.props("java.io.tmpdir")}/graft_profte_${ProcessHandle.current().pid()}_$rep"
      phase("writeTokenEditIndex")(graft.ops.Dedup.writeTokenEditIndex(d, tp))
      phase("appendTokenEditIndex")(graft.ops.Dedup.appendTokenEditIndex(decoys, tp))
      phase("deleteFromIndex(te)")(
        graft.ops.Similarity.deleteFromIndex(decoys.select("doc_id"), tp, idCol = "doc_id"))
      phase("compactTokenEditIndex")(graft.ops.Dedup.compactTokenEditIndex(spark, tp))
      phase("probeTokenEditIndex")(graft.ops.Dedup.probeTokenEditIndex(spark, tp, batch).count())
    }
    spark.stop()
  }
}
