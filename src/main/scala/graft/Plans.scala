package graft

import graft.etl.NessusSynth
import graft.queries.ScanQueries
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the headline queries. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = NessusSynth(spark, dir)
    println("=== scan_results ===")
    ScanQueries.scanResults(w, 7, 0).explain("formatted")
    println("=== folder_stats ===")
    ScanQueries.folderStats(w, 1, 0).explain("formatted")
    // the heavy dedup/ANN family — the plans whose shape the scale story
    // depends on (materialized reuse, banded equi-joins, broadcasts)
    for (name <- args.drop(1)) {
      println(s"=== $name ===")
      SparkEntry.queries.get(name) match {
        case Some(q) => q(spark, dir).explain("formatted")
        case None =>
          println(
            s"unknown query '$name'; valid names:\n  " +
              SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      }
    }
    spark.stop()
  }
}
