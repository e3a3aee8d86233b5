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
    spark.stop()
  }
}
