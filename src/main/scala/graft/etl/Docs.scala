package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-nest warehouse tables into the reference's scan-run documents — the
  * shape `export.py:196-215` uploads (one doc per (scan_id, history_id),
  * with the fully enriched host tree in `targets` per the Q2 aliasing).
  * Inverse of [[Normalize]]; used for the export-side sink (K2) and the
  * round-trip property (SURVEY §5.2#4).
  *
  * Array order inside collected lists is nondeterministic (Spark
  * collect_list); consumers must treat the arrays as sets — Normalize does.
  */
object Docs {

  /** Docs memoized per source dir (shared by the etl_normalize_* queries). */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Docs for the deterministic 1/10 run subset `scan_run_id % 10 = 3` —
    * the round-trip queries only need normalization *exercised*, not the
    * whole warehouse re-nested; oracle SQL applies the same predicate.
    */
  def cached(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    memo.computeIfAbsent(
      dir,
      _ => {
        import org.apache.spark.sql.functions.col
        val w = NessusSynth(spark, dir)
        val keep = col("scan_run_id") % 10 === 3
        val hv = w.hostVuln.filter(keep)
        val sub = NessusWarehouse(
          w.folder,
          w.scan,
          w.scanRun.filter(keep),
          w.host.filter(keep),
          hv,
          w.plugin,
          w.vulnOutput
            .join(hv.select("host_vuln_id"), Seq("host_vuln_id"), "left_semi"))
        // Materialize as parquet (see NessusSynth memo note): nested docs
        // are the largest intermediate in the engine; keeping them out of
        // executor memory keeps unrelated queries stable.
        val t0 = System.nanoTime()
        val key = Materialize.sourceKey(
          dir,
          Seq("region", "nation", "orders", "lineitem", "part"))
        val d = Materialize.getOrWrite(spark, key, "docs_mod10_3", scanRunDocs(sub))
        System.err.println(
          f"[docs] nested docs ready for $dir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        d
      })

  private val sevCols =
    Seq("critical_count", "high_count", "medium_count", "low_count", "info_count")

  def scanRunDocs(w: NessusWarehouse): DataFrame = {
    // outputs per (run, host, plugin): distinct {port, output} pairs — the
    // formatted doc shape (P2 already applied, export.py:144-149).
    val outputsNested = w.vulnOutput
      .join(
        w.hostVuln.select("host_vuln_id", "nessus_host_id", "scan_run_id", "plugin_id"),
        Seq("host_vuln_id"))
      .groupBy("scan_run_id", "nessus_host_id", "plugin_id")
      .agg(
        array_distinct(collect_list(struct(col("port"), col("output"))))
          .as("outputs"))

    val pluginStruct = struct(
      col("plugin_id"),
      col("severity"),
      col("name"),
      col("family"),
      col("synopsis"),
      col("description"),
      col("solution"),
      col("cvss_base_score"),
      col("cvss3_base_score"),
      col("cvss_vector"),
      col("cvss3_vector"),
      struct(array(col("ref")).as("see_also")).as("pluginattributes"),
      col("pub_date"),
      col("mod_date"))

    val vulnsNested = outputsNested
      .join(broadcast(w.plugin), Seq("plugin_id"))
      .select(
        col("scan_run_id"),
        col("nessus_host_id"),
        struct(
          pluginStruct.as("plugin"),
          struct(col("nessus_host_id"), col("scan_run_id"), col("plugin_id"))
            .as("host_vuln"),
          col("outputs")).as("vuln"))
      .groupBy("scan_run_id", "nessus_host_id")
      .agg(collect_list("vuln").as("vulnerabilities"))

    val hostsNested = vulnsNested
      .join(w.host, Seq("scan_run_id", "nessus_host_id"))
      .select(
        col("scan_run_id"),
        struct(
          Seq(
            col("nessus_host_id").as("host_id"),
            col("scan_run_id").as("history_id"),
            col("scan_id"),
            struct(
              col("host_ip"),
              col("host_fqdn"),
              col("host_start"),
              col("host_end"),
              col("os")).as("info"),
            col("vulnerabilities")) ++ sevCols.map(col): _*).as("target"))
      .groupBy("scan_run_id")
      .agg(collect_list("target").as("targets"))

    hostsNested
      .join(w.scanRun.drop("targets"), Seq("scan_run_id"))
      .select(
        Seq(
          col("scan_run_id").as("history_id"),
          col("scan_id"),
          col("scan_start").as("scanner_start"),
          col("scan_end").as("scanner_end"),
          col("host_count"),
          col("targets")) ++ sevCols.map(col): _*)
  }
}
