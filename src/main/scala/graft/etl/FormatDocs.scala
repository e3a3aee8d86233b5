package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw extraction bundles ([[graft.schema.Schemas.rawScanRunDoc]]) → the
  * reference's uploaded scan-run documents (`export.py:188-215`):
  *
  *  - P1 `format_plugin`: ref = newline-join of pluginattributes.see_also
  *  - P2 `format_vuln_outputs`: ports-map keys × outputs → {port, output}
  *  - P3 `format_host_vuln`: the (plugin, host_vuln, outputs) triple
  *  - P4 `format_host`: id/severity-count enrichment of each host
  *  - P5 `scan_summary`: run-level projection; Q2's targets = the fully
  *    formatted host tree
  *  - A1 `calculate_severities` at host and run level (Q1 flag honored)
  *
  * Everything is array/struct higher-order functions — the whole formatting
  * stage is a narrow projection with NO shuffle, in contrast to the
  * reference's per-host/per-vuln REST fan-out (J7). At 100 TB this stage
  * pipelines with the landing write.
  */
object FormatDocs {

  /** A1 as an array fold: weighted count of `severity == sev` entries. */
  private def sevCount(vulns: Column, sev: Int): Column =
    aggregate(
      vulns,
      lit(0L),
      (acc, v) =>
        acc + when(v.getField("severity") === sev, v.getField("count")).otherwise(0L))

  private def sevCols(vulns: Column, legacy: Boolean): Seq[Column] =
    Seq(
      sevCount(vulns, 4).as("critical_count"),
      sevCount(vulns, 3).as("high_count"),
      sevCount(vulns, 2).as("medium_count"),
      sevCount(vulns, 1).as("low_count"),
      (if (legacy) lit(0L) else sevCount(vulns, 0)).as("info_count"))

  /** P2: one {port, output} pair per key of each output's ports map. */
  def unnestPorts(outputs: Column): Column =
    flatten(
      transform(
        outputs,
        o =>
          transform(
            map_keys(o.getField("ports")),
            k =>
              struct(
                k.as("port"),
                o.getField("plugin_output").as("output")))))

  /** Format one raw bundle into the uploaded document shape. */
  def apply(raw: DataFrame, legacySeverity: Boolean = false): DataFrame = {
    val targets = transform(
      col("hosts"),
      h => {
        val vulnsArr = h.getField("vulnerabilities")
        val vulnDocs = transform(
          h.getField("plugin_outputs"),
          p =>
            struct(
              // P1: decorate the plugin description with the derived ref
              p.getField("info")
                .getField("plugindescription")
                .withField(
                  "ref",
                  array_join(
                    p.getField("info")
                      .getField("plugindescription")
                      .getField("pluginattributes")
                      .getField("see_also"),
                    "\n"))
                .as("plugin"),
              // P3: the host_vuln triple (scan_run_id := history_id)
              struct(
                h.getField("host_id").as("nessus_host_id"),
                col("history_id").as("scan_run_id"),
                p.getField("plugin_id").as("plugin_id")).as("host_vuln"),
              unnestPorts(p.getField("outputs")).as("outputs")))
        // P4: enriched host with per-host A1 counts
        struct(
          Seq(
            h.getField("host_id").as("host_id"),
            col("history_id").as("history_id"),
            col("scan_id").as("scan_id"),
            h.getField("info").as("info"),
            vulnDocs.as("vulnerabilities")) ++ sevCols(vulnsArr, legacySeverity): _*)
      })

    // run-level A1 over every host's vulnerabilities
    val allVulns = flatten(transform(col("hosts"), _.getField("vulnerabilities")))

    raw.select(
      Seq(
        col("history_id"),
        col("scan_id"),
        col("info.scan_start").as("scanner_start"), // P5
        col("info.scan_end").as("scanner_end"),
        col("info.hostcount").as("host_count"), // A3: copied, not recomputed
        targets.as("targets")) // Q2: targets = formatted host tree
        ++ sevCols(allVulns, legacySeverity): _*)
  }
}
