package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the warehouse tables (reference
  * `schema.sql:27-172`) and the three raw landing-zone document shapes
  * (FIXTURES.md §B). Reads are always schema-enforced — never inferred —
  * so unknown passthrough fields in Nessus responses can't destabilize the
  * pipeline (the validation the reference pinned jsonschema for but never
  * built, SURVEY Q9).
  */
object Schemas {

  // ---- warehouse (MySQL INT -> LongType for ids/counts, SURVEY §1.3) ----

  val folder: StructType = StructType(Seq(
    StructField("folder_id", LongType, nullable = false),
    StructField("type", StringType),
    StructField("name", StringType)))

  val scan: StructType = StructType(Seq(
    StructField("scan_id", LongType, nullable = false),
    StructField("folder_id", LongType),
    StructField("type", StringType),
    StructField("name", StringType)))

  val scanRun: StructType = StructType(Seq(
    StructField("scan_run_id", LongType, nullable = false),
    StructField("scan_id", LongType),
    StructField("scan_start", LongType), // epoch seconds (schema.sql:142)
    StructField("scan_end", LongType),
    StructField("targets", StringType), // serialized host tree (Q2)
    StructField("host_count", LongType),
    StructField("critical_count", LongType),
    StructField("high_count", LongType),
    StructField("medium_count", LongType),
    StructField("low_count", LongType),
    StructField("info_count", LongType)))

  /** scan_run + the landing partition's deployment uuid (present when the
    * table was loaded from landed docs; see [[graft.etl.Normalize.scanRun]]).
    */
  val scanRunDep: StructType =
    scanRun.add(StructField("deployment_uuid", StringType))

  /** `nessusdb2.scaner_deployments` (reference README.md:16-20): the
    * operator-maintained deployment-UUID → client mapping.
    */
  val scanerDeployment: StructType = StructType(Seq(
    StructField("scaner_deployment_id", LongType, nullable = false),
    StructField("client_id", LongType),
    StructField("location", StringType),
    StructField("deployment_uuid", StringType),
    StructField("scanner_type", StringType),
    StructField("hardware", StringType)))

  val host: StructType = StructType(Seq(
    StructField("host_id", LongType, nullable = false),
    StructField("nessus_host_id", LongType),
    StructField("scan_run_id", LongType),
    StructField("scan_id", LongType),
    StructField("host_ip", StringType),
    StructField("host_fqdn", StringType),
    StructField("host_start", StringType), // timestamps as strings (schema.sql:49)
    StructField("host_end", StringType),
    StructField("os", StringType),
    StructField("critical_count", LongType),
    StructField("high_count", LongType),
    StructField("medium_count", LongType),
    StructField("low_count", LongType),
    StructField("info_count", LongType)))

  val hostVuln: StructType = StructType(Seq(
    StructField("host_vuln_id", LongType, nullable = false),
    StructField("nessus_host_id", LongType), // NESSUS id, not the surrogate (Q8)
    StructField("scan_run_id", LongType),
    StructField("plugin_id", LongType)))

  val plugin: StructType = StructType(Seq(
    StructField("plugin_id", LongType, nullable = false),
    StructField("severity", LongType), // ordinal 0..4 (export.py:169)
    StructField("name", StringType),
    StructField("family", StringType),
    StructField("synopsis", StringType),
    StructField("description", StringType),
    StructField("solution", StringType),
    StructField("cvss_base_score", DoubleType),
    StructField("cvss3_base_score", DoubleType),
    StructField("cvss_vector", StringType),
    StructField("cvss3_vector", StringType),
    StructField("ref", StringType), // newline-joined see_also (P1)
    StructField("pub_date", StringType), // dates as strings (schema.sql:108)
    StructField("mod_date", StringType)))

  val vulnOutput: StructType = StructType(Seq(
    StructField("vuln_output_id", LongType, nullable = false),
    StructField("host_vuln_id", LongType),
    StructField("port", StringType), // JSON map key origin (schema.sql:167)
    StructField("output", StringType)))

  // ---- raw landing-zone documents (FIXTURES §B) ----

  /** One unnested output pair (export.py:144-149: P2 already applied —
    * the ports-MAP shape exists only in the raw API response below).
    */
  val outputDoc: StructType = StructType(Seq(
    StructField("port", StringType),
    StructField("output", StringType)))

  val pluginDoc: StructType = StructType(Seq(
    StructField("plugin_id", LongType),
    StructField("severity", LongType),
    StructField("name", StringType),
    StructField("family", StringType),
    StructField("synopsis", StringType),
    StructField("description", StringType),
    StructField("solution", StringType),
    StructField("cvss_base_score", DoubleType),
    StructField("cvss3_base_score", DoubleType),
    StructField("cvss_vector", StringType),
    StructField("cvss3_vector", StringType),
    StructField("pluginattributes",
      StructType(Seq(StructField("see_also", ArrayType(StringType))))),
    StructField("pub_date", StringType),
    StructField("mod_date", StringType),
    StructField("ref", StringType))) // P1-derived, appended by FormatDocs

  val vulnDoc: StructType = StructType(Seq(
    StructField("plugin", pluginDoc),
    StructField("host_vuln", StructType(Seq(
      StructField("nessus_host_id", LongType),
      StructField("scan_run_id", LongType),
      StructField("plugin_id", LongType)))),
    StructField("outputs", ArrayType(outputDoc))))

  val targetDoc: StructType = StructType(Seq(
    StructField("host_id", LongType), // the NESSUS host id (export.py:172)
    StructField("history_id", LongType),
    StructField("scan_id", LongType),
    StructField("critical_count", LongType),
    StructField("high_count", LongType),
    StructField("medium_count", LongType),
    StructField("low_count", LongType),
    StructField("info_count", LongType),
    StructField("info", StructType(Seq(
      StructField("host_ip", StringType),
      StructField("host_fqdn", StringType),
      StructField("host_start", StringType),
      StructField("host_end", StringType),
      StructField("os", StringType)))),
    StructField("vulnerabilities", ArrayType(vulnDoc))))

  /** `scan_run_{scan_id}_{history_id}.json` (export.py:196-215, Q2). */
  val scanRunDoc: StructType = StructType(Seq(
    StructField("history_id", LongType),
    StructField("scan_id", LongType),
    StructField("scanner_start", LongType),
    StructField("scanner_end", LongType),
    StructField("host_count", LongType),
    StructField("critical_count", LongType),
    StructField("high_count", LongType),
    StructField("medium_count", LongType),
    StructField("low_count", LongType),
    StructField("info_count", LongType),
    StructField("targets", ArrayType(targetDoc))))

  /** `folder.json` — GET /folders response (export.py:241-242). */
  val folderDoc: StructType = StructType(Seq(
    StructField("folders", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("type", StringType),
      StructField("name", StringType)))))))

  /** `scan.json` — GET /scans response (export.py:243). */
  val scanDoc: StructType = StructType(Seq(
    StructField("scans", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("folder_id", LongType),
      StructField("type", StringType),
      StructField("name", StringType))))),
    StructField("folders", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("type", StringType),
      StructField("name", StringType)))))))

  /** Raw per-run extraction bundle BEFORE formatting: the S5 run summary,
    * each host's S6 detail, and each vulnerability's S7 plugin-output
    * response, assembled structurally (no field munging) by the fetcher.
    * Only fields the reference touches are declared; the rest pass through
    * opaquely (SURVEY §7.5#5).
    */
  val rawScanRunDoc: StructType = StructType(Seq(
    StructField("scan_id", LongType),
    StructField("history_id", LongType),
    StructField("info", StructType(Seq( // S5 `info` (export.py:199-202)
      StructField("scan_start", LongType),
      StructField("scan_end", LongType),
      StructField("hostcount", LongType)))),
    StructField("hosts", ArrayType(StructType(Seq(
      StructField("host_id", LongType),
      StructField("info", StructType(Seq( // host detail passthrough region
        StructField("host_ip", StringType),
        StructField("host_fqdn", StringType),
        StructField("host_start", StringType),
        StructField("host_end", StringType),
        StructField("os", StringType)))),
      StructField("vulnerabilities", ArrayType(StructType(Seq( // S6 (export.py:62-64)
        StructField("plugin_id", LongType),
        StructField("severity", LongType),
        StructField("count", LongType))))),
      StructField("plugin_outputs", ArrayType(StructType(Seq( // S7 per vuln
        StructField("plugin_id", LongType),
        StructField("info", StructType(Seq(
          StructField("plugindescription", pluginDoc)))),
        StructField("outputs", ArrayType(StructType(Seq( // P2 input shape
          StructField("ports", MapType(StringType, IntegerType)),
          StructField("plugin_output", StringType)))))))))))))))

  /** scan detail `history` entries (export.py:231-237). The response has no
    * top-level scan_id — the caller threads the request's id through
    * structurally (see Extract.newRuns).
    */
  val historyDoc: StructType = StructType(Seq(
    StructField("history", ArrayType(StructType(Seq(
      StructField("history_id", LongType),
      StructField("status", StringType),
      StructField("last_modification_date", LongType)))))))
}
