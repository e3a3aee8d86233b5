package graft

import graft.etl.{NessusSynth, NessusSynthSql}
import graft.queries.{EtlQueries, GenQueries, OpsQueries, RelQueries, ScanQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Each `queries` entry is a pure function (SparkSession, sfDir) => DataFrame
  * over the driver's parquet tables; each `oracleSql` entry is the equivalent
  * DuckDB SQL over the same tables. The Nessus warehouse queries first
  * rebuild the reference's 7 tables deterministically from the TPC-H-ish
  * tables ([[graft.etl.NessusSynth]] in Spark, [[graft.etl.NessusSynthSql]]
  * CTEs in the oracle), then run the reference semantics on top.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val w = NessusSynth(spark, "/root/testdata/sf0.001")
    ScanQueries.folderResults(w, fid = 1, pid = None, offset = 0)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.queries ++ OpsQueries.queries ++ GenQueries.queries ++ RelQueries.queries ++ Map(
    "scan_stats" -> { (s, dir) =>
      ScanQueries.scanStats(NessusSynth(s, dir), sid = 7, offset = 1)
    },
    "scan_results" -> { (s, dir) =>
      ScanQueries.scanResults(NessusSynth(s, dir), sid = 7, offset = 0)
    },
    "folder_stats" -> { (s, dir) =>
      ScanQueries.folderStats(NessusSynth(s, dir), fid = 1, offset = 0)
    },
    "folder_results" -> { (s, dir) =>
      ScanQueries.folderResults(NessusSynth(s, dir), fid = 1, pid = None, offset = 0)
    },
    "folder_results_plugin" -> { (s, dir) =>
      ScanQueries.folderResults(NessusSynth(s, dir), fid = 3, pid = Some(34L), offset = 0)
    },
    "deployment_client_rollup" -> { (s, dir) =>
      import org.apache.spark.sql.functions.col
      ScanQueries.clientResults(
        NessusSynth(s, dir).scanRun
          .withColumn("deployment_uuid", NessusSynth.runDeploymentUuid(col("scan_run_id"))),
        NessusSynth.scanerDeployments(s, dir))
    }
  )

  private val statsSelect =
    """SELECT n.scan_id, n.scan_run_id, n.scan_start, n.scan_end, n.targets,
      |       n.host_count, n.critical_count, n.high_count, n.medium_count,
      |       n.low_count, n.info_count, s.folder_id, s.type, s.name
      |FROM nth n JOIN scan s USING (scan_id)""".stripMargin

  private val resultsSelect =
    """SELECT hv.host_vuln_id, hv.plugin_id, h.nessus_host_id, h.scan_run_id,
      |       h.host_id, h.scan_id, h.host_ip, h.host_fqdn, h.host_start,
      |       h.host_end, h.os, h.critical_count, h.high_count, h.medium_count,
      |       h.low_count, h.info_count, p.severity, p.name, p.family,
      |       p.synopsis, p.description, p.solution, p.cvss_base_score,
      |       p.cvss3_base_score, p.cvss_vector, p.cvss3_vector, p.ref,
      |       p.pub_date, p.mod_date, vo.vuln_output_id, vo.port, vo.output
      |FROM host h
      |JOIN host_vuln hv ON hv.nessus_host_id = h.nessus_host_id AND hv.scan_run_id = h.scan_run_id
      |JOIN plugin p ON p.plugin_id = hv.plugin_id
      |JOIN vuln_output vo ON vo.host_vuln_id = hv.host_vuln_id
      |WHERE h.scan_run_id IN (SELECT scan_run_id FROM nth)""".stripMargin

  private def nthCte(scanFilter: String, offset: Int) =
    s"""nth AS (
       |  SELECT * FROM (
       |    SELECT sr.*, ROW_NUMBER() OVER (
       |      PARTITION BY scan_id ORDER BY scan_start DESC, scan_run_id DESC) AS rn
       |    FROM scan_run sr WHERE $scanFilter) x
       |  WHERE rn = ${offset + 1}
       |)""".stripMargin

  def oracleSql: Map[String, String] =
    EtlQueries.oracleSql ++ OpsQueries.oracleSql ++ GenQueries.oracleSql ++ RelQueries.oracleSql ++ Map(
    "scan_stats" ->
      s"${NessusSynthSql.withCtes(nthCte("scan_id = 7", 1))}\n$statsSelect",
    "scan_results" ->
      s"${NessusSynthSql.withCtes(nthCte("scan_id = 7", 0))}\n$resultsSelect",
    "folder_stats" ->
      s"${NessusSynthSql.withCtes(nthCte("scan_id IN (SELECT scan_id FROM scan WHERE folder_id = 1)", 0))}\n$statsSelect",
    "folder_results" ->
      s"${NessusSynthSql.withCtes(nthCte("scan_id IN (SELECT scan_id FROM scan WHERE folder_id = 1)", 0))}\n$resultsSelect",
    "folder_results_plugin" ->
      s"${NessusSynthSql.withCtes(nthCte("scan_id IN (SELECT scan_id FROM scan WHERE folder_id = 3)", 0))}\n$resultsSelect AND hv.plugin_id = 34",
    "deployment_client_rollup" ->
      s"""${NessusSynthSql.withCtes(NessusSynthSql.deploymentCtes)}
         |SELECT client_id,
         |       CAST(COUNT(DISTINCT deployment_uuid) AS BIGINT) AS n_deployments,
         |       CAST(COUNT(*) AS BIGINT) AS n_runs,
         |       CAST(SUM(critical_count) AS BIGINT) AS critical_count,
         |       CAST(SUM(high_count) AS BIGINT) AS high_count,
         |       CAST(SUM(medium_count) AS BIGINT) AS medium_count,
         |       CAST(SUM(low_count) AS BIGINT) AS low_count,
         |       CAST(SUM(info_count) AS BIGINT) AS info_count
         |FROM runs_dep JOIN scaner_deployments USING (deployment_uuid)
         |GROUP BY client_id""".stripMargin
  )
}
