package graft.etl

/** DuckDB mirror of [[NessusSynth]]: CTE bodies that rebuild the same 7
  * Nessus warehouse tables from the driver's parquet tables, bit-identically
  * (integer arithmetic only; doubles are smallint/10.0 in both engines).
  * Used as the prefix of every `SparkEntry.oracleSql` entry that queries the
  * warehouse.
  */
object NessusSynthSql {

  private def sevBucket(sev: Int, name: String, src: String = "1") =
    s"CAST(SUM(CASE WHEN p.severity = $sev THEN $src ELSE 0 END) AS BIGINT) AS $name"

  /** CTE list (no leading WITH). Defines: folder, scan, li, plugin,
    * host_vuln, vuln_output, host_sev, run_sev, run_keys, run_hosts,
    * scan_run, host.
    */
  val ctes: String = s"""
folder AS (
  SELECT CAST(r_regionkey AS BIGINT) AS folder_id, 'custom' AS type, r_name AS name
  FROM region
),
scan AS (
  SELECT CAST(n_nationkey AS BIGINT) AS scan_id, CAST(n_regionkey AS BIGINT) AS folder_id,
         'local' AS type, n_name AS name
  FROM nation
),
li AS (
  SELECT CAST(l_orderkey AS BIGINT) AS scan_run_id,
         CAST(l_suppkey AS BIGINT) AS nessus_host_id,
         CAST(l_partkey AS BIGINT) AS plugin_id,
         CAST(l_linenumber AS BIGINT) AS line_no,
         CAST(l_orderkey AS BIGINT) * 1000000 + ROW_NUMBER() OVER (
           PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rid
  FROM lineitem
),
plugin AS (
  SELECT CAST(p_partkey AS BIGINT) AS plugin_id,
         CAST(p_partkey % 5 AS BIGINT) AS severity,
         p_name AS name, p_brand AS family, p_type AS synopsis, p_type AS description,
         'patch' AS solution,
         CAST(p_partkey % 100 AS DOUBLE) / 10.0 AS cvss_base_score,
         CAST(p_partkey % 101 AS DOUBLE) / 10.0 AS cvss3_base_score,
         'AV:N/AC:L' AS cvss_vector, 'CVSS:3.0' AS cvss3_vector,
         'https://nvd.example/' || CAST(p_partkey AS VARCHAR) AS ref,
         '2020/01/01' AS pub_date, '2021/01/01' AS mod_date
  FROM part
),
host_vuln AS (
  SELECT rid AS host_vuln_id, nessus_host_id, scan_run_id, plugin_id FROM li
),
vuln_output AS (
  SELECT rid AS vuln_output_id, rid AS host_vuln_id,
         CAST(line_no AS VARCHAR) || ' / tcp' AS port,
         'output-' || CAST(plugin_id AS VARCHAR) AS output
  FROM li
),
host_sev AS (
  SELECT hv.scan_run_id, hv.nessus_host_id,
         ${sevBucket(4, "critical_count")}, ${sevBucket(3, "high_count")},
         ${sevBucket(2, "medium_count")}, ${sevBucket(1, "low_count")},
         ${sevBucket(0, "info_count")}
  FROM host_vuln hv JOIN plugin p USING (plugin_id)
  GROUP BY hv.scan_run_id, hv.nessus_host_id
),
run_sev AS (
  SELECT hv.scan_run_id,
         ${sevBucket(4, "critical_count")}, ${sevBucket(3, "high_count")},
         ${sevBucket(2, "medium_count")}, ${sevBucket(1, "low_count")},
         ${sevBucket(0, "info_count")}
  FROM host_vuln hv JOIN plugin p USING (plugin_id)
  GROUP BY hv.scan_run_id
),
run_keys AS (
  SELECT CAST(o_orderkey AS BIGINT) AS scan_run_id,
         CAST(o_custkey % 25 AS BIGINT) AS scan_id,
         CAST(epoch_ms(o_orderdate) // 1000 AS BIGINT) AS scan_start,
         CAST(epoch_ms(o_orderdate) // 1000 + o_orderkey % 3600 AS BIGINT) AS scan_end
  FROM orders
),
run_hosts AS (
  SELECT scan_run_id, CAST(COUNT(DISTINCT nessus_host_id) AS BIGINT) AS host_count
  FROM li GROUP BY scan_run_id
),
scan_run AS (
  SELECT rk.scan_run_id, rk.scan_id, rk.scan_start, rk.scan_end,
         CAST(NULL AS VARCHAR) AS targets,
         COALESCE(rh.host_count, 0) AS host_count,
         COALESCE(rs.critical_count, 0) AS critical_count,
         COALESCE(rs.high_count, 0) AS high_count,
         COALESCE(rs.medium_count, 0) AS medium_count,
         COALESCE(rs.low_count, 0) AS low_count,
         COALESCE(rs.info_count, 0) AS info_count
  FROM run_keys rk
  LEFT JOIN run_hosts rh ON rh.scan_run_id = rk.scan_run_id
  LEFT JOIN run_sev rs ON rs.scan_run_id = rk.scan_run_id
),
host AS (
  SELECT hk.scan_run_id * 1000000 + ROW_NUMBER() OVER (
           PARTITION BY hk.scan_run_id ORDER BY hk.nessus_host_id) AS host_id,
         hk.nessus_host_id, hk.scan_run_id, rk.scan_id,
         '10.0.' || CAST(hk.nessus_host_id // 256 AS VARCHAR) || '.' || CAST(hk.nessus_host_id % 256 AS VARCHAR) AS host_ip,
         'host-' || CAST(hk.nessus_host_id AS VARCHAR) || '.example.com' AS host_fqdn,
         CAST(hk.scan_run_id AS VARCHAR) AS host_start,
         CAST(hk.scan_run_id + 1 AS VARCHAR) AS host_end,
         'Linux' AS os,
         hs.critical_count, hs.high_count, hs.medium_count, hs.low_count, hs.info_count
  FROM (SELECT DISTINCT scan_run_id, nessus_host_id FROM li) hk
  JOIN run_keys rk ON rk.scan_run_id = hk.scan_run_id
  JOIN host_sev hs ON hs.scan_run_id = hk.scan_run_id AND hs.nessus_host_id = hk.nessus_host_id
)"""

  /** `WITH <ctes>, <extra>` helper. */
  def withCtes(extra: String = ""): String =
    if (extra.isEmpty) s"WITH $ctes" else s"WITH $ctes,\n$extra"

  /** DuckDB mirror of [[NessusSynth.scanerDeployments]] +
    * [[NessusSynth.runDeploymentUuid]], as extra CTEs.
    */
  val deploymentCtes: String = """scaner_deployments AS (
  SELECT CAST(c_custkey AS BIGINT) AS scaner_deployment_id,
         CAST(c_custkey % 10 AS BIGINT) AS client_id,
         c_name AS location,
         md5('dep:' || CAST(c_custkey % 40 AS VARCHAR)) AS deployment_uuid,
         CASE WHEN c_custkey % 2 = 0 THEN 'internal' ELSE 'external' END AS scanner_type,
         c_mktsegment AS hardware
  FROM customer WHERE c_custkey <= 40
),
runs_dep AS (
  SELECT sr.*, md5('dep:' || CAST(sr.scan_run_id % 40 AS VARCHAR)) AS deployment_uuid
  FROM scan_run sr
)"""
}
