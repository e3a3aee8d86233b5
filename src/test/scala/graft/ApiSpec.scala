package graft

import graft.api.Nessus
import graft.etl.FormatDocs
import graft.sources.Extract
import org.apache.spark.sql.functions._

/** End-to-end through the public facade: extract (fake API) → format →
  * load warehouse → serve the four stored-procedure calls.
  */
class ApiSpec extends SparkSpec {

  test("extract → load → the four procedure calls serve correct shapes and rows") {
    val s = spark
    import s.implicits._
    val world = new ExtractSpec().worldFixture
    val factory = FakeFactory(world)
    val docs = FormatDocs(Extract.fetchRawRunDocs(Seq((1L, 10L)).toDS(), factory))
    val folderSnap = Seq(world(graft.sources.Endpoints.Scans)).toDF("value")
      .select(from_json(col("value"), graft.schema.Schemas.scanDoc).as("d"))
      .select(col("d.folders").as("folders"))
    val scanSnap = Seq(world(graft.sources.Endpoints.Scans)).toDF("value")
      .select(from_json(col("value"), graft.schema.Schemas.scanDoc).as("d"))
      .select(col("d.scans").as("scans"))

    val dir = java.nio.file.Files.createTempDirectory("graft_wh_").toString
    Nessus.load(spark, docs, folderSnap, scanSnap, dir)

    val api = new Nessus(spark, dir)
    val stats = api.getScanStats(1L)
    assert(stats.columns.toSeq == graft.queries.ScanQueries.statsCols)
    val st = stats.collect().head
    assert(st.getAs[Long]("scan_run_id") == 10L)
    assert(st.getAs[Long]("critical_count") == 2L)
    assert(st.getAs[String]("name") == "s1")

    val results = api.getScanResults(1L)
    assert(results.columns.toSeq == graft.queries.ScanQueries.resultsCols)
    assert(results.count() == 3) // 2 ports for plugin 41 + 1 for plugin 42
    assert(
      results.select("port").collect().map(_.getString(0)).toSet ==
        Set("443 / tcp", "8443 / tcp", "22 / tcp"))

    val folderResults = api.getFolderResults(100L)
    assert(folderResults.count() == 3)
    assert(api.getFolderResults(100L, pid = Some(42L)).count() == 1)
    assert(api.getFolderStats(100L).count() == 1) // scan 2 has no runs
  }

  test("client rollup: landed deployment_uuid joins scaner_deployments") {
    val s = spark
    import s.implicits._
    val world = new ExtractSpec().worldFixture
    val factory = FakeFactory(world)
    // landed docs carry the landing partition's deployment_id
    val docs = graft.io.LandingZone.stamped(
      FormatDocs(Extract.fetchRawRunDocs(Seq((1L, 10L)).toDS(), factory)),
      "uuid-scanner-7")
    val snap = Seq(world(graft.sources.Endpoints.Scans)).toDF("value")
      .select(from_json(col("value"), graft.schema.Schemas.scanDoc).as("d"))
    val dir = java.nio.file.Files.createTempDirectory("graft_wh_dep_").toString
    Nessus.load(
      spark, docs,
      snap.select(col("d.folders").as("folders")),
      snap.select(col("d.scans").as("scans")),
      dir)
    Nessus.loadDeployments(
      Seq(
        (1L, 10L, "hq", "uuid-scanner-7", "internal", "rack"),
        (2L, 20L, "dc2", "uuid-scanner-9", "internal", "rack"))
        .toDF(graft.schema.Schemas.scanerDeployment.fieldNames: _*),
      dir)
    val rollup = new Nessus(spark, dir).getClientResults().collect()
    assert(rollup.length == 1) // only client 10's deployment landed docs
    val r = rollup.head
    assert(r.getAs[Long]("client_id") == 10L)
    assert(r.getAs[Long]("n_deployments") == 1L)
    assert(r.getAs[Long]("n_runs") == 1L)
    assert(r.getAs[Long]("critical_count") == 2L)
    assert(r.getAs[Long]("info_count") == 3L)
  }
}
