package graft

/** Registry-wide physical-plan sweep: invariants that must hold for EVERY
  * query in `SparkEntry.queries`, not just the families PlanShapeSpec
  * pins individually. A new query cannot regress the repo's 100 TB
  * posture without failing here.
  *
  * Checked per plan (initial AQE plan, built at the sf0.001 fixture):
  *   - no `CartesianProduct` — an unbounded all-pairs join is never
  *     acceptable; every pairwise operator in the repo blocks/buckets
  *     first (LSH bands, time buckets, cells).
  *   - every `BroadcastNestedLoopJoin` carries a broadcast side — i.e. it
  *     is a deliberate bounded-side crossJoin(broadcast(...)) (centroid
  *     tables, scalar totals), not a fallback for an un-equi-keyed join
  *     of two large inputs.
  *
  * Construction-time driver jobs (centroid loops, checkpoint
  * materialization) run at sf0.001, so the sweep stays cheap.
  */
class RegistryPlanSpec extends SparkSpec {

  test("no query in the registry plans a CartesianProduct; BNLJ only with a broadcast side") {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          bad += s"$name: CartesianProduct"
        // every BNLJ line in Spark's text plan names its build side; a
        // broadcast-less nested loop would be a planner fallback for a
        // large-large non-equi join — forbidden
        val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(plan).toList
        bnlj.foreach { line =>
          if (!line.contains("BuildLeft") && !line.contains("BuildRight"))
            bad += s"$name: $line"
        }
      } catch {
        case e: Throwable => bad += s"$name: plan build FAILED: ${e.getMessage}"
      }
      // queries that localCheckpoint during construction leave scratch
      // blocks; drop them so 131 builds in one JVM don't accumulate
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    assert(bad.isEmpty, "registry plan violations:\n" + bad.mkString("\n"))
  }
}
