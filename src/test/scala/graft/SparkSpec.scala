package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per sbt test fork). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run `f` against a conf-isolated clone of the shared session (own
    * SQLConf, shared SparkContext). Tests that flip engine confs (e.g.
    * the `spark.graft.*.localEdgeCutoff` kernel gates) must never mutate
    * the shared session's conf: suites run concurrently, so a set/unset
    * window leaks the flipped conf into every other suite. The clone
    * carries the shared test conf the plans depend on, then `confs`.
    * Callers must build the DataFrames they pass to the ops from the
    * clone (the ops read conf from `df.sparkSession`).
    */
  def withIsolatedConf[A](confs: (String, String)*)(f: SparkSession => A): A = {
    val base = spark
    val s2 = base.newSession()
    SparkSession.setActiveSession(s2)
    try {
      s2.conf.set(
        "spark.sql.shuffle.partitions",
        base.conf.get("spark.sql.shuffle.partitions"))
      confs.foreach { case (k, v) => s2.conf.set(k, v) }
      f(s2)
    } finally SparkSession.setActiveSession(base)
  }

  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sf

  /** Suites run concurrently on sbt's test threads, and only the thread
    * that first forced the shared lazy session has it as its thread-local
    * active session. Plan construction outside an action wrapper
    * (localCheckpoint being the known case) reads
    * `SparkSession.getActiveSession.orNull`, so an unpinned thread can
    * build a physical plan with a null session and die with a
    * Spark-internal NPE mid-suite. Pin the shared session on the running
    * thread before every test.
    */
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    SparkSession.setActiveSession(SparkSpec.spark)
    super.withFixture(test)
  }
}
