package graft

import graft.functions.MinHashSignature
import org.apache.spark.sql.functions._

/** The native signature expression must be BIT-IDENTICAL to the composable
  * HOF form it replaces — the oracle mirrors the HOF arithmetic, so any
  * divergence is a silent hash-mismatch at the driver gate.
  */
class MinHashSpec extends SparkSpec {

  private def hofSignature(sh: org.apache.spark.sql.Column, k: Int) =
    (0 until k).map(i =>
      array_min(transform(sh, t => substring(md5(concat(lit(s"$i:"), t)), 1, 16))))

  test("native signature is bit-identical to the HOF path on real shingles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val withSh = docs.select(
      col("doc_id"),
      array_distinct(graft.ops.TextAnalysis.tokens(col("text"))).as("sh"))
    val both = withSh.select(
      col("doc_id"),
      MinHashSignature.minhash_signature(col("sh"), 8).as("native"),
      array(hofSignature(col("sh"), 8): _*).as("hof"))
    val diff = both.filter(not(col("native") <=> col("hof"))).count()
    assert(diff == 0L)
  }

  test("hand-computed minimum: matches md5 of the winning shingle") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq("alpha", "beta", "gamma")).toDF("sh")
    val got = df
      .select(MinHashSignature.minhash_signature(col("sh"), 2).as("m"))
      .collect()
      .head
      .getSeq[String](0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(kv: String): String =
      md.digest(kv.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    assert(got(0) == Seq("0:alpha", "0:beta", "0:gamma").map(h).min)
    assert(got(1) == Seq("1:alpha", "1:beta", "1:gamma").map(h).min)
  }

  test("null elements are skipped; empty arrays yield null slots; null input is null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq[String]("tok", null)),
      (2L, Seq.empty[String]),
      (3L, null)
    ).toDF("id", "sh")
    val got = df
      .select(col("id"), MinHashSignature.minhash_signature(col("sh"), 2).as("m"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(kv: String): String =
      md.digest(kv.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    assert(got(1L) == Seq(h("0:tok"), h("1:tok")))
    assert(got(2L) == Seq(null, null))
    assert(got(3L) == null)
  }

  test("SQL registration: minhash_signature callable from spark.sql") {
    graft.functions.functions.register(spark)
    val got = spark
      .sql("SELECT minhash_signature(array('alpha','beta','gamma'), 2) AS m")
      .collect()
      .head
      .getSeq[String](0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(kv: String): String =
      md.digest(kv.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    assert(got(0) == Seq("0:alpha", "0:beta", "0:gamma").map(h).min)
  }

  test("expression survives whole-stage codegen (no fallback to interpreted projection)") {
    // parquet-backed source: a local Seq would constant-fold into a
    // LocalTableScan and never exercise doGenCode
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(graft.ops.TextAnalysis.tokens(col("text")).as("sh"))
      .select(MinHashSignature.minhash_signature(col("sh"), 4).as("m"))
    df.collect() // a broken doGenCode throws (or falls back) here
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(800))
  }
}
