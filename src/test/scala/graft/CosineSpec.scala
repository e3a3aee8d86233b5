package graft

import graft.functions.functions.cosine_similarity
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CosineSpec extends SparkSpec {

  test("native cosine expression is bit-identical to the HOF fold on real embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = e
      .select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("vb")))
      .limit(5000)
    val both = pairs.select(
      (Similarity.dot(col("va"), col("vb")) /
        (Similarity.norm(col("va")) * Similarity.norm(col("vb")))).as("hof"),
      cosine_similarity(col("va"), col("vb")).as("native"))
    val diff = both.filter(col("hof") =!= col("native")).count()
    assert(diff == 0, s"$diff of 5000 pairs differ between HOF and native cosine")
  }

  test("native cosine survives whole-stage codegen and SQL registration") {
    graft.functions.functions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    e.createOrReplaceTempView("emb_cos_test")
    val viaSql = spark
      .sql("""SELECT cosine_similarity(a.embedding, b.embedding) AS c
              FROM emb_cos_test a JOIN emb_cos_test b ON a.vec_id = 0 AND b.vec_id = 1""")
      .collect().head.getDouble(0)
    assert(viaSql >= -1.0 && viaSql <= 1.0)
  }

  test("degenerate inputs are defined: null elements and zero-norm vectors yield null") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("ok", Seq[java.lang.Float](1f, 2f, 3f), Seq[java.lang.Float](1f, 2f, 3f)),
      ("null_elem", Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 2f, 3f)),
      ("zero_norm", Seq[java.lang.Float](0f, 0f, 0f), Seq[java.lang.Float](1f, 2f, 3f)),
      ("both_empty", Seq.empty[java.lang.Float], Seq.empty[java.lang.Float]))
      .toDF("kind", "a", "b")
    // interpreted path (literal-free projection over a local relation may
    // still codegen; force both by checking the collected values only)
    val out = rows
      .select(col("kind"), cosine_similarity(col("a"), col("b")).as("c"))
      .collect()
      .map(r => r.getString(0) -> Option(if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out("ok").exists(v => math.abs(v.asInstanceOf[Double] - 1.0) < 1e-12))
    assert(out("null_elem").isEmpty, "null element must yield null, not garbage floats")
    assert(out("zero_norm").isEmpty, "zero-norm must yield null, not NaN (NaN passes >= filters)")
    assert(out("both_empty").isEmpty)
    // and a threshold filter must DROP the degenerate rows (the NaN trap)
    val kept = rows
      .filter(cosine_similarity(col("a"), col("b")) >= 0.5)
      .select("kind").as[String].collect().toSet
    assert(kept == Set("ok"))
  }

  test("timing: native vs HOF on an all-pairs sweep (informational)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").cache()
    e.count()
    val pairs = e
      .select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("vb")))
    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s over $n pairs")
      n
    }
    time("HOF   ")(
      pairs
        .select(
          (Similarity.dot(col("va"), col("vb")) /
            (Similarity.norm(col("va")) * Similarity.norm(col("vb")))).as("c"))
        .filter(col("c") > 2.0).count() + pairs.count())
    time("native")(
      pairs
        .select(cosine_similarity(col("va"), col("vb")).as("c"))
        .filter(col("c") > 2.0).count() + pairs.count())
    e.unpersist()
  }
}
