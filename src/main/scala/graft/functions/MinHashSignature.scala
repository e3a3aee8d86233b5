package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native K-way MinHash signature over an `array<string>` shingle set:
  * result(k) = min over shingles of `substr(md5(k ':' shingle), 1, 16)`.
  *
  * The composable form — K × `array_min(transform(sh, t ->
  * substring(md5(concat(k:, t)), 1, 16)))` — is correct but pays the
  * interpreted-lambda toll per element per hash, plus a UTF8String
  * allocation per (element, hash) for the concat and another for the hex
  * substring. This expression makes one compiled pass: md5 state is
  * updated from the raw shingle bytes (no concat allocation), the leading
  * 8 digest bytes compare as an unsigned long (no hex-string allocation
  * until the final K values), and the whole row costs one static call from
  * generated code — whole-stage codegen stays intact.
  *
  * Arithmetic contract (oracle parity): the first 16 hex chars of an md5
  * preserve byte order, so unsigned-long comparison of the first 8 digest
  * bytes is EXACTLY lexicographic comparison of the hex prefix — the same
  * min the HOF path and the DuckDB mirror compute. Null elements are
  * skipped (HOF: the lambda maps them to null and `array_min` ignores
  * nulls); an empty/all-null array yields null signature slots.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if numHashes > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string> and numHashes > 0, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a =>
        s"${ev.value} = graft.functions.MinHashSignature.compute($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared hot loop for eval and generated code (one virtual call per ROW —
    * the per-element work runs as compiled bytecode either way).
    */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val digest = digests.get()
    // per-hash "k:" prefixes in UTF-8 (k <= numHashes, tiny)
    val prefixes = Array.tabulate(numHashes)(k => s"$k:".getBytes("UTF-8"))
    val mins = new Array[Long](numHashes)
    val seen = new Array[Boolean](numHashes)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < numHashes) {
          digest.reset()
          digest.update(prefixes(k))
          digest.update(tok)
          val d = digest.digest()
          // first 8 digest bytes, big-endian: unsigned-long order == hex-prefix order
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
          if (!seen(k) || java.lang.Long.compareUnsigned(v, mins(k)) < 0) {
            mins(k) = v
            seen(k) = true
          }
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = if (seen(k)) UTF8String.fromString(f"${mins(k)}%016x") else null
      k += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.shim

  /** Column wrapper. */
  def minhash_signature(sh: Column, numHashes: Int): Column =
    shim.column(MinHashSignature(shim.expression(sh), numHashes))
}
