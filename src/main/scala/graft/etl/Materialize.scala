package graft.etl

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-process parquet materialization cache.
  *
  * The synthesized warehouse and nested docs are deterministic functions of
  * the source parquet files; rebuilding them in every JVM (Verify, Bench,
  * tests each fork) wastes the dominant share of wall-clock. Results are
  * keyed by (source file sizes+mtimes, synthesis version) — bump
  * [[Materialize.Version]] whenever synthesis logic changes.
  */
object Materialize {

  /** Bump when NessusSynth/Docs derivation logic changes. */
  val Version = 2

  private val root: String =
    sys.env.getOrElse(
      "GRAFT_CACHE_DIR",
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_matcache")

  /** Fingerprint of the source tables a derivation depends on. */
  def sourceKey(dir: String, tables: Seq[String]): String = {
    val parts = tables.map { t =>
      val p = Paths.get(s"$dir/$t.parquet")
      if (Files.exists(p)) s"$t:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
      else s"$t:absent"
    }
    val digest = MessageDigest.getInstance("MD5")
      .digest((dir + "|" + parts.mkString(",") + s"|v$Version").getBytes("UTF-8"))
    digest.map("%02x".format(_)).mkString
  }

  /** Return the cached parquet for `key`/`name`, writing it via `df` on
    * first use. A `_SUCCESS` marker gates reuse (partial writes are retried).
    */
  def getOrWrite(spark: SparkSession, key: String, name: String, df: => DataFrame): DataFrame = {
    val path = s"$root/$key/$name"
    if (!Files.exists(Paths.get(s"$path/_SUCCESS"))) {
      df.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
