ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nessusclientetlscriptsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // events.parquet carries TIMESTAMP(NANOS); Spark reads it as LongType
  // (nanos since epoch) under this flag instead of failing the scan.
  "-Dspark.sql.legacy.parquet.nanosAsLong=true",
  // Catalyst constraint propagation blows up on this engine's deep cached
  // lineages + wide selects (measured: 10-17 s analysis per results query
  // at sf0.1 with it on, <2 s off). All our filters are explicit; the
  // inferred-filter optimization buys nothing here.
  "-Dspark.sql.constraintPropagation.enabled=false",
  // The bucketed stores (support/cclabels/nodeidx/postings) are 64-dir
  // partition trees: Spark's default threshold (32) turns EVERY read of
  // one into a distributed file-listing job (~0.1 s of pure scheduling
  // per read, many reads per lifecycle query). Driver-side listing of a
  // few thousand dirs is microseconds on any FS; 4096 still bounds the
  // driver's work at cluster scale (beyond it the distributed listing
  // takes over again). deltaScoped already sets this inside mutations —
  // this lifts it for the read faces too.
  "-Dspark.sql.sources.parallelPartitionDiscovery.threshold=4096",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
