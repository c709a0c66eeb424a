package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — Spark's
  * getOrCreate makes this cheap after the first suite).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4,
    shufflePartitions = 4)

  /** Temp dir that is deleted when `f` returns — repeated test runs must
    * not accumulate directories in tmpdir.
    */
  def withTempDir[T](prefix: String)(f: java.io.File => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    try f(dir) finally LocalFs.deleteRecursively(dir)
  }
}
