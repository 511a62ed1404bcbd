package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local JVM-wide SparkSession
  * (getOrCreate), configured exactly like Verify/Bench via [[Sessions]].
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("graft-test", cpus = "4")

  def tmpDir(tag: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_test_$tag")
    p.toFile.deleteOnExit()
    p
  }

  /** sf0.001 testdata dir — available in this environment, read-only. */
  val sfDir = "/root/testdata/sf0.001"
}
