package graft

import graft.engine.Graft
import org.apache.spark.sql.SparkSession

/** One shared local session across all suites (same JVM under
  * Test/fork). */
trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session
  val Sf: String = "/root/testdata/sf0.001"

  def tmp(sub: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-test-$sub").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = Graft.configure(SparkSession.builder().master("local[4]")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
