package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session; ScalaTest
  * suites run sequentially in the sbt test JVM).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.core.SparkEnv.session("graft-test")

  def resource(path: String): String = {
    val url = getClass.getClassLoader.getResource(path)
    require(url != null, s"missing test resource $path")
    new java.io.File(url.toURI).getAbsolutePath
  }

  def readLines(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().toList
    finally src.close()
  }
}
