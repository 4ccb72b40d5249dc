package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Operational resilience of the scan path — at 100 TB some file IS
  * eventually truncated or corrupt, and the difference between "one
  * job retries forever" and "the good 99.999% lands" is a reader
  * setting. Pins Spark's contract for both failure modes:
  * ignoreCorruptFiles skips undecodable parquet, and the default
  * strict mode fails loudly (silent data loss must be OPT-IN). */
class ResilienceSpec extends AnyFunSuite {
  import spark.implicits._

  test("ignoreCorruptFiles reads past a corrupt parquet part; strict mode fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_resil").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    // plant a corrupt part file that claims to be parquet
    val bad = new java.io.FileOutputStream(s"$dir/part-00099-corrupt.snappy.parquet")
    bad.write("PAR1garbage-not-a-footer".getBytes); bad.close()

    val strict = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).agg(count(lit(1))).collect()
    }
    assert(strict.getMessage.toLowerCase.contains("corrupt")
      || Option(strict.getCause).exists(_.getMessage.toLowerCase.contains("parquet")))

    val tolerant = spark.read.option("ignoreCorruptFiles", "true").parquet(dir)
      .select($"id").as[Long].collect().toSet
    assert(tolerant == Set(1L, 2L))
  }
}
