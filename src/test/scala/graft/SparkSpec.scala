package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite; small core count
  * keeps the suite fast — scale behavior is the bench's job). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // keep saveAsTable (bucketing specs) out of the repo working dir
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()

  /** Smallest driver testdata (read-only). */
  val Sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // One JVM-wide session is shared across suites (getOrCreate); leave it
    // to the JVM teardown rather than stopping it per suite — but DO drop
    // caches: queries persist() reuse points (Bench/Verify clearCache()
    // between queries; here the suite boundary plays that role), and
    // without this each dedup-family suite pins its shingle/label caches
    // for the rest of the run.
    spark.catalog.clearCache()
    super.afterAll()
  }
}
