package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.{Bronze, Silver}

/** Stream/batch parity for the incremental CRM medallion path: CSV
  * chunks arriving over multiple micro-batches must produce exactly the
  * silver table the batch pipeline computes over all the data at once.
  */
class CrmStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val datasets = "/root/reference/datasets"

  test("incremental CRM silver equals batch silver after multi-chunk arrival") {
    val lines = Files.readAllLines(Paths.get(s"$datasets/cust_info.csv"))
    val header = lines.get(0)
    val rows = (1 until lines.size).map(lines.get)
    // alternating split so duplicate-key groups land in BOTH chunks —
    // exercises the cross-batch latest-row merge, not just append
    val (evens, odds) = rows.zipWithIndex.partition(_._2 % 2 == 0)

    val work = Files.createTempDirectory("graft-crmstream")
    val watch = Files.createDirectory(work.resolve("landing"))
    val silver = work.resolve("silver_cust").toString
    val checkpoint = work.resolve("chk").toString

    def drop(name: String, chunk: Seq[String]): Unit =
      Files.write(watch.resolve(name),
        (header +: chunk).mkString("\n").getBytes("UTF-8"))

    drop("chunk1.csv", evens.map(_._1))
    CrmStream.run(spark, watch.toString, silver, checkpoint).awaitTermination()
    drop("chunk2.csv", odds.map(_._1))
    CrmStream.run(spark, watch.toString, silver, checkpoint).awaitTermination()

    val streamed = spark.read.parquet(silver)
    val batch = Silver.crmCustInfo(Bronze.crmCustInfo(spark, datasets))
    assert(streamed.count() === batch.count())
    assert(streamed.collect().map(_.toSeq).toSet ===
      batch.collect().map(_.toSeq).toSet)
  }
}
