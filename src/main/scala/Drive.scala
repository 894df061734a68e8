package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime,
          Option(js.properties.getProperty("spark.job.description")).getOrElse("?"))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.get(je.jobId).foreach { case (t0, desc) =>
          val s = (System.nanoTime - t0) / 1e9
          if (s > 0.02) println(f"  job ${je.jobId}%3d ${s}%6.2f s  ${desc.take(90)}")
        }
    })
    val dir = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$dir/embeddings.parquet").count()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime
      graft.SparkEntry.queries("ann_ivf_served")(spark, dir).count()
      println(f"rep $rep total ${(System.nanoTime - t0) / 1e9}%.2f s")
      Thread.sleep(300)
    }
    spark.stop()
  }
}
