package graft.functions

import org.apache.spark.sql.SparkSession

/** One-stop registration of every engine function family. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    GeoFunctions.register(spark)
    TextFunctions.register(spark)
  }
}
