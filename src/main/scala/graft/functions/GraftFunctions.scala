package graft.functions

import org.apache.spark.sql.SparkSession

/** One-stop registration of every engine function family. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    GeoFunctions.register(spark)
    TextFunctions.register(spark)
    HashFunctions.register(spark)
    VectorFunctions.register(spark)
    graft.operators.TextAnalysis.register(spark)
    graft.plans.GeoRules.install(spark)
  }
}
