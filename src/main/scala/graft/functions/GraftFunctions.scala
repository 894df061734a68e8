package graft.functions

import java.util.Collections

import org.apache.spark.sql.SparkSession

/** One-stop registration of every engine function family. Idempotent per
  * session: repeated calls (every query constructor calls this) would
  * otherwise re-register ~20 functions each time and spam
  * "replaced a previously registered function" warnings. */
object GraftFunctions {

  private val registered =
    Collections.newSetFromMap(new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def registerAll(spark: SparkSession): Unit = registered.synchronized {
    if (registered.add(spark)) {
      GeoFunctions.register(spark)
      TextFunctions.register(spark)
      HashFunctions.register(spark)
      VectorFunctions.register(spark)
      Bpe.register(spark)
      WordPiece.register(spark)
      Unigram.register(spark)
      graft.operators.TextAnalysis.register(spark)
      graft.plans.GeoRules.install(spark)
    }
  }
}
