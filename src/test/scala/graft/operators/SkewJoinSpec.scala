package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SkewJoinSpec extends AnyFunSuite with SparkTestBase {

  test("salted join ≡ plain join on skewed data") {
    val s = spark
    import s.implicits._
    // hot key: 90% of left rows share key 1
    val left = spark.range(10000).toDF("i")
      .withColumn("k", when(col("i") % 10 =!= 0, 1L).otherwise(col("i") % 100))
      .withColumn("payload", col("i") * 2)
    val right = spark.range(100).toDF("rk").withColumn("label", concat(lit("r"), col("rk")))
    val plain = left.join(right, col("k") === col("rk"))
      .agg(count(lit(1)), sum("payload"), sum("k")).head()
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", factor = 8)
      .agg(count(lit(1)), sum("payload"), sum("k")).head()
    assert(plain == salted)
  }

  test("salted left_outer keeps unmatched left rows exactly once") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (99L, "nomatch")).toDF("k", "v")
    val right = Seq((1L, "x"), (2L, "y")).toDF("rk", "w")
    val out = SkewJoin.saltedJoin(left, right, "k", "rk", factor = 4, joinType = "left_outer")
    assert(out.count() == 3)
    assert(out.filter(col("w").isNull).count() == 1)
  }

  test("key histogram surfaces the hot key") {
    val s = spark
    import s.implicits._
    val df = spark.range(1000).toDF("i")
      .withColumn("k", when(col("i") < 900, 7L).otherwise(col("i")))
    val top = SkewJoin.keyHistogram(df, "k", 1).head()
    assert(top.getLong(0) == 7L && top.getLong(1) == 900L)
  }
}
