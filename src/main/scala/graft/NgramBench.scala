package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Measurement harness for the two scale plans of exact n-gram Jaccard
 * (BASELINE.md "prefix vs sparse" section; VERDICT r5 next #4): runs
 * `Dedup.ngramJaccardPairsPrefix` and `ngramJaccardPairsSparse` on the
 * SAME corpus in ONE process (solo-process timings are not comparable
 * across JVMs — round-3 learning), asserts they produce the same pair
 * multiset, and reports the candidate-join sizes that explain the
 * difference:
 *   - sparse candidates  = Σ_g n_g·(n_g−1)/2 over ALL grams
 *   - prefix candidates  = Σ_g p_g·(p_g−1)/2 over PREFIX occurrences
 * (both computed analytically with the operators' own tokenization, so
 * the reported numbers are exactly the join sizes the plans pay).
 *
 * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.NgramBench <docsDir> [n] [plans]"
 * where docsDir holds documents.parquet (e.g. tools/gen_sf1_documents.py
 * zipf output) and plans ∈ both|prefix (prefix-only for corpora whose
 * sparse candidate volume exceeds local spill space — at 50k zipf docs
 * the sparse plan needs > 45 GB of shuffle spill; see BASELINE.md).
 */
object NgramBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 6
    val plans = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // UTC pinned to match Verify/SparkTestBase: the calendar serves
      // (date_trunc bucketing) must bench the SAME plan they verify
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()

    // analytic candidate counts, using the operators' own gram expression
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id").cast("long").as("id"),
        explode(expr(
          s"transform(sequence(1, greatest(length(text) - ${n - 1}, 1)), i -> substring(text, i, $n))"))
          .as("g"))
      .distinct()
    val g = grams(docs).cache()
    val sparseCand = g.groupBy(col("g")).agg(count(lit(1)).as("ng"))
      .agg(sum(col("ng") * (col("ng") - 1) / 2).cast("long")).head().getLong(0)
    val sizes = g.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val gfreq = g.groupBy(col("g")).agg(count(lit(1)).as("gf"))
    val prefixCand = g.join(gfreq, "g").join(sizes, "id")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("gf"), col("g"))))
      .filter(col("rk") <= col("sz") - ceil(col("sz") * 0.5) + 1)
      .groupBy(col("g")).agg(count(lit(1)).as("pg"))
      .agg(sum(col("pg") * (col("pg") - 1) / 2).cast("long")).head().getLong(0)
    g.unpersist()

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = f
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    val (prefixRows, prefixSec) = timed {
      operators.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n, 0.5).count()
    }
    val sparse = if (plans == "both") Some(timed {
      operators.Dedup.ngramJaccardPairsSparse(docs, "doc_id", "text", n, 0.5).count()
    }) else None
    sparse.foreach { case (sparseRows, _) =>
      require(prefixRows == sparseRows,
        s"plan disagreement: prefix=$prefixRows sparse=$sparseRows")
    }
    val sparsePart = sparse
      .map { case (_, s) => s""""sparse_sec":$s,""" }.getOrElse("")
    println(s"""{"docs":$nDocs,"n":$n,"pairs":$prefixRows,""" +
      s""""prefix_sec":$prefixSec,$sparsePart""" +
      s""""prefix_candidates":$prefixCand,"sparse_candidates":$sparseCand}""")
    spark.stop()
  }
}
