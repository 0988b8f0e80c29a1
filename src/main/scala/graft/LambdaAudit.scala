package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interpreted-lambda audit (round-10 item): the token-stats call
  * sites ride higher-order functions (`split`/`filter`/
  * `array_distinct`/`size`), which Spark evaluates INTERPRETED — they
  * sit outside whole-stage codegen and are not CSE'd. This main
  * measures what that actually costs on the corpus the engine runs
  * on, per the measure-then-optimize rule: each variant runs
  * `iters`-times over the sf dir and reports the median of a full
  * corpus pass forced through an aggregate (so nothing is pruned).
  *
  * Variants:
  *  - `scan`          — sum(octet_length(text)): the floor; scan +
  *                      agg with zero per-row lambda work.
  *  - `tokens`        — sum(size(tokens(text))): one split+filter
  *                      pass (the repo's canonical tokenizer).
  *  - `q202_priority` — the quality-waterfill ordering expression
  *                      verbatim: split + filter + array_distinct +
  *                      size twice + integer DIV.
  *  - `tok_materialized` — same stats but the token array is
  *                      materialized ONCE in its own projection and
  *                      re-read (the documented mitigation).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.LambdaAudit [iters]`.
  */
object LambdaAudit {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk.collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-18s median ${median(runs)}%7.3f s   runs ${runs.map(r => f"$r%.3f").mkString(" ")}")
    }

    time("scan") {
      docs.agg(sum(octet_length(col("text"))))
    }
    time("tokens") {
      docs.select(size(expr(
        "filter(split(trim(text), '\\\\s+'), x -> x != '')")).as("n"))
        .agg(sum("n"))
    }
    time("q202_priority") {
      docs.select(expr("""10000 - coalesce(
          cast((size(array_distinct(filter(split(trim(text), '\s+'),
            x -> x != ''))) * 10000L) DIV
            size(filter(split(trim(text), '\s+'), x -> x != ''))
            as bigint), 0)""").as("p"))
        .agg(sum("p"))
    }
    time("tok_materialized") {
      docs.select(expr(
          "filter(split(trim(text), '\\\\s+'), x -> x != '')").as("__toks"))
        .select(size(col("__toks")).as("n"),
          size(array_distinct(col("__toks"))).as("d"))
        .select(expr("10000 - coalesce(cast((d * 10000L) DIV n as bigint), 0)").as("p"))
        .agg(sum("p"))
    }
    spark.stop()
  }
}
