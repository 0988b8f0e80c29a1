package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the q118 char-explode contract: `split(text, '')` must yield
  * one element per Unicode CODE POINT (Java's empty-pattern regex
  * advances by code point, never splitting a surrogate pair), matching
  * DuckDB's `string_split(text, '')` — the cross-engine grain the
  * entropy oracle hashes against. */
class CharSplitSpec extends SparkSpec {
  import spark.implicits._

  test("split(text, '') emits whole code points — surrogate pairs stay intact") {
    val s = "a😀b" // a, U+1F600 (astral, 2 UTF-16 units), b
    val parts = Seq(s).toDF("t").select(split(col("t"), "").as("c"))
      .as[Seq[String]].head()
    assert(parts.length === 3, parts.mkString("|"))
    assert(parts(1).codePointCount(0, parts(1).length) === 1)
    assert(parts(1) === "😀")
  }

  test("split(text, '') has no leading/trailing empty element") {
    val parts = Seq("abc").toDF("t").select(split(col("t"), "").as("c"))
      .as[Seq[String]].head()
    assert(parts === Seq("a", "b", "c"))
  }
}
