package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application — the piece of
  * a training-data pipeline that turns the corpus itself into the
  * tokenizer (q41's BPE-ish regex counts tokens under a fixed scheme;
  * this learns the scheme).
  *
  * Division of labor at 100 TB (the standard one — HF/sentencepiece
  * train from word-frequency tables, not raw text):
  *   - The CORPUS-SIZED passes are distributed: word counting is a
  *     map-side-partial groupBy over exploded tokens, and the vocabulary
  *     cap is TakeOrderedAndProject (per-partition top-maxWords heaps —
  *     no global sort). Applying a trained tokenizer back to the corpus
  *     is a broadcast-merges typed map — a projection, no shuffle.
  *   - The VOCAB-SIZED training loop is driver-local, like any model
  *     fit: after the cap the word table is bounded by construction
  *     (maxWords rows — same legitimacy as broadcasting a dimension
  *     table), and nMerges in-memory rounds over it beat 2·nMerges
  *     cluster jobs by orders of magnitude. Nothing corpus-sized ever
  *     reaches the driver.
  *
  * Merges are fully deterministic: pair counts tie-break on the
  * lexicographically smallest (left, right), so the same corpus always
  * learns the same tokenizer.
  */
object Bpe {

  /** End-of-word marker. Character splitting can never produce it (it's
    * multi-char), but a SEQUENCE of merges over text containing the
    * literal run `<`,`/`,`w`,`>` could synthesize a mid-word symbol equal
    * to it — after which later rules targeting the boundary would also
    * fire mid-word. [[trainMerges]] therefore never learns a merge whose
    * concatenation equals this marker, which closes the only path to a
    * counterfeit (the final fusing step is always a single pair merge). */
  val EndOfWord = "</w>"

  private def toSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ EndOfWord

  /** Distributed word-frequency table capped to the `maxWords` most
    * frequent words (count desc, word asc — deterministic cut). */
  def wordCounts(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxWords)

  /** Learn `nMerges` BPE merge rules from the corpus. Returns them in
    * learned order: rank r's rule merges adjacent (left, right) symbol
    * pairs everywhere they occur. Stops early if no pair occurs twice. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  maxWords: Int = 10000): Seq[(String, String)] = {
    val words = wordCounts(docs, textCol, maxWords).collect()
      .map(r => (toSymbols(r.getString(0)), r.getLong(1)))
    var vocab: Array[(Vector[String], Long)] = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      // argmax with deterministic tiebreak: count desc, then pair asc.
      // Pairs that would fuse into a counterfeit EndOfWord are never
      // learnable (see the marker's doc).
      val best = pairCounts.toSeq
        .filterNot { case ((l, r), _) => l + r == EndOfWord }
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some((pair, c)) if c >= 2 =>
          merges += pair
          vocab = vocab.map { case (syms, cnt) =>
            (mergeOnce(syms, pair), cnt)
          }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  /** One left-to-right non-overlapping merge pass of `pair` over a
    * symbol sequence. */
  private[functions] def mergeOnce(syms: Vector[String],
                                   pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize one word under learned merges (applied in learned order —
    * the standard greedy BPE segmentation). */
  def segmentWord(w: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(toSymbols(w))((syms, p) => mergeOnce(syms, p))

  /** Apply a trained tokenizer to the corpus: per-document learned-BPE
    * token count beside the whitespace token count (their ratio is the
    * fertility metric tokenizer evaluations report). The merges list
    * rides to executors as a closure constant (vocab-sized — broadcast
    * semantics); the pass is a typed map: a projection, no shuffle, at
    * any corpus size. */
  def tokenizeCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    val m = merges.toIndexedSeq
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val ws =
          if (text == null) Array.empty[String]
          else text.trim.split("\\s+").filter(_.nonEmpty)
        val bpe = ws.iterator.map(w => segmentWord(w, m).length.toLong).sum
        (id, ws.length.toLong, bpe)
      }
      .toDF(idCol, "n_ws_tokens", "n_bpe_tokens")
  }
}
