package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-addressed release manifest — the integrity surface a corpus
  * RELEASE ships with (and the distributed big sibling of the
  * reference's landing-zone verification, `src/main_02.py:612-658`,
  * which checks files arrived by name/mtime; this checks the CONTENT
  * is byte-identical, doc for doc).
  *
  * Merkle-style two-level rollup: every document hashes to
  * md5(id ":" text) — the id is bound in, so a row swap between two
  * docs with identical text still changes the manifest — shards hash
  * the ordered concatenation of their member hashes, and the root
  * hashes the ordered concatenation of shard hashes. Two corpus
  * snapshots are bit-identical iff the roots match; when they don't,
  * the mismatching SHARD rows localize the diff to `shardSize`
  * documents without re-reading anything else — the property that
  * makes 100 TB release verification an O(#shards) comparison, not a
  * re-scan (and q66's snapshotDiff the targeted follow-up on the
  * flagged shards).
  *
  * Sharding is by id RANGE (`id DIV shardSize`), not hash: an
  * append-only corpus grows NEW shards while every sealed shard's
  * hash stays byte-stable across releases (only the trailing partial
  * shard and the root move) — so consumers re-verify a delta, not the
  * world. All hashing is md5, portable across engines (the q91/q96
  * twin-family discipline), and order inside every concatenation is
  * pinned by explicit sort keys — partition layout can never reach
  * the digest.
  *
  * Shape: one corpus-grain projection (id, shard, doc-hash, length) →
  * one shard-grain aggregate whose per-group state is bounded by
  * `shardSize` (the manifest grain is CHOSEN; 32 hex chars × shardSize
  * per group) → a #shards-row root aggregate broadcast back. Nothing
  * else touches the corpus; text never shuffles (the doc hash is
  * computed scan-side, 32 chars ride the Exchange).
  */
object CorpusManifest {

  /** One row per shard: (shard, n_docs, n_chars, shard_hash,
    * root_hash) — root_hash identical on every row (the q182 global
    * audit convention). */
  def releaseManifest(idCol: String, textCol: String, shardSize: Long = 1000L)
                     (docs: DataFrame): DataFrame = {
    require(shardSize >= 1, s"shardSize must be positive: $shardSize")
    val h = docs.select(
      expr(s"CAST(`$idCol` DIV $shardSize AS BIGINT)").as("shard"),
      col(idCol).cast("long").as("__id"),
      md5(concat(col(idCol).cast("string"), lit(":"),
        coalesce(col(textCol), lit("")))).as("__h"),
      length(coalesce(col(textCol), lit(""))).cast("long").as("__nc"))
    val shards = Staged.stage(h.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum("__nc").as("n_chars"),
      md5(concat_ws("",
        transform(array_sort(collect_list(struct(col("__id"), col("__h")))),
          x => x.getField("__h")))).as("shard_hash")))
    val root = shards.agg(
      md5(concat_ws("",
        transform(array_sort(collect_list(struct(col("shard"), col("shard_hash")))),
          x => x.getField("shard_hash")))).as("root_hash"))
    shards.crossJoin(broadcast(root))
  }

  /** Per-document 60-bit digest: the top 15 hex chars of md5(id:text)
    * as a positive long — portable (DuckDB parses the identical
    * prefix) and XOR-composable. */
  def docDigest(idCol: Column, textCol: Column): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(":"),
      coalesce(textCol, lit("")))), 1, 15), 16, 10).cast("long")

  /** Order-free ADDITIVE manifest — the incrementally-maintainable
    * twin of [[releaseManifest]]: per shard, the XOR of member doc
    * digests (plus the doc count, which XOR alone can't carry —
    * without it a vanished pair of identical digests would go
    * unseen), and a root XOR over all documents broadcast back.
    *
    * XOR is commutative, associative, and self-inverse, so the digest
    * is independent of arrival order AND maintainable under both
    * insert and delete at O(1) per row — the set-digest trade
    * (Bellare–Micciancio 1997's XHASH): what it gives up is
    * adversarial collision resistance (a crafted QUADRUPLE of docs
    * can cancel), which release signing keeps [[releaseManifest]]
    * for; what it buys is a digest a STREAM can keep as two longs of
    * state per shard and that replay/compaction cannot perturb.
    * `CorpusStream.manifestMonitor` maintains exactly this reading
    * live; after any exactly-once prefix the monitor's row equals
    * this operator over the delivered rows — live ≡ batch by
    * construction.
    *
    * Shape: scan-side digest projection, one shard-grain aggregate
    * (two longs of state per group — no collect_list here), a
    * #shards-row root broadcast back. */
  def additiveManifest(idCol: String, textCol: String, shardSize: Long = 1000L)
                      (docs: DataFrame): DataFrame = {
    require(shardSize >= 1, s"shardSize must be positive: $shardSize")
    val h = docs.select(
      expr(s"CAST(`$idCol` DIV $shardSize AS BIGINT)").as("shard"),
      docDigest(col(idCol), col(textCol)).as("__h"))
    val shards = Staged.stage(h.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      expr("bit_xor(__h)").as("xor_digest")))
    val root = shards.agg(expr("bit_xor(xor_digest)").as("root_digest"))
    shards.crossJoin(broadcast(root))
  }
}
