package graft.queries

import graft.Tables
import graft.functions.{KmvSketchAgg, Num, TextFunctions, VectorFunctions}
import graft.ops.{Centrality, Collocations, Constraints, Coreset, CorpusManifest, Coverage, Dedup, EventAnalytics, Skew, IncrementalDedup, LinearModel, Privacy, Retrieval, Sampling, Similarity, Sketches, Skyline, Spectral, Stats, VocabStats}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data-pipeline operators (north star): dedup family,
  * similarity search, text analysis, fingerprinting — each a first-class
  * `queries()` entry over `documents` / `embeddings`. SQL-expressible ones
  * carry a DuckDB oracle; the hash-based ones (minhash/simhash/LSH use
  * Spark's xxhash64, which DuckDB lacks) get the driver's rows-only check.
  */
object LlmQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** q209's committed Public-Suffix-List fixture subset — same
    * resolution contract as CoreQueries' fixture roots (resolve lazily
    * and WITHOUT validating, because the oracle SQL interpolates this
    * at registry construction; [[requirePslFixtures]] fail-fasts
    * inside q209's own run closure instead). */
  private lazy val pslFixtureRoot: String =
    sys.props.get("graft.fixtures.psl.dir")
      .orElse(sys.env.get("GRAFT_PSL_FIXTURES_DIR"))
      .map(new java.io.File(_))
      .getOrElse(new java.io.File("fixtures/psl"))
      .getAbsolutePath

  private def requirePslFixtures(): Unit =
    require(new java.io.File(pslFixtureRoot).isDirectory,
      s"psl fixture dir not found at $pslFixtureRoot; " +
        "launch from the repo root or set -Dgraft.fixtures.psl.dir / GRAFT_PSL_FIXTURES_DIR")

  def all: Seq[Q] = Seq(

    // Exact dedup: content-hash groupBy — the canonical first pass of a
    // web-scale corpus pipeline. One shuffle on md5(text).
    Q("q22_dedup_exact",
      (s, d) => Tables.documents(s, d).transform(Dedup.exact("doc_id", "text")),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             |count(*) AS n_dupes FROM documents GROUP BY 1""".stripMargin)),

    // Token statistics: whitespace token count + distinct-token count.
    Q("q23_token_stats",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        size(array_distinct(TextFunctions.tokens(col("text")))).cast("long").as("n_uniq")),
      Some("""SELECT doc_id,
             |cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             |cast(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_uniq
             |FROM documents""".stripMargin)),

    // Quality scoring: length / mean token length / stopword ratio /
    // punctuation ratio (explicit char class for cross-engine regex
    // parity).
    Q("q24_quality_score",
      (s, d) => {
        val qs = TextFunctions.qualityStruct(col("text"), stopwords)
        Tables.documents(s, d).select(
          col("doc_id"),
          qs.getField("n_tokens").cast("long").as("n_tokens"),
          qs.getField("mean_token_len").as("mean_token_len"),
          qs.getField("stopword_ratio").as("stopword_ratio"),
          Num.roundz((length(col("text")) -
            length(regexp_replace(col("text"), "[.,;:!?'\"()-]", ""))).cast("double") /
            greatest(length(col("text")), lit(1)), 4).as("punct_ratio"))
      },
      Some("""SELECT doc_id,
             |cast(len(w) AS BIGINT) AS n_tokens,
             |round(list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w), 4) AS mean_token_len,
             |round(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in'], x))) * 1.0 / len(w), 4) AS stopword_ratio,
             |round((length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g'))) * 1.0 /
             |  greatest(length(text), 1), 4) AS punct_ratio
             |FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents)""".stripMargin)),

    // BPE-ish regex token counting (north star: "whitespace + a BPE-ish
    // regex"): letter-runs, digit-runs, and single punctuation marks as
    // separate tokens — the pre-tokenization shape of GPT-style BPE.
    // Whitespace spelled as an explicit class: Java's \s includes \x0B
    // (vertical tab) while RE2's does not — same parity rule as q24.
    Q("q41_bpe_tokens",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\x0B\\f]"), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        size(array_distinct(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\x0B\\f]"), lit(0))))
          .cast("long").as("n_bpe_uniq")),
      Some("""SELECT doc_id,
             |cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\x0B\f]')) AS BIGINT) AS n_bpe_tokens,
             |cast(len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\x0B\f]'))) AS BIGINT) AS n_bpe_uniq
             |FROM documents""".stripMargin)),

    // Document chunking: fixed-size token windows with overlap — the
    // standard pre-training/RAG chunker. stride = chunk - overlap; the
    // last partial window is kept (ceil semantics) so no tokens drop.
    Q("q46_chunking",
      (s, d) => {
        val chunk = 50
        val stride = 40
        val ws = TextFunctions.tokens(col("text"))
        Tables.documents(s, d)
          .filter(size(ws) > 0)
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0), greatest(ceil((size(ws) - chunk) /
                lit(stride.toDouble)).cast("long"), lit(0L))),
              i => array_join(slice(ws, (i * stride + 1).cast("int"), lit(chunk)), " "))))
          .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
            col("col").as("chunk_text"),
            size(split(col("col"), " ")).cast("long").as("n_chunk_tokens"))
      },
      Some("""SELECT doc_id, chunk_idx,
             |array_to_string(w[(chunk_idx*40 + 1):(chunk_idx*40 + 50)], ' ') AS chunk_text,
             |cast(len(w[(chunk_idx*40 + 1):(chunk_idx*40 + 50)]) AS BIGINT) AS n_chunk_tokens
             |FROM (
             |  SELECT doc_id, w, unnest(range(
             |    greatest(cast(ceil((len(w) - 50) / 40.0) AS BIGINT), 0) + 1)) AS chunk_idx
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents WHERE trim(text) <> ''))""".stripMargin)),

    // Text normalization: lowercase, strip control chars, collapse
    // whitespace — the canonical cleanup pass before dedup/tokenize.
    Q("q47_normalize",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(lower(trim(col("text"))), "[\\x00-\\x1F\\x7F]", " "),
          "  +", " ").as("norm_text")),
      Some("""SELECT doc_id,
             |regexp_replace(regexp_replace(lower(trim(text)), '[\x00-\x1F\x7F]', ' ', 'g'),
             |  '  +', ' ', 'g') AS norm_text
             |FROM documents""".stripMargin)),

    // Language-ID heuristic: stopword-hit argmax across candidate
    // languages (ties resolved identically on both sides).
    Q("q25_langid",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred")),
      Some("""SELECT doc_id, CASE WHEN mx = 0 THEN 'und'
             |WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es'
             |WHEN h_en = mx THEN 'en' ELSE 'de' END AS lang_pred FROM (
             |SELECT doc_id, greatest(h_de, h_en, h_es, h_fr) AS mx, h_de, h_en, h_es, h_fr FROM (
             |SELECT doc_id,
             |len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS h_de,
             |len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS h_en,
             |len(list_filter(w, x -> list_contains(['el','la','de','que','y','los','una'], x))) AS h_es,
             |len(list_filter(w, x -> list_contains(['le','la','les','des','et','est','une'], x))) AS h_fr
             |FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)))""".stripMargin)),

    // Exact n-gram Jaccard near-dup pairs via inverted shingle index —
    // the oracle-checkable ground truth the MinHash variant approximates.
    Q("q26_ngram_jaccard",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b,
             |round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
             |FROM inter JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03""".stripMargin)),

    // Duplicate-cluster assignment: connected components over the exact
    // n-gram Jaccard pair graph (q26's edges) — every document in a
    // duplicate cluster labeled with the cluster's min doc_id, the step
    // that turns pairwise near-dup hits into "keep one per cluster".
    // Oracle: DuckDB recursive-CTE transitive closure + min over the
    // reachable set (quadratic closure — fine at verify scale; the
    // Spark side is the iterative min-label propagation that scales).
    Q("q61_dup_clusters",
      (s, d) => Dedup.duplicateClusters(
        Tables.documents(s, d)
          .transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
        "doc_a", "doc_b"),
      Some(dupClustersOracle)),

    // Same clustering, web-scale formulation: alternating large-star /
    // small-star edge contraction (SCALE.md's designated 100 TB path —
    // the edge set SHRINKS across rounds instead of shuffling a full
    // label table every round). Output-identical to q61 by construction
    // and by oracle: both share the DuckDB recursive-CTE closure.
    Q("q71_dup_clusters_stars",
      (s, d) => Dedup.duplicateClustersStars(
        Tables.documents(s, d)
          .transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
        "doc_a", "doc_b"),
      Some(dupClustersOracle)),

    // Passage-level dedup: drop every 16-token chunk whose exact text
    // already occurred earlier in the corpus (keep-first), rebuild docs
    // from the survivors — the repeated-passage/boilerplate removal pass
    // whole-document dedup can't do. Chunk text is fingerprinted before
    // the Exchange; only the rebuild join moves text.
    Q("q72_passage_dedup",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.dropRepeatedPassages("doc_id", "text", 16)),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
             |  FROM documents),
             |tt AS (SELECT doc_id, w, cast(ceil(len(w) / 16.0) AS BIGINT) AS nc
             |  FROM t WHERE len(w) > 0),
             |occ AS (SELECT doc_id, nc, w, unnest(range(nc)) AS pos FROM tt),
             |ch AS (SELECT doc_id, nc, pos,
             |    array_to_string(w[(pos*16 + 1):(pos*16 + 16)], ' ') AS chunk FROM occ),
             |k AS (SELECT doc_id, nc, pos, chunk,
             |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn FROM ch)
             |SELECT doc_id,
             |  string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
             |  min(nc) AS n_chunks,
             |  cast(count(*) AS BIGINT) AS n_kept
             |FROM k WHERE rn = 1 GROUP BY doc_id""".stripMargin)),

    // Unaligned passage removal: q72's stride-1 twin — fingerprint every
    // 16-token window at every position, keep-first globally, drop the
    // tokens covered by later occurrences. Catches copies that do NOT
    // start on a chunk boundary (DedupSpec has the offset-shifted
    // fixture q72's chunk mode provably misses); removal is exactly the
    // copied span. Token-granular output.
    Q("q93_passage_dedup_unaligned",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.dropRepeatedPassagesUnaligned("doc_id", "text", 16)),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
             |  FROM documents),
             |tt AS (SELECT doc_id, w, cast(len(w) AS BIGINT) AS n
             |  FROM t WHERE len(w) > 0),
             |occ AS (SELECT doc_id, w, unnest(range(n - 16 + 1)) AS pos
             |  FROM tt WHERE n >= 16),
             |fp AS (SELECT doc_id, pos,
             |    md5(array_to_string(w[(pos + 1):(pos + 16)], ' ')) AS f FROM occ),
             |k AS (SELECT doc_id, pos,
             |    row_number() OVER (PARTITION BY f ORDER BY doc_id, pos) AS rn FROM fp),
             |ds AS (SELECT doc_id, list(pos ORDER BY pos) AS dss
             |  FROM k WHERE rn > 1 GROUP BY doc_id),
             |r AS (SELECT tt.doc_id, tt.w, tt.n,
             |    coalesce(ds.dss, []::BIGINT[]) AS dss
             |  FROM tt LEFT JOIN ds ON tt.doc_id = ds.doc_id),
             |kept AS (SELECT doc_id, w, n,
             |    list_filter(range(n), t ->
             |      len(list_filter(dss, s -> s <= t AND t < s + 16)) = 0) AS ki
             |  FROM r)
             |SELECT doc_id,
             |  coalesce(array_to_string(list_transform(ki, t -> w[t + 1]), ' '), '')
             |    AS clean_text,
             |  n AS n_tokens, cast(len(ki) AS BIGINT) AS n_kept
             |FROM kept""".stripMargin)),

    // Incremental corpus dedup: dedupe the OLDER half of the corpus,
    // then fold the newer half in through IncrementalDedup.dedupDelta —
    // the daily-crawl path that never re-pairs the corpus against
    // itself. The oracle is a FULL REBUILD over all documents: the hash
    // match demonstrates incremental ≡ rebuild on this corpus (star
    // clusters; see IncrementalDedupSpec for the contract and the
    // chain-topology superset case).
    Q("q74_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val cut = docs.agg((max("doc_id") / lit(2.0)).as("__cut"))
        val withCut = docs.crossJoin(broadcast(cut))
        val oldHalf = withCut.filter(col("doc_id") <= col("__cut")).drop("__cut")
        val freshHalf = withCut.filter(col("doc_id") > col("__cut")).drop("__cut")
        val base = IncrementalDedup.dedupCorpus("doc_id", "text", 3, 0.5)(oldHalf)
        IncrementalDedup.dedupDelta("doc_id", "text", 3, 0.5)(base, freshHalf)
          .select("doc_id")
      },
      Some("""WITH RECURSIVE ex AS (SELECT doc_id, text FROM (
             |    SELECT doc_id, text,
             |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |    FROM documents) WHERE rn = 1),
             |sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM ex))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.5),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |labels AS (SELECT src AS doc, min(dst) AS cluster FROM reach GROUP BY 1)
             |SELECT e.doc_id FROM ex e LEFT JOIN labels l ON e.doc_id = l.doc
             |WHERE l.doc IS NULL OR l.cluster = e.doc_id""".stripMargin)),

    // Flagship composition: the full training-corpus build as ONE lazy
    // plan — normalize → quality gate (>= 5 tokens) → language-ID gate →
    // exact dedup (min doc per content hash) → near-dup cluster removal
    // (Jaccard pairs → connected components → keep representatives) →
    // deterministic train/val/test split. Every stage is an operator the
    // engine already oracle-checks in isolation (q47/q23/q25/q22/q26/
    // q61/q58); this row proves they COMPOSE — the end-to-end pipeline a
    // real 100 TB corpus run executes, hash-checked against one DuckDB
    // query (recursive CTE for the cluster step).
    Q("q62_corpus_pipeline",
      (s, d) => graft.ops.CorpusPipeline.run(
        Tables.documents(s, d),
        keep => keep.transform(Dedup.ngramJaccardPairs(
          "doc_id", "norm_text", 3, 0.03, tokensCol = Some("__w")))),
      Some("""WITH RECURSIVE
             |norm AS (SELECT doc_id, lang,
             |  regexp_replace(regexp_replace(lower(trim(text)), '[\x00-\x1F\x7F]', ' ', 'g'),
             |    '  +', ' ', 'g') AS norm_text FROM documents),
             |scored AS (SELECT doc_id, lang, norm_text,
             |  string_split_regex(trim(norm_text), '\s+') AS w FROM norm),
             |langed AS (SELECT doc_id, lang, norm_text, w,
             |  cast(len(w) AS BIGINT) AS n_tokens,
             |  CASE WHEN mx = 0 THEN 'und'
             |       WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es'
             |       WHEN h_en = mx THEN 'en' ELSE 'de' END AS lang_pred
             |  FROM (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS mx FROM (
             |    SELECT *,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','que','y','los','una'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','des','et','est','une'], x))) AS h_fr
             |    FROM scored))),
             |gated AS (SELECT * FROM langed WHERE n_tokens >= 5 AND lang_pred <> 'und'),
             |keepd AS (SELECT g.* FROM gated g JOIN (
             |    SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(norm_text)) k USING (doc_id)),
             |sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle FROM keepd)),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |dropset AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING min(dst) <> src)
             |SELECT doc_id, lang, lang_pred, n_tokens,
             |  CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
             |       WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM keepd WHERE doc_id NOT IN (SELECT doc_id FROM dropset)""".stripMargin)),

    // Multimodal corpus pipeline: q62's build over a MIXED text+asset
    // corpus — each document's bytes decode through the Multimodal stub
    // (q59's real mapPartitions plumbing) into typed columns
    // (asset_len, brightness) that ride CorpusPipeline's `carry` hook
    // THROUGH normalize/gate/dedup/cluster/split: a dropped document
    // drops its asset columns with it, proving multimodal columns
    // compose with the gates instead of living beside them. Oracle =
    // q62's extended with the asset-derived columns (the stub decode's
    // non-fake outputs are SQL-expressible, q59's pattern; asset_len is
    // byte-based on both sides, brightness inherits q59's documented
    // ASCII-only fixture contract).
    Q("q95_multimodal_pipeline",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val assets = docs.filter(col("n_chars") > 0)
          .select(col("doc_id").cast("string").as("path"),
            lit("binary").as("modality"),
            octet_length(col("text")).cast("long").as("length"),
            col("text").cast("binary").as("content"))
          .as[graft.multimodal.RawAsset]
        val decoded = graft.multimodal.Multimodal.decodeBatch(assets, featureDim = 16)
          .toDF()
          .select(col("path").cast("bigint").as("doc_id"),
            col("length").as("asset_len"),
            Num.roundz(col("brightness"), 4).as("brightness"))
        graft.ops.CorpusPipeline.run(
          docs.join(decoded, Seq("doc_id"), "left"),
          keep => keep.transform(Dedup.ngramJaccardPairs(
            "doc_id", "norm_text", 3, 0.03, tokensCol = Some("__w"))),
          carry = Seq("asset_len", "brightness"))
      },
      Some("""WITH RECURSIVE
             |norm AS (SELECT doc_id, lang,
             |  regexp_replace(regexp_replace(lower(trim(text)), '[\x00-\x1F\x7F]', ' ', 'g'),
             |    '  +', ' ', 'g') AS norm_text,
             |  cast(octet_length(encode(text)) AS BIGINT) AS asset_len,
             |  round(list_avg(list_transform(string_split(text, ''), x -> ascii(x))), 4) AS brightness
             |  FROM documents),
             |scored AS (SELECT doc_id, lang, norm_text, asset_len, brightness,
             |  string_split_regex(trim(norm_text), '\s+') AS w FROM norm),
             |langed AS (SELECT doc_id, lang, norm_text, asset_len, brightness, w,
             |  cast(len(w) AS BIGINT) AS n_tokens,
             |  CASE WHEN mx = 0 THEN 'und'
             |       WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es'
             |       WHEN h_en = mx THEN 'en' ELSE 'de' END AS lang_pred
             |  FROM (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS mx FROM (
             |    SELECT *,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','que','y','los','una'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','des','et','est','une'], x))) AS h_fr
             |    FROM scored))),
             |gated AS (SELECT * FROM langed WHERE n_tokens >= 5 AND lang_pred <> 'und'),
             |keepd AS (SELECT g.* FROM gated g JOIN (
             |    SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(norm_text)) k USING (doc_id)),
             |sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle FROM keepd)),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |dropset AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING min(dst) <> src)
             |SELECT doc_id, lang, lang_pred, n_tokens, asset_len, brightness,
             |  CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
             |       WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM keepd WHERE doc_id NOT IN (SELECT doc_id FROM dropset)""".stripMargin)),

    // The 100 TB variant of q62: the SAME pipeline fed by MinHash+LSH
    // pairs instead of exact shingle-intersection counting — exact
    // Jaccard over all candidate pairs is the one stage a corpus-scale
    // build never runs. 64 perms, 16 bands × 4 rows, threshold 0.5 (the
    // operating point of a real near-dup pass; q62's 0.03 exists to
    // exercise the exact generator against a nontrivial pair graph).
    // Oracle: the EXACT-Jaccard pipeline at the same threshold. This is
    // a full hash-check, not rows-only, because at these jaccard
    // parameters banding recall and estimator error are both
    // deterministic non-factors on the verify corpora: the observed
    // pair-similarity distribution is bimodal (near-dups >= 0.8, noise
    // < 0.2, nothing in 0.2..0.75), a J=0.8 pair escapes all 16 bands
    // with p = (1-0.8^4)^16 ~ 2e-4 and mis-estimates below 0.5 with
    // p ~ 1e-9 (Binom(64, 0.8) < 32), so MinHash-fed and exact-fed
    // keep sets coincide (`CorpusPipelineSpec` pins the equivalence).
    Q("q69_corpus_pipeline_approx",
      (s, d) => graft.ops.CorpusPipeline.run(
        Tables.documents(s, d),
        keep => keep.transform(Dedup.minhashLshPairs(
          "doc_id", "norm_text", 3, 64, 4, 0.5, tokensCol = Some("__w")))),
      Some("""WITH RECURSIVE
             |norm AS (SELECT doc_id, lang,
             |  regexp_replace(regexp_replace(lower(trim(text)), '[\x00-\x1F\x7F]', ' ', 'g'),
             |    '  +', ' ', 'g') AS norm_text FROM documents),
             |scored AS (SELECT doc_id, lang, norm_text,
             |  string_split_regex(trim(norm_text), '\s+') AS w FROM norm),
             |langed AS (SELECT doc_id, lang, norm_text, w,
             |  cast(len(w) AS BIGINT) AS n_tokens,
             |  CASE WHEN mx = 0 THEN 'und'
             |       WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es'
             |       WHEN h_en = mx THEN 'en' ELSE 'de' END AS lang_pred
             |  FROM (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS mx FROM (
             |    SELECT *,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','que','y','los','una'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','des','et','est','une'], x))) AS h_fr
             |    FROM scored))),
             |gated AS (SELECT * FROM langed WHERE n_tokens >= 5 AND lang_pred <> 'und'),
             |keepd AS (SELECT g.* FROM gated g JOIN (
             |    SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(norm_text)) k USING (doc_id)),
             |sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle FROM keepd)),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.5),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |dropset AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING min(dst) <> src)
             |SELECT doc_id, lang, lang_pred, n_tokens,
             |  CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
             |       WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM keepd WHERE doc_id NOT IN (SELECT doc_id FROM dropset)""".stripMargin)),

    // MinHash + LSH banding near-dup (rows-only check: DuckDB lacks
    // Spark's xxhash64). 32 perms, 8 bands × 4 rows.
    Q("q27_minhash_lsh",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.minhashLshPairs("doc_id", "text", 3, 32, 4, 0.03)),
      None),

    // q27's md5-signature twin — same algorithm, same parameters, but
    // every hash in the pipeline (per-perm minhash AND band bucket) is
    // md5, which DuckDB computes bit-identically, so the full MinHash+LSH
    // pair set gets a hash-checked oracle instead of q27's rows-only
    // check. MinhashLshSpec pins its pair set ≡ q27's on the same input;
    // xxhash64 stays the production default (long vs 32-char hex
    // signatures).
    Q("q91_minhash_lsh_md5",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.minhashLshPairsMd5("doc_id", "text", 3, 32, 4, 0.03)),
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sig AS (SELECT doc, p, min(md5(p::VARCHAR || '|' || shingle)) AS h
             |  FROM sh CROSS JOIN range(32) t(p) GROUP BY doc, p),
             |buck AS (SELECT doc, p // 4 AS band,
             |    md5(string_agg(h, '|' ORDER BY p)) AS bucket
             |  FROM sig GROUP BY doc, p // 4),
             |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
             |  FROM buck a JOIN buck b
             |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc),
             |est AS (SELECT doc_a, doc_b,
             |    round(sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) / 32.0, 4) AS est_jaccard
             |  FROM cand JOIN sig sa ON sa.doc = cand.doc_a
             |            JOIN sig sb ON sb.doc = cand.doc_b AND sb.p = sa.p
             |  GROUP BY doc_a, doc_b)
             |SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.03""".stripMargin)),

    // SimHash near-dup at the radius the 4-chunk banding makes
    // EXHAUSTIVE (<= 3; see Dedup.simhashPairs) — rows-only check.
    Q("q28_simhash_pairs",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.simhashPairs("doc_id", "text", 3)),
      None),

    // q28's md5-bit twin — token bits from md5 nibbles, signature as a
    // 64-char bit string, same 4×16 chunk banding + Hamming verify —
    // every stage DuckDB-reproducible, so the SimHash family gets a full
    // hash oracle (q91's pattern for MinHash). Unlike MinHash the
    // radius-1..3 tail is legitimately bit-family-dependent (one 64-bit
    // sketch, not an averaged estimate), so DedupSpec pins both
    // families' surfaced pairs to the top of the exact token-cosine
    // distribution instead of to each other.
    Q("q97_simhash_pairs_md5",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.simhashPairsMd5("doc_id", "text", 3)),
      Some("""WITH tok AS (SELECT doc_id AS doc, unnest(list_filter(
             |    string_split_regex(trim(text), '\s+'), x -> x <> '')) AS w
             |  FROM documents),
             |tm AS (SELECT doc, md5(w) AS m FROM tok),
             |bits AS (SELECT doc, b,
             |    ((strpos('0123456789abcdef', substr(m, cast(1 + b // 4 AS INT), 1)) - 1)
             |      >> cast(3 - b % 4 AS INT)) & 1 AS bit
             |  FROM tm CROSS JOIN range(64) t(b)),
             |votes AS (SELECT doc, b, sum(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
             |  FROM bits GROUP BY doc, b),
             |sig AS (SELECT doc,
             |    string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sim
             |  FROM votes GROUP BY doc),
             |ch AS (SELECT doc, sim, c, substr(sim, cast(1 + c * 16 AS INT), 16) AS ckey
             |  FROM sig CROSS JOIN range(4) t2(c)),
             |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
             |    a.sim AS sa, b.sim AS sb
             |  FROM ch a JOIN ch b
             |  ON a.c = b.c AND a.ckey = b.ckey AND a.doc < b.doc)
             |SELECT doc_a, doc_b,
             |  cast(len(list_filter(range(64),
             |    i -> substr(sa, cast(i + 1 AS INT), 1) <> substr(sb, cast(i + 1 AS INT), 1)))
             |    AS BIGINT) AS hamming
             |FROM cand
             |WHERE len(list_filter(range(64),
             |  i -> substr(sa, cast(i + 1 AS INT), 1) <> substr(sb, cast(i + 1 AS INT), 1))) <= 3""".stripMargin)),

    // Brute-force cosine top-k — the exact ANN baseline. Query set =
    // vec_id < 100, a FIXED-size set: the broadcast side stays O(1) in
    // the corpus size (a %-based sample would grow with N and eventually
    // OOM the broadcast at 100 TB). k = 5; rank on rounded sim for
    // cross-engine determinism.
    Q("q29_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 5)
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
             |  FROM embeddings WHERE vec_id < 100),
             |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
             |s AS (SELECT query_id, neighbor_id,
             |  round(list_dot_product(qv, cv) /
             |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4) + 0.0 AS sim
             |  FROM c, q WHERE neighbor_id <> query_id)
             |SELECT query_id, neighbor_id, sim, rk FROM
             |(SELECT *, row_number() OVER (PARTITION BY query_id
             |  ORDER BY sim DESC, neighbor_id) AS rk FROM s)
             |WHERE rk <= 5""".stripMargin)),

    // LSH-bucketed approximate top-k — the 100 TB scale path
    // (rows-only check: bucket ids derive from xxhash64; measured
    // against the exact baseline by q50_ann_recall). Multi-probe: each
    // query probes its home bucket plus the 7 likeliest sign-error
    // buckets — recall knob with no corpus re-bucketing.
    Q("q30_lsh_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 5, nBits = 4, nProbe = 8)
      },
      None),

    // q30's md5-hyperplane twin (home bucket, same nBits/k): hyperplane
    // signs from md5 nibble parity, projections rounded 4dp before the
    // sign test, string bucket ids — the whole bucket assignment +
    // candidate join + ranking reproducible in DuckDB, completing the
    // hash-family oracle set (q91 MinHash, q96 IVF, q97 SimHash).
    Q("q98_lsh_topk_md5",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.lshTopKMd5(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 5, nBits = 4)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |proj AS (SELECT vec_id, h,
             |    round(list_sum(list_transform(range(len(v)), i -> v[i+1] *
             |      CASE WHEN (strpos('0123456789abcdef',
             |          substr(md5(h::VARCHAR || '|' || i::VARCHAR), 1, 1)) - 1) & 1 = 1
             |        THEN 1.0 ELSE -1.0 END)), 4) AS p
             |  FROM e CROSS JOIN range(4) t(h)),
             |buck AS (SELECT vec_id,
             |    string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, '' ORDER BY h) AS bucket
             |  FROM proj GROUP BY vec_id),
             |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
             |  FROM buck q JOIN buck c ON q.bucket = c.bucket
             |  WHERE q.vec_id < 100 AND c.vec_id <> q.vec_id),
             |s AS (SELECT query_id, neighbor_id,
             |    round(list_dot_product(eq.v, en.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) *
             |       sqrt(list_dot_product(en.v, en.v))), 4) + 0.0 AS sim
             |  FROM cand JOIN e eq ON eq.vec_id = cand.query_id
             |            JOIN e en ON en.vec_id = cand.neighbor_id)
             |SELECT query_id, neighbor_id, sim, rk FROM
             |(SELECT *, row_number() OVER (PARTITION BY query_id
             |  ORDER BY sim DESC, neighbor_id) AS rk FROM s)
             |WHERE rk <= 5""".stripMargin)),

    // Embedding-cosine near-duplicate pairs, exact all-pairs variant —
    // oracle ground truth for the LSH-bucketed scale path
    // (Similarity.cosineNearDupPairs). Quadratic by construction: run on
    // the corpus sample that fits the verify budget; at scale the LSH/IVF
    // candidate generation replaces the cross join.
    Q("q45_cosine_near_dup",
      (s, d) => {
        val c = Tables.embeddings(s, d)
          .select(col("vec_id").as("id_a"), col("embedding").as("va"))
        val c2 = Tables.embeddings(s, d)
          .select(col("vec_id").as("id_b"), col("embedding").as("vb"))
        c.join(c2, col("id_a") < col("id_b"))
          .withColumn("sim", Num.roundz(
            graft.functions.CosineSimilarityExpr.cosineSim(col("va"), col("vb")), 4))
          .filter(col("sim") >= 0.35)
          .select("id_a", "id_b", "sim")
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             |  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS sim
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             |  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.35""".stripMargin)),

    // IVF approximate top-k — the density-adaptive ANN scale path
    // (rows-only check; the coarse quantizer is engine-defined; measured
    // against the exact baseline by q50_ann_recall).
    Q("q35_ivf_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 5, nCentroids = 16, nProbe = 8)
      },
      None),

    // q35's deterministic twin at the same parameters (16 cells, probe
    // 8, k 5): md5-seeded centroids + every ordering decision on
    // round(cos, 4) with id tiebreaks make the WHOLE approximate search
    // — cell argmax, probe ranking, candidate join, final top-k —
    // reproducible in DuckDB, so the IVF family gets a full hash oracle
    // (q35 keeps the production metric + q50's recall floor). Same
    // pattern as q91↔q27 for MinHash and q92's cell assignment.
    Q("q96_ivf_topk_md5",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopKDeterministic(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 5,
          Similarity.md5SeededCentroids(emb, "vec_id", "embedding", 16),
          nProbe = 8)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cid, v AS cv FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |scored AS (SELECT e.vec_id, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent c),
             |assign AS (SELECT vec_id, cid AS cell FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM scored) WHERE rn = 1),
             |probes AS (SELECT query_id, cid AS cell FROM (
             |    SELECT vec_id AS query_id, cid, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY cs DESC, cid) AS pn
             |    FROM scored WHERE vec_id < 100) WHERE pn <= 8),
             |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
             |  FROM probes p JOIN assign a ON a.cell = p.cell
             |  WHERE a.vec_id <> p.query_id),
             |s2 AS (SELECT c.query_id, c.neighbor_id,
             |    round(list_dot_product(eq.v, en.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) *
             |       sqrt(list_dot_product(en.v, en.v))), 4) + 0.0 AS sim
             |  FROM cand c JOIN e eq ON eq.vec_id = c.query_id
             |              JOIN e en ON en.vec_id = c.neighbor_id)
             |SELECT query_id, neighbor_id, sim, rk FROM
             |(SELECT *, row_number() OVER (PARTITION BY query_id
             |  ORDER BY sim DESC, neighbor_id) AS rk FROM s2)
             |WHERE rk <= 5""".stripMargin)),

    // Filtered ANN: q96's deterministic IVF search scoped per query to
    // same-label corpus rows — the tenant/category/language search-time
    // filter every production vector store exposes. The label rides the
    // cell assignment itself (no corpus join-back) and prunes candidates
    // BEFORE any distance math or ranking slot; the whole filtered
    // search (cells, probes, filter, top-k) reproduces in DuckDB.
    Q("q103_filtered_ann",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopKDeterministicFiltered(emb,
          emb.filter(col("vec_id") < 100), "vec_id", "embedding", "label",
          5, Similarity.md5SeededCentroids(emb, "vec_id", "embedding", 16),
          nProbe = 8)
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cid, v AS cv FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |scored AS (SELECT e.vec_id, e.label, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent c),
             |assign AS (SELECT vec_id, label, cid AS cell FROM (
             |    SELECT vec_id, label, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM scored) WHERE rn = 1),
             |probes AS (SELECT query_id, qlabel, cid AS cell FROM (
             |    SELECT vec_id AS query_id, label AS qlabel, cid, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY cs DESC, cid) AS pn
             |    FROM scored WHERE vec_id < 100) WHERE pn <= 8),
             |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, a.label
             |  FROM probes p JOIN assign a ON a.cell = p.cell
             |  WHERE a.vec_id <> p.query_id AND a.label = p.qlabel),
             |s2 AS (SELECT c.query_id, c.label, c.neighbor_id,
             |    round(list_dot_product(eq.v, en.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) *
             |       sqrt(list_dot_product(en.v, en.v))), 4) + 0.0 AS sim
             |  FROM cand c JOIN e eq ON eq.vec_id = c.query_id
             |              JOIN e en ON en.vec_id = c.neighbor_id)
             |SELECT query_id, label, neighbor_id, sim, rk FROM
             |(SELECT *, row_number() OVER (PARTITION BY query_id
             |  ORDER BY sim DESC, neighbor_id) AS rk FROM s2)
             |WHERE rk <= 5""".stripMargin)),

    // ANN recall harness: join each approximate method's top-k against
    // the exact brute-force top-k and report per-method recall — the
    // quantitative check that turns "runs" into "measurably correct"
    // (rows-only here; SimilaritySpec asserts recall >= 0.6 on sf0.01).
    Q("q50_ann_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 100)
        val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
          .select("query_id", "neighbor_id")
        val approx =
          Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5, nBits = 4, nProbe = 8)
            .select(lit("lsh").as("method"), col("query_id"), col("neighbor_id"))
          .union(
            Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
              nCentroids = 16, nProbe = 8)
            .select(lit("ivf").as("method"), col("query_id"), col("neighbor_id")))
          .union(
            // one Lloyd round — measures whether density-adapted cells
            // help recall at the same probe budget (spec floors it too)
            Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
              nCentroids = 16, nProbe = 8, nIters = 1)
            .select(lit("ivf_lloyd").as("method"), col("query_id"), col("neighbor_id")))
          .union(
            Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
              dim = 64, m = 16, refine = 8)
            .select(lit("pq").as("method"), col("query_id"), col("neighbor_id")))
          .union(
            Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
              dim = 64, nCentroids = 16, nProbe = 8, m = 16, refine = 8)
            .select(lit("ivfpq").as("method"), col("query_id"), col("neighbor_id")))
          .union {
            // JL 64→16 + brute force on the projection: what retrieval
            // quality the q138 compression alone costs, before any
            // bucketing. MEASURED finding (sf0.01): recall@5 ≈ 0.11 —
            // sign-JL at k=16 drowns this corpus's tiny neighbor
            // margins in its 1/√k ≈ 0.25 noise, while PQ at the SAME
            // 16-byte budget reaches 0.86 by fitting codebooks to the
            // data. The projection is a storage/distance-audit tool
            // (q138), not a fine-ranking index; the harness keeps the
            // number on record so nobody re-learns this the hard way
            val jl = emb.select(col("vec_id"),
              graft.functions.VectorFunctions.jlProject(col("embedding"), 16)
                .cast("array<float>").as("embedding"))
            Similarity.bruteForceTopK(jl, jl.filter(col("vec_id") < 100),
              "vec_id", "embedding", 5)
            .select(lit("jl16").as("method"), col("query_id"), col("neighbor_id"))
          }
        approx
          .join(exact.withColumn("__hit", lit(1L)),
            Seq("query_id", "neighbor_id"), "left")
          .groupBy("method")
          .agg(count(lit(1)).as("n_returned"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
          .crossJoin(broadcast(exact.agg(count(lit(1)).as("n_exact"))))
          .withColumn("recall", Num.roundz(col("n_hit").cast("double") / col("n_exact"), 4))
          .select("method", "n_returned", "n_hit", "n_exact", "recall")
      },
      None),

    // Embedding near-dup via the LSH scale path, oracle-checked: 32
    // independent 2-bit tables OR-amplified give per-pair miss
    // probability (1 - p²)^32 < 3e-7 at cos = 0.35 (p = 1 - θ/π ≈ 0.61),
    // so the output hash-matches the exact all-pairs q45 oracle while the
    // plan stays a bucket equi-join + id-only dedup (no cross join).
    // Low nBits/many tables is what a 0.35 threshold costs; a realistic
    // near-dup threshold (≥ 0.9) runs the same operator with nBits = 8
    // and a handful of tables — see Similarity.cosineNearDupPairs.
    Q("q51_cosine_near_dup_lsh",
      (s, d) => Similarity.cosineNearDupPairs(
        Tables.embeddings(s, d), "vec_id", "embedding", 0.35,
        nBits = 2, nTables = 32),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             |  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS sim
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             |  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.35""".stripMargin)),

    // Document fingerprinting: md5 window signatures, one row per window.
    Q("q31_fingerprint",
      (s, d) => Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), posexplode(
          TextFunctions.windowFingerprints(col("text"), col("n_chars"))))
        .select(col("doc_id"), col("pos").cast("long").as("win_idx"),
          col("col").as("fp")),
      Some("""SELECT doc_id, win_idx, md5(substr(text, cast(win_idx * 100 + 1 AS INT), 50)) AS fp
             |FROM (SELECT doc_id, text,
             |  unnest(range(greatest((n_chars - 1) // 100, 0) + 1)) AS win_idx
             |  FROM documents WHERE n_chars > 0)""".stripMargin)),

    // Multimodal decode plumbing, oracle-checked: binary payloads
    // synthesized from document text (pure ASCII, so byte statistics are
    // SQL-expressible) run through the REAL partition-batched decode path
    // (binary column -> typed Dataset -> mapPartitions decode). The
    // oracle covers the non-stub outputs (length, mean-byte
    // "brightness"); the fake dimensions/features stay spec-tested
    // behind the documented stub boundary. Byte sums are integers, so
    // the double mean is exact on both engines. length is byte-based on
    // both sides (octet_length ↔ octet_length(encode(…))); brightness
    // averages BYTES on the Spark side vs CODE POINTS in the oracle —
    // equal only under the fixtures' pinned ASCII-only contract
    // (verified: all sf tiers), which is the documented boundary.
    Q("q59_multimodal_decode",
      (s, d) => {
        import s.implicits._
        val assets = Tables.documents(s, d)
          .filter(col("n_chars") > 0)
          .select(col("doc_id").cast("string").as("path"),
            lit("binary").as("modality"),
            octet_length(col("text")).cast("long").as("length"),
            col("text").cast("binary").as("content"))
          .as[graft.multimodal.RawAsset]
        graft.multimodal.Multimodal.decodeBatch(assets, featureDim = 16)
          .toDF()
          .select(col("path"), col("modality"), col("length"),
            Num.roundz(col("brightness"), 4).as("brightness"))
      },
      Some("""SELECT cast(doc_id AS VARCHAR) AS path, 'binary' AS modality,
             |cast(octet_length(encode(text)) AS BIGINT) AS length,
             |round(list_avg(list_transform(string_split(text, ''), x -> ascii(x))), 4) AS brightness
             |FROM documents WHERE n_chars > 0""".stripMargin)),

    // Deterministic stratified sampling: per-language rates decided by an
    // md5-prefix threshold — replay-safe (same rows every run on any
    // cluster/partitioning), shuffle-free (a scan-level filter), and
    // reproducible by any engine that computes md5 (hence the oracle).
    Q("q52_stratified_sample",
      (s, d) => Sampling.stratifiedByHash(
          Tables.documents(s, d), "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), 0.125)
        .select(col("doc_id"), col("lang"),
          Sampling.hashBucket(col("doc_id")).as("bucket_hex")),
      Some("""SELECT doc_id, lang, substr(md5(cast(doc_id AS VARCHAR)), 1, 2) AS bucket_hex
             |FROM documents
             |WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 2) <
             |  CASE WHEN lang = 'en' THEN '80'
             |       WHEN lang IN ('de', 'fr') THEN '40' ELSE '20' END""".stripMargin)),

    // Train/val/test split assignment: cumulative hash ranges over the
    // same md5 bucket as q52 — a pure function of the id, so a document
    // never migrates between splits as the corpus grows (eval-set
    // contamination guard). 80/10/10.
    Q("q58_train_split",
      (s, d) => Sampling.splitByHash(
          Tables.documents(s, d).select("doc_id", "lang"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("lang"), col("split")),
      Some("""SELECT doc_id, lang,
             |CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
             |     WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
             |     ELSE 'test' END AS split
             |FROM documents""".stripMargin)),

    // TF-IDF: top-3 terms per document. tf and df are two hash
    // aggregations; ranking is on the ROUNDED score (cross-engine float
    // parity) with term tiebreak. The vocabulary join is deliberately
    // UNHINTED: dfreq has one row per distinct term — unbounded on a web
    // corpus — so a broadcast hint would OOM the executors at scale.
    // Catalyst picks broadcast from stats when the vocabulary is actually
    // small and a shuffled join on `term` (a shuffle dfreq's own groupBy
    // already pays) when it isn't. Only the ONE-ROW n_docs count keeps a
    // broadcast hint (bounded by construction).
    Q("q53_tfidf",
      (s, d) => {
        val toks = Tables.documents(s, d).select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
        tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
          .withColumn("tfidf", Num.roundz(col("tf") *
            log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 4))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("doc_id", "term", "tf", "df", "tfidf", "rk")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT doc_id, term, tf, df, tfidf, rk FROM (
             |  SELECT doc_id, term, tf, df,
             |    round(tf * ln((n_docs + 1) * 1.0 / (df + 1)), 4) AS tfidf,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY round(tf * ln((n_docs + 1) * 1.0 / (df + 1)), 4) DESC, term) AS rk
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
             |WHERE rk <= 3""".stripMargin)),

    // Unigram LM quality score: per-doc mean log probability of its
    // tokens under the corpus's own unigram distribution — the
    // perplexity-style filter that catches gibberish q24's ratio
    // heuristics miss (rare-token soup scores low, fluent text high).
    // Same vocabulary discipline as q53: the term join is UNHINTED
    // (a web corpus's vocabulary is unbounded, broadcast is a stats
    // decision), and the shuffles carry (doc_id, token)-level rows, never
    // documents; the single-row corpus total is always broadcast.
    Q("q73_unigram_logprob",
      (s, d) => {
        val toks = Tables.documents(s, d).select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val total = vocab.agg(sum("cnt").as("__total"))
        toks.join(vocab, "tok")
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            Num.roundz(avg(log(col("cnt") / col("__total"))), 4).as("logprob_per_token"))
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
             |t AS (SELECT cast(sum(cnt) AS BIGINT) AS total FROM v)
             |SELECT doc_id, count(*) AS n_tokens,
             |  round(avg(ln(cnt * 1.0 / total)), 4) AS logprob_per_token
             |FROM tk JOIN v USING (tok) CROSS JOIN t GROUP BY doc_id""".stripMargin)),

    // Mixture drift monitor: KL(source token distribution ‖ corpus token
    // distribution) per source — the check a corpus build runs when a
    // crawl's composition shifts. The source×token and token aggregates
    // are map-side-partial counts; nothing document-sized shuffles, and
    // the corpus-wide counts derive from the per-source counts (one
    // explode pass, reused). KL ≥ 0 always; 0 iff the source matches
    // the corpus mix exactly. Every source token exists in the corpus
    // distribution by construction, so no zero-probability terms.
    Q("q75_source_kl",
      (s, d) => {
        val toks = Tables.documents(s, d).select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        val srcCnt = toks.groupBy("source", "tok").agg(count(lit(1)).as("c_s"))
        val srcTot = srcCnt.groupBy("source").agg(sum("c_s").as("t_s"))
        val corpusCnt = srcCnt.groupBy("tok").agg(sum("c_s").as("c"))
        val corpusTot = corpusCnt.agg(sum("c").as("t"))
        srcCnt.join(srcTot, "source").join(corpusCnt, "tok")
          .crossJoin(broadcast(corpusTot))
          .groupBy("source")
          .agg(sum("c_s").as("n_tokens"),
            // KL is ≥ 0 mathematically but the float sum of signed terms
            // can land at -1e-17 for a near-global source → signed zero
            Num.round4(sum((col("c_s") / col("t_s")) *
              log((col("c_s") / col("t_s")) / (col("c") / col("t"))))).as("kl_nats"))
      },
      Some("""WITH tk AS (SELECT source,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
             |  FROM documents),
             |sc AS (SELECT source, tok, count(*) AS c_s FROM tk GROUP BY 1, 2),
             |st AS (SELECT source, cast(sum(c_s) AS BIGINT) AS t_s FROM sc GROUP BY 1),
             |cc AS (SELECT tok, cast(sum(c_s) AS BIGINT) AS c FROM sc GROUP BY 1),
             |ct AS (SELECT cast(sum(c) AS BIGINT) AS t FROM cc)
             |SELECT source, cast(sum(c_s) AS BIGINT) AS n_tokens,
             |  round(sum((c_s * 1.0 / t_s) * ln((c_s * 1.0 / t_s) / (c * 1.0 / t))), 4) + 0.0 AS kl_nats
             |FROM sc JOIN st USING (source) JOIN cc USING (tok) CROSS JOIN ct
             |GROUP BY source""".stripMargin)),

    // Embedding maintenance: L2 norm, unit-normalized lead component, and
    // symmetric int8 quantization (the standard compression step before
    // an ANN index build). Quantized values are exact integers, emitted
    // as a joined string so the oracle compare is representation-
    // independent; the oracle carries the same zero-vector arms as the
    // guarded Spark functions (pass-through normalize, all-zero quant).
    Q("q54_embed_quantize",
      (s, d) => Tables.embeddings(s, d).select(
        col("vec_id"),
        Num.roundz(VectorFunctions.norm(col("embedding")), 4).as("l2_norm"),
        // a unit component that is ~±1e-18 rounds to -0.0 or 0.0 by
        // engine summation-order luck (surfaced at sf0.1)
        Num.round4(element_at(VectorFunctions.unitNormalize(col("embedding")), 1))
          .as("unit0"),
        array_join(VectorFunctions.quantizeInt8(col("embedding")), ",").as("quant_i8")),
      Some("""SELECT vec_id,
             |round(nrm, 4) AS l2_norm,
             |CASE WHEN nrm = 0 THEN round(ed[1], 4) + 0.0
             |     ELSE round(ed[1] / nrm, 4) + 0.0 END AS unit0,
             |CASE WHEN mx = 0 THEN array_to_string(list_transform(ed, x -> 0), ',')
             |     ELSE array_to_string(list_transform(ed, x -> CAST(round(x * 127.0 / mx) AS BIGINT)), ',')
             |END AS quant_i8
             |FROM (SELECT vec_id, embedding::DOUBLE[] AS ed,
             |  list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx,
             |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
             |  FROM embeddings)""".stripMargin)),

    // Copy detection by fingerprint collision: docs sharing >= 2 window
    // fingerprints (q31's signatures put to work). The join key is the
    // fingerprint — an inverted index like the shingle join, never an
    // all-pairs comparison. Degenerate common windows (whitespace runs,
    // boilerplate headers) would explode the self-join quadratically on
    // one hot fp, so fingerprints whose document frequency exceeds maxDf
    // are dropped first — the same stop-term cap as the shingle join
    // (Dedup.ngramJaccardPairs), mirrored in the oracle's HAVING.
    Q("q55_fingerprint_dupes",
      (s, d) => {
        val maxDf = 1000L
        val fps = Tables.documents(s, d).filter(col("n_chars") > 0)
          .select(col("doc_id"), explode(
            TextFunctions.windowFingerprints(col("text"), col("n_chars"))).as("fp"))
          .distinct()
        // df via groupBy (map-side partial counts), never a window over
        // the hot key — same rationale as Dedup.ngramJaccardPairs
        val rare = fps.join(
          fps.groupBy("fp").agg(count(lit(1)).as("__df"))
            .filter(col("__df") <= maxDf).drop("__df"), "fp")
        rare.as("a").join(rare.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
      },
      Some("""WITH f AS (SELECT DISTINCT doc_id,
             |    md5(substr(text, cast(win_idx * 100 + 1 AS INT), 50)) AS fp
             |  FROM (SELECT doc_id, text,
             |    unnest(range(greatest((n_chars - 1) // 100, 0) + 1)) AS win_idx
             |    FROM documents WHERE n_chars > 0)),
             |r AS (SELECT f.* FROM f JOIN (
             |    SELECT fp FROM f GROUP BY fp HAVING count(*) <= 1000) ok USING (fp))
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
             |FROM r a JOIN r b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin)),

    // Benchmark decontamination: remove training documents sharing any
    // 3-word shingle with a held-out benchmark set (fixture: every 50th
    // doc plays the benchmark). The held-out shingle set is broadcast —
    // benchmarks are bounded while train is the 100 TB side — so the
    // probe is a map-side semi-join; see Dedup.decontaminate.
    Q("q63_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.decontaminate("doc_id", "text", 3)(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0))
          .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
      },
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |contaminated AS (SELECT DISTINCT t.doc AS doc_id FROM sh t
             |  WHERE t.doc % 50 <> 0 AND t.shingle IN (
             |    SELECT shingle FROM sh WHERE doc % 50 = 0))
             |SELECT doc_id, lang, cast(n_chars AS BIGINT) AS n_chars FROM documents
             |WHERE doc_id % 50 <> 0
             |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)""".stripMargin)),

    // Repetition profiling: duplicate-token and duplicate-bigram
    // fractions per document (the repeated-n-gram family of quality
    // filters — boilerplate and degenerate text score high). Pure
    // per-row array expressions: zero shuffle at any scale. Token and
    // bigram arrays are hoisted into their own projections so the
    // interpreted lambdas run once per row (no CSE — q62's rule).
    Q("q64_repetition",
      (s, d) => {
        val rep = TextFunctions.repetitionStructFromArrays(col("__w"), col("__bg"))
        Tables.documents(s, d)
          .withColumn("__w", TextFunctions.tokens(col("text")))
          .withColumn("__bg", TextFunctions.bigrams(col("__w")))
          .select(
            col("doc_id"),
            rep.getField("n_tokens").as("n_tokens"),
            rep.getField("dup_token_frac").as("dup_token_frac"),
            rep.getField("dup_bigram_frac").as("dup_bigram_frac"))
      },
      Some("""SELECT doc_id,
             |cast(len(w) AS BIGINT) AS n_tokens,
             |CASE WHEN len(w) > 0 THEN
             |  round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 4) END AS dup_token_frac,
             |CASE WHEN len(w) >= 2 THEN
             |  round(1.0 - len(list_distinct(bg)) * 1.0 / len(bg), 4) END AS dup_bigram_frac
             |FROM (SELECT doc_id, w,
             |  list_transform(range(greatest(len(w) - 1, 0)),
             |    i -> w[i+1] || ' ' || w[i+2]) AS bg
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents))""".stripMargin)),

    // Dataloader shard layout: deterministic global shuffle (md5 of
    // seed+id) dealt round-robin into 4 shards — reproducible across
    // runs/engines, reshuffled per epoch by the seed. Two-phase rank
    // underneath: no single-partition window (PlanSpec guards it).
    Q("q65_shuffle_shards",
      (s, d) => Tables.documents(s, d)
        .transform(Sampling.shuffleShards("doc_id", 4, "epoch0"))
        .select(col("doc_id"), col("pos"), col("shard")),
      Some("""SELECT doc_id,
             |row_number() OVER (ORDER BY md5('epoch0' || cast(doc_id AS VARCHAR)), doc_id) - 1 AS pos,
             |cast((row_number() OVER (ORDER BY md5('epoch0' || cast(doc_id AS VARCHAR)), doc_id) - 1) % 4 AS INT) AS shard
             |FROM documents""".stripMargin)),

    // Corpus snapshot diff: added/removed/changed between two ingests —
    // the incremental-reprocessing primitive. Fixture snapshots derive
    // deterministically from the one corpus: the "old" ingest is missing
    // every 10th doc (those become added), the "new" ingest drops every
    // 9th (removed) and rewrites every 7th's content (changed).
    Q("q66_snapshot_diff",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val oldSnap = docs.filter(col("doc_id") % 10 =!= 0)
        val newSnap = docs.filter(col("doc_id") % 9 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(lit("v2 "), col("text")))
              .otherwise(col("text")))
        Dedup.snapshotDiff("doc_id", "text")(oldSnap, newSnap)
      },
      Some("""WITH o AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 <> 0),
             |n AS (SELECT doc_id,
             |  md5(CASE WHEN doc_id % 7 = 0 THEN 'v2 ' || text ELSE text END) AS h
             |  FROM documents WHERE doc_id % 9 <> 0)
             |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             |  CASE WHEN o.doc_id IS NULL THEN 'added'
             |       WHEN n.doc_id IS NULL THEN 'removed'
             |       WHEN o.h <> n.h THEN 'changed' END AS status
             |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
             |WHERE (o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h)""".stripMargin)),

    // Mixture building 1/2: sample each source down to a char budget —
    // keep rate min(1, budget/total) per source, decided per row by the
    // 16-bit md5 hash fraction (deterministic, nested across budget
    // changes). src0/src1 get tight budgets (partial keep), src2 an
    // ample one (keep-all), unlisted sources keep everything.
    Q("q67_token_budget_mix",
      (s, d) => Sampling.tokenBudgetSample(
          Tables.documents(s, d), "doc_id", "source", "n_chars",
          Map("src0" -> 3000L, "src1" -> 2000L, "src2" -> 10000000L))
        .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars")),
      Some("""WITH tot AS (SELECT source, sum(n_chars) AS total FROM documents GROUP BY source)
             |SELECT d.doc_id, d.source, cast(d.n_chars AS BIGINT) AS n_chars
             |FROM documents d JOIN tot USING (source)
             |WHERE ('0x' || substr(md5('budget:' || cast(d.doc_id AS VARCHAR)), 1, 4))::BIGINT / 65536.0 <
             |  CASE d.source
             |    WHEN 'src0' THEN least(1.0, 3000.0 / total)
             |    WHEN 'src1' THEN least(1.0, 2000.0 / total)
             |    WHEN 'src2' THEN least(1.0, 10000000.0 / total)
             |    ELSE 1.0 END""".stripMargin)),

    // Mixture building 2/2: deterministic fractional upsampling — src0
    // runs 2.5 epochs (all rows twice, a hash-chosen half a third time),
    // src1 half an epoch (hash-chosen half once), everything else 1.
    Q("q68_epoch_repeat",
      (s, d) => Sampling.repeatByFactor(
          Tables.documents(s, d), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.5))
        .select(col("doc_id"), col("source"), col("rep")),
      Some("""WITH f AS (SELECT doc_id, source,
             |  CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5 ELSE 1.0 END AS fac
             |  FROM documents),
             |e AS (SELECT doc_id, source,
             |  cast(floor(fac) AS BIGINT) +
             |  (CASE WHEN ('0x' || substr(md5('rep:' || cast(doc_id AS VARCHAR)), 1, 4))::BIGINT / 65536.0
             |        < fac - floor(fac) THEN 1 ELSE 0 END) AS n FROM f)
             |SELECT doc_id, source, unnest(range(n)) AS rep FROM e WHERE n > 0""".stripMargin)),

    // Sequence packing: documents laid end-to-end into fixed-512-token
    // training sequences, 4 dataloader shards, deterministic epoch-0
    // order — the padding-free concat-and-chunk batch layout. The
    // cumulative token offset is a window PARTITIONED BY SHARD: nShards
    // independent running sums (at corpus scale, thousands), never one
    // global single-partition window (PlanSpec pins it).
    Q("q76_seq_pack",
      (s, d) => Tables.documents(s, d)
        // prune to (id, length) BEFORE packing: the rank's range Exchange
        // and the shard Exchange must never carry document text the
        // output doesn't need (a writer packing the documents themselves
        // passes the text column on purpose — the operator is generic)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        .transform(Sampling.packSequences("doc_id", "n_tokens", 512, 4, "epoch0"))
        .select(col("doc_id"), col("pos"), col("shard"),
          col("n_tokens"), col("offset"), col("bin")),
      Some("""WITH t AS (SELECT doc_id,
             |    cast(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |p AS (SELECT doc_id, n_tokens,
             |    row_number() OVER (ORDER BY md5('epoch0' || cast(doc_id AS VARCHAR)), doc_id) - 1 AS pos
             |  FROM t),
             |s AS (SELECT doc_id, n_tokens, pos, cast(pos % 4 AS INT) AS shard FROM p)
             |SELECT doc_id, pos, shard, n_tokens,
             |  cast(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos) - n_tokens AS BIGINT) AS offset,
             |  cast(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos) - n_tokens) / 512.0) AS BIGINT) AS bin
             |FROM s""".stripMargin)),

    // Corpus heavy hitters: the 50 most document-frequent 3-word
    // shingles — boilerplate mining (the shingles a line/passage-level
    // cleaner would strip, and the stop-shingle list the maxDf caps in
    // the dedup joins are built from). groupBy gives map-side partial
    // counts; the top-50 cut is TakeOrderedAndProject (per-partition
    // top-k, tiny driver merge), never a global sort (PlanSpec pins it).
    Q("q77_heavy_hitters",
      (s, d) => Tables.documents(s, d)
        .select(explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle"))
        .limit(50),
      Some("""WITH sh AS (SELECT doc_id, unnest(list_distinct(
             |    list_transform(range(greatest(len(w) - 2, 0)),
             |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))
             |SELECT shingle, count(*) AS df FROM sh GROUP BY 1
             |ORDER BY df DESC, shingle LIMIT 50""".stripMargin)),

    // PII scrub: detect + mask emails and phone numbers before corpus
    // release. The synthetic corpus carries no PII, so the fixture
    // injects a deterministic contact line into every third document —
    // the detector must count and mask exactly those (and leave the
    // other documents byte-identical, which the hash compare proves).
    // Pure per-row regexes: zero shuffle at any scale.
    Q("q78_pii_redact",
      (s, d) => {
        val injected = Tables.documents(s, d).withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or call +1-555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
            .otherwise(col("text")))
        injected.select(col("doc_id"),
          graft.functions.TextFunctions.emailCount(col("text")).as("n_emails"),
          graft.functions.TextFunctions.phoneCount(col("text")).as("n_phones"),
          graft.functions.TextFunctions.redactPii(col("text")).as("clean_text"))
      },
      Some("""WITH inj AS (SELECT doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || cast(doc_id AS VARCHAR)
             |    || '@example.com or call +1-555-' || lpad(cast(doc_id % 10000 AS VARCHAR), 4, '0')
             |  ELSE text END AS text FROM documents)
             |SELECT doc_id,
             |  cast(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |  cast(len(regexp_extract_all(text, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
             |  regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text
             |FROM inj""".stripMargin)),

    // Per-source quality calibration: a fixed global quality threshold
    // over-prunes clean sources and under-prunes noisy ones, so corpus
    // builds gate on the score's PERCENTILE WITHIN SOURCE — keep each
    // source's top 80% by stopword ratio. percent_rank runs partitioned
    // by source (parallel across sources; within a source the rank is
    // the same two-phase shape as any per-group window). doc_id breaks
    // score ties so the cut is deterministic on both engines.
    Q("q79_quality_calibrated",
      (s, d) => {
        val score = TextFunctions.qualityStruct(col("text"), stopwords)
          .getField("stopword_ratio")
        val w = Window.partitionBy("source")
          .orderBy(col("score").desc, col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), score.as("score"))
          .withColumn("pr", Num.roundz(percent_rank().over(w), 4))
          .filter(col("pr") <= 0.8)
      },
      Some("""WITH s AS (SELECT doc_id, source,
             |    round(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in'], x))) * 1.0
             |      / len(w), 4) AS score
             |  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents))
             |SELECT doc_id, source, score,
             |  round(percent_rank() OVER (PARTITION BY source ORDER BY score DESC, doc_id), 4) AS pr
             |FROM s QUALIFY pr <= 0.8""".stripMargin)),

    // Bigram LM quality score: per-doc mean log P(w2 | w1) under the
    // corpus's own bigram/prefix counts — the next step up from q73's
    // unigram filter (catches shuffled-word soup that unigram stats
    // can't: plausible tokens in implausible order score low). Prefix
    // counts come from the bigram table itself, so the conditional is
    // self-consistent. Same vocabulary discipline as q53/q73: both
    // count joins are UNHINTED (bigram vocabulary is unbounded at
    // corpus scale — broadcast is a stats decision, never a pin), and
    // every shuffle carries (doc, bigram)-level rows, never documents.
    Q("q80_bigram_logprob",
      (s, d) => {
        // staged: three plan branches (both count aggregates + the final
        // join) consume the exploded bigram table, and the interpreted
        // bigram lambda is the expensive part — same reuse rationale as
        // the Jaccard shingle table (Staged releases the pin per query)
        val bgs = graft.ops.Staged.stage(
          Tables.documents(s, d).select(col("doc_id"),
            explode(TextFunctions.bigrams(TextFunctions.tokens(col("text")))).as("bg"))
          .withColumn("pref", substring_index(col("bg"), " ", 1)))
        val bgCnt = bgs.groupBy("bg").agg(count(lit(1)).as("c_bg"))
        val prefCnt = bgs.groupBy("pref").agg(count(lit(1)).as("c_pref"))
        bgs.join(bgCnt, "bg").join(prefCnt, "pref")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            Num.roundz(avg(log(col("c_bg") / col("c_pref"))), 4).as("logprob_per_bigram"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
             |  FROM documents),
             |b AS (SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 1, 0)),
             |    i -> w[i+1] || ' ' || w[i+2])) AS bg FROM t),
             |bp AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS pref FROM b),
             |cb AS (SELECT bg, count(*) AS c_bg FROM bp GROUP BY 1),
             |cp AS (SELECT pref, count(*) AS c_pref FROM bp GROUP BY 1)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  round(avg(ln(c_bg * 1.0 / c_pref)), 4) AS logprob_per_bigram
             |FROM bp JOIN cb USING (bg) JOIN cp USING (pref) GROUP BY doc_id""".stripMargin)),

    // Product-quantization ANN — the compressed serving path (IVF-PQ's
    // compression half): the corpus-side scan reads 8-byte code arrays
    // (32× smaller than the float32 vectors), scores by per-query lookup
    // table, and only the top refine·k candidates' real vectors are
    // fetched for the exact rerank. Rows-only check (codebooks derive
    // from xxhash64 sampling); q50's recall harness and SimilaritySpec
    // floor the quality against the exact baseline.
    Q("q82_pq_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 5, dim = 64, m = 16, refine = 8)
      },
      None),

    // Per-source quota cap: at most 15 documents per source, survivors
    // chosen by hash order — the anti-spam rule a web-corpus build
    // applies per domain (a rate can't express "cap only the
    // over-represented"). Windows run BY SOURCE: parallel across
    // sources, deterministic on both engines via the md5 order.
    Q("q84_source_quota",
      (s, d) => Sampling.quotaPerStratum(
          Tables.documents(s, d).select("doc_id", "source"), "doc_id",
          "source", 15)
        .select(col("doc_id"), col("source")),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source, row_number() OVER (
             |    PARTITION BY source
             |    ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents) WHERE rn <= 15""".stripMargin)),

    // IVF-PQ — the full FAISS-style composition: IVF cells prune WHICH
    // rows are scored (nProbe/nCentroids of the corpus), PQ codes set
    // the BYTES PER ROW (ADC over 16-byte codes, vectors fetched only
    // for the top refine·k rerank). The two scale levers compose
    // independently; the modeled serving table is (cell, id, codes)
    // bucketed by cell. Rows-only check; q50 measures its recall
    // against the exact baseline next to its parts.
    Q("q83_ivfpq_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 5, dim = 64, nCentroids = 16, nProbe = 8,
          m = 16, refine = 8)
      },
      None),

    // Incremental ANN index maintenance: build the persisted IVF-PQ
    // index on the OLDER half of the corpus, fold the newer half in
    // through appendIvfPqIndex (frozen models — batch-sized encode, the
    // base index is never re-read), serve from the appended table. The
    // dedupDelta twin for the serving story. Rows-only (xxhash64-seeded
    // models); BucketedAnnSpec pins append ≡ fresh encode of base ∪
    // batch under the same models. Tables are dropped up front so every
    // invocation (Bench iterations) appends exactly once.
    Q("q94_ivfpq_append",
      (s, d) => {
        val t = "graft_q94_ivfpq"
        Seq(t, s"${t}_centroids", s"${t}_codebooks").foreach { x =>
          s.sql(s"DROP TABLE IF EXISTS $x")
          // a FRESH session's catalog may not know a table whose
          // warehouse directory survived an earlier run — saveAsTable
          // then fails on LOCATION_ALREADY_EXISTS; clear the location too
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir") + "/" + x)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val emb = Tables.embeddings(s, d)
        val cut = emb.agg((max("vec_id") / lit(2.0)).as("__cut"))
        val withCut = emb.crossJoin(broadcast(cut))
        val base = withCut.filter(col("vec_id") <= col("__cut")).drop("__cut")
        val batch = withCut.filter(col("vec_id") > col("__cut")).drop("__cut")
        Similarity.writeIvfPqIndex(base, "vec_id", "embedding", t,
          dim = 64, nCentroids = 16, m = 16, nBuckets = 8)
        Similarity.appendIvfPqIndex(batch, "vec_id", "embedding", t,
          dim = 64, m = 16, nBuckets = 8)
        Similarity.ivfPqTopKIndexed(s, t, emb,
          emb.filter(col("vec_id") < 100), "vec_id", "embedding", 5,
          dim = 64, nProbe = 8, m = 16, refine = 8)
      },
      None),

    // q94's verification twin — the whole persisted-index LIFECYCLE
    // (build on the first corpus half, frozen-model append of the
    // second, serve from the bucketed table) under md5-seeded models
    // and rounded/quantized decisions, so DuckDB reproduces it end to
    // end by encoding base ∪ batch against the base-trained models (the
    // frozen-model append contract: append ≡ fresh encode of the union,
    // which BucketedAnnSpec pins as frame equality). Completes the last
    // rows-only ANN family with a full hash oracle; q94 keeps the
    // production xxhash64/Lloyd path.
    Q("q120_ivfpq_append_md5",
      (s, d) => {
        val t = "graft_q120_ivfpq_md5"
        Seq(t, s"${t}_centroids", s"${t}_codebooks").foreach { x =>
          s.sql(s"DROP TABLE IF EXISTS $x")
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir") + "/" + x)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val emb = Tables.embeddings(s, d)
        val cut = emb.agg((max("vec_id") / lit(2.0)).as("__cut"))
        val withCut = emb.crossJoin(broadcast(cut))
        val base = withCut.filter(col("vec_id") <= col("__cut")).drop("__cut")
        val batch = withCut.filter(col("vec_id") > col("__cut")).drop("__cut")
        Similarity.writeIvfPqIndexDeterministic(base, "vec_id", "embedding",
          t, dim = 64, nCentroids = 16, m = 16, kCodes = 16, nBuckets = 8)
        Similarity.appendIvfPqIndexDeterministic(batch, "vec_id", "embedding",
          t, dim = 64, m = 16, nBuckets = 8)
        Similarity.ivfPqTopKIndexedDeterministic(s, t, emb,
          emb.filter(col("vec_id") < 100), "vec_id", "embedding", 5,
          dim = 64, nProbe = 8, m = 16, refine = 8)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cut AS (SELECT max(vec_id) / 2.0 AS c FROM e),
             |base AS (SELECT e.vec_id, e.v FROM e, cut WHERE e.vec_id <= c),
             |cent AS (SELECT vec_id AS cid, v AS cv FROM base
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |u AS (SELECT vec_id, v,
             |    list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
             |  FROM e),
             |seed AS (SELECT uv, row_number() OVER (
             |      ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id) - 1 AS code
             |  FROM (SELECT b.vec_id, u.uv FROM base b JOIN u ON u.vec_id = b.vec_id
             |    ORDER BY md5(cast(b.vec_id AS VARCHAR)), b.vec_id LIMIT 16)),
             |cb AS (SELECT code, j AS subspace,
             |    uv[cast(j * 4 + 1 AS INT):cast(j * 4 + 4 AS INT)] AS centv
             |  FROM seed CROSS JOIN range(16) t(j)),
             |scored AS (SELECT e.vec_id, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent c),
             |assign AS (SELECT vec_id, cid AS cell FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM scored) WHERE rn = 1),
             |enc AS (SELECT cu.vec_id AS neighbor_id, cb.subspace, cb.code,
             |    cast(round(list_sum(list_transform(range(4), i ->
             |      (cu.uv[cast(cb.subspace * 4 + i + 1 AS INT)] - cb.centv[cast(i + 1 AS INT)]) *
             |      (cu.uv[cast(cb.subspace * 4 + i + 1 AS INT)] - cb.centv[cast(i + 1 AS INT)])))
             |      * 10000) AS BIGINT) AS d
             |  FROM u cu CROSS JOIN cb),
             |codes AS (SELECT neighbor_id, subspace, code FROM (
             |    SELECT *, row_number() OVER (PARTITION BY neighbor_id, subspace
             |      ORDER BY d, code) AS rn FROM enc) WHERE rn = 1),
             |probes AS (SELECT query_id, cid AS cell FROM (
             |    SELECT vec_id AS query_id, cid, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY cs DESC, cid) AS pn
             |    FROM scored WHERE vec_id < 100) WHERE pn <= 8),
             |lut AS (SELECT qu.vec_id AS query_id, cb.subspace, cb.code,
             |    cast(round(list_sum(list_transform(range(4), i ->
             |      qu.uv[cast(cb.subspace * 4 + i + 1 AS INT)] * cb.centv[cast(i + 1 AS INT)]))
             |      * 10000) AS BIGINT) AS l
             |  FROM u qu CROSS JOIN cb WHERE qu.vec_id < 100),
             |cand0 AS (SELECT p.query_id, a.vec_id AS neighbor_id
             |  FROM probes p JOIN assign a ON a.cell = p.cell
             |  WHERE a.vec_id <> p.query_id),
             |approx AS (SELECT c0.query_id, c0.neighbor_id, sum(l.l) AS ap
             |  FROM cand0 c0 JOIN codes c ON c.neighbor_id = c0.neighbor_id
             |  JOIN lut l ON l.query_id = c0.query_id
             |    AND l.subspace = c.subspace AND l.code = c.code
             |  GROUP BY 1, 2),
             |cand AS (SELECT query_id, neighbor_id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |      ORDER BY ap DESC, neighbor_id) AS crk FROM approx) WHERE crk <= 40),
             |s AS (SELECT cand.query_id, cand.neighbor_id,
             |    round(list_dot_product(eq.v, en.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) *
             |       sqrt(list_dot_product(en.v, en.v))), 4) + 0.0 AS sim
             |  FROM cand JOIN e eq ON eq.vec_id = cand.query_id
             |            JOIN e en ON en.vec_id = cand.neighbor_id)
             |SELECT query_id, neighbor_id, sim, rk FROM
             |(SELECT *, row_number() OVER (PARTITION BY query_id
             |  ORDER BY sim DESC, neighbor_id) AS rk FROM s)
             |WHERE rk <= 5""".stripMargin)),

    // q82's deterministic twin: md5-seeded no-Lloyd codebooks, encode
    // argmin and ADC LUT entries quantized to ×10⁴ integers (exact,
    // order-independent sums — ties-away rounding agrees across
    // engines), id/code tiebreaks everywhere — the full PQ search (seed
    // → slice → encode → LUT → codes-only approx scan → top-refine·k →
    // exact rerank) reproduces in DuckDB. Completes the verification-twin
    // set: every ANN/sketch family now has a hash-checked instance.
    Q("q99_pq_topk_md5",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.pqTopKDeterministic(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 5, dim = 64, m = 8, kCodes = 16, refine = 4)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |u AS (SELECT vec_id, v,
             |    list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
             |  FROM e),
             |seed AS (SELECT uv, row_number() OVER (
             |      ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id) - 1 AS code
             |  FROM (SELECT vec_id, uv FROM u
             |    ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 16)),
             |cb AS (SELECT code, j AS subspace,
             |    uv[cast(j * 8 + 1 AS INT):cast(j * 8 + 8 AS INT)] AS centv
             |  FROM seed CROSS JOIN range(8) t(j)),
             |enc AS (SELECT cu.vec_id AS neighbor_id, cb.subspace, cb.code,
             |    cast(round(list_sum(list_transform(range(8), i ->
             |      (cu.uv[cast(cb.subspace * 8 + i + 1 AS INT)] - cb.centv[cast(i + 1 AS INT)]) *
             |      (cu.uv[cast(cb.subspace * 8 + i + 1 AS INT)] - cb.centv[cast(i + 1 AS INT)])))
             |      * 10000) AS BIGINT) AS d
             |  FROM u cu CROSS JOIN cb),
             |codes AS (SELECT neighbor_id, subspace, code FROM (
             |    SELECT *, row_number() OVER (PARTITION BY neighbor_id, subspace
             |      ORDER BY d, code) AS rn FROM enc) WHERE rn = 1),
             |lut AS (SELECT qu.vec_id AS query_id, cb.subspace, cb.code,
             |    cast(round(list_sum(list_transform(range(8), i ->
             |      qu.uv[cast(cb.subspace * 8 + i + 1 AS INT)] * cb.centv[cast(i + 1 AS INT)]))
             |      * 10000) AS BIGINT) AS l
             |  FROM u qu CROSS JOIN cb WHERE qu.vec_id < 100),
             |approx AS (SELECT l.query_id, c.neighbor_id, sum(l.l) AS ap
             |  FROM codes c JOIN lut l ON l.subspace = c.subspace AND l.code = c.code
             |  WHERE c.neighbor_id <> l.query_id GROUP BY 1, 2),
             |cand AS (SELECT query_id, neighbor_id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |      ORDER BY ap DESC, neighbor_id) AS crk FROM approx) WHERE crk <= 20),
             |s AS (SELECT cand.query_id, cand.neighbor_id,
             |    round(list_dot_product(eq.v, en.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) *
             |       sqrt(list_dot_product(en.v, en.v))), 4) + 0.0 AS sim
             |  FROM cand JOIN e eq ON eq.vec_id = cand.query_id
             |            JOIN e en ON en.vec_id = cand.neighbor_id)
             |SELECT query_id, neighbor_id, sim, rk FROM
             |(SELECT *, row_number() OVER (PARTITION BY query_id
             |  ORDER BY sim DESC, neighbor_id) AS rk FROM s)
             |WHERE rk <= 5""".stripMargin)),

    // BPE tokenizer TRAINING: learn merge rules from the corpus's own
    // word-frequency table (q41 counts tokens under a fixed scheme; this
    // learns the scheme). Corpus-sized passes are distributed (word
    // count groupBy + TakeOrdered vocab cap); the nMerges training loop
    // runs driver-local over the BOUNDED word table — the standard
    // HF/sentencepiece division, model-fit on a dimension-sized input.
    // Deterministic (count-desc, pair-asc tiebreaks) but not
    // SQL-expressible (iterative merge loop) — rows-only; BpeSpec pins
    // hand-computed merges, determinism, and reconstruction.
    Q("q85_bpe_merges",
      (s, d) => {
        import s.implicits._
        graft.functions.Bpe
          .trainMerges(Tables.documents(s, d), "text", 40, maxWords = 5000)
          .zipWithIndex
          .map { case ((l, r), i) => (i.toLong, l, r) }
          .toDF("rank", "left", "right")
      },
      None),

    // The trained tokenizer applied back to the corpus: per-document
    // learned-BPE token count beside the whitespace count (their ratio
    // is tokenizer fertility). The merges ride to executors as a
    // vocab-sized closure constant; the pass is a typed map projection —
    // no shuffle at any corpus size.
    Q("q86_bpe_tokenize",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = graft.functions.Bpe
          .trainMerges(docs, "text", 40, maxWords = 5000)
        graft.functions.Bpe.tokenizeCounts(docs, "doc_id", "text", merges)
      },
      None),

    // Corpus card: the per-source stats table a dataset release ships —
    // volume (docs, tokens), token-length distribution (mean + exact
    // median, q56's percentile ≡ quantile_cont parity), language mix,
    // and exact-duplicate rate (distinct content hashes vs rows). One
    // pass, one aggregation: every stat is map-side-partial except the
    // distinct-hash count, which shuffles (source, hash) pairs — ids and
    // hashes, never documents.
    Q("q87_corpus_card",
      (s, d) => Tables.documents(s, d)
        .select(col("source"), col("lang"),
          md5(col("text")).as("__h"),
          TextFunctions.tokenCount(col("text")).cast("long").as("__nt"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("__nt").as("total_tokens"),
          Num.roundz(avg("__nt"), 4).as("mean_tokens"),
          Num.roundz(expr("percentile(__nt, 0.5)"), 4).as("p50_tokens"),
          Num.roundz(sum(when(col("lang") === "en", 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 4).as("en_frac"),
          countDistinct(col("__h")).as("n_unique"),
          Num.roundz(lit(1.0) - countDistinct(col("__h")).cast("double") / count(lit(1)), 4)
            .as("dup_rate")),
      Some("""SELECT source, count(*) AS n_docs,
             |cast(sum(nt) AS BIGINT) AS total_tokens,
             |round(avg(nt), 4) AS mean_tokens,
             |round(quantile_cont(nt, 0.5), 4) AS p50_tokens,
             |round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS en_frac,
             |count(DISTINCT md5(text)) AS n_unique,
             |round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 4) AS dup_rate
             |FROM (SELECT source, lang, text,
             |  cast(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS nt
             |  FROM documents)
             |GROUP BY source""".stripMargin)),

    // Per-label embedding centroids: element-wise mean vector per class
    // — the pooling step behind class prototypes, centroid classifiers,
    // and per-cluster summaries. Emitted EXPLODED as (label, pos, n, m):
    // the posexplode → groupBy(label, pos) shape collapses each map
    // partition to ≤ labels×dim rows before the Exchange (same
    // cluster-sized shuffle as the IVF Lloyd step), and the exploded
    // output keeps the float compare inside the driver's canonicalizer.
    Q("q88_label_centroids",
      (s, d) => Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(count(lit(1)).as("n"),
          // an avg of ~±1e-18 rounds to a SIGNED zero whose sign is
          // summation-order luck (q54's fix)
          Num.round4(avg(col("col").cast("double"))).as("m"))
        .select("label", "pos", "n", "m"),
      Some("""WITH e AS (SELECT label, embedding::DOUBLE[] AS ed FROM embeddings),
             |x AS (SELECT label, unnest(ed) AS v,
             |        unnest(range(len(ed))) AS pos FROM e)
             |SELECT label, cast(pos AS BIGINT) AS pos, count(*) AS n,
             |  round(avg(v), 4) + 0.0 AS m
             |FROM x GROUP BY 1, 2""".stripMargin)),

    // Padded-batching waste estimator: docs dealt into power-of-two
    // length buckets (the classic bucketed-batching layout), reporting
    // per bucket the token volume and the padding waste a
    // pad-to-bucket-size dataloader would burn — the number that
    // justifies q76's packed layout. Map-side-partial aggregate; the
    // bucket is a per-row CASE chain (deterministic on both engines,
    // no float log2 at power boundaries).
    Q("q89_length_buckets",
      (s, d) => {
        // tokenize ONCE into __nt, then derive the bucket from the
        // column: inlining tokenCount into all 8 when-conditions would
        // re-run the lambda-bearing split per condition (no CSE for
        // interpreted lambdas — q64/q76's rule)
        val nt = col("__nt")
        val bucket = when(nt <= 8, 8L).when(nt <= 16, 16L)
          .when(nt <= 32, 32L).when(nt <= 64, 64L).when(nt <= 128, 128L)
          .when(nt <= 256, 256L).when(nt <= 512, 512L).otherwise(1024L)
        Tables.documents(s, d)
          .select(TextFunctions.tokenCount(col("text")).cast("long").as("__nt"))
          .select(bucket.as("bucket"), col("__nt"))
          .filter(col("__nt") > 0)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum("__nt").as("total_tokens"),
            sum(col("bucket") - col("__nt")).as("padding_waste"),
            Num.roundz(sum(col("bucket") - col("__nt")).cast("double") /
              sum(col("bucket")), 4).as("waste_frac"))
      },
      Some("""WITH t AS (SELECT cast(len(list_filter(string_split_regex(trim(text), '\s+'),
             |    x -> x <> '')) AS BIGINT) AS nt FROM documents),
             |b AS (SELECT nt, CASE WHEN nt <= 8 THEN 8 WHEN nt <= 16 THEN 16
             |    WHEN nt <= 32 THEN 32 WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128
             |    WHEN nt <= 256 THEN 256 WHEN nt <= 512 THEN 512 ELSE 1024 END AS bucket
             |  FROM t WHERE nt > 0)
             |SELECT cast(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
             |  cast(sum(nt) AS BIGINT) AS total_tokens,
             |  cast(sum(bucket - nt) AS BIGINT) AS padding_waste,
             |  round(sum(bucket - nt) * 1.0 / sum(bucket), 4) AS waste_frac
             |FROM b GROUP BY 1""".stripMargin)),

    // Embedding outlier detection: distance to the own-label centroid,
    // z-scored within the label, flag z >= 2 — the mislabeled/corrupt
    // vector filter an embedding pipeline runs before index builds.
    // Three cluster-sized aggregates (centroids = labels×dim rows,
    // stats = labels rows) around one projection pass for the
    // distances; the corpus joins only against broadcastable
    // label-keyed tables. Two full scans (mean, then deviation) are
    // inherent to the statistic.
    Q("q90_embedding_outliers",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cent = e.select(col("label"), posexplode(col("embedding")))
          .groupBy("label", "pos").agg(avg(col("col").cast("double")).as("m"))
          .groupBy("label")
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("label"),
            transform(col("pm"), x => x.getField("m")).as("cv"))
        // staged: both the stats aggregate and the final join consume
        // the distance frame — unstaged, the scan + centroid join +
        // distance lambda run once per branch
        val dist = graft.ops.Staged.stage(e.join(cent, "label")
          .select(col("vec_id"), col("label"),
            sqrt(aggregate(
              zip_with(col("embedding").cast("array<double>"), col("cv"),
                (a, b) => (a - b) * (a - b)),
              lit(0.0), (acc, x) => acc + x)).as("dist")))
        val stats = dist.groupBy("label")
          .agg(avg("dist").as("mu"), stddev_samp(col("dist")).as("sd"))
        dist.join(stats, "label")
          // sd = 0 (a label whose member distances are all identical)
          // must yield a null z, not an ANSI DIVIDE_BY_ZERO — the
          // oracle's 0/0 is NULL in DuckDB and the filter drops it
          .withColumn("z", when(col("sd") > 0,
            Num.roundz((col("dist") - col("mu")) / col("sd"), 4)))
          .filter(col("z") >= 2.0)
          .select(col("vec_id"), col("label"), Num.roundz(col("dist"), 4).as("dist"),
            col("z"))
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS ed FROM embeddings),
             |x AS (SELECT label, unnest(ed) AS v, unnest(range(len(ed))) AS pos FROM e),
             |c AS (SELECT label, pos, avg(v) AS m FROM x GROUP BY 1, 2),
             |cent AS (SELECT label, list(m ORDER BY pos) AS cv FROM c GROUP BY 1),
             |d AS (SELECT vec_id, e.label,
             |    sqrt(list_sum(list_transform(range(len(ed)),
             |      i -> (ed[i+1] - cv[i+1]) * (ed[i+1] - cv[i+1])))) AS dist
             |  FROM e JOIN cent USING (label)),
             |st AS (SELECT label, avg(dist) AS mu, stddev_samp(dist) AS sd
             |  FROM d GROUP BY 1)
             |SELECT vec_id, label, round(dist, 4) AS dist,
             |  round((dist - mu) / sd, 4) AS z
             |FROM d JOIN st USING (label)
             |WHERE round((dist - mu) / sd, 4) >= 2.0""".stripMargin)),

    // SemDeDup: embedding-cluster semantic dedup — assign every vector
    // to its nearest centroid cell, exact-cosine-verify WITHIN-CELL
    // pairs at θ, connected-components the pair graph, label every doc
    // with its component's min id (singletons label themselves); "keep
    // one per semantic cluster" is doc = sem_cluster. Fully
    // hash-checkable: centroids are the 8 md5(id)-smallest vectors and
    // the argmax runs on round(cos, 4) with centroid-id tiebreak, all
    // reproducible in DuckDB; the closure reuses q61's recursive-CTE
    // pattern. θ matches q45's 0.35 so SimilaritySpec can pin the
    // subset/keep-superset laws against the exact all-pairs graph.
    Q("q92_semdedup",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.semDedup(e, "vec_id", "embedding",
          Similarity.md5SeededCentroids(e, "vec_id", "embedding", 8), 0.35)
      },
      Some("""WITH RECURSIVE
             |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cid, v AS cv FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 8),
             |scored AS (SELECT e.vec_id, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent c),
             |assign AS (SELECT vec_id, cid AS cell FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM scored) WHERE rn = 1),
             |pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib
             |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
             |  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
             |  WHERE round(list_dot_product(ea.v, eb.v) /
             |    (sqrt(list_dot_product(ea.v, ea.v)) *
             |     sqrt(list_dot_product(eb.v, eb.v))), 4) >= 0.35),
             |edges AS (SELECT ia AS u, ib AS v FROM pairs
             |  UNION SELECT ib, ia FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e2.v FROM reach r JOIN edges e2 ON r.dst = e2.u),
             |lab AS (SELECT src AS doc, min(dst) AS sem_cluster FROM reach GROUP BY 1)
             |SELECT e.vec_id AS doc, coalesce(l.sem_cluster, e.vec_id) AS sem_cluster
             |FROM e LEFT JOIN lab l ON l.doc = e.vec_id""".stripMargin)),

    // Contamination scoring: q63's graded twin — per-document shingle
    // overlap with the held-out benchmark set (same every-50th-doc
    // fixture). The binary decontaminate pass drops; this one measures,
    // which is what a release audit actually publishes (and the
    // threshold debate becomes policy, not a rebuild). Same scale shape:
    // broadcast held-out shingles, map-side probe, (doc, counts)-only
    // aggregate Exchange.
    Q("q81_contamination_score",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.contaminationScore("doc_id", "text", 3)(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0))
      },
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |held AS (SELECT DISTINCT shingle FROM sh WHERE doc % 50 = 0)
             |SELECT t.doc AS doc_id, count(*) AS n_shingles,
             |  cast(sum(CASE WHEN h.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
             |  round(sum(CASE WHEN h.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS overlap_frac
             |FROM sh t LEFT JOIN held h ON t.shingle = h.shingle
             |WHERE t.doc % 50 <> 0
             |GROUP BY t.doc""".stripMargin)),

    // Per-source length-band pruning: drop each source's shortest and
    // longest 10% by token count (P10/P90 via percentile ≡ quantile_cont,
    // q56's parity) — the "prune both tails" heuristic that removes
    // fragments and concatenation artifacts per source rather than with
    // one global cutoff that would gut short-form sources. Bounds are a
    // #sources-row broadcast; the keep decision is a scan-level filter.
    Q("q106_length_band_prune",
      (s, d) => {
        val toks = Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        // bounds round to 4dp before the compare: interpolated
        // percentiles are a + frac*(b-a)-style float chains, not a
        // single IEEE op — last-ulp dust must not flip an integer
        // token count across the boundary (cross-engine discipline)
        val bounds = toks.groupBy("source").agg(
          Num.roundz(expr("percentile(n_tokens, 0.1)"), 4).as("__lo"),
          Num.roundz(expr("percentile(n_tokens, 0.9)"), 4).as("__hi"))
        toks.join(broadcast(bounds), "source")
          .filter(col("n_tokens") >= col("__lo") && col("n_tokens") <= col("__hi"))
          .select("doc_id", "source", "n_tokens")
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |    cast(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |b AS (SELECT source, round(quantile_cont(n_tokens, 0.1), 4) AS lo,
             |    round(quantile_cont(n_tokens, 0.9), 4) AS hi FROM t GROUP BY 1)
             |SELECT doc_id, source, n_tokens
             |FROM t JOIN b USING (source)
             |WHERE n_tokens >= lo AND n_tokens <= hi""".stripMargin)),

    // Quality-keep dedup: q61's clusters, but each cluster keeps its
    // LONGEST member (doc-id tiebreak), not the min id — representative
    // selection is a data policy, and "longest copy" is the standard
    // boilerplate-stripping heuristic. Singletons keep themselves, so
    // the output is the full post-dedup corpus census.
    Q("q107_cluster_best_keep",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.keepBestPerCluster(docs, "doc_id", length(col("text")),
          docs.transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)))
      },
      Some("""WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |cl AS (SELECT src AS doc, min(dst) AS cluster FROM reach GROUP BY 1),
             |lab AS (SELECT d.doc_id AS doc, coalesce(cl.cluster, d.doc_id) AS cluster,
             |    length(d.text) AS sc FROM documents d LEFT JOIN cl ON cl.doc = d.doc_id),
             |r AS (SELECT *, row_number() OVER (PARTITION BY cluster
             |    ORDER BY sc DESC, doc) AS rn,
             |    count(*) OVER (PARTITION BY cluster) AS n FROM lab)
             |SELECT cluster, doc AS keep_id, cast(n AS BIGINT) AS n_members
             |FROM r WHERE rn = 1""".stripMargin)),

    // Leakage-free train/val/test split: q58's md5 split keyed on the
    // near-dup CLUSTER label instead of the doc id, so a near-duplicate
    // can never straddle train and test — the contamination mode a
    // doc-keyed split provably has (spec pins a q58-split cluster that
    // leaks). Cluster labels from q61's machinery; singletons fall back
    // to their own id, so non-duplicated docs split exactly like q58.
    Q("q108_leakage_free_split",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clusters = Dedup.duplicateClusters(
          docs.transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
          "doc_a", "doc_b")
        val labeled = docs.select(col("doc_id").as("doc"))
          .join(clusters, Seq("doc"), "left_outer")
          .withColumn("cluster", coalesce(col("cluster"), col("doc")))
        Sampling.splitByHash(labeled, "cluster",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select(col("doc").as("doc_id"), col("cluster"), col("split"))
      },
      Some("""WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |cl AS (SELECT src AS doc, min(dst) AS cluster FROM reach GROUP BY 1),
             |lab AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
             |  FROM documents d LEFT JOIN cl ON cl.doc = d.doc_id)
             |SELECT doc_id, cluster,
             |  CASE WHEN substr(md5(cast(cluster AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
             |       WHEN substr(md5(cast(cluster AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM lab""".stripMargin)),

    // q62's pipeline under the q107 keep POLICY: near-dup clusters keep
    // their LONGEST member (n_tokens desc, id tiebreak) instead of the
    // min id — proving representative selection composes into the
    // production pipeline rather than living beside it (the q95 carry
    // precedent). Oracle = q62's with the drop stage replaced by the
    // per-cluster rank; everything upstream (gates, exact dedup, pair
    // graph, closure) is byte-identical.
    Q("q109_corpus_pipeline_bestkeep",
      (s, d) => graft.ops.CorpusPipeline.run(
        Tables.documents(s, d),
        keep => keep.transform(Dedup.ngramJaccardPairs(
          "doc_id", "norm_text", 3, 0.03, tokensCol = Some("__w"))),
        keepScore = Some(col("n_tokens"))),
      Some("""WITH RECURSIVE
             |norm AS (SELECT doc_id, lang,
             |  regexp_replace(regexp_replace(lower(trim(text)), '[\x00-\x1F\x7F]', ' ', 'g'),
             |    '  +', ' ', 'g') AS norm_text FROM documents),
             |scored AS (SELECT doc_id, lang, norm_text,
             |  string_split_regex(trim(norm_text), '\s+') AS w FROM norm),
             |langed AS (SELECT doc_id, lang, norm_text, w,
             |  cast(len(w) AS BIGINT) AS n_tokens,
             |  CASE WHEN mx = 0 THEN 'und'
             |       WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es'
             |       WHEN h_en = mx THEN 'en' ELSE 'de' END AS lang_pred
             |  FROM (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS mx FROM (
             |    SELECT *,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','que','y','los','una'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','des','et','est','une'], x))) AS h_fr
             |    FROM scored))),
             |gated AS (SELECT * FROM langed WHERE n_tokens >= 5 AND lang_pred <> 'und'),
             |keepd AS (SELECT g.* FROM gated g JOIN (
             |    SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(norm_text)) k USING (doc_id)),
             |sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle FROM keepd)),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |cl AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY 1),
             |lab AS (SELECT k.doc_id, k.lang, k.lang_pred, k.n_tokens,
             |    coalesce(cl.cluster, k.doc_id) AS cl
             |  FROM keepd k LEFT JOIN cl USING (doc_id)),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY cl
             |    ORDER BY n_tokens DESC, doc_id) AS rn FROM lab)
             |SELECT doc_id, lang, lang_pred, n_tokens,
             |  CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
             |       WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM rk WHERE rn = 1""".stripMargin)),

    // DSIR importance weights against the English slice as the target
    // distribution: hashed unigram+bigram features (64 md5 buckets),
    // Laplace-smoothed bucket log-ratios quantized to ×10⁴ BIGINTs
    // before the per-doc sum (integer sums are order-independent — the
    // q99 discipline — so the full score table hash-checks). en docs
    // score high, other langs negative — the data-selection scorer a
    // "make it look like Wikipedia" mix runs at corpus scale.
    Q("q102_dsir_weights",
      (s, d) => Sampling.dsirWeights(Tables.documents(s, d), "doc_id",
        "text", col("lang") === "en", nBuckets = 64),
      Some("""WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
             |  FROM documents),
             |f AS (SELECT doc_id, tgt, unnest(w ||
             |    list_transform(range(greatest(len(w) - 1, 0)),
             |      i -> w[i+1] || ' ' || w[i+2])) AS f FROM t),
             |fb AS (SELECT doc_id, tgt, ('0x' || substr(md5(f), 1, 4))::BIGINT % 64 AS b FROM f),
             |cr AS (SELECT b, count(*) AS c_r FROM fb GROUP BY 1),
             |ct AS (SELECT b, count(*) AS c_t FROM fb WHERE tgt GROUP BY 1),
             |tot AS (SELECT count(*) AS r, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS t FROM fb),
             |lw AS (SELECT b, cast(round(ln(((coalesce(c_t, 0) + 1.0) / (t + 64))
             |    / ((c_r + 1.0) / (r + 64))) * 10000) AS BIGINT) AS lw
             |  FROM cr LEFT JOIN ct USING (b) CROSS JOIN tot)
             |SELECT doc_id, count(*) AS n_feats,
             |  cast(sum(lw) AS BIGINT) AS weight_q,
             |  round(sum(lw) / 10000.0, 4) AS dsir_weight
             |FROM fb JOIN lw USING (b) GROUP BY doc_id""".stripMargin)),

    // Character-level near-dup pairs: Levenshtein similarity over
    // candidates from the 5-shingle inverted index (maxDf 50) — the
    // complement of q26's token-set Jaccard (an edit moves few chars but
    // keeps most shingles; a word scramble keeps Jaccard ≈ 1 while edit
    // similarity collapses). The threshold filter runs on the UNROUNDED
    // single-division similarity, so both engines make identical keep
    // decisions; the O(len²) DP is paid only by length-band survivors.
    Q("q100_edit_distance_pairs",
      (s, d) => Dedup.editDistancePairs("doc_id", "text", 5,
          threshold = 0.8, maxDf = 50L)(Tables.documents(s, d)),
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 4, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |df AS (SELECT shingle, count(*) AS c FROM sh GROUP BY 1),
             |rare AS (SELECT sh.* FROM sh JOIN df USING (shingle) WHERE c <= 50),
             |cand AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
             |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc < b.doc),
             |lv AS (SELECT id_a, id_b,
             |    levenshtein(da.text, db.text) AS lev,
             |    greatest(greatest(length(da.text), length(db.text)), 1) AS mx
             |  FROM cand JOIN documents da ON da.doc_id = id_a
             |            JOIN documents db ON db.doc_id = id_b
             |  WHERE abs(length(da.text) - length(db.text)) * 1.0 <=
             |    0.19999999999999996 * greatest(greatest(length(da.text), length(db.text)), 1))
             |SELECT id_a, id_b, round(1.0 - lev * 1.0 / mx, 4) AS edit_sim
             |FROM lv WHERE 1.0 - lev * 1.0 / mx >= 0.8""".stripMargin)),

    // Temperature (α = 0.5) mixture sampling over the skewed lang
    // strata: per-lang quotas ∝ √n rebalance the en-heavy fixture mix
    // (en's natural 43.6% share drops to ~30.6% of the 300-doc budget)
    // with md5-order survivors — the multilingual upsampling/
    // downsampling rule every multi-source training mix applies. Kept
    // sets are nested in the budget; the quota arithmetic rounds before
    // the integer cut so both engines agree on every quota.
    Q("q104_temperature_mix",
      (s, d) => Sampling.temperatureQuota(
          Tables.documents(s, d).select("doc_id", "lang"), "doc_id",
          "lang", alpha = 0.5, budget = 300)
        .select(col("doc_id"), col("lang")),
      Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
             |z AS (SELECT sum(pow(n, 0.5)) AS z FROM c),
             |q AS (SELECT lang, least(n, greatest(1,
             |    cast(floor(round(300.0 * pow(n, 0.5) / z, 4)) AS BIGINT))) AS quota
             |  FROM c CROSS JOIN z),
             |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
             |    ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |SELECT doc_id, lang FROM r JOIN q USING (lang) WHERE rn <= quota""".stripMargin)),

    // Vocabulary coverage / OOV rate: per-document fraction of tokens
    // outside the corpus's top-1000 unigram vocabulary — the coverage
    // audit a tokenizer/vocab decision runs before training (high OOV →
    // the vocab underserves that slice of the corpus). The vocab cut is
    // a TakeOrderedAndProject over the (count, token) total order — no
    // global window — and the membership join is UNHINTED on the token
    // key like q53's vocabulary joins (the vocab side is LIMIT-bounded
    // here, so stats pick broadcast; the exploded side never carries
    // documents, only (doc_id, token) rows).
    Q("q105_vocab_coverage",
      (s, d) => {
        val toks = graft.ops.Staged.stageCut(
          Tables.documents(s, d).select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("tok")))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__c"))
          .orderBy(col("__c").desc, col("tok")).limit(1000)
          .select(col("tok"), lit(1L).as("__in"))
        toks.join(vocab, Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_rate",
            Num.roundz(col("n_oov").cast("double") / col("n_tokens"), 4))
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, 1 AS __in FROM (
             |    SELECT tok, count(*) AS c FROM tk GROUP BY 1)
             |  ORDER BY c DESC, tok LIMIT 1000)
             |SELECT doc_id, count(*) AS n_tokens,
             |  cast(sum(CASE WHEN __in IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             |  round(sum(CASE WHEN __in IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS oov_rate
             |FROM tk LEFT JOIN v USING (tok) GROUP BY doc_id""".stripMargin)),

    // Stupid Backoff LM score (Brants et al. 2007): bigram score backs
    // off to 0.4 × unigram when the bigram is unseen in the TRAIN half
    // (md5-split, q58's idiom — scoring the corpus under its own counts
    // would never back off). This is the perplexity-quality filter q73/
    // q80 approximate, with the realistic held-out formulation: unseen
    // unigrams floor at a 0.5 pseudo-count. The fixture's word soup is a
    // closed vocabulary (the floor would never fire), so every ~97th doc
    // gets a deterministic doc-unique token injected IN-QUERY on both
    // engines (q78's injection pattern) — eval-half injected docs then
    // exercise the unseen-bigram AND unseen-unigram branches under the
    // hash check. Same scale shape as q80: one staged exploded-bigram
    // table, UNHINTED count joins at (doc, bigram) grain, only the
    // one-row train-total broadcast.
    Q("q101_backoff_logprob",
      (s, d) => {
        val docs = Tables.documents(s, d).withColumn("text",
          concat(col("text"), when(col("doc_id") % 97 === 0,
            concat(lit(" zzznovel"), col("doc_id"))).otherwise(lit(""))))
        val trainPred = md5(col("doc_id").cast("string")) < lit("8")
        val bgs = graft.ops.Staged.stageCut(
          docs.select(col("doc_id"),
            explode(TextFunctions.bigrams(TextFunctions.tokens(col("text")))).as("bg"))
          .withColumn("pref", substring_index(col("bg"), " ", 1))
          .withColumn("w2", substring_index(col("bg"), " ", -1))
          .withColumn("__train", trainPred))
        val cbg = bgs.filter(col("__train")).groupBy("bg").agg(count(lit(1)).as("c_bg"))
        val cpref = bgs.filter(col("__train")).groupBy("pref").agg(count(lit(1)).as("c_pref"))
        val cuni = graft.ops.Staged.stageCut(
          docs.filter(trainPred).select(
            explode(TextFunctions.tokens(col("text"))).as("w2"))
          .groupBy("w2").agg(count(lit(1)).as("c_uni")))
        val nTot = cuni.agg(sum("c_uni").as("__n"))
        bgs.join(cbg, Seq("bg"), "left")
          .join(cpref, Seq("pref"), "left")
          .join(cuni, Seq("w2"), "left")
          .crossJoin(broadcast(nTot))
          .withColumn("__s",
            when(col("c_bg").isNotNull, col("c_bg").cast("double") / col("c_pref"))
              .otherwise(lit(0.4) * coalesce(col("c_uni").cast("double"), lit(0.5)) / col("__n")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            Num.roundz(avg(log(col("__s"))), 4).as("backoff_logprob"))
      },
      Some("""WITH d0 AS (SELECT doc_id,
             |    text || CASE WHEN doc_id % 97 = 0
             |      THEN ' zzznovel' || cast(doc_id AS VARCHAR) ELSE '' END AS text
             |  FROM documents),
             |t AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w,
             |    md5(cast(doc_id AS VARCHAR)) < '8' AS __train
             |  FROM d0),
             |b AS (SELECT doc_id, __train,
             |    unnest(list_transform(range(greatest(len(w) - 1, 0)),
             |      i -> w[i+1] || ' ' || w[i+2])) AS bg FROM t),
             |bp AS (SELECT doc_id, __train, bg,
             |    string_split(bg, ' ')[1] AS pref, string_split(bg, ' ')[2] AS w2 FROM b),
             |cb AS (SELECT bg, count(*) AS c_bg FROM bp WHERE __train GROUP BY 1),
             |cp AS (SELECT pref, count(*) AS c_pref FROM bp WHERE __train GROUP BY 1),
             |cu AS (SELECT w2, count(*) AS c_uni FROM (
             |    SELECT unnest(w) AS w2 FROM t WHERE __train) GROUP BY 1),
             |n AS (SELECT cast(sum(c_uni) AS BIGINT) AS total FROM cu)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  round(avg(ln(CASE WHEN c_bg IS NOT NULL THEN c_bg * 1.0 / c_pref
             |    ELSE 0.4 * coalesce(c_uni, 0.5) / total END)), 4) AS backoff_logprob
             |FROM bp LEFT JOIN cb USING (bg) LEFT JOIN cp USING (pref)
             |  LEFT JOIN cu USING (w2) CROSS JOIN n
             |GROUP BY doc_id""".stripMargin)),

    // Importance-weighted corpus sample: 200 docs drawn WITHOUT
    // replacement with inclusion probability ∝ token count (Efraimidis–
    // Spirakis exponential-keys reservoir) — the sampling step that
    // turns q102-style importance weights or length priors into an
    // actual subset, vs q104's per-stratum quotas (category-balanced)
    // and q52's fixed-rate strata (probability-balanced). Selection is
    // on the unrounded key; both engines draw identical u from md5, so
    // the 200-row cut hash-checks end to end.
    Q("q112_weighted_sample",
      (s, d) => Sampling.weightedSample(
        Tables.documents(s, d).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", col("n_tokens"), k = 200),
      Some("""WITH t AS (SELECT doc_id,
             |    cast(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |k AS (SELECT doc_id, n_tokens,
             |    ln((('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT + 1.0)
             |      / 65536.0) / n_tokens AS ek
             |  FROM t WHERE n_tokens > 0)
             |SELECT doc_id, n_tokens, round(ek, 4) + 0.0 AS es_key
             |FROM k ORDER BY ek DESC, doc_id LIMIT 200""".stripMargin)),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    // LANGUAGE, split the corpus into head/middle/tail thirds by LM
    // score — the standard crawl-curation move (train on head+middle,
    // quarantine tail) that q73's raw score only enables. Tertile
    // bounds are exact percentiles rounded to 4dp BEFORE the compare
    // (q106's cross-engine discipline: the interpolation is a float
    // chain, the scores are 4dp-rounded doubles, so the bucket decision
    // must compare like against like); the bucket CASE order matches
    // the SQL so boundary ties resolve identically. Scale: the score is
    // q73's shape (unhinted vocab join, (doc,token)-grain shuffles); the
    // bounds are a #langs-row broadcast and the bucket assignment a
    // scan-level projection — at corpus scale swap the exact percentile
    // for approx_percentile and nothing else moves.
    Q("q110_perplexity_buckets",
      (s, d) => {
        val toks = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val total = vocab.agg(sum("cnt").as("__total"))
        val scored = toks.join(vocab, "tok")
          .crossJoin(broadcast(total))
          .groupBy("doc_id", "lang")
          .agg(Num.roundz(avg(log(col("cnt") / col("__total"))), 4).as("logprob"))
        val bounds = scored.groupBy("lang").agg(
          Num.roundz(expr("percentile(logprob, 1.0/3)"), 4).as("__lo"),
          Num.roundz(expr("percentile(logprob, 2.0/3)"), 4).as("__hi"))
        scored.join(broadcast(bounds), "lang")
          .withColumn("bucket",
            when(col("logprob") >= col("__hi"), "head")
              .when(col("logprob") >= col("__lo"), "middle")
              .otherwise("tail"))
          .select("doc_id", "lang", "logprob", "bucket")
      },
      Some("""WITH tk AS (SELECT doc_id, lang,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
             |t AS (SELECT cast(sum(cnt) AS BIGINT) AS total FROM v),
             |sc AS (SELECT doc_id, lang,
             |    round(avg(ln(cnt * 1.0 / total)), 4) AS logprob
             |  FROM tk JOIN v USING (tok) CROSS JOIN t GROUP BY doc_id, lang),
             |b AS (SELECT lang, round(quantile_cont(logprob, 1.0/3), 4) AS lo,
             |    round(quantile_cont(logprob, 2.0/3), 4) AS hi FROM sc GROUP BY 1)
             |SELECT doc_id, lang, logprob,
             |  CASE WHEN logprob >= hi THEN 'head'
             |       WHEN logprob >= lo THEN 'middle'
             |       ELSE 'tail' END AS bucket
             |FROM sc JOIN b USING (lang)""".stripMargin)),

    // Cluster-balanced (diversity) sampling: assign every embedding to
    // its nearest md5-seeded centroid cell (q92/q96's deterministic
    // assignment), then cap each cell at a fixed quota with md5-order
    // survivors (q84's cut) — the embedding-space twin of per-source
    // quotas, which flattens over-represented semantic regions instead
    // of over-represented sources (the "cluster-then-balance" step of
    // SemDeDup-style curation, kept as a SAMPLE rather than a dedup).
    // Scale: cell assignment is a zero-shuffle broadcast-pack
    // projection; the quota is one (cell, id)-grain window — no
    // vector-carrying shuffle anywhere.
    Q("q113_cluster_balanced_sample",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cells = Similarity.assignCellsRounded(e, "vec_id", "embedding",
            Similarity.md5SeededCentroids(e, "vec_id", "embedding", 8))
          .select(col("neighbor_id").as("vec_id"), col("centroid_id").as("cell"))
        Sampling.quotaPerStratum(cells, "vec_id", "cell", quota = 40)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cid, v AS cv FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 8),
             |scored AS (SELECT e.vec_id, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent c),
             |assign AS (SELECT vec_id, cid AS cell FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM scored) WHERE rn = 1),
             |r AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
             |    ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id) AS rn
             |  FROM assign)
             |SELECT vec_id, cell FROM r WHERE rn <= 40""".stripMargin)),

    // TF-IDF sparse cosine near-dup pairs (3-shingle features, maxDf
    // 50, θ 0.5): the vector-space complement of q26's set Jaccard and
    // q100's edit similarity — weighted shingle vectors with integer-
    // quantized idf, so dots/norms are exact BIGINT sums and the
    // unrounded cosine threshold agrees bit-for-bit with the oracle.
    // On the fixture the score is cleanly bimodal (near-dup pairs ≥
    // 0.99, inverted-index noise < 0.3), so θ 0.5 sits in the gap.
    Q("q111_sparse_cosine_pairs",
      (s, d) => Dedup.sparseCosinePairs("doc_id", "text", 3,
        threshold = 0.5, maxDf = 50L)(Tables.documents(s, d)),
      Some("""WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
             |    x -> x <> '') AS w FROM documents),
             |sh AS (SELECT doc_id AS doc, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS term FROM t),
             |tf AS (SELECT doc, term, count(*) AS tf FROM sh GROUP BY 1, 2),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) <= 50),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |wt AS (SELECT doc, term,
             |    tf * cast(round(ln((n_docs + 1) * 1.0 / (df + 1)) * 10000) AS BIGINT) AS wq
             |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
             |norms AS (SELECT doc, sum(wq * wq) AS n2 FROM wt GROUP BY 1),
             |dots AS (SELECT a.doc AS id_a, b.doc AS id_b, sum(a.wq * b.wq) AS dot
             |  FROM wt a JOIN wt b ON a.term = b.term AND a.doc < b.doc GROUP BY 1, 2),
             |c AS (SELECT id_a, id_b,
             |    dot * 1.0 / (sqrt(na.n2 * 1.0) * sqrt(nb.n2 * 1.0)) AS cos
             |  FROM dots JOIN norms na ON na.doc = id_a JOIN norms nb ON nb.doc = id_b)
             |SELECT id_a, id_b, round(cos, 4) AS cos_sim FROM c WHERE cos >= 0.5""".stripMargin)),

    // Bloom-filter decontamination, production path: q63's semantics
    // under a BOUNDED broadcast — the held-out set is summarized into a
    // 2²⁰-bit Bloom filter (relational: the distinct set-bit positions)
    // instead of broadcasting its shingle strings; k=4 xxhash64
    // positions per shingle. xxhash64 isn't SQL-expressible → rows-only;
    // q115 is the md5 twin carrying the full oracle, and DedupSpec pins
    // kept ⊆ q63-kept (no false negatives) for both hash families.
    Q("q114_bloom_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.bloomDecontaminate("doc_id", "text", 3,
          mBits = 1L << 20, kHashes = 4)(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0))
          .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
      },
      None),

    // md5 verification twin of q114: positions from the first 32 md5
    // bits of "seed|shingle", so the bit set, the probe, and any false
    // positives are all reproduced exactly by the SQL oracle — the
    // whole Bloom construction hash-checks, not just its effect.
    Q("q115_bloom_decontaminate_md5",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.bloomDecontaminateMd5("doc_id", "text", 3,
          mBits = 1L << 20, kHashes = 4)(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0))
          .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
      },
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |bits AS (SELECT DISTINCT unnest(list_transform(range(4),
             |    s -> ('0x' || substr(md5(cast(s AS VARCHAR) || '|' || shingle), 1, 8))::BIGINT
             |      % 1048576)) AS bit
             |  FROM sh WHERE doc % 50 = 0),
             |probe AS (SELECT doc, shingle, unnest(list_transform(range(4),
             |    s -> ('0x' || substr(md5(cast(s AS VARCHAR) || '|' || shingle), 1, 8))::BIGINT
             |      % 1048576)) AS bit
             |  FROM sh WHERE doc % 50 <> 0),
             |cont AS (SELECT DISTINCT doc FROM (
             |    SELECT doc, shingle, count(*) FILTER (b.bit IS NOT NULL) AS m
             |    FROM probe p LEFT JOIN bits b ON p.bit = b.bit GROUP BY 1, 2)
             |  WHERE m = 4)
             |SELECT doc_id, lang, cast(n_chars AS BIGINT) AS n_chars
             |FROM documents
             |WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc FROM cont)""".stripMargin)),

    // Cross-source overlap matrix: pairwise shingle-set Jaccard between
    // SOURCES (not documents) — the audit that catches two crawls/dumps
    // feeding the mix the same underlying content before doc-level
    // dedup has to clean it up. Same inverted-index shape as q26 lifted
    // one grain up: distinct (source, shingle) rows, equi-join on
    // shingle, |A|+|B|−inter denominator. Output rows only for source
    // pairs sharing ≥ 1 shingle. Scale: the per-source shingle sets are
    // map-side-partial distincts; a ubiquitous shingle fans out to at
    // most #sources² rows — sources number in the hundreds, not the
    // billions, so the join is skew-safe without a cap.
    Q("q116_source_overlap",
      (s, d) => {
        val sh = graft.ops.Staged.stage(Tables.documents(s, d)
          .select(col("source"),
            explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
          .distinct())
        val sizes = sh.groupBy("source").agg(count(lit(1)).as("sz"))
        val inter = sh.as("a").join(sh.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared"))
        inter
          .join(sizes.select(col("source").as("source_a"), col("sz").as("__sa")), "source_a")
          .join(sizes.select(col("source").as("source_b"), col("sz").as("__sb")), "source_b")
          .select(col("source_a"), col("source_b"), col("n_shared"),
            Num.roundz(col("n_shared").cast("double")
              / (col("__sa") + col("__sb") - col("n_shared")), 4).as("jaccard"))
      },
      Some("""WITH sh AS (SELECT DISTINCT source, shingle FROM (
             |  SELECT source, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.source AS source_a, b.source AS source_b,
             |    count(*) AS n_shared
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT source_a, source_b, n_shared,
             |  round(n_shared * 1.0 / (sa.sz + sb.sz - n_shared), 4) AS jaccard
             |FROM inter JOIN sizes sa ON sa.source = source_a
             |  JOIN sizes sb ON sb.source = source_b""".stripMargin)),

    // Per-source quality-rank normalization: percent_rank of the
    // stopword-ratio quality signal WITHIN each source, keep above the
    // 20th percentile — the cross-source fairness fix for one global
    // threshold (a clean academic source would sail through a cutoff
    // that guts a noisy crawl; ranking per source drops each source's
    // own worst 20%). Deterministic: ranks order by (score, doc_id) so
    // no rank ties exist, and the keep filter runs on the UNROUNDED
    // percent_rank (an exact small-integer ratio, identical in both
    // engines). Scale: one window sort per source partition — the q17
    // total-order discipline, range-partitioned by Catalyst; the signal
    // itself is a pure projection.
    Q("q117_quality_rank_norm",
      (s, d) => {
        val qs = TextFunctions.qualityStruct(col("text"), stopwords)
        val scored = Tables.documents(s, d).select(col("doc_id"), col("source"),
          qs.getField("stopword_ratio").as("score"))
        val w = Window.partitionBy("source").orderBy(col("score"), col("doc_id"))
        scored.withColumn("__pr", percent_rank().over(w))
          .filter(col("__pr") >= 0.2)
          .select(col("doc_id"), col("source"), col("score"),
            Num.roundz(col("__pr"), 4).as("q_rank"))
      },
      Some("""WITH sc AS (SELECT doc_id, source,
             |    round(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in'], x)))
             |      * 1.0 / len(w), 4) AS score
             |  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents)),
             |r AS (SELECT doc_id, source, score, percent_rank() OVER (
             |    PARTITION BY source ORDER BY score, doc_id) AS pr FROM sc)
             |SELECT doc_id, source, score, round(pr, 4) AS q_rank
             |FROM r WHERE pr >= 0.2""".stripMargin)),

    // Character-entropy quality signal: Shannon entropy of each doc's
    // character distribution — low entropy exposes repetitive junk
    // (aaaa…, repeated boilerplate runs) that token-level ratios (q24)
    // and n-gram repetition (q64) can miss at the sub-token level.
    // Cross-engine determinism is the q99/q102 integer discipline
    // applied to entropy: H = ln(n) − Σ c·ln(c) / n needs a float sum
    // over per-char counts, so ln(c) is quantized to a ×10⁴ BIGINT and
    // the Σ is exact integer arithmetic; the only float ops are the
    // final ln(n) and one division, identical in both engines. Scale:
    // (doc, char)-grain explode + two hash aggregates, nothing wider.
    Q("q118_char_entropy",
      (s, d) => {
        val chars = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"),
            // split by empty pattern = one O(len) pass over the string;
            // the sequence+substring form was O(len²) per document
            // (each substring(text, i, 1) rescans i bytes of UTF8)
            explode(split(col("text"), "")).as("ch"))
        chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_chars"),
            sum(col("c") * round(log(col("c")) * 10000).cast("long")).as("__s"))
          .select(col("doc_id"), col("n_chars"),
            // a uniform doc's entropy is ln(n) minus its own quantized
            // self → ±1e-5-ish residue that rounds to a SIGNED zero
            Num.round4(log(col("n_chars")) - col("__s") / lit(10000.0) / col("n_chars"))
              .as("char_entropy"))
      },
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
             |  FROM documents WHERE length(text) > 0),
             |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2)
             |SELECT doc_id, cast(sum(c) AS BIGINT) AS n_chars,
             |  round(ln(sum(c)) - sum(c * cast(round(ln(c) * 10000) AS BIGINT))
             |    / 10000.0 / sum(c), 4) + 0.0 AS char_entropy
             |FROM cc GROUP BY doc_id""".stripMargin)),

    // KMV distinct-count sketch: per-source distinct-shingle estimates
    // from a k-minimum-values sketch ([[graft.functions.KmvSketchAgg]]) —
    // the hash-VERIFIABLE member of the sketch family. q49's
    // approx_count_distinct is rows-only because HLL internals are
    // engine-private; KMV's state is "bottom k of a public md5-derived
    // 48-bit hash", so DuckDB reproduces sketch, estimate, and the
    // audit columns exactly. n_distinct counts distinct HASHES (longs,
    // not shingle strings, ride every Exchange) — the same quantity the
    // sketch estimates, and exact-equal to distinct shingles absent
    // 48-bit collisions. The estimate is (k−1)·2⁴⁸/h₍k₎ (Beyer et al.
    // 2007), exact when a source has fewer than k distinct shingles.
    // Scale: the sketch aggregates with map-side partials at ≤ k longs
    // per group; only the exact-count audit column costs a distinct —
    // drop it in production and the query is one bounded-state pass.
    Q("q121_kmv_distinct",
      (s, d) => {
        import s.implicits._
        val k = 256
        val hs = Tables.documents(s, d)
          .select(col("source"),
            explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
          .select(col("source"),
            conv(substring(md5(col("shingle")), 1, 12), 16, 10)
              .cast("long").as("h"))
          .as[(String, Long)]
        val kmv = KmvSketchAgg[(String, Long)](k, _._2).toColumn
        hs.groupByKey(_._1)
          .agg(kmv.name("kmv"), countDistinct(col("h")).as[Long].name("n_distinct"))
          .toDF("source", "kmv", "n_distinct")
          .select(col("source"), col("n_distinct"),
            when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
              .otherwise(lit((k - 1).toDouble * 281474976710656.0)
                / element_at(col("kmv"), k).cast("double")).as("__est"))
          .select(col("source"), col("n_distinct"),
            Num.round4(col("__est")).as("kmv_est"),
            Num.round4(abs(col("__est") - col("n_distinct"))
              / col("n_distinct")).as("rel_err"))
      },
      Some("""WITH sh AS (SELECT DISTINCT source, shingle FROM (
             |  SELECT source, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |hs AS (SELECT DISTINCT source,
             |    ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h FROM sh),
             |ranked AS (SELECT source, h,
             |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
             |    count(*) OVER (PARTITION BY source) AS n_distinct FROM hs),
             |est AS (SELECT source, max(n_distinct) AS n_distinct,
             |    CASE WHEN max(n_distinct) < 256 THEN max(n_distinct) * 1.0
             |         ELSE 255 * 281474976710656.0 / max(CASE WHEN rn = 256 THEN h END)
             |    END AS est
             |  FROM ranked GROUP BY source)
             |SELECT source, cast(n_distinct AS BIGINT) AS n_distinct,
             |  round(est, 4) + 0.0 AS kmv_est,
             |  round(abs(est - n_distinct) / n_distinct, 4) + 0.0 AS rel_err
             |FROM est""".stripMargin)),

    // Containment near-dup pairs: |A∩B| / min(|A|,|B|) over the same
    // 3-shingle inverted index as q26 — the doc-inside-doc detector.
    // A 100-shingle excerpt embedded in a 2000-shingle page has
    // containment 1.0 but Jaccard ≈ 0.05: threshold-Jaccard dedup
    // structurally misses excerpt/quote/boilerplate-page duplication;
    // this is the operator that catches it (Broder 1997's containment).
    Q("q122_containment_pairs",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.containmentPairs("doc_id", "text", 3, 0.5)),
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b,
             |round(inter * 1.0 / least(sa.sz, sb.sz), 4) + 0.0 AS containment
             |FROM inter JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |WHERE inter * 1.0 / least(sa.sz, sb.sz) >= 0.5""".stripMargin)),

    // Content-level asset fingerprinting + exact-dup groups: the
    // multimodal twin of q22. Really-decodable images get a perceptual
    // dHash (pixel-gradient fingerprint, stable across re-encoding —
    // PNG vs BMP of the same raster collide, MultimodalSpec pins it on
    // committed fixtures); everything else gets byte-exact md5. The
    // synthesized payloads here are text bytes (q59's asset contract),
    // so the driver-gated path is the md5 branch — which is exactly
    // what DuckDB's md5() reproduces, giving the fingerprint surface a
    // full hash oracle while the dhash branch is spec-pinned. Scale:
    // fingerprint is a partition-local projection; the group-by ships
    // (fingerprint, path) only — assets never ride the Exchange.
    Q("q123_asset_fingerprint",
      (s, d) => {
        import s.implicits._
        val assets = Tables.documents(s, d)
          .filter(col("n_chars") > 0)
          .select(col("doc_id").cast("string").as("path"),
            lit("binary").as("modality"),
            octet_length(col("text")).cast("long").as("length"),
            col("text").cast("binary").as("content"))
          .as[graft.multimodal.RawAsset]
        graft.multimodal.Multimodal.fingerprintAssets(assets).toDF()
          .groupBy(col("fp_kind"), col("fingerprint"))
          .agg(min(col("path")).as("keep_path"), count(lit(1)).as("n_dupes"))
          .select("fp_kind", "fingerprint", "keep_path", "n_dupes")
      },
      Some("""SELECT 'md5' AS fp_kind, md5(text) AS fingerprint,
             |min(cast(doc_id AS VARCHAR)) AS keep_path, count(*) AS n_dupes
             |FROM documents WHERE n_chars > 0 GROUP BY md5(text)""".stripMargin)),

    // Full Lloyd k-means, iteration INCLUDED, under one DuckDB oracle:
    // md5 seeds → assign → quantized-integer-mean centroid update →
    // reassign. q88 pinned the centroid-mean step and q96 the rounded
    // assignment; this pins their composition — the training loop
    // itself — so even iterative clustering is hash-verifiable (more
    // rounds = repeat the x/m/cent CTE block). The update mean is exact
    // integer arithmetic (×10⁴ BIGINT sums, one division, float cast),
    // so round-2 centroids are bit-identical cross-engine and the
    // reassignment argmax cannot diverge.
    Q("q124_kmeans_rounds",
      (s, d) => Similarity.kmeansDeterministic(
          Tables.embeddings(s, d), "vec_id", "embedding", n = 8, rounds = 1)
        .select(col("neighbor_id").as("vec_id"), col("centroid_id")),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent0 AS (SELECT vec_id AS cid, v AS cv FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 8),
             |s0 AS (SELECT e.vec_id, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent0 c),
             |a0 AS (SELECT vec_id, cid FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM s0) WHERE rn = 1),
             |x1 AS (SELECT a0.cid, unnest(e.v) AS v,
             |    unnest(range(len(e.v))) AS pos
             |  FROM a0 JOIN e ON e.vec_id = a0.vec_id),
             |m1 AS (SELECT cid, pos, sum(cast(round(v * 10000) AS BIGINT)) AS s,
             |    count(*) AS n FROM x1 GROUP BY 1, 2),
             |cent1 AS (SELECT cid, list(cast(cast(s / (10000.0 * n) AS REAL)
             |    AS DOUBLE) ORDER BY pos) AS cv FROM m1 GROUP BY 1),
             |s1 AS (SELECT e.vec_id, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent1 c)
             |SELECT vec_id, cid AS centroid_id FROM (
             |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |    ORDER BY cs DESC, cid) AS rn FROM s1) WHERE rn = 1""".stripMargin)),

    // Cross-document boilerplate STRIP (CCNet/RefinedWeb line-dedup
    // rule): drop EVERY occurrence of any 8-token chunk appearing in
    // more than maxDf=1 documents — a different policy from q72's
    // keep-first passage dedup, which preserves one copy (menus and
    // license headers are junk in ALL their carriers, including the
    // first). Rewrites the corpus: per doc, token counts before/after
    // plus the md5 of the rebuilt text, so the oracle hash-checks the
    // reconstruction itself without shipping rewritten text.
    Q("q125_boilerplate_strip",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.stripFrequentChunks("doc_id", "text", 8, 1)),
      Some("""WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents WHERE length(trim(text)) > 0),
             |cs AS (SELECT doc_id, w,
             |    list_transform(range(cast(ceil(len(w)/8.0) AS BIGINT)),
             |      i -> struct_pack(i := i,
             |        c := array_to_string(w[i*8+1:i*8+8], ' '))) AS chunks
             |  FROM docs),
             |ch AS (SELECT doc_id, u.i AS idx, u.c AS chunk
             |  FROM (SELECT doc_id, unnest(chunks) AS u FROM cs)),
             |freq AS (SELECT chunk FROM (SELECT chunk,
             |    count(DISTINCT doc_id) AS df FROM ch GROUP BY 1) WHERE df > 1),
             |keep AS (SELECT doc_id, idx, chunk FROM ch
             |  WHERE chunk NOT IN (SELECT chunk FROM freq))
             |SELECT d.doc_id, cast(len(d.w) AS BIGINT) AS n_tokens,
             |  cast(coalesce(sum(len(string_split_regex(k.chunk, '\s+'))), 0)
             |    AS BIGINT) AS n_kept,
             |  md5(coalesce(string_agg(k.chunk, ' ' ORDER BY k.idx), ''))
             |    AS clean_md5
             |FROM docs d LEFT JOIN keep k USING (doc_id)
             |GROUP BY d.doc_id, len(d.w)""".stripMargin)),

    // BM25 keyword retrieval (Robertson & Zaragoza 2009): top-20 docs
    // for a 3-term bag-of-words query — the words-only retrieval twin
    // of the ANN family, used for curation audits and topic pulls.
    // idf is ln-quantized to ×10⁴ BIGINTs and each per-term partial
    // score is rounded to an integer before the per-doc sum (order-free
    // addition); ordering is on the exact integer sum + doc_id. The
    // oracle writes the k1/b coefficient arithmetic as EXPRESSIONS
    // (1.2+1.0, 1.2*(1-0.75), 1.2*0.75), not decimal literals — DuckDB
    // folds them through the same IEEE ops as the JVM, where the
    // pre-folded literal 0.9 is 1 ulp away from 1.2*0.75.
    Q("q126_bm25_topk",
      (s, d) => Tables.documents(s, d)
        .transform(Retrieval.bm25TopK("doc_id", "text",
          Seq("spark", "join", "window"), 20)),
      Some("""WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents WHERE length(trim(text)) > 0),
             |dl AS (SELECT doc_id, w, cast(len(w) AS BIGINT) AS dl FROM docs),
             |corpus AS (SELECT count(*) AS n, sum(dl) AS t FROM dl),
             |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM (
             |    SELECT doc_id, dl, unnest(w) AS term FROM dl)
             |  WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
             |idf AS (SELECT term,
             |    cast(round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * 10000)
             |      AS BIGINT) AS idfq,
             |    t * 1.0 / n AS avgdl
             |  FROM (SELECT term, count(DISTINCT doc_id) AS df
             |        FROM tf GROUP BY 1), corpus),
             |scored AS (SELECT tf.doc_id,
             |    cast(round(idf.idfq * ((tf.tf * (1.2 + 1.0)) /
             |      (tf.tf + 1.2 * (1 - 0.75) + (1.2 * 0.75) * tf.dl / idf.avgdl)))
             |      AS BIGINT) AS sq
             |  FROM tf JOIN idf USING (term))
             |SELECT doc_id, cast(count(*) AS BIGINT) AS matched,
             |  round(sum(sq) / 10000.0, 4) + 0.0 AS score
             |FROM scored GROUP BY doc_id
             |ORDER BY sum(sq) DESC, doc_id LIMIT 20""".stripMargin)),

    // PMI collocations (Church & Hanks 1990): top adjacent-pair
    // associations — the phrase detector a vocab-curation pass runs
    // before deciding which multi-word units deserve tokenizer merges.
    // PMI ratio in pinned operand order from exact integer counts, ln
    // quantized to ×10⁴ BIGINTs, ordering on (pmi_q, w1, w2) — the
    // q118/q126 determinism discipline.
    Q("q129_pmi_collocations",
      (s, d) => Tables.documents(s, d)
        .transform(Collocations.pmiTopK("text", 50, 5L)),
      Some("""WITH docs AS (SELECT string_split_regex(trim(text), '\s+') AS w
             |  FROM documents WHERE length(trim(text)) > 0),
             |totals AS (SELECT cast(sum(len(w)) AS DOUBLE) AS n1,
             |    cast(sum(len(w) - 1) AS DOUBLE) AS n2 FROM docs),
             |uni AS (SELECT t, count(*) AS c FROM (
             |    SELECT unnest(w) AS t FROM docs) GROUP BY 1),
             |bs AS (SELECT list_transform(range(len(w) - 1),
             |    i -> struct_pack(a := w[i+1], b := w[i+2])) AS ps FROM docs),
             |pairs AS (SELECT w1, w2, count(*) AS n_pair FROM (
             |    SELECT u.a AS w1, u.b AS w2 FROM (
             |      SELECT unnest(ps) AS u FROM bs)) GROUP BY 1, 2
             |  HAVING count(*) >= 5),
             |scored AS (SELECT w1, w2, n_pair,
             |    cast(round(ln((n_pair * n1 * n1) /
             |      ((cx.c * 1.0) * cy.c * n2)) * 10000) AS BIGINT) AS pmiq
             |  FROM pairs
             |  JOIN uni cx ON cx.t = pairs.w1
             |  JOIN uni cy ON cy.t = pairs.w2, totals)
             |SELECT w1, w2, n_pair, round(pmiq / 10000.0, 4) + 0.0 AS pmi
             |FROM scored ORDER BY pmiq DESC, w1, w2 LIMIT 50""".stripMargin)),

    // Histogram-sketch quantiles: per-lang token-count P50/P90/P99 from
    // a width-16 fixed-bin histogram — the hash-VERIFIABLE quantile
    // sketch next to q49's engine-private approx_percentile (the q121
    // KMV-vs-HLL pattern applied to quantiles). Partial bin counts
    // merge associatively map-side; the read-off (⌈q·N⌉ rank, linear
    // interpolation in the target bin) is integer arithmetic plus one
    // division, so both engines agree exactly.
    Q("q130_histogram_quantiles",
      (s, d) => Sketches.histogramQuantiles("lang",
          TextFunctions.tokenCount(col("text")), 16L)(
          Tables.documents(s, d).filter(length(trim(col("text"))) > 0)),
      Some("""WITH docs AS (SELECT lang,
             |    len(string_split_regex(trim(text), '\s+')) AS tc
             |  FROM documents WHERE length(trim(text)) > 0),
             |hist AS (SELECT lang, tc // 16 AS bin, count(*) AS cnt
             |  FROM docs GROUP BY 1, 2),
             |c AS (SELECT lang, bin, cnt,
             |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
             |    sum(cnt) OVER (PARTITION BY lang) AS n FROM hist),
             |qs AS (SELECT c.*, q FROM c,
             |  (VALUES (0.5), (0.9), (0.99)) AS t(q)),
             |hit AS (SELECT lang, q, bin, cnt, cum, n,
             |    cast(ceil(q * n) AS BIGINT) AS pos FROM qs
             |  WHERE cum >= cast(ceil(q * n) AS BIGINT)
             |    AND cum - cnt < cast(ceil(q * n) AS BIGINT))
             |SELECT lang, q, cast(n AS BIGINT) AS n,
             |  round(bin * 16 + ((pos - (cum - cnt)) * 16.0) / cnt, 4) + 0.0 AS est
             |FROM hit""".stripMargin)),

    // Hard-negative mining: q103's filtered ANN with the predicate
    // INVERTED — each query's top-5 nearest DIFFERENT-label vectors,
    // the contrastive-training triple constructor (SimCSE/DPR-style
    // hardest negatives: closest in embedding space, wrong by label).
    // Same deterministic machinery (md5 centroids, rounded cosine, id
    // tiebreaks) and the same zero-Exchange cell-assignment economics;
    // the ≠ filter rides the candidate join before any distance math.
    Q("q131_hard_negatives",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfHardNegativesDeterministic(emb,
          emb.filter(col("vec_id") < 100), "vec_id", "embedding", "label",
          5, Similarity.md5SeededCentroids(emb, "vec_id", "embedding", 16),
          nProbe = 8)
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cid, v AS cv FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |scored AS (SELECT e.vec_id, e.label, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent c),
             |assign AS (SELECT vec_id, label, cid AS cell FROM (
             |    SELECT vec_id, label, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM scored) WHERE rn = 1),
             |probes AS (SELECT query_id, qlabel, cid AS cell FROM (
             |    SELECT vec_id AS query_id, label AS qlabel, cid, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY cs DESC, cid) AS pn
             |    FROM scored WHERE vec_id < 100) WHERE pn <= 8),
             |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, a.label
             |  FROM probes p JOIN assign a ON a.cell = p.cell
             |  WHERE a.vec_id <> p.query_id AND a.label <> p.qlabel),
             |s2 AS (SELECT c.query_id, c.label, c.neighbor_id,
             |    round(list_dot_product(eq.v, en.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) *
             |       sqrt(list_dot_product(en.v, en.v))), 4) + 0.0 AS sim
             |  FROM cand c JOIN e eq ON eq.vec_id = c.query_id
             |              JOIN e en ON en.vec_id = c.neighbor_id)
             |SELECT query_id, label, neighbor_id, sim, rk FROM
             |(SELECT *, row_number() OVER (PARTITION BY query_id
             |  ORDER BY sim DESC, neighbor_id) AS rk FROM s2)
             |WHERE rk <= 5""".stripMargin)),

    // Cluster labeling: top-5 c-TF-IDF terms per embedding cell
    // (BERTopic's class-based TF-IDF) — what a semantic-curation pass
    // reads to know WHAT each cell holds before sampling/capping/
    // dropping it. Each cell is one pseudo-document; the score is an
    // INTEGER product tf·idf_q (ln-quantized ×10⁴), so nothing about
    // cross-engine float summation even arises; cut is one by-cell
    // window over the vocabulary-bounded (cell, term) table.
    Q("q132_cluster_terms",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.clusterTopTermsDeterministic(
          Tables.documents(s, d), emb, "doc_id", "text", "vec_id", "embedding",
          Similarity.md5SeededCentroids(emb, "vec_id", "embedding", 16), 5)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cid, v AS cv FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |scored AS (SELECT e.vec_id, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent c),
             |assign AS (SELECT vec_id, cid AS centroid_id FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM scored) WHERE rn = 1),
             |terms AS (SELECT a.centroid_id, t.term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
             |    FROM documents WHERE length(trim(text)) > 0) t
             |  JOIN assign a ON a.vec_id = t.doc_id GROUP BY 1, 2),
             |nc AS (SELECT count(DISTINCT centroid_id) AS c FROM assign),
             |idf AS (SELECT term, cast(round(ln((nc.c + 1.0) / (cf + 1.0)) * 10000)
             |      AS BIGINT) AS idfq
             |  FROM (SELECT term, count(DISTINCT centroid_id) AS cf
             |        FROM terms GROUP BY 1), nc),
             |sc AS (SELECT t.centroid_id, t.term, t.tf, t.tf * i.idfq AS score
             |  FROM terms t JOIN idf i USING (term))
             |SELECT centroid_id, rk, term, tf,
             |  round(score / 10000.0, 4) + 0.0 AS ctfidf FROM (
             |  SELECT *, row_number() OVER (PARTITION BY centroid_id
             |    ORDER BY score DESC, term) AS rk FROM sc) WHERE rk <= 5"""
        .stripMargin)),

    // Boilerplate-cleaned corpus build: q125's strip REWRITES the
    // corpus and q62's full pipeline runs on the rewrite — the q109/q95
    // composition story for the new operator (operators compose as
    // DataFrame transforms; no pipeline code changes). Stripping runs
    // BEFORE the gates on purpose: a doc that was mostly boilerplate
    // may now fall under minTokens and gate out, and two docs differing
    // only in boilerplate become exact dupes the hash dedup folds —
    // neither happens if the strip runs after. Oracle = the strip CTEs
    // rebuilding text, feeding q62's oracle unchanged.
    Q("q133_corpus_pipeline_clean",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val cleaned = docs
          .transform(Dedup.stripFrequentChunksText("doc_id", "text", 8, 1))
          .join(docs.select("doc_id", "lang"), "doc_id")
          .select(col("doc_id"), col("lang"), col("clean_text").as("text"))
        graft.ops.CorpusPipeline.run(
          cleaned,
          keep => keep.transform(Dedup.ngramJaccardPairs(
            "doc_id", "norm_text", 3, 0.03, tokensCol = Some("__w"))))
      },
      Some("""WITH RECURSIVE
             |docs0 AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents WHERE length(trim(text)) > 0),
             |cs AS (SELECT doc_id, lang, w,
             |    list_transform(range(cast(ceil(len(w)/8.0) AS BIGINT)),
             |      i -> struct_pack(i := i,
             |        c := array_to_string(w[i*8+1:i*8+8], ' '))) AS chunks
             |  FROM docs0),
             |ch AS (SELECT doc_id, u.i AS idx, u.c AS chunk
             |  FROM (SELECT doc_id, unnest(chunks) AS u FROM cs)),
             |freq AS (SELECT chunk FROM (SELECT chunk,
             |    count(DISTINCT doc_id) AS df FROM ch GROUP BY 1) WHERE df > 1),
             |keepc AS (SELECT doc_id, idx, chunk FROM ch
             |  WHERE chunk NOT IN (SELECT chunk FROM freq)),
             |cleaned AS (SELECT d.doc_id, d.lang,
             |    coalesce(string_agg(k.chunk, ' ' ORDER BY k.idx), '') AS text
             |  FROM docs0 d LEFT JOIN keepc k USING (doc_id)
             |  GROUP BY d.doc_id, d.lang),
             |norm AS (SELECT doc_id, lang,
             |  regexp_replace(regexp_replace(lower(trim(text)), '[\x00-\x1F\x7F]', ' ', 'g'),
             |    '  +', ' ', 'g') AS norm_text FROM cleaned),
             |scored AS (SELECT doc_id, lang, norm_text,
             |  string_split_regex(trim(norm_text), '\s+') AS w FROM norm),
             |langed AS (SELECT doc_id, lang, norm_text, w,
             |  cast(len(w) AS BIGINT) AS n_tokens,
             |  CASE WHEN mx = 0 THEN 'und'
             |       WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es'
             |       WHEN h_en = mx THEN 'en' ELSE 'de' END AS lang_pred
             |  FROM (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS mx FROM (
             |    SELECT *,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','que','y','los','una'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','des','et','est','une'], x))) AS h_fr
             |    FROM scored))),
             |gated AS (SELECT * FROM langed WHERE n_tokens >= 5 AND lang_pred <> 'und'),
             |keepd AS (SELECT g.* FROM gated g JOIN (
             |    SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(norm_text)) k USING (doc_id)),
             |sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle FROM keepd)),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |dropset AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING min(dst) <> src)
             |SELECT doc_id, lang, lang_pred, n_tokens,
             |  CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
             |       WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM keepd WHERE doc_id NOT IN (SELECT doc_id FROM dropset)""".stripMargin)),

    // Per-source weighted sampling: q112's Efraimidis–Spirakis
    // reservoir run independently inside every source — spending each
    // source's curation budget on its best-weighted documents (quota
    // caps by count alone; this biases ∝ weight within the cap). The
    // global TakeOrderedAndProject becomes ONE by-source window with
    // WindowGroupLimit map-side pruning.
    Q("q134_weighted_per_source",
      (s, d) => Sampling.weightedSamplePerGroup(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "source", col("n_tokens"), kPerGroup = 10),
      Some("""WITH t AS (SELECT doc_id, source,
             |    cast(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |k AS (SELECT doc_id, source, n_tokens,
             |    ln((('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT + 1.0)
             |      / 65536.0) / n_tokens AS ek
             |  FROM t WHERE n_tokens > 0)
             |SELECT doc_id, source, n_tokens, rk, round(ek, 4) + 0.0 AS es_key
             |FROM (SELECT *, row_number() OVER (PARTITION BY source
             |  ORDER BY ek DESC, doc_id) AS rk FROM k) WHERE rk <= 10""".stripMargin)),

    // Per-source duplicate-rate audit: the corpus health metric a crawl
    // operator watches per feed — docs, distinct contents (by md5, the
    // q22/q62 identity), dup rate, and how many tokens exact dedup
    // would reclaim. One (source, hash)-grain aggregate with map-side
    // partials, then a #sources-row rollup; hashes ride the Exchange,
    // text never does.
    Q("q135_dup_rate_by_source",
      (s, d) => Tables.documents(s, d)
        .select(col("source"), md5(col("text")).as("__h"),
          TextFunctions.tokenCount(col("text")).cast("long").as("__t"))
        .groupBy("source", "__h")
        .agg(count(lit(1)).as("__n"), sum(col("__t")).as("__tok"),
          min(col("__t")).as("__keep"))
        .groupBy("source")
        .agg(sum(col("__n")).as("n_docs"),
          count(lit(1)).as("n_distinct"),
          Num.round4((sum(col("__n")) - count(lit(1))) / sum(col("__n")))
            .as("dup_rate"),
          (sum(col("__tok")) - sum(col("__keep"))).as("reclaimable_tokens")),
      Some("""WITH h AS (SELECT source, md5(text) AS h, count(*) AS n,
             |    sum(cast(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT)) AS tok,
             |    min(cast(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT)) AS keep
             |  FROM documents GROUP BY 1, 2)
             |SELECT source, cast(sum(n) AS BIGINT) AS n_docs, count(*) AS n_distinct,
             |  round((sum(n) - count(*)) * 1.0 / sum(n), 4) + 0.0 AS dup_rate,
             |  cast(sum(tok) - sum(keep) AS BIGINT) AS reclaimable_tokens
             |FROM h GROUP BY source""".stripMargin)),

    // Count–Min sketch frequency estimates: the FREQUENCY member of
    // the hash-verifiable sketch trio (q121 KMV → distinct, q130
    // histogram → quantiles, this → per-item frequency). The d×w
    // counter matrix merges by ADDITION — order-independent, unlike
    // Misra–Gries — and rows hash via md5(i‖token) mod w (the q121
    // public-hash discipline), so DuckDB rebuilds the identical matrix
    // and the min-over-rows read-off cannot diverge. n_true is the
    // exact audit column; production drops it and never groups by
    // token — only by the bounded d·w cells.
    Q("q137_cms_frequency",
      (s, d) => Sketches.cmsFrequency(col("text"),
        Seq("spark", "join", "window", "absentword"), 4, 64)(
        Tables.documents(s, d)),
      Some("""WITH toks AS (SELECT unnest(list_filter(
             |    string_split_regex(trim(text), '\s+'), x -> x <> '')) AS t
             |  FROM documents),
             |cells AS (SELECT t, i,
             |    ('0x' || substr(md5(cast(i AS VARCHAR) || '|' || t), 1, 12))::BIGINT
             |      % 64 AS c
             |  FROM toks, range(4) AS r(i)),
             |m AS (SELECT i, c, count(*) AS n FROM cells GROUP BY 1, 2),
             |probes AS (SELECT term, i,
             |    ('0x' || substr(md5(cast(i AS VARCHAR) || '|' || term), 1, 12))::BIGINT
             |      % 64 AS c
             |  FROM (VALUES ('spark'), ('join'), ('window'), ('absentword')) AS p(term),
             |    range(4) AS r(i)),
             |est AS (SELECT term, min(coalesce(m.n, 0)) AS cms_est
             |  FROM probes LEFT JOIN m USING (i, c) GROUP BY term),
             |exact AS (SELECT t AS term, count(*) AS n_true FROM toks
             |  WHERE t IN ('spark', 'join', 'window', 'absentword') GROUP BY 1)
             |SELECT term, coalesce(n_true, 0) AS n_true, cms_est,
             |  cms_est - coalesce(n_true, 0) AS overestimate
             |FROM est LEFT JOIN exact USING (term)""".stripMargin)),

    // Johnson–Lindenstrauss sign projection: 64-dim embeddings → 16
    // dims via a ±1 matrix whose signs are the high bit of md5("j|i")
    // — cheap model-free dimensionality reduction before storage or
    // indexing. Components are emitted in the EXACT integer form
    // (×10⁴-quantized signed sums, units 10⁻⁴·√k): a 4dp re-round of
    // the float form sits exactly on .5 boundaries whenever the sum
    // isn't divisible by √k·10⁴, so the oracle compares the BIGINT the
    // engines can agree on — linear maps preserve distance ratios
    // under any fixed scale. Exploded to (vec_id, dim) grain.
    Q("q138_jl_projection",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(VectorFunctions.jlProjectQ(col("embedding"), 16)))
        .select(col("vec_id"), col("pos").cast("long").as("j"),
          col("col").as("projq")),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
             |SELECT vec_id, j,
             |  cast(sum(cast(round(v[i+1] * 10000) AS BIGINT) *
             |      CASE WHEN substr(md5(cast(j AS VARCHAR) || '|' || cast(i AS VARCHAR)), 1, 1)
             |        >= '8' THEN 1 ELSE -1 END) AS BIGINT) AS projq
             |FROM e, range(16) AS rj(j), range(64) AS ri(i)
             |WHERE i < len(v)
             |GROUP BY vec_id, j""".stripMargin)),

    // Dominant principal component by deterministic power iteration —
    // the spectral member of the embedding-model families (trained:
    // k-means q124 / PQ q99; model-free: JL q138). Unlike the JL
    // projection this LOOKS at the data: the direction embedding mass
    // concentrates in, which "all-but-the-top" (q140) then removes.
    // Every step is exact integer arithmetic: ×10⁴ quantization, an
    // integer-rounded mean with positive-operand floor division, the
    // centered scatter via the one-pass moments identity
    // A = M − μSᵀ − Sμᵀ + nμμᵀ, and 128-bit-exact mat-vec rounds
    // (BigInt ≡ HUGEINT) renormalized to ×10⁴ by integer division —
    // so three iteration rounds reproduce bit-identically in DuckDB
    // (the q124 "pin the training loop itself" discipline, applied to
    // spectral training). Sign canonicalized by the largest-|component|
    // rule. Scale: ONE corpus pass into a d²+d+1-long mergeable state
    // (map-side partials, vectors never shuffle); the iteration is
    // O(rounds·d²) driver work on a 33 KB matrix — corpus-independent,
    // the BPE bounded-driver-loop contract.
    Q("q139_pc1_power_iteration",
      (s, d) => Spectral.pc1Deterministic(
        Tables.embeddings(s, d), "embedding", d = 64, rounds = 3),
      Some(s"""$pc1OracleCtes
             |SELECT j AS pos, v AS pc1_q FROM vv""".stripMargin)),

    // "All-but-the-top" embedding post-processing (Mu & Viswanath, ICLR
    // 2018): center and project out q139's dominant component — the
    // standard cleanup that makes cosine geometry more discriminative
    // before ANN/semantic-dedup runs. The residual is emitted SCALED:
    // rᵢ·D for D = v·v, so the whole apply step is integer
    // multiply-subtract with NO division and NO rounding anywhere —
    // there is no arithmetic left for engines to disagree on, and
    // distance RATIOS are invariant under the fixed scale (divide by
    // D·10⁴ to recover embedding units). proj_q = c·v is the ×10⁻⁸-
    // units projection coefficient the audit reads directly. Scale:
    // apply is a pure per-row projection against broadcast literal μ/v
    // (a d+d-long model) — zero shuffle at any corpus size.
    Q("q140_remove_top_component",
      (s, d) => Spectral.removeTopComponent(
        Tables.embeddings(s, d), "vec_id", "embedding", d = 64, rounds = 3),
      Some(s"""$pc1OracleCtes,
             |dd AS (SELECT CAST(sum(v*v) AS BIGINT) AS d FROM vv),
             |t AS (SELECT c.vec_id, CAST(sum(c.c * vv.v) AS BIGINT) AS t
             |  FROM c JOIN vv ON c.i = vv.j GROUP BY 1)
             |SELECT t.vec_id, t.t AS proj_q,
             |  array_to_string(list(c.c * dd.d - t.t * vv.v ORDER BY c.i), ',') AS resid_q
             |FROM c JOIN vv ON c.i = vv.j JOIN t ON c.vec_id = t.vec_id CROSS JOIN dd
             |GROUP BY t.vec_id, t.t""".stripMargin)),

    // Graph-centrality document scoring: three pinned PageRank rounds
    // over the q26 near-dup pair graph — "how CONNECTED is this
    // document?" as a curation signal (the most central variant of a
    // duplicate neighborhood is the canonical one; at web scale the
    // same iteration over a link graph is the classic crawl-quality
    // prior, Page et al. 1999 / Common Crawl's host ranking). Ranks
    // are ×10⁶ BIGINTs and each round is base + (85·Σ(r div deg)) div
    // 100 with positive-operand floor division only — both engines
    // truncate identically, so the training loop itself hash-checks
    // (the q124/q139 discipline). Isolated documents settle at base.
    // Scale: per round one node-grain join + one edge-grain shuffle,
    // cost ∝ |E|; the symmetrized edges and degrees are staged once.
    Q("q141_pagerank_centrality",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ops.Centrality.pageRankQuantized(
          docs, docs.transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
          "doc_id", "doc_a", "doc_b", rounds = 3)
          .select(col("node").as("doc_id"), col("rank_q"))
      },
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |p AS (SELECT doc_a, doc_b
             |  FROM inter JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM p
             |  UNION ALL SELECT doc_b, doc_a FROM p),
             |deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY 1),
             |nodes AS (SELECT doc_id AS node FROM documents),
             |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
             |r1 AS (SELECT n.node, 150000 + (85 * coalesce(i.s, 0)) // 100 AS r
             |  FROM nodes n LEFT JOIN (SELECT e.v AS node,
             |      CAST(sum(r.r // d.deg) AS BIGINT) AS s
             |    FROM edges e JOIN r0 r ON e.u = r.node JOIN deg d ON e.u = d.u
             |    GROUP BY 1) i USING (node)),
             |r2 AS (SELECT n.node, 150000 + (85 * coalesce(i.s, 0)) // 100 AS r
             |  FROM nodes n LEFT JOIN (SELECT e.v AS node,
             |      CAST(sum(r.r // d.deg) AS BIGINT) AS s
             |    FROM edges e JOIN r1 r ON e.u = r.node JOIN deg d ON e.u = d.u
             |    GROUP BY 1) i USING (node)),
             |r3 AS (SELECT n.node, 150000 + (85 * coalesce(i.s, 0)) // 100 AS r
             |  FROM nodes n LEFT JOIN (SELECT e.v AS node,
             |      CAST(sum(r.r // d.deg) AS BIGINT) AS s
             |    FROM edges e JOIN r2 r ON e.u = r.node JOIN deg d ON e.u = d.u
             |    GROUP BY 1) i USING (node))
             |SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_q FROM r3""".stripMargin)),

    // Per-document n-gram novelty: fraction of a doc's distinct
    // 3-shingles first seen (min doc id = ingest order) in that doc —
    // the "recombined already-seen content" signal mass template
    // duplication produces without any single pair crossing a Jaccard
    // threshold; the scoring twin of keep-first passage dedup (q72
    // rewrites, this measures). One shingle-grain groupBy (map-side
    // partial min) + one join back on the staged shingle table — NO
    // pair join, strictly cheaper than the q26 family. Ratio is a
    // single division of exact integers through the Num.roundz
    // discipline.
    Q("q142_ngram_novelty",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.noveltyScores("doc_id", "text", 3)),
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |f AS (SELECT shingle, min(doc) AS first_doc FROM sh GROUP BY 1)
             |SELECT sh.doc AS doc_id, count(*) AS n_shingles,
             |  CAST(sum(CASE WHEN f.first_doc = sh.doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |  round(sum(CASE WHEN f.first_doc = sh.doc THEN 1 ELSE 0 END) * 1.0
             |    / count(*), 4) + 0.0 AS novelty
             |FROM sh JOIN f USING (shingle) GROUP BY 1""".stripMargin)),

    // Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    // BM25 relevance for a keyword query fused with PageRank authority
    // — the classic relevance×authority composition, used in curation
    // to pick CANONICAL on-topic documents. Fusion is rank-only (no
    // score calibration across wildly different scales): each list
    // contributes 10⁸ div (60 + rank), positive-operand integer floor
    // division, so the fused score is an exact BIGINT sum. The rank
    // windows run over k-row candidate LISTS (bounded, never the
    // corpus) and the final cut is a TakeOrderedAndProject; ties
    // resolve on (score, id) in both engines.
    Q("q143_rrf_hybrid",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bm = docs.transform(Retrieval.bm25TopK("doc_id", "text",
            Seq("spark", "join", "window"), 20))
          // single-partition window is fine HERE: the list is ≤ k rows
          .withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .select("doc_id", "rank")
        val cent = graft.ops.Centrality.pageRankQuantized(
            docs, docs.transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
            "doc_id", "doc_a", "doc_b", rounds = 3)
          .orderBy(col("rank_q").desc, col("node")).limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("rank_q").desc, col("node"))).cast("long"))
          .select(col("node").as("doc_id"), col("rank"))
        Retrieval.rrfFuse(Seq(bm, cent), "doc_id", 10)
      },
      Some("""WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents WHERE length(trim(text)) > 0),
             |dl AS (SELECT doc_id, w, cast(len(w) AS BIGINT) AS dl FROM docs),
             |corpus AS (SELECT count(*) AS n, sum(dl) AS t FROM dl),
             |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM (
             |    SELECT doc_id, dl, unnest(w) AS term FROM dl)
             |  WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
             |idf AS (SELECT term,
             |    cast(round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * 10000)
             |      AS BIGINT) AS idfq,
             |    t * 1.0 / n AS avgdl
             |  FROM (SELECT term, count(DISTINCT doc_id) AS df
             |        FROM tf GROUP BY 1), corpus),
             |scored AS (SELECT tf.doc_id,
             |    cast(round(idf.idfq * ((tf.tf * (1.2 + 1.0)) /
             |      (tf.tf + 1.2 * (1 - 0.75) + (1.2 * 0.75) * tf.dl / idf.avgdl)))
             |      AS BIGINT) AS sq
             |  FROM tf JOIN idf USING (term)),
             |bm AS (SELECT doc_id, round(sum(sq) / 10000.0, 4) + 0.0 AS score
             |  FROM scored GROUP BY doc_id ORDER BY sum(sq) DESC, doc_id LIMIT 20),
             |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             |  FROM bm),
             |sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |p AS (SELECT doc_a, doc_b
             |  FROM inter JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM p
             |  UNION ALL SELECT doc_b, doc_a FROM p),
             |deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY 1),
             |nodes AS (SELECT doc_id AS node FROM documents),
             |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
             |r1 AS (SELECT n.node, 150000 + (85 * coalesce(i.s, 0)) // 100 AS r
             |  FROM nodes n LEFT JOIN (SELECT e.v AS node,
             |      CAST(sum(r.r // d.deg) AS BIGINT) AS s
             |    FROM edges e JOIN r0 r ON e.u = r.node JOIN deg d ON e.u = d.u
             |    GROUP BY 1) i USING (node)),
             |r2 AS (SELECT n.node, 150000 + (85 * coalesce(i.s, 0)) // 100 AS r
             |  FROM nodes n LEFT JOIN (SELECT e.v AS node,
             |      CAST(sum(r.r // d.deg) AS BIGINT) AS s
             |    FROM edges e JOIN r1 r ON e.u = r.node JOIN deg d ON e.u = d.u
             |    GROUP BY 1) i USING (node)),
             |r3 AS (SELECT n.node, 150000 + (85 * coalesce(i.s, 0)) // 100 AS r
             |  FROM nodes n LEFT JOIN (SELECT e.v AS node,
             |      CAST(sum(r.r // d.deg) AS BIGINT) AS s
             |    FROM edges e JOIN r2 r ON e.u = r.node JOIN deg d ON e.u = d.u
             |    GROUP BY 1) i USING (node)),
             |ct AS (SELECT node AS doc_id, r FROM r3 ORDER BY r DESC, node LIMIT 20),
             |cr AS (SELECT doc_id, row_number() OVER (ORDER BY r DESC, doc_id) AS rank
             |  FROM ct),
             |u AS (SELECT doc_id, 100000000 // (60 + rank) AS c FROM bmr
             |  UNION ALL SELECT doc_id, 100000000 // (60 + rank) AS c FROM cr)
             |SELECT doc_id, count(*) AS n_lists, CAST(sum(c) AS BIGINT) AS rrf_q
             |FROM u GROUP BY doc_id ORDER BY sum(c) DESC, doc_id LIMIT 10""".stripMargin)),

    // IVF index health audit: per-cell occupancy of the deterministic
    // cell assignment plus share (basis points) and ×10⁴ load factor —
    // max(load_q) IS the worst-case probe-cost multiplier, since IVF
    // probe latency ∝ probed-cell size; the reading an index operator
    // watches before deciding to re-train centroids or split a hot
    // cell. Corpus-sized work is the zero-Exchange broadcast-pack
    // assignment straight into a #cells-grain count; the audit math is
    // positive-operand integer division on the #cells-row table.
    Q("q144_index_balance",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.indexBalanceAudit(e, "vec_id", "embedding",
          Similarity.md5SeededCentroids(e, "vec_id", "embedding", 8))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cid, v AS cv FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 8),
             |scored AS (SELECT e.vec_id, c.cid,
             |    round(list_dot_product(e.v, c.cv) /
             |      (sqrt(list_dot_product(e.v, e.v)) *
             |       sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0 AS cs
             |  FROM e CROSS JOIN cent c),
             |assign AS (SELECT vec_id, cid AS cell FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cs DESC, cid) AS rn FROM scored) WHERE rn = 1),
             |occ AS (SELECT cell, count(*) AS n_vecs FROM assign GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS t,
             |    count(*) AS k FROM occ)
             |SELECT cell, n_vecs, (n_vecs * 10000) // t AS share_bp,
             |  (n_vecs * k * 10000) // t AS load_q
             |FROM occ, tot""".stripMargin)),

    // Per-node triangle count + local clustering coefficient over the
    // q26/q141 near-dup pair graph — the dedup-graph HEALTH reading:
    // closure → 10⁴ is clique-like template duplication that transitive
    // clustering safely collapses; high degree with near-zero closure is
    // chain-like drift (A~B~C but A≁C) where q61/q71's connected
    // components over-merge — the "tighten the threshold first" signal.
    // Algorithm is degree-ordered compact-forward (each edge oriented
    // from its lower-(degree, id) endpoint, wedge fan-out bounded by
    // arboricity, never hub-degree²; one equi-join closes wedges, each
    // triangle materializes once). closure_bp = (2T·10⁴) div (d(d−1))
    // in positive-operand integer division; degree-1 nodes emit NULL.
    Q("q147_triangle_closure",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ops.Centrality.triangleStats(
          docs.transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
          "doc_a", "doc_b")
          .select(col("node").as("doc_id"), col("degree"),
            col("n_tri"), col("closure_bp"))
      },
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |p AS (SELECT doc_a, doc_b
             |  FROM inter JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |deg AS (SELECT node, count(*) AS degree FROM (
             |    SELECT doc_a AS node FROM p UNION ALL SELECT doc_b FROM p)
             |  GROUP BY 1),
             |o AS (SELECT CASE WHEN da.degree < db.degree
             |      OR (da.degree = db.degree AND p.doc_a < p.doc_b)
             |    THEN p.doc_a ELSE p.doc_b END AS u,
             |    CASE WHEN da.degree < db.degree
             |      OR (da.degree = db.degree AND p.doc_a < p.doc_b)
             |    THEN p.doc_b ELSE p.doc_a END AS v
             |  FROM p JOIN deg da ON p.doc_a = da.node
             |    JOIN deg db ON p.doc_b = db.node),
             |ov AS (SELECT o.u, o.v, d.degree AS dv
             |  FROM o JOIN deg d ON o.v = d.node),
             |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
             |  FROM ov e1 JOIN ov e2 ON e1.u = e2.u
             |    AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
             |  JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
             |tc AS (SELECT node, count(*) AS n_tri FROM (
             |    SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY 1)
             |SELECT deg.node AS doc_id, deg.degree,
             |  coalesce(tc.n_tri, 0) AS n_tri,
             |  CASE WHEN deg.degree >= 2
             |    THEN (2 * coalesce(tc.n_tri, 0) * 10000) //
             |      (deg.degree * (deg.degree - 1)) END AS closure_bp
             |FROM deg LEFT JOIN tc USING (node)""".stripMargin)),

    // Per-source Zipf fit (q148): least-squares slope of ln(count) on
    // ln(rank) over each source's top-200 token frequencies — natural
    // text sits near slope −10⁴ (α≈1; Zipf 1949); α≫1 is boilerplate/
    // log-spam domination, α≈0 is near-uniform junk (random strings,
    // minified code) — the source-level degeneracy screen beside q75's
    // drift monitor. x/y are ln-quantized ×10⁴ BIGINTs (q129
    // discipline) and the fit is emitted as EXACT integer num/den plus
    // a sign-extracted positive-operand ×10⁴ division — regression
    // with no arithmetic left to diverge. Corpus-grain work is one
    // (source, token) count; ranks window the vocabulary-bounded
    // matrix with WindowGroupLimit pruning.
    Q("q148_zipf_fit",
      (s, d) => Tables.documents(s, d)
        .transform(VocabStats.zipfSlopes("source", "text", 200)),
      Some("""WITH tk AS (SELECT source,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |c AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
             |r AS (SELECT source, c,
             |    row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rn
             |  FROM c),
             |q AS (SELECT source,
             |    CAST(round(ln(rn) * 10000) AS BIGINT) AS x,
             |    CAST(round(ln(c) * 10000) AS BIGINT) AS y
             |  FROM r WHERE rn <= 200),
             |a AS (SELECT source, count(*) AS n_ranks, sum(x*y) AS sxy,
             |    sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx
             |  FROM q GROUP BY 1)
             |SELECT source, n_ranks,
             |  CAST(n_ranks*sxy - sx*sy AS BIGINT) AS num,
             |  CAST(n_ranks*sxx - sx*sx AS BIGINT) AS den,
             |  CAST(CASE WHEN n_ranks*sxx - sx*sx <= 0 THEN NULL
             |    WHEN n_ranks*sxy - sx*sy >= 0
             |    THEN ((n_ranks*sxy - sx*sy) * 10000) // (n_ranks*sxx - sx*sx)
             |    ELSE -((-(n_ranks*sxy - sx*sy) * 10000) // (n_ranks*sxx - sx*sx))
             |    END AS BIGINT) AS slope_q4
             |FROM a""".stripMargin)),

    // Linear classifier inference gate (q149): per-document logit =
    // Σ token weights over a LIMIT-bounded top-2000 vocabulary, keep
    // iff logit > 0 — the fastText-style model-based quality filter of
    // the CCNet/LLaMA pipelines, as deployment plumbing: weights are a
    // deterministic ×10⁻³-quantized md5 stand-in (training is out of
    // scope; swapping in trained weights is a one-table replacement).
    // The vocab broadcasts onto the (doc, token) stream (no join
    // shuffle), OOV scores 0 via the left join, scoring is exact
    // BIGINT summation with map-side partials into one per-doc
    // aggregate.
    Q("q149_classifier_gate",
      (s, d) => Tables.documents(s, d)
        .transform(LinearModel.linearGate("doc_id", "text", 2000)),
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok,
             |    (('0x' || substr(md5('w|' || tok), 1, 12))::BIGINT % 2001)
             |      - 1000 AS w
             |  FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1)
             |  ORDER BY c DESC, tok LIMIT 2000)
             |SELECT tk.doc_id, count(*) AS n_tokens,
             |  count(v.w) AS n_in_vocab,
             |  CAST(coalesce(sum(v.w), 0) AS BIGINT) AS score_q3,
             |  CAST(CASE WHEN coalesce(sum(v.w), 0) > 0 THEN 1 ELSE 0 END
             |    AS BIGINT) AS keep
             |FROM tk LEFT JOIN v USING (tok) GROUP BY 1""".stripMargin)),

    // Unicode NFC normalization (q151): the native NfcNormalizeExpr
    // (second codegen Catalyst expression beside cosine_sim — Spark
    // has no builtin, and a UDF would break whole-stage codegen in the
    // gate chain where this runs) verified against DuckDB's
    // nfc_normalize: both implement the standard Unicode algorithm, so
    // the normalized TEXT ITSELF hash-checks. The corpus is ASCII, so
    // decomposed forms are injected (combining acute/diaeresis, plus
    // the U+212B→U+00C5 Angström singleton, which changes bytes but
    // not code-point count) the q78 injection way. Canonical identity
    // is step zero of dedup: without it "café" NFD and NFC split every
    // content hash downstream.
    Q("q151_nfc_normalize",
      (s, d) => {
        val injected = Tables.documents(s, d).withColumn("text",
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" cafe\u0301 nai\u0308ve \u212B")))
            .otherwise(col("text")))
        injected
          .select(col("doc_id"), col("text"),
            graft.functions.NfcNormalizeExpr.nfcNormalize(col("text"))
              .as("norm_text"))
          .select(col("doc_id"),
            length(col("text")).cast("long").as("n_before"),
            length(col("norm_text")).cast("long").as("n_after"),
            when(col("norm_text") === col("text"), 0L).otherwise(1L)
              .as("changed"),
            col("norm_text"))
      },
      Some("""WITH inj AS (SELECT doc_id,
             |  CASE WHEN doc_id % 4 = 0 THEN text || ' cafe' || chr(769)
             |    || ' nai' || chr(776) || 've ' || chr(8491)
             |  ELSE text END AS text FROM documents)
             |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_before,
             |  CAST(length(nfc_normalize(text)) AS BIGINT) AS n_after,
             |  CAST(CASE WHEN nfc_normalize(text) = text THEN 0 ELSE 1 END
             |    AS BIGINT) AS changed,
             |  nfc_normalize(text) AS norm_text
             |FROM inj""".stripMargin)),

    // Misra–Gries heavy hitters (q152): per-source top-token summary
    // in ≤ 20 counters of bounded state — the TOP-K member of the
    // sketch quartet (KMV distinct / CMS frequency / histogram
    // quantiles / this), where exact q77 keeps a counter per distinct
    // item. Emitted next to the exact counts with the theorem's bound
    // check (0 ≤ exact − est ≤ n/k) so the audit column is visible in
    // the dump; counter VALUES are encounter-order-dependent, hence
    // rows-only + the law specs (same verification status as the
    // xxhash production sketches). State merges map-side; the shuffle
    // carries one ≤ k-entry map per (source × map task).
    Q("q152_mg_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val k = 20
        val toks = graft.ops.Staged.stage(
          Tables.documents(s, d).select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("tok")))
        val mg = graft.functions.MisraGriesAgg[(String, String)](k, _._2)
          .toColumn
        val summaries = toks.as[(String, String)].groupByKey(_._1)
          .agg(mg.name("mg"), count(lit(1)).as[Long].name("n"))
          .toDF("source", "mg", "n")
          .select(col("source"), col("n"), explode(col("mg")).as(Seq("tok", "est")))
        val exact = toks.groupBy("source", "tok")
          .agg(count(lit(1)).as("exact"))
        summaries.join(exact, Seq("source", "tok"))
          .select(col("source"), col("tok"), col("est"), col("exact"), col("n"),
            when(col("est") <= col("exact") &&
              (col("exact") - col("est")) * k <= col("n"), 1L)
              .otherwise(0L).as("bound_ok"))
      },
      None),

    // Exact 2-D Pareto frontier (q153): the documents on the
    // (minimize length, maximize vocabulary diversity) skyline — the
    // provably-best curation trades, everything else dominated. The
    // oracle is the textbook O(n²) dominance anti-join; the Spark side
    // is the bucketed one-Exchange form (in-bucket strict-less +
    // equal-key windows, cross-bucket dominance collapsed to a
    // ≤64-row prefix-max broadcast) — no pair join at any scale.
    Q("q153_pareto_frontier",
      (s, d) => {
        val m = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
          size(array_distinct(TextFunctions.tokens(col("text"))))
            .cast("long").as("n_distinct_toks"))
        Skyline.frontier2d(m, "n_chars", "n_distinct_toks")
      },
      Some("""WITH m AS (SELECT doc_id, n_chars,
             |  CAST(len(list_distinct(list_filter(
             |    string_split_regex(trim(text), '\s+'), x -> x <> '')))
             |    AS BIGINT) AS n_distinct_toks FROM documents)
             |SELECT doc_id, n_chars, n_distinct_toks FROM m r
             |WHERE NOT EXISTS (SELECT 1 FROM m o
             |  WHERE o.n_chars <= r.n_chars
             |    AND o.n_distinct_toks >= r.n_distinct_toks
             |    AND (o.n_chars < r.n_chars
             |      OR o.n_distinct_toks > r.n_distinct_toks))""".stripMargin)),

    // Declarative data-quality constraint report (q155): the whole
    // rule battery — row count, completeness, key uniqueness,
    // derived-column consistency, domain membership, range and
    // distribution bands — evaluates in ONE aggregate pass over the
    // table (a single Aggregate node; the distinct-count rule adds the
    // usual Expand), then pivots to (rule, metric, pass) rows. The
    // n_chars_max_500 rule FAILS on this corpus (max is ~553-558) on
    // purpose: a checker whose report is all-green on any input is
    // indistinguishable from one that checks nothing.
    Q("q155_quality_constraints",
      (s, d) => {
        import graft.ops.Constraints.Rule
        Constraints.report(Tables.documents(s, d), Seq(
          Rule("row_count_min_100", count(lit(1)), _ >= 100.0),
          Rule("text_complete",
            sum(when(col("text").isNull ||
              length(trim(col("text"))) === 0, 1L).otherwise(0L)),
            _ === 0.0),
          Rule("doc_id_unique",
            count(lit(1)) - countDistinct(col("doc_id")), _ === 0.0),
          Rule("n_chars_matches_text",
            sum(when(col("n_chars") =!= length(col("text")), 1L)
              .otherwise(0L)), _ === 0.0),
          Rule("lang_in_domain",
            sum(when(!col("lang").isin("de", "en", "es", "fr", "zh"), 1L)
              .otherwise(0L)), _ === 0.0),
          Rule("n_chars_min_1", min(col("n_chars")), _ >= 1.0),
          Rule("n_chars_max_500", max(col("n_chars")), _ <= 500.0),
          Rule("mean_chars_band",
            sum(col("n_chars")) * lit(1.0) / count(lit(1)),
            m => m >= 50.0 && m <= 5000.0)))
      },
      Some("""WITH a AS (SELECT
             |  count(*) * 1.0 AS m0,
             |  sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
             |    THEN 1 ELSE 0 END) * 1.0 AS m1,
             |  (count(*) - count(DISTINCT doc_id)) * 1.0 AS m2,
             |  sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
             |    * 1.0 AS m3,
             |  sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh')
             |    THEN 1 ELSE 0 END) * 1.0 AS m4,
             |  min(n_chars) * 1.0 AS m5,
             |  max(n_chars) * 1.0 AS m6,
             |  sum(n_chars) * 1.0 / count(*) AS m7
             |  FROM documents)
             |SELECT 'row_count_min_100' AS rule, round(m0,4)+0.0 AS metric,
             |  CAST(CASE WHEN m0 >= 100 THEN 1 ELSE 0 END AS BIGINT) AS pass
             |  FROM a
             |UNION ALL SELECT 'text_complete', round(m1,4)+0.0,
             |  CAST(CASE WHEN m1 = 0 THEN 1 ELSE 0 END AS BIGINT) FROM a
             |UNION ALL SELECT 'doc_id_unique', round(m2,4)+0.0,
             |  CAST(CASE WHEN m2 = 0 THEN 1 ELSE 0 END AS BIGINT) FROM a
             |UNION ALL SELECT 'n_chars_matches_text', round(m3,4)+0.0,
             |  CAST(CASE WHEN m3 = 0 THEN 1 ELSE 0 END AS BIGINT) FROM a
             |UNION ALL SELECT 'lang_in_domain', round(m4,4)+0.0,
             |  CAST(CASE WHEN m4 = 0 THEN 1 ELSE 0 END AS BIGINT) FROM a
             |UNION ALL SELECT 'n_chars_min_1', round(m5,4)+0.0,
             |  CAST(CASE WHEN m5 >= 1 THEN 1 ELSE 0 END AS BIGINT) FROM a
             |UNION ALL SELECT 'n_chars_max_500', round(m6,4)+0.0,
             |  CAST(CASE WHEN m6 <= 500 THEN 1 ELSE 0 END AS BIGINT) FROM a
             |UNION ALL SELECT 'mean_chars_band', round(m7,4)+0.0,
             |  CAST(CASE WHEN m7 >= 50 AND m7 <= 5000 THEN 1 ELSE 0 END
             |    AS BIGINT) FROM a""".stripMargin)),

    // Greedy k-center diversity coreset (q157): 4 farthest-point
    // rounds over the embedding table — the maximally-diverse-subset
    // selector (eval carving, annotation budgets), the opposite knob
    // from SemDeDup. Spark side: k driver rounds of one scan +
    // TakeOrdered(1) with the selected set riding as literal vectors
    // inside the distance expression (dist² = n2x − 2·x·c + n2c off
    // the one precomputed norm column); oracle: the same four rounds
    // unrolled as CTEs. The emitted score sequence is the shrinking
    // greedy cover radius.
    Q("q157_kcenter_coreset",
      (s, d) => Coreset.kCenterGreedy(
        Tables.embeddings(s, d), "vec_id", "embedding", 4),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
             |  FROM embeddings),
             |n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
             |c1 AS (SELECT vec_id, v, n2, n2 AS sc FROM n
             |  ORDER BY n2 DESC, vec_id LIMIT 1),
             |d1 AS (SELECT n.vec_id, n.v, n.n2,
             |    n.n2 - 2.0 * list_dot_product(n.v, c1.v) + c1.n2 AS dmin
             |  FROM n, c1),
             |c2 AS (SELECT vec_id, v, n2, dmin AS sc FROM d1
             |  ORDER BY dmin DESC, vec_id LIMIT 1),
             |d2 AS (SELECT d1.vec_id, d1.v, d1.n2,
             |    least(d1.dmin, d1.n2 - 2.0 * list_dot_product(d1.v, c2.v)
             |      + c2.n2) AS dmin FROM d1, c2),
             |c3 AS (SELECT vec_id, v, n2, dmin AS sc FROM d2
             |  ORDER BY dmin DESC, vec_id LIMIT 1),
             |d3 AS (SELECT d2.vec_id, d2.v, d2.n2,
             |    least(d2.dmin, d2.n2 - 2.0 * list_dot_product(d2.v, c3.v)
             |      + c3.n2) AS dmin FROM d2, c3),
             |c4 AS (SELECT vec_id, dmin AS sc FROM d3
             |  ORDER BY dmin DESC, vec_id LIMIT 1)
             |SELECT CAST(1 AS BIGINT) AS round, vec_id,
             |  round(sc, 4) + 0.0 AS score_q4 FROM c1
             |UNION ALL SELECT 2, vec_id, round(sc, 4) + 0.0 FROM c2
             |UNION ALL SELECT 3, vec_id, round(sc, 4) + 0.0 FROM c3
             |UNION ALL SELECT 4, vec_id, round(sc, 4) + 0.0 FROM c4"""
        .stripMargin)),

    // Greedy maximum-coverage selection (q158): the 4 documents whose
    // union covers the most of the top-2000 3-gram shingle universe,
    // one highest-marginal-gain pick per round — submodular (1−1/e)
    // greedy, the token-space sibling of q157's embedding-space
    // k-center. Units are SHINGLES, not unigrams: this corpus's
    // unigram vocabulary is 31 tokens and one document covers it
    // whole (a correct but degenerate 1-round cover); the shingle
    // universe is thousands-large, so the 4 rounds genuinely
    // discriminate. All-integer output (gains, coverage totals): no
    // float parity surface at all. Spark side: staged bounded
    // (doc, unit) pair table, k rounds of broadcast anti-join +
    // TakeOrdered(1); oracle: the same four rounds unrolled as CTEs.
    Q("q158_greedy_set_cover",
      (s, d) => Coverage.greedySetCover(Tables.documents(s, d), "doc_id",
        TextFunctions.shingles(col("text"), 3), 4),
      Some("""WITH tk AS (SELECT DISTINCT doc_id, shingle AS tok FROM (
             |  SELECT doc_id, unnest(list_transform(
             |      range(greatest(len(w) - 2, 0)),
             |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id,
             |    string_split_regex(trim(text), '\s+') AS w
             |    FROM documents))),
             |uni AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tk
             |    GROUP BY 1)
             |  ORDER BY c DESC, tok LIMIT 2000),
             |tku AS (SELECT tk.doc_id, tk.tok FROM tk JOIN uni USING (tok)),
             |g1 AS (SELECT doc_id, count(*) AS gain FROM tku GROUP BY 1),
             |p1 AS (SELECT doc_id, gain FROM g1
             |  ORDER BY gain DESC, doc_id LIMIT 1),
             |c1 AS (SELECT DISTINCT tok FROM tku JOIN p1 USING (doc_id)),
             |g2 AS (SELECT doc_id, count(*) AS gain FROM tku
             |  WHERE doc_id NOT IN (SELECT doc_id FROM p1)
             |    AND tok NOT IN (SELECT tok FROM c1) GROUP BY 1),
             |p2 AS (SELECT doc_id, gain FROM g2
             |  ORDER BY gain DESC, doc_id LIMIT 1),
             |c2 AS (SELECT tok FROM c1
             |  UNION SELECT tok FROM tku JOIN p2 USING (doc_id)),
             |g3 AS (SELECT doc_id, count(*) AS gain FROM tku
             |  WHERE doc_id NOT IN (SELECT doc_id FROM p1
             |    UNION ALL SELECT doc_id FROM p2)
             |    AND tok NOT IN (SELECT tok FROM c2) GROUP BY 1),
             |p3 AS (SELECT doc_id, gain FROM g3
             |  ORDER BY gain DESC, doc_id LIMIT 1),
             |c3 AS (SELECT tok FROM c2
             |  UNION SELECT tok FROM tku JOIN p3 USING (doc_id)),
             |g4 AS (SELECT doc_id, count(*) AS gain FROM tku
             |  WHERE doc_id NOT IN (SELECT doc_id FROM p1
             |    UNION ALL SELECT doc_id FROM p2
             |    UNION ALL SELECT doc_id FROM p3)
             |    AND tok NOT IN (SELECT tok FROM c3) GROUP BY 1),
             |p4 AS (SELECT doc_id, gain FROM g4
             |  ORDER BY gain DESC, doc_id LIMIT 1),
             |c4 AS (SELECT tok FROM c3
             |  UNION SELECT tok FROM tku JOIN p4 USING (doc_id))
             |SELECT CAST(1 AS BIGINT) AS round, doc_id, gain,
             |  (SELECT count(*) FROM c1) AS covered_total FROM p1
             |UNION ALL SELECT 2, doc_id, gain,
             |  (SELECT count(*) FROM c2) FROM p2
             |UNION ALL SELECT 3, doc_id, gain,
             |  (SELECT count(*) FROM c3) FROM p3
             |UNION ALL SELECT 4, doc_id, gain,
             |  (SELECT count(*) FROM c4) FROM p4""".stripMargin)),

    // Language-ID confusion audit (q160): the q25 heuristic predictor
    // cross-tabulated against the DECLARED lang column — the
    // label-vs-model agreement matrix a curation pipeline reads before
    // trusting either side (here it also EXPOSES the predictor's
    // blind spot: declared-zh rows can only land in 'und' or a false
    // positive, since the n-gram stopword battery has no zh entry).
    // Row percentages in exact basis points (n·10⁴ div row total).
    // One (lang, pred) aggregate with map-side partials; the
    // normalizer windows the ≤|langs|² matrix, never the corpus.
    Q("q160_langid_confusion",
      (s, d) => {
        val preds = Tables.documents(s, d).select(col("lang"),
          TextFunctions.langId(col("text")).as("lang_pred"))
        val m = preds.groupBy("lang", "lang_pred")
          .agg(count(lit(1)).as("n"))
        m.withColumn("pct_bp", expr(
          "n * 10000 DIV sum(n) OVER (PARTITION BY lang)"))
      },
      Some("""WITH p AS (SELECT lang, CASE WHEN mx = 0 THEN 'und'
             |    WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es'
             |    WHEN h_en = mx THEN 'en' ELSE 'de' END AS lang_pred
             |  FROM (SELECT lang,
             |    greatest(h_de, h_en, h_es, h_fr) AS mx, h_de, h_en,
             |    h_es, h_fr FROM (SELECT lang,
             |  len(list_filter(w, x -> list_contains(
             |    ['der','die','das','und','ist','nicht','ein'], x))) AS h_de,
             |  len(list_filter(w, x -> list_contains(
             |    ['the','a','of','and','to','in','is','that'], x))) AS h_en,
             |  len(list_filter(w, x -> list_contains(
             |    ['el','la','de','que','y','los','una'], x))) AS h_es,
             |  len(list_filter(w, x -> list_contains(
             |    ['le','la','les','des','et','est','une'], x))) AS h_fr
             |  FROM (SELECT lang,
             |    string_split_regex(trim(text), '\s+') AS w
             |    FROM documents)))),
             |m AS (SELECT lang, lang_pred, count(*) AS n FROM p
             |  GROUP BY 1, 2)
             |SELECT lang, lang_pred, n,
             |  CAST((n * 10000) // sum(n) OVER (PARTITION BY lang)
             |    AS BIGINT) AS pct_bp
             |FROM m""".stripMargin)),

    // Per-source Pareto frontier (q161): q153's skyline independently
    // within every source — the per-domain curation trade sheet (each
    // crawl source gets its own "shortest documents for a given
    // diversity" frontier, because frontiers do NOT compose: a row
    // dominated globally can be its source's best). Same bucketed
    // one-Exchange structure with the group key prepended; the oracle
    // is the dominance anti-join constrained to the same source.
    Q("q161_pareto_per_source",
      (s, d) => {
        val m = Tables.documents(s, d).select(col("doc_id"), col("source"),
          col("n_chars"),
          size(array_distinct(TextFunctions.tokens(col("text"))))
            .cast("long").as("n_distinct_toks"))
        Skyline.frontier2dPerGroup(m, Seq("source"),
          "n_chars", "n_distinct_toks")
      },
      Some("""WITH m AS (SELECT doc_id, source, n_chars,
             |  CAST(len(list_distinct(list_filter(
             |    string_split_regex(trim(text), '\s+'), x -> x <> '')))
             |    AS BIGINT) AS n_distinct_toks FROM documents)
             |SELECT doc_id, source, n_chars, n_distinct_toks FROM m r
             |WHERE NOT EXISTS (SELECT 1 FROM m o
             |  WHERE o.source = r.source
             |    AND o.n_chars <= r.n_chars
             |    AND o.n_distinct_toks >= r.n_distinct_toks
             |    AND (o.n_chars < r.n_chars
             |      OR o.n_distinct_toks > r.n_distinct_toks))""".stripMargin)),

    // MMR diversified re-ranking (q162): 4 greedy rounds of
    // relevance-vs-redundancy over the embedding table anchored at
    // query vec 0 — the diversified-retrieval head (RAG context
    // assembly) on top of any dense ranker, query-anchored where
    // q157's k-center is query-free. 0.7/0.3 weights are LITERALS on
    // both sides (1−0.7 computed anywhere is a different double than
    // the 0.3 literal — the constants must fold identically). Oracle:
    // the same four rounds unrolled, max-similarity carried
    // incrementally via greatest (associative ⇒ ≡ the from-scratch
    // greatest the Spark side evaluates).
    Q("q162_mmr_rerank",
      (s, d) => Retrieval.mmrRerank(
        Tables.embeddings(s, d), "vec_id", "embedding", 0L, 4),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
             |  FROM embeddings),
             |n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
             |q AS (SELECT v AS qv, n2 AS qn2 FROM n WHERE vec_id = 0),
             |c AS (SELECT vec_id, v, n2,
             |    list_dot_product(v, qv) / (sqrt(n2) * sqrt(qn2)) AS rel
             |  FROM n, q WHERE vec_id <> 0),
             |c1 AS (SELECT vec_id, v, n2, rel, rel AS sc FROM c
             |  ORDER BY rel DESC, vec_id LIMIT 1),
             |s1 AS (SELECT c.vec_id, c.v, c.n2, c.rel,
             |    list_dot_product(c.v, c1.v) / (sqrt(c.n2) * sqrt(c1.n2))
             |      AS ms
             |  FROM c, c1 WHERE c.vec_id <> c1.vec_id),
             |c2 AS (SELECT vec_id, v, n2, rel, 0.7 * rel - 0.3 * ms AS sc
             |  FROM s1 ORDER BY sc DESC, vec_id LIMIT 1),
             |s2 AS (SELECT s1.vec_id, s1.v, s1.n2, s1.rel,
             |    greatest(s1.ms, list_dot_product(s1.v, c2.v)
             |      / (sqrt(s1.n2) * sqrt(c2.n2))) AS ms
             |  FROM s1, c2 WHERE s1.vec_id <> c2.vec_id),
             |c3 AS (SELECT vec_id, v, n2, rel, 0.7 * rel - 0.3 * ms AS sc
             |  FROM s2 ORDER BY sc DESC, vec_id LIMIT 1),
             |s3 AS (SELECT s2.vec_id, s2.v, s2.n2, s2.rel,
             |    greatest(s2.ms, list_dot_product(s2.v, c3.v)
             |      / (sqrt(s2.n2) * sqrt(c3.n2))) AS ms
             |  FROM s2, c3 WHERE s2.vec_id <> c3.vec_id),
             |c4 AS (SELECT vec_id, 0.7 * rel - 0.3 * ms AS sc FROM s3
             |  ORDER BY sc DESC, vec_id LIMIT 1)
             |SELECT CAST(1 AS BIGINT) AS round, vec_id,
             |  round(sc, 4) + 0.0 AS score_q4 FROM c1
             |UNION ALL SELECT 2, vec_id, round(sc, 4) + 0.0 FROM c2
             |UNION ALL SELECT 3, vec_id, round(sc, 4) + 0.0 FROM c3
             |UNION ALL SELECT 4, vec_id, round(sc, 4) + 0.0 FROM c4"""
        .stripMargin)),

    // Poisson bootstrap CI (q163): 200 deterministic md5-seeded
    // Poisson(1)-weighted replicas of the corpus length mean, CI =
    // exact order-statistic quantiles of the replica means — the
    // one-pass resampling scheme that works at any scale because it
    // never materializes an index-based resample. Replica sums are
    // exact integers; u = md5-48-bit / 2⁴⁸ is an EXACT power-of-two
    // division, so both engines see identical uniforms, weights, and
    // means. Tie-straddled quantile ranks are still deterministic:
    // tied means emit the same value whichever side of the rank they
    // land.
    Q("q163_bootstrap_ci",
      (s, d) => Stats.poissonBootstrapCi(
        Tables.documents(s, d), "doc_id", "n_chars"),
      Some("""WITH r AS (SELECT doc_id, n_chars, b
             |  FROM documents, range(200) AS t(b)),
             |wt AS (SELECT n_chars, b,
             |    CASE WHEN u < 0.36787944117144233 THEN 0
             |      WHEN u < 0.7357588823428847 THEN 1
             |      WHEN u < 0.9196986029286058 THEN 2
             |      WHEN u < 0.9810118431238462 THEN 3
             |      WHEN u < 0.9963401531726563 THEN 4
             |      ELSE 5 END AS w
             |  FROM (SELECT n_chars, b,
             |      ('0x' || substring(md5(doc_id::VARCHAR || '|'
             |        || b::VARCHAR), 1, 12))::BIGINT
             |        / 281474976710656.0 AS u
             |    FROM r)),
             |reps AS (SELECT b, sum(w * n_chars) AS s, sum(w) AS n
             |  FROM wt GROUP BY 1 HAVING sum(w) > 0),
             |m AS (SELECT s * 1.0 / n AS m FROM reps),
             |rk AS (SELECT m, row_number() OVER (ORDER BY m) AS rk FROM m),
             |p AS (SELECT sum(n_chars) * 1.0 / count(*) AS pm
             |  FROM documents)
             |SELECT round(max(pm), 4) + 0.0 AS mean_q4,
             |  round(max(CASE WHEN rk = 5 THEN m END), 4) + 0.0 AS lo_q4,
             |  round(max(CASE WHEN rk = 196 THEN m END), 4) + 0.0 AS hi_q4,
             |  count(*) AS n_replicas
             |FROM rk, p""".stripMargin)),

    // Two-sample KS drift (q164): the Kolmogorov–Smirnov distance
    // between src0's and src1's length distributions in EXACT integer
    // arithmetic — D emitted as the fraction (max_x |cumA·n_b −
    // cumB·n_a|, n_a·n_b) plus basis points, no floats, no
    // ties-handling ambiguity. The drift alarm between two crawl
    // sources or snapshot dates. One (value)-grain aggregate over both
    // populations; windows and the max run over the value-domain-sized
    // matrix (staged — totals and the max share it).
    Q("q164_ks_drift",
      (s, d) => Stats.ksDrift(Tables.documents(s, d), "n_chars",
        col("source") === "src0", col("source") === "src1"),
      Some("""WITH pv AS (SELECT n_chars AS v,
             |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
             |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
             |  FROM documents WHERE source IN ('src0', 'src1')
             |  GROUP BY 1),
             |c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
             |    sum(cb) OVER (ORDER BY v) AS cumb FROM pv),
             |t AS (SELECT max(cuma) AS n_a, max(cumb) AS n_b FROM c)
             |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  CAST(max(abs(cuma * n_b - cumb * n_a)) AS BIGINT) AS d_num,
             |  CAST(n_a * n_b AS BIGINT) AS d_den,
             |  CAST(max(abs(cuma * n_b - cumb * n_a)) * 10000
             |    // (n_a * n_b) AS BIGINT) AS d_bp
             |FROM c, t GROUP BY n_a, n_b""".stripMargin)),

    // Gate-agreement kappa (q165): Cohen's κ between two independent
    // keep-gates — the stopword-density heuristic (integer
    // cross-multiply: hits·20 ≥ n_tokens ⟺ ratio ≥ 0.05) and the q149
    // classifier — in EXACT rational arithmetic: κ = (n·agree −
    // Σ marginal products) / (n² − Σ marginal products) emitted as
    // (num, den) plus sign-extracted basis points (κ can be negative;
    // truncating and flooring division disagree there, so the sign is
    // factored out before the positive-operand DIV — the zipf-fit
    // discipline). The agreement audit that tells you whether a cheap
    // heuristic can stand in for a model gate.
    Q("q165_gate_kappa",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val heur = docs.select(col("doc_id"),
          when(TextFunctions.stopwordHits(col("text"), stopwords) * 20 >=
            TextFunctions.tokenCount(col("text")), 1L).otherwise(0L).as("a"))
        val model = docs.transform(LinearModel.linearGate("doc_id", "text", 2000))
          .select(col("doc_id"), col("keep").as("b"))
        heur.join(model, "doc_id")
          .agg(
            sum(col("a") * col("b")).as("n11"),
            sum(col("a") * (lit(1L) - col("b"))).as("n10"),
            sum((lit(1L) - col("a")) * col("b")).as("n01"),
            sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
          .select(col("n11"), col("n10"), col("n01"), col("n00"),
            expr("""(n11+n10+n01+n00) * (n11+n00)
              - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))""").as("kappa_num"),
            expr("""(n11+n10+n01+n00) * (n11+n10+n01+n00)
              - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))""").as("kappa_den"))
          .withColumn("kappa_bp", expr(
            """CASE WHEN kappa_num >= 0
              THEN kappa_num * 10000 DIV kappa_den
              ELSE -((-kappa_num) * 10000 DIV kappa_den) END"""))
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok,
             |    (('0x' || substr(md5('w|' || tok), 1, 12))::BIGINT % 2001)
             |      - 1000 AS w
             |  FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1)
             |  ORDER BY c DESC, tok LIMIT 2000),
             |mdl AS (SELECT tk.doc_id,
             |    CASE WHEN coalesce(sum(v.w), 0) > 0 THEN 1 ELSE 0 END AS b
             |  FROM tk LEFT JOIN v USING (tok) GROUP BY 1),
             |heur AS (SELECT doc_id, CASE WHEN
             |    len(list_filter(w, x -> list_contains(
             |      ['the','a','of','and','to','in'], x))) * 20 >= len(w)
             |    THEN 1 ELSE 0 END AS a
             |  FROM (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w FROM documents)),
             |ct AS (SELECT
             |    CAST(sum(a * b) AS BIGINT) AS n11,
             |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
             |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
             |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
             |  FROM heur JOIN mdl USING (doc_id)),
             |k AS (SELECT n11, n10, n01, n00,
             |    (n11+n10+n01+n00) * (n11+n00)
             |      - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) AS kappa_num,
             |    (n11+n10+n01+n00) * (n11+n10+n01+n00)
             |      - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) AS kappa_den
             |  FROM ct)
             |SELECT n11, n10, n01, n00,
             |  CAST(kappa_num AS BIGINT) AS kappa_num,
             |  CAST(kappa_den AS BIGINT) AS kappa_den,
             |  CAST(CASE WHEN kappa_num >= 0
             |    THEN kappa_num * 10000 // kappa_den
             |    ELSE -((-kappa_num) * 10000 // kappa_den) END
             |    AS BIGINT) AS kappa_bp
             |FROM k""".stripMargin)),

    // Quantized-ranking eval (q166): how much ranking damage does int8
    // compression do? Per query: the exact-cosine top-10 is ground
    // truth, the int8-quantized-cosine top-10 is the run, and the
    // metrics are recall@10, reciprocal rank of the true top-1, and
    // harmonic-discounted cumulative gain (HDCG: discount 27720 DIV
    // (pos+1) — the lcm(2..11) trick keeps the whole eval in EXACT
    // integers where log₂ discounts would hand the hash to libm
    // differences). This is the evaluation a PQ/int8 compression claim
    // owes its users, and it rides the established round4-then-rank
    // determinism contract on both rankings.
    Q("q166_quantized_ranking_eval",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val ideal = Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") < 20), "vec_id", "embedding", 10)
          .select(col("query_id"), col("neighbor_id"), col("rk").as("irk"))
        val z = emb.select(col("vec_id"),
          VectorFunctions.quantizeInt8(col("embedding")).as("zv"))
        val zq = z.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("zv").as("qv"))
        val run = z.select(col("vec_id").as("neighbor_id"), col("zv").as("cv"))
          .crossJoin(broadcast(zq))
          .filter(col("neighbor_id") =!= col("query_id"))
          .withColumn("sim",
            Num.round4(VectorFunctions.cosine(col("qv"), col("cv"))))
          .withColumn("rk", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
          .filter(col("rk") <= 10)
          .select("query_id", "neighbor_id", "rk")
        val perQ = run
          .join(ideal, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(col("irk")).as("n_hits"),
            coalesce(max(when(col("irk") === 1L, expr("10000 DIV rk"))),
              lit(0L)).as("rr_bp"),
            sum(when(col("irk").isNotNull,
              (lit(11L) - col("irk")) * expr("27720 DIV (rk + 1)"))
              .otherwise(0L)).as("hdcg"))
        val idealG = ideal.groupBy("query_id")
          .agg(sum((lit(11L) - col("irk")) *
            expr("27720 DIV (irk + 1)")).as("ihdcg"))
        perQ.join(idealG, "query_id")
          .withColumn("ndcg_bp", expr("hdcg * 10000 DIV ihdcg"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
             |  FROM embeddings),
             |ex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    round(list_dot_product(q.v, c.v) /
             |      (sqrt(list_dot_product(q.v, q.v))
             |        * sqrt(list_dot_product(c.v, c.v))), 4) + 0.0 AS sim
             |  FROM e q, e c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
             |ideal AS (SELECT query_id, neighbor_id, rk AS irk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY sim DESC, neighbor_id) AS rk FROM ex)
             |  WHERE rk <= 10),
             |z AS (SELECT vec_id,
             |    CASE WHEN mx = 0
             |      THEN list_transform(v, x -> CAST(0 AS DOUBLE))
             |      ELSE list_transform(v,
             |        x -> CAST(CAST(round(x * 127.0 / mx) AS BIGINT)
             |          AS DOUBLE)) END AS zv
             |  FROM (SELECT vec_id, v,
             |    list_max(list_transform(v, x -> abs(x))) AS mx FROM e)),
             |zc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    round(list_dot_product(q.zv, c.zv) /
             |      (sqrt(list_dot_product(q.zv, q.zv))
             |        * sqrt(list_dot_product(c.zv, c.zv))), 4) + 0.0 AS sim
             |  FROM z q, z c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
             |run AS (SELECT query_id, neighbor_id, rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY sim DESC, neighbor_id) AS rk FROM zc)
             |  WHERE rk <= 10),
             |j AS (SELECT run.query_id, run.rk, ideal.irk FROM run
             |  LEFT JOIN ideal USING (query_id, neighbor_id)),
             |pq AS (SELECT query_id, count(irk) AS n_hits,
             |    coalesce(max(CASE WHEN irk = 1 THEN 10000 // rk END), 0)
             |      AS rr_bp,
             |    sum(CASE WHEN irk IS NOT NULL
             |      THEN (11 - irk) * (27720 // (rk + 1)) ELSE 0 END) AS hdcg
             |  FROM j GROUP BY 1),
             |ig AS (SELECT query_id,
             |    sum((11 - irk) * (27720 // (irk + 1))) AS ihdcg
             |  FROM ideal GROUP BY 1)
             |SELECT pq.query_id, CAST(n_hits AS BIGINT) AS n_hits,
             |  CAST(rr_bp AS BIGINT) AS rr_bp,
             |  CAST(hdcg AS BIGINT) AS hdcg,
             |  CAST(ihdcg AS BIGINT) AS ihdcg,
             |  CAST(hdcg * 10000 // ihdcg AS BIGINT) AS ndcg_bp
             |FROM pq JOIN ig USING (query_id)""".stripMargin)),

    // Classifier ranking quality (q167): exact tie-aware ROC AUC of the
    // q149 linear classifier's integer score against the stopword
    // heuristic's accept label, via Mann–Whitney in EXACT integer
    // arithmetic (auc_num = 2U, auc_den = 2·n₁·n₀ — doubling clears
    // the tie ½, so there is no float or rank-convention surface).
    // q165's κ scores the binarized gate; this scores the whole
    // ordering — the threshold-free number that tells you whether the
    // classifier could REPLACE the heuristic at some cutoff, before
    // committing to one. Score-grain staging: the corpus touches one
    // aggregate; the cumulative window runs over the score domain.
    Q("q167_classifier_auc",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val heur = docs.select(col("doc_id"),
          when(TextFunctions.stopwordHits(col("text"), stopwords) * 20 >=
            TextFunctions.tokenCount(col("text")), 1L).otherwise(0L).as("y"))
        val scored = docs
          .transform(LinearModel.linearGate("doc_id", "text", 2000))
          .select(col("doc_id"), col("score_q3"))
        Stats.aucExact(scored.join(heur, "doc_id"), "score_q3", "y")
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok,
             |    (('0x' || substr(md5('w|' || tok), 1, 12))::BIGINT % 2001)
             |      - 1000 AS w
             |  FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1)
             |  ORDER BY c DESC, tok LIMIT 2000),
             |sc AS (SELECT tk.doc_id,
             |    CAST(coalesce(sum(v.w), 0) AS BIGINT) AS s
             |  FROM tk LEFT JOIN v USING (tok) GROUP BY 1),
             |heur AS (SELECT doc_id, CASE WHEN
             |    len(list_filter(w, x -> list_contains(
             |      ['the','a','of','and','to','in'], x))) * 20 >= len(w)
             |    THEN 1 ELSE 0 END AS y
             |  FROM (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w FROM documents)),
             |ps AS (SELECT s, sum(y) AS c1, count(*) - sum(y) AS c0
             |  FROM sc JOIN heur USING (doc_id) GROUP BY 1),
             |cw AS (SELECT s, c1, c0,
             |    coalesce(sum(c0) OVER (ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS cum0
             |  FROM ps),
             |ag AS (SELECT CAST(sum(c1) AS BIGINT) AS n_pos,
             |    CAST(sum(c0) AS BIGINT) AS n_neg,
             |    CAST(sum(c1 * (2 * cum0 + c0)) AS BIGINT) AS auc_num
             |  FROM cw)
             |SELECT n_pos, n_neg, auc_num,
             |  CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
             |  CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
             |    ELSE auc_num * 10000 // (2 * n_pos * n_neg) END
             |    AS BIGINT) AS auc_bp
             |FROM ag""".stripMargin)),

    // Privacy audit (q168): k-anonymity / l-diversity over the corpus
    // metadata — quasi-identifiers (source, n_chars DIV 100), sensitive
    // attribute lang. q78 redacts direct identifiers from TEXT; this
    // measures what the per-document ATTRIBUTES still leak: a class
    // smaller than k=5 pins its members to class_size candidates for
    // anyone who knows (source, length band); a class with one lang
    // leaks the language even when large (homogeneity). Per-class rows
    // plus the global (total_rows, at_risk_rows, risk_bp) audit — all
    // exact integers; one corpus-grain aggregate, everything else over
    // the QI-domain-sized class table.
    Q("q168_k_anonymity",
      (s, d) => Privacy.kAnonymity(
        Tables.documents(s, d)
          .withColumn("len_bucket", expr("n_chars DIV 100")),
        Seq("source", "len_bucket"), "lang", k = 5),
      Some("""WITH c AS (SELECT source, n_chars // 100 AS len_bucket,
             |    count(*) AS class_size,
             |    count(DISTINCT lang) AS n_sensitive
             |  FROM documents GROUP BY 1, 2),
             |g AS (SELECT CAST(sum(class_size) AS BIGINT) AS total_rows,
             |    CAST(coalesce(sum(CASE WHEN class_size < 5
             |      THEN class_size END), 0) AS BIGINT) AS at_risk_rows
             |  FROM c)
             |SELECT source, CAST(len_bucket AS BIGINT) AS len_bucket,
             |  CAST(class_size AS BIGINT) AS class_size,
             |  CAST(n_sensitive AS BIGINT) AS n_sensitive,
             |  CAST(CASE WHEN class_size >= 5 THEN 1 ELSE 0 END
             |    AS BIGINT) AS k_ok,
             |  CAST(CASE WHEN n_sensitive >= 2 THEN 1 ELSE 0 END
             |    AS BIGINT) AS l_ok,
             |  total_rows, at_risk_rows,
             |  CAST(at_risk_rows * 10000 // total_rows AS BIGINT) AS risk_bp
             |FROM c, g""".stripMargin)),

    // Duplicated spans (q169): the maximal runs of corpus-duplicated
    // 5-token windows inside each document — substring-level dedup's
    // reporting half (Lee et al. remove exactly these spans; q72/q93
    // drop them at chunk granularity). Islands merging (pos −
    // row_number constant on a run) turns a copied paragraph into ONE
    // (start, length) span instead of fifty overlapping grams. Windows
    // are md5-fingerprinted before any Exchange — the count groups
    // fingerprints, the probe moves (fp, id, pos), never text.
    Q("q169_dup_spans",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.dupSpans("doc_id", "text", 5)),
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w
             |  FROM documents),
             |ge AS (SELECT doc_id,
             |    unnest(list_transform(range(greatest(len(w) - 4, 0)),
             |      i -> struct_pack(pos := i,
             |        h := md5(array_to_string(w[i+1 : i+5], ' '))))) AS s
             |  FROM tk),
             |g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.h AS h
             |  FROM ge),
             |dup AS (SELECT h FROM g GROUP BY 1 HAVING count(*) > 1),
             |hit AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
             |isl AS (SELECT doc_id, pos,
             |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
             |      AS grp
             |  FROM hit)
             |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             |  CAST(max(pos) - min(pos) + 5 AS BIGINT) AS span_ntokens
             |FROM isl GROUP BY doc_id, grp""".stripMargin)),

    // Vocabulary growth curve (q170): Heaps' law read at 10-document
    // checkpoints — cumulative distinct tokens vs cumulative tokens in
    // ingestion order, the scaling curve a vocab-size decision
    // extrapolates from (linear growth = unbounded churn / tokenizer
    // poison; early flattening = heavy repetition). Cumulative-distinct
    // doesn't decompose into windows; the scalable form is
    // first-occurrence attribution (+1 exactly at each token's min-id
    // document) with the running sum over the bucket grain.
    Q("q170_vocab_growth",
      (s, d) => Tables.documents(s, d)
        .transform(VocabStats.vocabGrowth("doc_id", "text", 10)),
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |nv AS (SELECT first_doc // 10 AS bucket, count(*) AS nw
             |  FROM (SELECT tok, min(doc_id) AS first_doc FROM tk
             |    GROUP BY 1) GROUP BY 1),
             |tb AS (SELECT doc_id // 10 AS bucket, count(*) AS nt
             |  FROM tk GROUP BY 1),
             |db AS (SELECT doc_id // 10 AS bucket, count(*) AS nd
             |  FROM documents GROUP BY 1)
             |SELECT CAST(db.bucket AS BIGINT) AS bucket,
             |  CAST(sum(nd) OVER (ORDER BY db.bucket) AS BIGINT)
             |    AS docs_so_far,
             |  CAST(sum(coalesce(nt, 0)) OVER (ORDER BY db.bucket)
             |    AS BIGINT) AS cum_tokens,
             |  CAST(sum(coalesce(nw, 0)) OVER (ORDER BY db.bucket)
             |    AS BIGINT) AS cum_vocab
             |FROM db LEFT JOIN tb USING (bucket)
             |  LEFT JOIN nv USING (bucket)""".stripMargin)),

    // PR threshold sweep (q171): the cutoff-selection table beside
    // q167's threshold-free AUC — one row per distinct classifier
    // score, with confusion counts and basis-point precision / recall
    // / F1 of "keep iff score ≥ thresh", all exact integers (tp/fp =
    // descending cumulative class counts; F1 = 2·tp·10⁴ DIV
    // (2·tp+fp+fn)). AUC says the ordering is good; this is where you
    // pick the operating point and read what it costs in kept spam
    // (fp) vs dropped quality (fn).
    Q("q171_pr_curve",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val heur = docs.select(col("doc_id"),
          when(TextFunctions.stopwordHits(col("text"), stopwords) * 20 >=
            TextFunctions.tokenCount(col("text")), 1L).otherwise(0L).as("y"))
        val scored = docs
          .transform(LinearModel.linearGate("doc_id", "text", 2000))
          .select(col("doc_id"), col("score_q3"))
        Stats.prCurve(scored.join(heur, "doc_id"), "score_q3", "y")
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok,
             |    (('0x' || substr(md5('w|' || tok), 1, 12))::BIGINT % 2001)
             |      - 1000 AS w
             |  FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1)
             |  ORDER BY c DESC, tok LIMIT 2000),
             |sc AS (SELECT tk.doc_id,
             |    CAST(coalesce(sum(v.w), 0) AS BIGINT) AS s
             |  FROM tk LEFT JOIN v USING (tok) GROUP BY 1),
             |heur AS (SELECT doc_id, CASE WHEN
             |    len(list_filter(w, x -> list_contains(
             |      ['the','a','of','and','to','in'], x))) * 20 >= len(w)
             |    THEN 1 ELSE 0 END AS y
             |  FROM (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w FROM documents)),
             |ps AS (SELECT s AS thresh, sum(y) AS c1,
             |    count(*) - sum(y) AS c0
             |  FROM sc JOIN heur USING (doc_id) GROUP BY 1),
             |cw AS (SELECT thresh,
             |    sum(c1) OVER (ORDER BY thresh DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             |    sum(c0) OVER (ORDER BY thresh DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
             |    sum(c1) OVER () AS n_pos, sum(c0) OVER () AS n_neg
             |  FROM ps)
             |SELECT thresh, CAST(tp AS BIGINT) AS tp,
             |  CAST(fp AS BIGINT) AS fp,
             |  CAST(n_pos - tp AS BIGINT) AS fn,
             |  CAST(n_neg - fp AS BIGINT) AS tn,
             |  CAST(tp * 10000 // (tp + fp) AS BIGINT) AS precision_bp,
             |  CAST(CASE WHEN n_pos = 0 THEN NULL
             |    ELSE tp * 10000 // n_pos END AS BIGINT) AS recall_bp,
             |  CAST(2 * tp * 10000 // (2 * tp + fp + (n_pos - tp))
             |    AS BIGINT) AS f1_bp
             |FROM cw""".stripMargin)),

    // Winnowing fingerprints (q172): the MOSS document signature
    // (Schleimer et al. 2003) — min-hash-per-window selection over
    // 3-gram hashes at w=4, guaranteeing any shared ≥6-token substring
    // contributes one identical fingerprint to both docs at ~2/(w+1)
    // density. q169 reports exact duplicated runs; this is the bounded
    // sketch you inverted-index at corpus scale. Argmin = smallest
    // (hash, pos) encoded as ONE integer key (40 md5 bits · 2²³ + pos)
    // so both engines compare identical BIGINTs — no tie surface.
    // Every row carries `truncated` (gram count > 2²³ — megadoc tail
    // coverage loss made visible; constant-false at fixture scale but
    // computed by BOTH engines, so the flag itself is hash-gated).
    Q("q172_winnow_fingerprints",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.winnowFingerprints("doc_id", "text", 3, 4)),
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w
             |  FROM documents),
             |ge AS (SELECT doc_id,
             |    unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |      i -> struct_pack(pos := i,
             |        h := ('0x' || substr(md5(
             |          array_to_string(w[i+1 : i+3], ' ')), 1, 10))
             |          ::BIGINT))) AS s
             |  FROM tk),
             |g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos,
             |    s.h * 8388608 + s.pos AS key
             |  FROM ge WHERE s.pos < 8388608),
             |mw AS (SELECT doc_id, pos,
             |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
             |    max(pos) OVER (PARTITION BY doc_id) AS last
             |  FROM g)
             |SELECT DISTINCT mw.doc_id,
             |  CAST(mn // 8388608 AS BIGINT) AS fp,
             |  CAST(mn % 8388608 AS BIGINT) AS fp_pos,
             |  tr.truncated
             |FROM mw JOIN (SELECT doc_id,
             |    CAST(len(w) AS BIGINT) - 2 > 8388608 AS truncated
             |  FROM tk WHERE len(w) >= 3) tr ON tr.doc_id = mw.doc_id
             |WHERE pos <= last - 3""".stripMargin)),

    // Winnow overlap pairs (q173): the MOSS pipeline end-to-end —
    // sketch (q172) → df-capped inverted index → candidate pairs with
    // the shared-fingerprint count and the containment-convention
    // overlap fraction (vs the SMALLER sketch, so excerpts still
    // fire). Does the q26 job at sketch density: only selected
    // fingerprints reach the pair join. All exact integers.
    Q("q173_winnow_overlap_pairs",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.winnowOverlapPairs("doc_id", "text", 3, 4, 2, 1000L)),
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w
             |  FROM documents),
             |ge AS (SELECT doc_id,
             |    unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |      i -> struct_pack(pos := i,
             |        h := ('0x' || substr(md5(
             |          array_to_string(w[i+1 : i+3], ' ')), 1, 10))
             |          ::BIGINT))) AS s
             |  FROM tk),
             |g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos,
             |    s.h * 8388608 + s.pos AS key
             |  FROM ge WHERE s.pos < 8388608),
             |mw AS (SELECT doc_id, pos,
             |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
             |    max(pos) OVER (PARTITION BY doc_id) AS last
             |  FROM g),
             |fps AS (SELECT DISTINCT doc_id AS doc,
             |    CAST(mn // 8388608 AS BIGINT) AS fp
             |  FROM mw WHERE pos <= last - 3),
             |keep AS (SELECT fp FROM fps GROUP BY 1
             |  HAVING count(*) <= 1000),
             |sz AS (SELECT doc, count(*) AS sz FROM fps GROUP BY 1),
             |idx AS (SELECT doc, fps.fp FROM fps JOIN keep USING (fp)),
             |pr AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
             |    count(*) AS n_shared
             |  FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc < b.doc
             |  GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
             |  CAST(sa.sz AS BIGINT) AS n_a, CAST(sb.sz AS BIGINT) AS n_b,
             |  CAST(n_shared * 10000 // least(sa.sz, sb.sz) AS BIGINT)
             |    AS overlap_bp
             |FROM pr JOIN sz sa ON pr.doc_a = sa.doc
             |  JOIN sz sb ON pr.doc_b = sb.doc""".stripMargin)),

    // Length-bias audit (q174): exact Pearson correlation between the
    // q149 classifier's integer score and document length — r² in
    // signed basis points plus the exact rational pieces. Length bias
    // is the canonical quality-classifier failure mode (the model
    // learns "long = good"); a corr far from 0 means the gate is
    // substantially a length proxy and the curation it drives skews
    // the corpus length distribution. r² avoids the square root, the
    // sign is factored out before the positive-operand DIV, and the
    // arithmetic rides decimal/HUGEINT so r_num² stays exact.
    Q("q174_score_length_bias",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = docs
          .transform(LinearModel.linearGate("doc_id", "text", 2000))
          .select(col("doc_id"), col("score_q3"))
        Stats.corrExact(
          scored.join(docs.select(col("doc_id"), col("n_chars")), "doc_id"),
          "score_q3", "n_chars")
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok,
             |    (('0x' || substr(md5('w|' || tok), 1, 12))::BIGINT % 2001)
             |      - 1000 AS w
             |  FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1)
             |  ORDER BY c DESC, tok LIMIT 2000),
             |sc AS (SELECT tk.doc_id,
             |    CAST(coalesce(sum(v.w), 0) AS BIGINT) AS x
             |  FROM tk LEFT JOIN v USING (tok) GROUP BY 1),
             |j AS (SELECT x, n_chars AS y FROM sc
             |  JOIN documents USING (doc_id)),
             |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
             |  FROM j),
             |dd AS (SELECT n, n*sxy - sx*sy AS num,
             |    n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
             |  FROM m)
             |SELECT CAST(n AS BIGINT) AS n, CAST(num AS BIGINT) AS r_num,
             |  CAST(dx AS BIGINT) AS r_den_x, CAST(dy AS BIGINT) AS r_den_y,
             |  CAST(CASE WHEN dx = 0 OR dy = 0 THEN NULL
             |    WHEN num >= 0 THEN (num*num*10000) // (dx*dy)
             |    ELSE -((num*num*10000) // (dx*dy)) END AS BIGINT) AS r2_bp
             |FROM dd""".stripMargin)),

    // Source homogeneity (q175): Pearson chi² of the language mix
    // across sources with Cramér's V² in basis points — the
    // distribution-level audit beside q160's cell-level confusion
    // matrix: a single number that says whether sources draw from the
    // same language distribution (V² ≈ 0) or some source has drifted
    // (V² ≫ 0), independent of corpus size where raw χ² grows with N.
    // Every cell's (O−E)²/E is computed with the expectation
    // cross-multiplied away and one deterministic floor division.
    Q("q175_source_lang_chi2",
      (s, d) => Stats.chi2Homogeneity(
        Tables.documents(s, d), "source", "lang"),
      Some("""WITH obs AS (SELECT source AS r, lang AS c, count(*) AS o
             |  FROM documents GROUP BY 1, 2),
             |rt AS (SELECT r, sum(o) AS rt FROM obs GROUP BY 1),
             |ct AS (SELECT c, sum(o) AS ct FROM obs GROUP BY 1),
             |tot AS (SELECT sum(o) AS n FROM obs),
             |dims AS (SELECT (SELECT count(*) FROM rt) AS n_rows,
             |    (SELECT count(*) FROM ct) AS n_cols),
             |grid AS (SELECT rt.r, ct.c, rt.rt, ct.ct,
             |    coalesce(obs.o, 0) AS o
             |  FROM rt CROSS JOIN ct
             |  LEFT JOIN obs ON obs.r = rt.r AND obs.c = ct.c),
             |cells AS (SELECT
             |    ((o::HUGEINT * n - rt::HUGEINT * ct)
             |     * (o::HUGEINT * n - rt::HUGEINT * ct)
             |     * 10000) // (rt::HUGEINT * ct * n) AS term_bp, n
             |  FROM grid, tot),
             |agg AS (SELECT n, sum(term_bp) AS chi2_bp FROM cells
             |  GROUP BY n)
             |SELECT CAST(n AS BIGINT) AS n,
             |  CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_cols AS BIGINT) AS n_cols,
             |  CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
             |  CAST(chi2_bp AS BIGINT) AS chi2_bp,
             |  CAST(CASE WHEN n_rows < 2 OR n_cols < 2 THEN NULL
             |    ELSE chi2_bp // (n * least(n_rows - 1, n_cols - 1)) END
             |    AS BIGINT) AS v2_bp
             |FROM agg, dims""".stripMargin)),

    // Incremental near-dup probe (q176): the winnow family's serving
    // half — the NEWER half of the corpus (the q74 cut convention)
    // probed against the OLDER half's sketch index: "is this incoming
    // document substantially already in the corpus?" Winnowing is
    // doc-local, so the corpus is sketched ONCE and split by the cut;
    // the df cap comes from the base (the standing corpus defines
    // boilerplate), bounding the probe at O(|probe sketch|·maxDf)
    // however large the base. Probe-intra-probe pairs deliberately
    // absent (intra-batch dedup is q173 on the batch). The streaming
    // twin (CorpusStream.nearDupProbe) runs this exact code per
    // micro-batch against a frozen base sketch.
    Q("q176_winnow_probe",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val cut = docs.agg((max("doc_id") / lit(2.0)).as("__cut"))
        val fps = graft.ops.Staged.stage(
          Dedup.winnowFingerprints("doc_id", "text", 3, 4)(docs)
            .select(col("doc_id").as("doc"), col("fp"))
            .crossJoin(broadcast(cut)))
        Dedup.sketchProbePairs(2, 1000L)(
          fps.filter(col("doc") <= col("__cut")).select("doc", "fp"),
          fps.filter(col("doc") > col("__cut")).select("doc", "fp"))
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w
             |  FROM documents),
             |ge AS (SELECT doc_id,
             |    unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |      i -> struct_pack(pos := i,
             |        h := ('0x' || substr(md5(
             |          array_to_string(w[i+1 : i+3], ' ')), 1, 10))
             |          ::BIGINT))) AS s
             |  FROM tk),
             |g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos,
             |    s.h * 8388608 + s.pos AS key
             |  FROM ge WHERE s.pos < 8388608),
             |mw AS (SELECT doc_id, pos,
             |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
             |    max(pos) OVER (PARTITION BY doc_id) AS last
             |  FROM g),
             |fps AS (SELECT DISTINCT doc_id AS doc,
             |    CAST(mn // 8388608 AS BIGINT) AS fp
             |  FROM mw WHERE pos <= last - 3),
             |cut AS (SELECT max(doc_id) / 2.0 AS cut FROM documents),
             |base AS (SELECT doc, fp FROM fps, cut WHERE doc <= cut),
             |probe AS (SELECT doc, fp FROM fps, cut WHERE doc > cut),
             |keep AS (SELECT fp FROM base GROUP BY 1
             |  HAVING count(*) <= 1000),
             |bsz AS (SELECT doc, count(*) AS n_base FROM base GROUP BY 1),
             |psz AS (SELECT doc, count(*) AS n_probe FROM probe GROUP BY 1),
             |pr AS (SELECT p.doc AS probe_id, b.doc AS base_id,
             |    count(*) AS n_shared
             |  FROM probe p JOIN base b ON p.fp = b.fp
             |  JOIN keep k ON b.fp = k.fp
             |  GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT probe_id, base_id,
             |  CAST(n_shared AS BIGINT) AS n_shared,
             |  CAST(psz.n_probe AS BIGINT) AS n_probe,
             |  CAST(bsz.n_base AS BIGINT) AS n_base,
             |  CAST(n_shared * 10000 // least(psz.n_probe, bsz.n_base)
             |    AS BIGINT) AS overlap_bp
             |FROM pr JOIN psz ON pr.probe_id = psz.doc
             |  JOIN bsz ON pr.base_id = bsz.doc""".stripMargin)),

    // Dedup-recall harness (q177): q50's measurement discipline applied
    // to the NEAR-DUP family — the md5 MinHash+LSH pair set (q91's
    // pipeline, est ≥ 0.3) scored against exact-Jaccard truth (q26's
    // pipeline, jaccard ≥ 0.3): n_truth / n_run / n_tp and basis-point
    // precision/recall. This is the number a dedup deployment owes
    // before trusting the sketch: LSH trades recall for never running
    // the full pair join, and the trade should be MEASURED, not
    // assumed. Both sides ride their established oracle-exact paths,
    // so the whole eval hash-checks end to end.
    Q("q177_lsh_dedup_recall",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val truth = Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.3)(docs)
          .select("doc_a", "doc_b")
        val run = Dedup.minhashLshPairsMd5("doc_id", "text", 3, 32, 4, 0.3)(docs)
          .select("doc_a", "doc_b")
        val nT = truth.agg(count(lit(1)).as("n_truth"))
        val nR = run.agg(count(lit(1)).as("n_run"))
        val nTp = truth.join(run, Seq("doc_a", "doc_b"))
          .agg(count(lit(1)).as("n_tp"))
        nT.crossJoin(broadcast(nR)).crossJoin(broadcast(nTp))
          .select(col("n_truth"), col("n_run"), col("n_tp"),
            expr("CASE WHEN n_run = 0 THEN NULL ELSE n_tp * 10000 DIV n_run END")
              .as("precision_bp"),
            expr("CASE WHEN n_truth = 0 THEN NULL ELSE n_tp * 10000 DIV n_truth END")
              .as("recall_bp"))
      },
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |    FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |truth AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.3),
             |sig AS (SELECT doc, p, min(md5(p::VARCHAR || '|' || shingle)) AS h
             |  FROM sh CROSS JOIN range(32) t(p) GROUP BY doc, p),
             |buck AS (SELECT doc, p // 4 AS band,
             |    md5(string_agg(h, '|' ORDER BY p)) AS bucket
             |  FROM sig GROUP BY doc, p // 4),
             |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
             |  FROM buck a JOIN buck b
             |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc),
             |run AS (SELECT doc_a, doc_b FROM (SELECT doc_a, doc_b,
             |    round(sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) / 32.0, 4)
             |      AS est
             |  FROM cand JOIN sig sa ON sa.doc = cand.doc_a
             |            JOIN sig sb ON sb.doc = cand.doc_b AND sb.p = sa.p
             |  GROUP BY doc_a, doc_b) WHERE est >= 0.3),
             |ct AS (SELECT (SELECT count(*) FROM truth) AS n_truth,
             |    (SELECT count(*) FROM run) AS n_run,
             |    (SELECT count(*) FROM truth JOIN run USING (doc_a, doc_b))
             |      AS n_tp)
             |SELECT CAST(n_truth AS BIGINT) AS n_truth,
             |  CAST(n_run AS BIGINT) AS n_run,
             |  CAST(n_tp AS BIGINT) AS n_tp,
             |  CAST(CASE WHEN n_run = 0 THEN NULL
             |    ELSE n_tp * 10000 // n_run END AS BIGINT) AS precision_bp,
             |  CAST(CASE WHEN n_truth = 0 THEN NULL
             |    ELSE n_tp * 10000 // n_truth END AS BIGINT) AS recall_bp
             |FROM ct""".stripMargin)),

    // Robust per-source length stats (q178): exact LOWER-median and
    // MAD of n_chars per source — the outlier-immune audit beside the
    // mean (one megabyte blob moves a mean arbitrarily, a median by at
    // most one order statistic). Lower median = order statistic
    // ⌈n/2⌉: always an observed value, always an integer, no midpoint
    // averaging to float. One (source, value) corpus aggregate; both
    // median passes window the value-domain table; the deviation pass
    // regroups the SAME staged counts, never rows.
    Q("q178_robust_length_stats",
      (s, d) => Stats.robustStats(
        Tables.documents(s, d), "source", "n_chars"),
      Some("""WITH c AS (SELECT source AS g, n_chars AS v, count(*) AS c
             |  FROM documents GROUP BY 1, 2),
             |m0 AS (SELECT g, v, c,
             |    sum(c) OVER (PARTITION BY g ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    sum(c) OVER (PARTITION BY g) AS n
             |  FROM c),
             |med AS (SELECT g, min(v) AS median, max(n) AS n FROM m0
             |  WHERE cum * 2 >= n GROUP BY g),
             |dv AS (SELECT c.g, abs(c.v - med.median) AS v,
             |    sum(c.c) AS c
             |  FROM c JOIN med USING (g) GROUP BY 1, 2),
             |m1 AS (SELECT g, v,
             |    sum(c) OVER (PARTITION BY g ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    sum(c) OVER (PARTITION BY g) AS n
             |  FROM dv),
             |mad AS (SELECT g, min(v) AS mad FROM m1
             |  WHERE cum * 2 >= n GROUP BY g)
             |SELECT med.g AS source, CAST(med.n AS BIGINT) AS n,
             |  CAST(median AS BIGINT) AS median, CAST(mad AS BIGINT) AS mad
             |FROM med JOIN mad USING (g)""".stripMargin)),

    // Gate attribution (q179): per source, how many documents each
    // quality gate would drop — and crucially the SOLE-drop counts
    // (failed exactly that gate), which is the number that says what
    // loosening one gate actually buys back; total-drop columns
    // double-count docs failing several gates and n_multi makes the
    // overlap explicit. Gates reuse the live predicates: the
    // pipeline's min-token cut, langIdFromTokens == 'und', the
    // repetition cut as an integer cross-multiply (2·distinct <
    // tokens — no rounded fraction in the decision), and the q78 PII
    // detectors on the q78 injection corpus so the PII column is
    // non-degenerate. One corpus pass, one aggregate.
    Q("q179_gate_attribution",
      (s, d) => {
        val injected = Tables.documents(s, d).withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or call +1-555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
            .otherwise(col("text")))
        val flagged = injected
          .withColumn("__w", TextFunctions.tokens(col("text")))
          .select(col("source"),
            when(size(col("__w")) < 5, 1L).otherwise(0L).as("g_short"),
            when(TextFunctions.langIdFromTokens(col("__w")) === "und", 1L)
              .otherwise(0L).as("g_lang"),
            when(size(array_distinct(col("__w"))) * 2 < size(col("__w")), 1L)
              .otherwise(0L).as("g_rep"),
            when(TextFunctions.emailCount(col("text")) +
              TextFunctions.phoneCount(col("text")) > 0, 1L)
              .otherwise(0L).as("g_pii"))
          .withColumn("__nf",
            col("g_short") + col("g_lang") + col("g_rep") + col("g_pii"))
        flagged.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("g_short").as("drop_short"),
          sum("g_lang").as("drop_lang"),
          sum("g_rep").as("drop_rep"),
          sum("g_pii").as("drop_pii"),
          sum(when(col("__nf") === 1L && col("g_short") === 1L, 1L)
            .otherwise(0L)).as("sole_short"),
          sum(when(col("__nf") === 1L && col("g_lang") === 1L, 1L)
            .otherwise(0L)).as("sole_lang"),
          sum(when(col("__nf") === 1L && col("g_rep") === 1L, 1L)
            .otherwise(0L)).as("sole_rep"),
          sum(when(col("__nf") === 1L && col("g_pii") === 1L, 1L)
            .otherwise(0L)).as("sole_pii"),
          sum(when(col("__nf") === 0L, 1L).otherwise(0L)).as("n_clean"),
          sum(when(col("__nf") >= 2L, 1L).otherwise(0L)).as("n_multi"))
      },
      Some("""WITH inj AS (SELECT source, doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN text || ' contact user'
             |    || cast(doc_id AS VARCHAR) || '@example.com or call +1-555-'
             |    || lpad(cast(doc_id % 10000 AS VARCHAR), 4, '0')
             |  ELSE text END AS text FROM documents),
             |tk AS (SELECT source, text,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w
             |  FROM inj),
             |fl AS (SELECT source,
             |  CASE WHEN len(w) < 5 THEN 1 ELSE 0 END AS g_short,
             |  CASE WHEN greatest(
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))),
             |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))),
             |    len(list_filter(w, x -> list_contains(['el','la','de','que','y','los','una'], x))),
             |    len(list_filter(w, x -> list_contains(['le','la','les','des','et','est','une'], x)))) = 0
             |    THEN 1 ELSE 0 END AS g_lang,
             |  CASE WHEN len(list_distinct(w)) * 2 < len(w)
             |    THEN 1 ELSE 0 END AS g_rep,
             |  CASE WHEN len(regexp_extract_all(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |    + len(regexp_extract_all(text, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}'))
             |    > 0 THEN 1 ELSE 0 END AS g_pii
             |  FROM tk),
             |nf AS (SELECT *, g_short + g_lang + g_rep + g_pii AS k FROM fl)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(g_short) AS BIGINT) AS drop_short,
             |  CAST(sum(g_lang) AS BIGINT) AS drop_lang,
             |  CAST(sum(g_rep) AS BIGINT) AS drop_rep,
             |  CAST(sum(g_pii) AS BIGINT) AS drop_pii,
             |  CAST(sum(CASE WHEN k = 1 AND g_short = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS sole_short,
             |  CAST(sum(CASE WHEN k = 1 AND g_lang = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS sole_lang,
             |  CAST(sum(CASE WHEN k = 1 AND g_rep = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS sole_rep,
             |  CAST(sum(CASE WHEN k = 1 AND g_pii = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS sole_pii,
             |  CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_clean,
             |  CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_multi
             |FROM nf GROUP BY source""".stripMargin)),

    // Corpus concentration (q180): exact Gini of character mass across
    // documents — 0 = every document the same size, →1 = a few
    // megadocs hold everything. The skew read that decides whether
    // length-stratified sampling / packing is worth building before
    // training. Computed from the value histogram (ties by rank-block
    // construction, no per-row rank window): one corpus aggregate, a
    // value-domain cumulative window, exact rational + basis points.
    Q("q180_length_gini",
      (s, d) => Stats.giniExact(Tables.documents(s, d), "n_chars"),
      Some("""WITH c AS (SELECT n_chars AS v, count(*) AS c
             |  FROM documents GROUP BY 1),
             |cw AS (SELECT v, c,
             |    coalesce(sum(c) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS cp
             |  FROM c),
             |ag AS (SELECT sum(c)::HUGEINT AS n,
             |    sum(v::HUGEINT * c)::HUGEINT AS t,
             |    sum(v::HUGEINT * (c::HUGEINT * cp * 2 + c::HUGEINT * (c + 1)))
             |      ::HUGEINT AS s2
             |  FROM cw)
             |SELECT CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS total,
             |  CAST(s2 - (n + 1) * t AS BIGINT) AS gini_num,
             |  CAST(n * t AS BIGINT) AS gini_den,
             |  CAST(CASE WHEN t = 0 THEN NULL
             |    ELSE ((s2 - (n + 1) * t) * 10000) // (n * t) END
             |    AS BIGINT) AS gini_bp
             |FROM ag""".stripMargin)),

    // Split-contamination certificate (q181): does the train/test
    // split itself leak? — every 8-token window of every test doc
    // checked for presence anywhere in train, reported as the count of
    // contaminated test docs, shared fingerprints, and basis points.
    // q63 decontaminates against an EXTERNAL eval suite; this audits
    // the INTERNAL split a release ships with — hash-random splits
    // leak by construction whenever near-dups exist (the q108
    // cluster-split's whole reason to exist), and this is the query
    // that proves or disproves it for a given corpus. Windows are
    // md5-fingerprinted before any Exchange; the cross-split probe is
    // fp-grain and df-capped.
    Q("q181_split_contamination",
      (s, d) => Sampling.splitByHash(
          Tables.documents(s, d).select("doc_id", "text"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .transform(Dedup.splitContamination("split", "doc_id", "text", 8, 1000L)),
      Some("""WITH sp AS (SELECT doc_id, text,
             |  CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cd'
             |    THEN 'train'
             |  WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6'
             |    THEN 'val' ELSE 'test' END AS split
             |  FROM documents),
             |tk AS (SELECT doc_id, split,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w
             |  FROM sp),
             |fp AS (SELECT doc_id, split,
             |    unnest(list_distinct(list_transform(
             |      range(greatest(len(w) - 7, 0)),
             |      i -> md5(array_to_string(w[i+1 : i+8], ' '))))) AS fp
             |  FROM tk WHERE len(w) >= 8),
             |keep AS (SELECT fp FROM (SELECT fp,
             |    count(DISTINCT doc_id) AS df FROM fp GROUP BY 1)
             |  WHERE df <= 1000),
             |idx AS (SELECT doc_id, split, fp.fp FROM fp
             |  JOIN keep USING (fp)),
             |tr AS (SELECT DISTINCT fp FROM idx WHERE split = 'train'),
             |hits AS (SELECT idx.doc_id, idx.fp FROM idx
             |  JOIN tr USING (fp) WHERE split = 'test'),
             |ct AS (SELECT
             |    (SELECT count(*) FROM sp WHERE split = 'train') AS n_train,
             |    (SELECT count(*) FROM sp WHERE split = 'test') AS n_test,
             |    (SELECT count(DISTINCT doc_id) FROM hits)
             |      AS n_test_contaminated,
             |    (SELECT count(DISTINCT fp) FROM hits) AS n_shared_fps)
             |SELECT CAST(n_train AS BIGINT) AS n_train,
             |  CAST(n_test AS BIGINT) AS n_test,
             |  CAST(n_test_contaminated AS BIGINT) AS n_test_contaminated,
             |  CAST(n_shared_fps AS BIGINT) AS n_shared_fps,
             |  CAST(CASE WHEN n_test = 0 THEN NULL
             |    ELSE n_test_contaminated * 10000 // n_test END AS BIGINT)
             |    AS contamination_bp
             |FROM ct""".stripMargin)),

    // Duplicate-cluster size histogram (q182): the "what will dedup
    // actually save" distribution — one row per cluster size k with
    // the number of clusters, member docs, and removable docs (k−1
    // each, keep-one-per-cluster), plus the global dup-mass audit
    // (total_docs, total_removable, dup_mass_bp) broadcast onto every
    // row. A corpus where savings sit in two giant clusters needs a
    // different plan (hot-key handling, q107's best-keep) than one
    // with a million pairs; this is the read that tells you which.
    // Singleton documents (never in any pair) count as size-1 clusters
    // so the mass accounting covers the WHOLE corpus.
    Q("q182_cluster_size_histogram",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id")
        val clustered = Dedup.duplicateClusters(
          Tables.documents(s, d)
            .transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
          "doc_a", "doc_b")
        val full = docs
          .join(clustered.withColumnRenamed("doc", "doc_id"),
            Seq("doc_id"), "left")
          .select(coalesce(col("cluster"), col("doc_id")).as("cluster"))
        val sizes = full.groupBy("cluster")
          .agg(count(lit(1)).as("k"))
        val hist = sizes.groupBy("k")
          .agg(count(lit(1)).as("n_clusters"))
          .select(col("k"), col("n_clusters"),
            (col("k") * col("n_clusters")).as("n_docs"),
            ((col("k") - 1L) * col("n_clusters")).as("n_removable"))
        val tot = hist.agg(sum("n_docs").as("total_docs"),
          sum("n_removable").as("total_removable"))
        hist.crossJoin(broadcast(tot))
          .withColumn("dup_mass_bp",
            expr("total_removable * 10000 DIV total_docs"))
      },
      Some("""WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
             |  UNION
             |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |lbl AS (SELECT src AS doc, min(dst) AS cluster FROM reach
             |  GROUP BY 1),
             |fl AS (SELECT d.doc_id,
             |    coalesce(lbl.cluster, d.doc_id) AS cluster
             |  FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.doc),
             |cs AS (SELECT cluster, count(*) AS k FROM fl GROUP BY 1),
             |hist AS (SELECT k, count(*) AS n_clusters FROM cs GROUP BY 1),
             |tot AS (SELECT sum(k * n_clusters) AS total_docs,
             |    sum((k - 1) * n_clusters) AS total_removable FROM hist)
             |SELECT CAST(k AS BIGINT) AS k,
             |  CAST(n_clusters AS BIGINT) AS n_clusters,
             |  CAST(k * n_clusters AS BIGINT) AS n_docs,
             |  CAST((k - 1) * n_clusters AS BIGINT) AS n_removable,
             |  CAST(total_docs AS BIGINT) AS total_docs,
             |  CAST(total_removable AS BIGINT) AS total_removable,
             |  CAST(total_removable * 10000 // total_docs AS BIGINT)
             |    AS dup_mass_bp
             |FROM hist, tot""".stripMargin)),

    // Split-balance certificate (q183): exact two-sample KS between
    // the train and test length distributions under the q58 hash
    // split — q181 certifies the split doesn't LEAK; this certifies
    // the test side is REPRESENTATIVE (a test split that drifted long
    // or short measures a different task). Same ksDrift machinery as
    // q164, predicates = split membership; a hash split should read
    // near 0 and a stratification bug reads as drift.
    Q("q183_split_balance",
      (s, d) => Stats.ksDrift(
        Sampling.splitByHash(
          Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
        "n_chars", col("split") === "train", col("split") === "test"),
      Some("""WITH sp AS (SELECT n_chars,
             |  CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cd'
             |    THEN 'train'
             |  WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6'
             |    THEN 'val' ELSE 'test' END AS split
             |  FROM documents),
             |pv AS (SELECT n_chars AS v,
             |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS ca,
             |    sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS cb
             |  FROM sp WHERE split IN ('train', 'test')
             |  GROUP BY 1),
             |c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
             |    sum(cb) OVER (ORDER BY v) AS cumb FROM pv),
             |t AS (SELECT max(cuma) AS n_a, max(cumb) AS n_b FROM c)
             |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  CAST(max(abs(cuma * n_b - cumb * n_a)) AS BIGINT) AS d_num,
             |  CAST(n_a * n_b AS BIGINT) AS d_den,
             |  CAST(max(abs(cuma * n_b - cumb * n_a)) * 10000
             |    // (n_a * n_b) AS BIGINT) AS d_bp
             |FROM c, t GROUP BY n_a, n_b""".stripMargin)),

    // Cluster-separation audit (q184): the geometric quality read
    // behind q144's occupancy balance — per cell, Σ intra-dist² vs
    // Σ nearest-OTHER-centroid-dist² in basis points (Davies–Bouldin
    // shaped, kept exact: ×10⁴-quantized coordinates make every
    // distance² an exact integer). Low = compact, well-separated cells
    // (trustworthy ANN probes / k-means labels); →10⁴ = boundaries are
    // noise and nProbe=1 recall will suffer. md5-seeded centroids, the
    // q96 determinism contract.
    Q("q184_cluster_separation",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.clusterSeparation(emb, "vec_id", "embedding",
          Similarity.md5SeededCentroids(emb, "vec_id", "embedding", 16))
      },
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding::DOUBLE[],
             |      x -> CAST(round(x * 10000) AS BIGINT)) AS q
             |  FROM embeddings),
             |cent AS (SELECT vec_id AS cid, q AS cq FROM e
             |  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |d AS (SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(len(e.q)),
             |      i -> (e.q[i+1] - c.cq[i+1]) * (e.q[i+1] - c.cq[i+1])))
             |      AS d2
             |  FROM e CROSS JOIN cent c),
             |r AS (SELECT vec_id, cid, d2, row_number() OVER (
             |    PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d),
             |pp AS (SELECT a.vec_id, a.cid AS cell, a.d2 AS intra,
             |    b.d2 AS nearest_other
             |  FROM r a JOIN r b
             |  ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2)
             |SELECT CAST(cell AS BIGINT) AS cell,
             |  CAST(count(*) AS BIGINT) AS n_points,
             |  CAST(sum(intra) AS BIGINT) AS sum_intra,
             |  CAST(sum(nearest_other) AS BIGINT) AS sum_nearest_other,
             |  CAST(CASE WHEN sum(nearest_other) = 0 THEN NULL
             |    ELSE (sum(intra)::HUGEINT * 10000) // sum(nearest_other)
             |    END AS BIGINT) AS tightness_bp
             |FROM pp GROUP BY 1""".stripMargin)),

    // Packing-efficiency audit (q185): per shard of the q76 packing,
    // the two costs a sequence-packer trades: WASTE (the shard's final
    // partial bin — contiguous concat-and-chop wastes nothing
    // anywhere else) and STRADDLERS (documents split across a
    // seqLen boundary, each one an attention-mask discontinuity at
    // training time). A doc-aligned packer has zero straddlers and
    // more waste; this measures where q76's layout actually sits so
    // the trade is a number, not a belief. All exact integers off the
    // same (offset, bin) arithmetic as q76.
    Q("q185_pack_efficiency",
      (s, d) => {
        val packed = Tables.documents(s, d)
          .select(col("doc_id"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
          .transform(Sampling.packSequences("doc_id", "n_tokens", 512, 4, "epoch0"))
        packed.groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            sum(when(col("n_tokens") > 0L &&
              expr("offset DIV 512") =!= expr("(offset + n_tokens - 1) DIV 512"),
              1L).otherwise(0L)).as("n_straddlers"))
          .select(col("shard").cast("long").as("shard"), col("n_docs"),
            col("total_tokens"),
            expr("(total_tokens + 511) DIV 512").as("n_bins"),
            expr("((total_tokens + 511) DIV 512) * 512 - total_tokens")
              .as("waste"),
            expr("""(((total_tokens + 511) DIV 512) * 512 - total_tokens)
              * 10000 DIV (((total_tokens + 511) DIV 512) * 512)""")
              .as("waste_bp"),
            col("n_straddlers"),
            expr("n_straddlers * 10000 DIV n_docs").as("straddle_bp"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    cast(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |p AS (SELECT doc_id, n_tokens,
             |    row_number() OVER (ORDER BY
             |      md5('epoch0' || cast(doc_id AS VARCHAR)), doc_id) - 1
             |      AS pos
             |  FROM t),
             |s AS (SELECT doc_id, n_tokens, pos,
             |    cast(pos % 4 AS INT) AS shard FROM p),
             |o AS (SELECT shard, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos)
             |      - n_tokens AS off
             |  FROM s),
             |g AS (SELECT shard, count(*) AS n_docs,
             |    sum(n_tokens) AS total_tokens,
             |    sum(CASE WHEN n_tokens > 0
             |      AND off // 512 <> (off + n_tokens - 1) // 512
             |      THEN 1 ELSE 0 END) AS n_straddlers
             |  FROM o GROUP BY 1)
             |SELECT CAST(shard AS BIGINT) AS shard,
             |  CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(total_tokens AS BIGINT) AS total_tokens,
             |  CAST((total_tokens + 511) // 512 AS BIGINT) AS n_bins,
             |  CAST((total_tokens + 511) // 512 * 512 - total_tokens
             |    AS BIGINT) AS waste,
             |  CAST(((total_tokens + 511) // 512 * 512 - total_tokens)
             |    * 10000 // ((total_tokens + 511) // 512 * 512)
             |    AS BIGINT) AS waste_bp,
             |  CAST(n_straddlers AS BIGINT) AS n_straddlers,
             |  CAST(n_straddlers * 10000 // n_docs AS BIGINT)
             |    AS straddle_bp
             |FROM g""".stripMargin)),

    // Hapax rate (q186): per source, the share of vocabulary seen
    // exactly once — the corpus-noise read the Zipf fit (q148) and
    // Heaps curve (q170) bracket from either side: a hapax-heavy
    // source is OCR garbage / random identifiers (every token novel),
    // a hapax-starved one is templated boilerplate. hapax_vocab_bp =
    // singleton share of the source's vocabulary, hapax_mass_bp = of
    // its token mass. One (source, token) aggregate; everything else
    // is source-grain.
    Q("q186_hapax_rate",
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_vocab"),
          sum("c").as("n_tokens"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_vocab"), col("n_tokens"),
          col("n_hapax"),
          expr("n_hapax * 10000 DIV n_vocab").as("hapax_vocab_bp"),
          expr("n_hapax * 10000 DIV n_tokens").as("hapax_mass_bp")),
      Some("""WITH tk AS (SELECT source,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |c AS (SELECT source, tok, count(*) AS c FROM tk
             |  GROUP BY 1, 2)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_vocab,
             |  CAST(sum(c) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_hapax,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000
             |    // count(*) AS BIGINT) AS hapax_vocab_bp,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000
             |    // sum(c) AS BIGINT) AS hapax_mass_bp
             |FROM c GROUP BY source""".stripMargin)),

    // Water-filling budget allocation (q187): one GLOBAL budget (95% of
    // total corpus chars) split max-min fair across sources — the
    // mixture-design complement of q67's fixed per-source budgets:
    // small sources keep everything, large ones are clipped to a common
    // water level, Σalloc = min(budget, supply) EXACTLY (the integer
    // remainder goes to the largest capped sources, +1 each). Closed
    // form over the source-domain table; no iteration.
    Q("q187_budget_waterfill",
      (s, d) => Sampling.waterfillBudget(
        Tables.documents(s, d), "source", "n_chars", 9500L),
      Some("""WITH a AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
             |  FROM documents GROUP BY 1),
             |t AS (SELECT count(*) AS n, CAST(sum(avail) AS HUGEINT) AS tot
             |  FROM a),
             |s AS (SELECT source, avail,
             |    row_number() OVER (ORDER BY avail, source) AS rn,
             |    CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS HUGEINT) AS p
             |  FROM a),
             |s2 AS (SELECT s.source, s.avail, s.rn, s.p,
             |    t.tot * 9500 // 10000 AS b, t.tot AS tot,
             |    t.n - s.rn + 1 AS m,
             |    (CAST(s.avail AS HUGEINT) * (t.n - s.rn + 1) + s.p
             |      <= t.tot * 9500 // 10000) AS sat
             |  FROM s, t),
             |pv AS (SELECT p AS pp, m AS pm FROM s2 WHERE NOT sat
             |  ORDER BY rn LIMIT 1),
             |f AS (SELECT s2.*, pv.pp, pv.pm FROM s2 LEFT JOIN pv ON TRUE)
             |SELECT source, avail,
             |  CAST(CASE WHEN sat THEN avail
             |    ELSE (b - pp) // pm +
             |      (CASE WHEN m <= (b - pp) % pm THEN 1 ELSE 0 END)
             |    END AS BIGINT) AS alloc,
             |  NOT sat AS capped,
             |  CAST((b - pp) // pm AS BIGINT) AS water_cap,
             |  CAST(b AS BIGINT) AS budget,
             |  CAST(CASE WHEN pp IS NULL THEN b - tot ELSE 0 END
             |    AS BIGINT) AS leftover
             |FROM f""".stripMargin)),

    // Source-profile similarity matrix (q188): exact histogram
    // intersection of per-source unigram distributions + vocab Jaccard
    // for every source pair — the mixture-redundancy read beside q75's
    // source-vs-corpus KL: two sources at >= 9000 bp are near-duplicate
    // FEEDS and should be merged/down-weighted before q187 hands both a
    // budget. Full pair grid (disjoint pairs emit 0 bp rows).
    Q("q188_source_profile_overlap",
      (s, d) => VocabStats.profileOverlap("source", "text")(
        Tables.documents(s, d)),
      Some("""WITH tk AS (SELECT source AS src,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |c AS (SELECT src, tok, count(*) AS c FROM tk GROUP BY 1, 2),
             |t AS (SELECT src, CAST(sum(c) AS HUGEINT) AS t,
             |    count(*) AS vocab FROM c GROUP BY 1),
             |p AS (SELECT a.src AS src_a, b.src AS src_b,
             |    count(*) AS n_shared,
             |    sum(least(CAST(a.c AS HUGEINT) * tb.t,
             |              CAST(b.c AS HUGEINT) * ta.t)) AS inter
             |  FROM c a JOIN c b ON a.tok = b.tok AND a.src < b.src
             |  JOIN t ta ON ta.src = a.src
             |  JOIN t tb ON tb.src = b.src
             |  GROUP BY 1, 2),
             |g AS (SELECT ta.src AS src_a, tb.src AS src_b,
             |    ta.t AS ta, tb.t AS tb,
             |    ta.vocab AS vocab_a, tb.vocab AS vocab_b
             |  FROM t ta, t tb WHERE ta.src < tb.src)
             |SELECT g.src_a AS source_a, g.src_b AS source_b,
             |  CAST(vocab_a AS BIGINT) AS vocab_a,
             |  CAST(vocab_b AS BIGINT) AS vocab_b,
             |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared_vocab,
             |  CAST(coalesce(inter, 0) * 10000 // (g.ta * g.tb)
             |    AS BIGINT) AS overlap_bp,
             |  CAST(coalesce(n_shared, 0) * 10000
             |    // (vocab_a + vocab_b - coalesce(n_shared, 0))
             |    AS BIGINT) AS jaccard_bp
             |FROM g LEFT JOIN p
             |  ON g.src_a = p.src_a AND g.src_b = p.src_b""".stripMargin)),

    // Dedup-threshold sensitivity sweep (q189): for every OBSERVED
    // 3-gram Jaccard level, the cumulative cost of cutting there —
    // pairs >= t, documents touched by >= 1 such pair, and their share
    // of the corpus. The q26 threshold (0.03) stops being a copied
    // constant and becomes a read off this table: where n_pairs
    // explodes is where boilerplate starts. Docs-touched decomposes by
    // max-attribution (each doc counts at its MAX incident jac_bp);
    // both curves are descending cumulative sums on the value grid.
    // The sweep runs with the SAME maxDf=1000 cap as the q26 operator
    // it tunes (capped-vocabulary Jaccard on both engines — the
    // oracle applies the identical df cut, so the parity holds even
    // on a corpus where the cap engages).
    Q("q189_jaccard_threshold_sweep",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.jaccardThresholdSweep("doc_id", "text", 3)),
      Some("""WITH sh0 AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents))),
             |dfc AS (SELECT shingle FROM sh0 GROUP BY 1
             |  HAVING count(*) <= 1000),
             |sh AS (SELECT sh0.doc, sh0.shingle FROM sh0
             |  JOIN dfc USING (shingle)),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
             |    count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |pr AS (SELECT doc_a, doc_b,
             |    inter * 10000 // (sa.sz + sb.sz - inter) AS jac_bp
             |  FROM inter JOIN sizes sa ON doc_a = sa.doc
             |  JOIN sizes sb ON doc_b = sb.doc),
             |tot AS (SELECT count(*) AS total FROM documents),
             |pc AS (SELECT jac_bp, count(*) AS pc FROM pr GROUP BY 1),
             |dm AS (SELECT doc, max(jac_bp) AS jac_bp FROM (
             |    SELECT doc_a AS doc, jac_bp FROM pr
             |    UNION ALL SELECT doc_b, jac_bp FROM pr) GROUP BY 1),
             |dc AS (SELECT jac_bp, count(*) AS dc FROM dm GROUP BY 1)
             |SELECT pc.jac_bp,
             |  CAST(sum(pc.pc) OVER w AS BIGINT) AS n_pairs,
             |  CAST(sum(coalesce(dc.dc, 0)) OVER w AS BIGINT) AS n_docs,
             |  CAST(sum(coalesce(dc.dc, 0)) OVER w * 10000 // tot.total
             |    AS BIGINT) AS docs_bp
             |FROM pc LEFT JOIN dc ON pc.jac_bp = dc.jac_bp, tot
             |WINDOW w AS (ORDER BY pc.jac_bp DESC
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Release manifest (q190): Merkle-style content-addressed rollup —
    // md5(id:text) per doc, ordered-concat md5 per id-range shard, one
    // root over the shard hashes broadcast onto every row. Two
    // snapshots are identical iff roots match; a mismatch localizes to
    // shardSize docs (then q66 snapshotDiff runs on just those). Range
    // sharding keeps sealed shards byte-stable under append-only
    // growth, so releases re-verify a delta, not the world.
    Q("q190_release_manifest",
      (s, d) => CorpusManifest.releaseManifest("doc_id", "text", 100L)(
        Tables.documents(s, d)),
      Some("""WITH h AS (SELECT doc_id // 100 AS shard, doc_id,
             |    md5(CAST(doc_id AS VARCHAR) || ':' || coalesce(text, ''))
             |      AS h,
             |    len(coalesce(text, '')) AS nc
             |  FROM documents),
             |s AS (SELECT shard, count(*) AS n_docs,
             |    CAST(sum(nc) AS BIGINT) AS n_chars,
             |    md5(string_agg(h, '' ORDER BY doc_id)) AS shard_hash
             |  FROM h GROUP BY 1),
             |r AS (SELECT md5(string_agg(shard_hash, '' ORDER BY shard))
             |    AS root_hash FROM s)
             |SELECT CAST(shard AS BIGINT) AS shard,
             |  CAST(n_docs AS BIGINT) AS n_docs, n_chars,
             |  shard_hash, root_hash
             |FROM s, r""".stripMargin)),

    // Truncation-loss audit (q191): per source, what a truncating
    // dataloader costs — the OTHER side of q185's packing trade: q185
    // prices concat-and-chop (tiny waste, ~10% straddlers), this
    // prices truncation (zero straddlers, every over-length doc loses
    // its tail). loss_bp = token mass dropped; truncated_bp = docs
    // cut. The pair of numbers IS the layout decision. seqLen 64 here
    // (this corpus tops out at 100 tokens, so 512 reads a degenerate
    // all-zero audit — 64 sits at the ~60th percentile and produces
    // the non-trivial read; production runs the same query at its
    // real seqLen). NULL guards on empty-token sources mirror
    // cross-engine (DuckDB //0 errors where Spark DIV yields null).
    Q("q191_truncation_loss",
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("__nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__nt") > 64L, 1L).otherwise(0L)).as("n_truncated"),
          sum("__nt").as("n_tokens"),
          sum(when(col("__nt") > 64L, col("__nt") - 64L).otherwise(0L))
            .as("tokens_lost"))
        .select(col("source"), col("n_docs"), col("n_truncated"),
          col("n_tokens"), col("tokens_lost"),
          expr("""CASE WHEN n_tokens = 0 THEN NULL
            ELSE tokens_lost * 10000 DIV n_tokens END""").as("loss_bp"),
          expr("n_truncated * 10000 DIV n_docs").as("truncated_bp")),
      Some("""WITH t AS (SELECT source,
             |    cast(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS nt
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN nt > 64 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_truncated,
             |  CAST(sum(nt) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END)
             |    AS BIGINT) AS tokens_lost,
             |  CAST(CASE WHEN sum(nt) = 0 THEN NULL
             |    ELSE sum(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END)
             |      * 10000 // sum(nt) END AS BIGINT) AS loss_bp,
             |  CAST(sum(CASE WHEN nt > 64 THEN 1 ELSE 0 END) * 10000
             |    // count(*) AS BIGINT) AS truncated_bp
             |FROM t GROUP BY source""".stripMargin)),

    // Additive manifest (q192): q190's order-free twin — per shard the
    // XOR of 60-bit doc digests plus the count (XOR alone can't see a
    // vanished identical pair), root XOR broadcast back. Commutative,
    // self-inverse: a stream maintains it as two longs per shard
    // (CorpusStream.manifestMonitor IS this reading live), and insert/
    // delete are O(1) re-XORs. The trade vs q190's ordered md5 chain:
    // no adversarial collision resistance — release signing keeps
    // q190, intake integrity uses this.
    Q("q192_additive_manifest",
      (s, d) => CorpusManifest.additiveManifest("doc_id", "text", 100L)(
        Tables.documents(s, d)),
      Some("""WITH h AS (SELECT doc_id // 100 AS shard,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
             |      || coalesce(text, '')), 1, 15))::BIGINT AS h
             |  FROM documents),
             |s AS (SELECT shard, count(*) AS n_docs,
             |    bit_xor(h) AS xor_digest
             |  FROM h GROUP BY 1),
             |r AS (SELECT bit_xor(xor_digest) AS root_digest FROM s)
             |SELECT CAST(shard AS BIGINT) AS shard,
             |  CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(xor_digest AS BIGINT) AS xor_digest,
             |  CAST(root_digest AS BIGINT) AS root_digest
             |FROM s, r""".stripMargin)),

    // Waterfill sample (q193): q187's allocation MATERIALIZED — per
    // source, keep documents in deterministic md5 order until the next
    // would overshoot the source's max-min-fair share of the 95%
    // global budget. Greedy maximal prefix (kept mass within one doc
    // of alloc); allocation monotonicity + fixed hash order make the
    // sample NESTED in the budget like every sampler here.
    Q("q193_waterfill_sample",
      (s, d) => Sampling.waterfillSample(
        Tables.documents(s, d), "doc_id", "source", "n_chars", 9500L)
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("n_chars")),
      Some("""WITH a AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
             |  FROM documents GROUP BY 1),
             |t AS (SELECT count(*) AS n, CAST(sum(avail) AS HUGEINT) AS tot
             |  FROM a),
             |s AS (SELECT source, avail,
             |    row_number() OVER (ORDER BY avail, source) AS rn,
             |    CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS HUGEINT) AS p
             |  FROM a),
             |s2 AS (SELECT s.source, s.avail, s.rn, s.p,
             |    t.tot * 9500 // 10000 AS b,
             |    t.n - s.rn + 1 AS m,
             |    (CAST(s.avail AS HUGEINT) * (t.n - s.rn + 1) + s.p
             |      <= t.tot * 9500 // 10000) AS sat
             |  FROM s, t),
             |pv AS (SELECT p AS pp, m AS pm FROM s2 WHERE NOT sat
             |  ORDER BY rn LIMIT 1),
             |al AS (SELECT s2.source,
             |    CAST(CASE WHEN sat THEN avail
             |      ELSE (b - pp) // pm +
             |        (CASE WHEN m <= (b - pp) % pm THEN 1 ELSE 0 END)
             |      END AS BIGINT) AS alloc
             |  FROM s2 LEFT JOIN pv ON TRUE),
             |r AS (SELECT doc_id, source,
             |    CAST(n_chars AS BIGINT) AS n_chars,
             |    sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY md5('wf:' || CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum
             |  FROM documents)
             |SELECT r.doc_id, r.source, r.n_chars
             |FROM r JOIN al ON r.source = al.source
             |WHERE r.cum <= al.alloc""".stripMargin)),

    // Duplicate-span masking (q194): the REMOVAL twin of q169 — every
    // token covered by a corpus-duplicated 5-token window is dropped
    // and the survivors rejoin in order (Lee et al. ExactSubstr
    // removal at token grain, all copies go; keep-one variants are
    // q72/q93 at chunk grain). Fully masked docs survive as empty
    // strings: removal never silently drops the row.
    Q("q194_mask_dup_spans",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.maskDupSpans("doc_id", "text", 5)),
      Some("""WITH w AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w
             |  FROM documents),
             |g AS (SELECT doc_id, u.ws AS ws, u.h AS h FROM (
             |    SELECT doc_id, unnest(list_transform(
             |      range(greatest(len(w) - 4, 0)),
             |      i -> struct_pack(ws := i,
             |        h := md5(array_to_string(w[i+1:i+5], ' '))))) AS u
             |    FROM w)),
             |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
             |f AS (SELECT DISTINCT doc_id,
             |    unnest(list_transform(range(5), k -> ws + k)) AS pos
             |  FROM g JOIN dup USING (h)),
             |t AS (SELECT doc_id, u.pos AS pos, u.t AS tok FROM (
             |    SELECT doc_id, unnest(list_transform(range(len(w)),
             |      i -> struct_pack(pos := i, t := w[i+1]))) AS u
             |    FROM w)),
             |k AS (SELECT t.doc_id, t.pos, t.tok FROM t
             |  LEFT JOIN f ON t.doc_id = f.doc_id AND t.pos = f.pos
             |  WHERE f.pos IS NULL),
             |r AS (SELECT doc_id,
             |    string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             |    count(*) AS n_kept
             |  FROM k GROUP BY 1)
             |SELECT w.doc_id, coalesce(r.clean_text, '') AS clean_text,
             |  CAST(len(w.w) AS BIGINT) AS n_tokens,
             |  CAST(len(w.w) - coalesce(r.n_kept, 0) AS BIGINT)
             |    AS n_removed
             |FROM w LEFT JOIN r ON w.doc_id = r.doc_id""".stripMargin)),

    // Three-way snapshot merge (q195): two lines of edits off a common
    // base reconciled per doc — whoever changed wins, agreeing changes
    // merge, disagreeing ones surface as 'conflict' rows (never
    // silently resolved — that's upsert's one-side-wins job). Ours
    // drops %11 and prefixes 'A ' on %6; theirs drops %13 and prefixes
    // 'B ' on %15 — so the corpus exercises every cell: clean keeps,
    // one-side edits/deletes, agreeing deletes (%143), edit-vs-edit
    // conflicts (%30), and delete-vs-edit conflicts (%165).
    Q("q195_three_way_merge",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val ours = base.filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 6 === 0, concat(lit("A "), col("text")))
              .otherwise(col("text")).as("text"))
        val theirs = base.filter(col("doc_id") % 13 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 15 === 0, concat(lit("B "), col("text")))
              .otherwise(col("text")).as("text"))
        graft.ops.Merge.threeWayMerge("doc_id", "text")(base, ours, theirs)
      },
      Some("""WITH b AS (SELECT doc_id, text FROM documents),
             |o AS (SELECT doc_id, CASE WHEN doc_id % 6 = 0
             |      THEN 'A ' || text ELSE text END AS text
             |  FROM documents WHERE doc_id % 11 <> 0),
             |t AS (SELECT doc_id, CASE WHEN doc_id % 15 = 0
             |      THEN 'B ' || text ELSE text END AS text
             |  FROM documents WHERE doc_id % 13 <> 0),
             |j AS (SELECT coalesce(b.doc_id, o.doc_id) AS doc_id,
             |    b.text AS bt, o.text AS ot
             |  FROM b FULL JOIN o ON b.doc_id = o.doc_id),
             |j2 AS (SELECT coalesce(j.doc_id, t.doc_id) AS doc_id,
             |    j.bt, j.ot, t.text AS tt
             |  FROM j FULL JOIN t ON j.doc_id = t.doc_id)
             |SELECT doc_id,
             |  CASE
             |    WHEN ot IS NOT DISTINCT FROM bt
             |     AND tt IS NOT DISTINCT FROM bt THEN 'base'
             |    WHEN NOT (ot IS NOT DISTINCT FROM bt)
             |     AND tt IS NOT DISTINCT FROM bt THEN 'ours'
             |    WHEN ot IS NOT DISTINCT FROM bt THEN 'theirs'
             |    WHEN ot IS NOT DISTINCT FROM tt THEN 'both'
             |    ELSE 'conflict' END AS resolution,
             |  CASE
             |    WHEN ot IS NOT DISTINCT FROM bt
             |     AND tt IS NOT DISTINCT FROM bt THEN bt
             |    WHEN NOT (ot IS NOT DISTINCT FROM bt)
             |     AND tt IS NOT DISTINCT FROM bt THEN ot
             |    WHEN ot IS NOT DISTINCT FROM bt THEN tt
             |    WHEN ot IS NOT DISTINCT FROM tt THEN ot
             |    ELSE NULL END AS merged
             |FROM j2""".stripMargin)),

    // Shuffle-skew audit (q196): the measurement half of the salting
    // machinery (Skew.salted / Merge.lastWriterWins(saltBuckets) are
    // the remedy) applied to events.user_id as a prospective join key:
    // top-20 heaviest keys + the global read — max_over_avg_x100 and
    // the salt fan-out needed at 32 partitions. This synthetic table
    // honestly reads ~149 (1.5x average) and salt_buckets = 1: "don't
    // salt" is a first-class answer. Null keys audit as '__null__' —
    // in real data null is routinely THE hot key.
    Q("q196_skew_audit",
      (s, d) => Skew.skewAudit("user_id", 20, 32)(Tables.events(s, d)
        .select("user_id")),
      Some("""WITH c AS (SELECT coalesce(CAST(user_id AS VARCHAR),
             |      '__null__') AS key, count(*) AS cnt
             |  FROM events GROUP BY 1),
             |t AS (SELECT sum(cnt) AS n_rows, count(*) AS n_keys,
             |    max(cnt) AS max_cnt FROM c),
             |k AS (SELECT key, cnt,
             |    row_number() OVER (ORDER BY cnt DESC, key) AS rank
             |  FROM c ORDER BY cnt DESC, key LIMIT 20)
             |SELECT k.key, CAST(k.cnt AS BIGINT) AS cnt,
             |  CAST(k.cnt * 10000 // t.n_rows AS BIGINT) AS share_bp,
             |  CAST(k.rank AS BIGINT) AS rank,
             |  CAST(t.n_rows AS BIGINT) AS n_rows,
             |  CAST(t.n_keys AS BIGINT) AS n_keys,
             |  CAST(CAST(t.max_cnt AS HUGEINT) * t.n_keys * 100
             |    // t.n_rows AS BIGINT) AS max_over_avg_x100,
             |  CAST((t.max_cnt * 32 + t.n_rows - 1) // t.n_rows
             |    AS BIGINT) AS salt_buckets
             |FROM k, t""".stripMargin)),

    // Prefix-filtered Jaccard pairs (q197): the PPJoin/All-Pairs prefix
    // principle at t = 0.3 — only each doc's rarest |s|-ceil(t|s|)+1
    // shingles are indexed, provably losing NO pair at the threshold.
    // The oracle is the plain brute-force pair join with no prefix
    // logic: the hash gate itself certifies the optimization is
    // lossless at every fixture scale. Replaces the maxDf
    // approximation knob with an exact reduction; hot shingles sort
    // last and fall out of every prefix.
    Q("q197_prefix_jaccard_pairs",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.prefixJaccardPairs("doc_id", "text", 3, 3000L)),
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
             |    count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |p AS (SELECT doc_a, doc_b, inter,
             |    sa.sz + sb.sz - inter AS un
             |  FROM inter JOIN sizes sa ON doc_a = sa.doc
             |  JOIN sizes sb ON doc_b = sb.doc)
             |SELECT doc_a, doc_b,
             |  CAST(inter * 10000 // un AS BIGINT) AS jac_bp
             |FROM p WHERE inter * 10000 >= 3000 * un""".stripMargin)),

    // Source modularity of the near-dup graph (q198): Newman Q of the
    // SOURCE partition over q26's pair edges — the one-number answer
    // to "can dedup shard per source?": Q near 1 = duplication is
    // source-internal (each source's pair join runs independently at
    // 100 TB), Q near 0/negative = copying crosses feeds and only
    // global dedup is sound. Exact rationals, sign-extracted DIV.
    Q("q198_source_modularity",
      (s, d) => Centrality.modularity(
        Tables.documents(s, d)
          .transform(Dedup.ngramJaccardPairs("doc_id", "text", 3, 0.03)),
        "doc_a", "doc_b",
        Tables.documents(s, d), "doc_id", "source"),
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
             |    count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |pairs AS (SELECT doc_a, doc_b FROM inter
             |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
             |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
             |le AS (SELECT da.source AS ca, db.source AS cb FROM pairs
             |  JOIN documents da ON pairs.doc_a = da.doc_id
             |  JOIN documents db ON pairs.doc_b = db.doc_id),
             |m AS (SELECT count(*) AS m FROM le),
             |mc AS (SELECT ca AS c, count(*) AS mc FROM le
             |  WHERE ca = cb GROUP BY 1),
             |dc AS (SELECT c, count(*) AS d FROM (
             |    SELECT ca AS c FROM le UNION ALL SELECT cb FROM le)
             |  GROUP BY 1),
             |terms AS (SELECT dc.c, coalesce(mc.mc, 0) AS mc, dc.d
             |  FROM dc LEFT JOIN mc ON dc.c = mc.c),
             |agg AS (SELECT count(*) AS n_parts, sum(mc) AS intra,
             |    sum(CAST(4 AS HUGEINT) * m.m * mc
             |      - CAST(d AS HUGEINT) * d) AS num,
             |    max(m.m) AS n_edges
             |  FROM terms, m)
             |SELECT CAST(coalesce(n_edges, 0) AS BIGINT) AS n_edges,
             |  CAST(coalesce(intra, 0) AS BIGINT) AS intra_edges,
             |  CAST(n_parts AS BIGINT) AS n_parts,
             |  CAST(CASE WHEN n_edges IS NULL OR n_edges = 0 THEN NULL
             |    WHEN num >= 0 THEN (num * 10000)
             |      // (4 * CAST(n_edges AS HUGEINT) * n_edges)
             |    ELSE -(((-num) * 10000)
             |      // (4 * CAST(n_edges AS HUGEINT) * n_edges))
             |    END AS BIGINT) AS q_bp
             |FROM agg""".stripMargin)),

    // LSH parameter planner (q199): price each (bands, rows) MinHash
    // banding on THIS corpus — expected missed true pairs and spurious
    // candidates at t=0.3, from the observed exact-Jaccard pair
    // distribution (P[band]=J^r by the MinHash property; J quantized
    // ONCE to the x10^4 grid, then the J^r product chain and the
    // (1-J^r)^b squaring chain both ride that grid — every
    // intermediate < 10^8, identical on both engines, no overflow at
    // any set size). Runs UNCAPPED (no maxDf): the planner prices the
    // true J the actual MinHash path collides on, not a capped-
    // vocabulary variant. The q91 choice (8x4) stops being folklore:
    // the table says what it misses and what (32,1)/(16,2) would cost.
    Q("q199_lsh_planner",
      (s, d) => Tables.documents(s, d)
        .transform(Dedup.lshPlanner("doc_id", "text", 3, 3000L)),
      Some("""WITH sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
             |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
             |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |        FROM documents))),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
             |    count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |p AS (SELECT inter * 10000 // (sa.sz + sb.sz - inter) AS j
             |  FROM inter JOIN sizes sa ON doc_a = sa.doc
             |  JOIN sizes sb ON doc_b = sb.doc),
             |a0 AS (SELECT j, 10000 - j AS m FROM p),
             |a1 AS (SELECT j, (m * m) // 10000 AS m FROM a0),
             |a2 AS (SELECT j, (m * m) // 10000 AS m FROM a1),
             |a3 AS (SELECT j, (m * m) // 10000 AS m FROM a2),
             |a4 AS (SELECT j, (m * m) // 10000 AS m FROM a3),
             |a5 AS (SELECT j, (m * m) // 10000 AS m FROM a4),
             |b0 AS (SELECT j,
             |    10000 - ((j * j) // 10000) AS m FROM p),
             |b1 AS (SELECT j, (m * m) // 10000 AS m FROM b0),
             |b2 AS (SELECT j, (m * m) // 10000 AS m FROM b1),
             |b3 AS (SELECT j, (m * m) // 10000 AS m FROM b2),
             |b4 AS (SELECT j, (m * m) // 10000 AS m FROM b3),
             |c0 AS (SELECT j,
             |    10000 - ((((((j * j) // 10000) * j) // 10000) * j)
             |      // 10000) AS m
             |  FROM p),
             |c1 AS (SELECT j, (m * m) // 10000 AS m FROM c0),
             |c2 AS (SELECT j, (m * m) // 10000 AS m FROM c1),
             |c3 AS (SELECT j, (m * m) // 10000 AS m FROM c2)
             |SELECT CAST(32 AS BIGINT) AS n_bands,
             |  CAST(1 AS BIGINT) AS rows_per_band,
             |  CAST(sum(CASE WHEN j >= 3000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_true,
             |  CAST(sum(CASE WHEN j >= 3000 THEN m ELSE 0 END)
             |    AS BIGINT) AS exp_missed_x10k,
             |  CAST(sum(CASE WHEN j < 3000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_below,
             |  CAST(sum(CASE WHEN j < 3000 THEN 10000 - m
             |    ELSE 0 END) AS BIGINT) AS exp_extra_x10k
             |FROM a5
             |UNION ALL
             |SELECT CAST(16 AS BIGINT), CAST(2 AS BIGINT),
             |  CAST(sum(CASE WHEN j >= 3000 THEN 1 ELSE 0 END)
             |    AS BIGINT),
             |  CAST(sum(CASE WHEN j >= 3000 THEN m ELSE 0 END)
             |    AS BIGINT),
             |  CAST(sum(CASE WHEN j < 3000 THEN 1 ELSE 0 END)
             |    AS BIGINT),
             |  CAST(sum(CASE WHEN j < 3000 THEN 10000 - m
             |    ELSE 0 END) AS BIGINT)
             |FROM b4
             |UNION ALL
             |SELECT CAST(8 AS BIGINT), CAST(4 AS BIGINT),
             |  CAST(sum(CASE WHEN j >= 3000 THEN 1 ELSE 0 END)
             |    AS BIGINT),
             |  CAST(sum(CASE WHEN j >= 3000 THEN m ELSE 0 END)
             |    AS BIGINT),
             |  CAST(sum(CASE WHEN j < 3000 THEN 1 ELSE 0 END)
             |    AS BIGINT),
             |  CAST(sum(CASE WHEN j < 3000 THEN 10000 - m
             |    ELSE 0 END) AS BIGINT)
             |FROM c3""".stripMargin)),

    // Release pipeline (q200): the sixth-session operators composed
    // end to end — duplicate-span masking (q194, empty hulls dropped)
    // → exact dedup on the CLEANED text (masking makes near-dups
    // byte-identical, so exact dedup now catches them) → max-min-fair
    // 80% budget cut (q187/q193) → Merkle manifest of the release
    // (q190). The output IS the release certificate: shard hashes +
    // root. One hash-oracled query proving the whole chain is
    // cross-engine byte-deterministic.
    Q("q200_release_pipeline",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val deduped = docs
          .transform(Dedup.maskDupSpans("doc_id", "text", 5))
          .filter(col("clean_text") =!= "")
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .withColumn("__keep",
            min("doc_id").over(w.partitionBy(md5(col("clean_text")))))
          .filter(col("doc_id") === col("__keep"))
          .withColumn("n_clean", length(col("clean_text")).cast("long"))
        val kept = Sampling.waterfillSample(
            deduped, "doc_id", "source", "n_clean", 8000L)
          .select("doc_id")
        CorpusManifest.releaseManifest("doc_id", "clean_text", 100L)(
          deduped.join(kept, Seq("doc_id")))
      },
      Some("""WITH w AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> x <> '') AS w
             |  FROM documents),
             |g AS (SELECT doc_id, u.ws AS ws, u.h AS h FROM (
             |    SELECT doc_id, unnest(list_transform(
             |      range(greatest(len(w) - 4, 0)),
             |      i -> struct_pack(ws := i,
             |        h := md5(array_to_string(w[i+1:i+5], ' '))))) AS u
             |    FROM w)),
             |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
             |f AS (SELECT DISTINCT doc_id,
             |    unnest(list_transform(range(5), k -> ws + k)) AS pos
             |  FROM g JOIN dup USING (h)),
             |t AS (SELECT doc_id, u.pos AS pos, u.t AS tok FROM (
             |    SELECT doc_id, unnest(list_transform(range(len(w)),
             |      i -> struct_pack(pos := i, t := w[i+1]))) AS u
             |    FROM w)),
             |k AS (SELECT t.doc_id, t.pos, t.tok FROM t
             |  LEFT JOIN f ON t.doc_id = f.doc_id AND t.pos = f.pos
             |  WHERE f.pos IS NULL),
             |cl AS (SELECT k.doc_id,
             |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
             |  FROM k GROUP BY 1),
             |ms AS (SELECT cl.doc_id, cl.clean_text, d.source
             |  FROM cl JOIN documents d ON cl.doc_id = d.doc_id
             |  WHERE cl.clean_text <> ''),
             |dd AS (SELECT doc_id, clean_text, source FROM (
             |    SELECT ms.*, min(doc_id) OVER (
             |      PARTITION BY md5(clean_text)) AS keep FROM ms)
             |  WHERE doc_id = keep),
             |sz AS (SELECT doc_id, clean_text, source,
             |    CAST(len(clean_text) AS BIGINT) AS n_clean FROM dd),
             |a AS (SELECT source, CAST(sum(n_clean) AS BIGINT) AS avail
             |  FROM sz GROUP BY 1),
             |tt AS (SELECT count(*) AS n, CAST(sum(avail) AS HUGEINT) AS tot
             |  FROM a),
             |s AS (SELECT source, avail,
             |    row_number() OVER (ORDER BY avail, source) AS rn,
             |    CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS HUGEINT) AS p
             |  FROM a),
             |s2 AS (SELECT s.source, s.avail, s.rn, s.p,
             |    tt.tot * 8000 // 10000 AS b, tt.n - s.rn + 1 AS m,
             |    (CAST(s.avail AS HUGEINT) * (tt.n - s.rn + 1) + s.p
             |      <= tt.tot * 8000 // 10000) AS sat
             |  FROM s, tt),
             |pv AS (SELECT p AS pp, m AS pm FROM s2 WHERE NOT sat
             |  ORDER BY rn LIMIT 1),
             |al AS (SELECT s2.source,
             |    CAST(CASE WHEN sat THEN avail
             |      ELSE (b - pp) // pm +
             |        (CASE WHEN m <= (b - pp) % pm THEN 1 ELSE 0 END)
             |      END AS BIGINT) AS alloc
             |  FROM s2 LEFT JOIN pv ON TRUE),
             |rr AS (SELECT doc_id, clean_text, sz.source, n_clean,
             |    sum(n_clean) OVER (PARTITION BY sz.source
             |      ORDER BY md5('wf:' || CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM sz),
             |kept AS (SELECT rr.doc_id, rr.clean_text FROM rr
             |  JOIN al ON rr.source = al.source WHERE rr.cum <= al.alloc),
             |hh AS (SELECT doc_id // 100 AS shard, doc_id,
             |    md5(CAST(doc_id AS VARCHAR) || ':' || clean_text) AS h,
             |    len(clean_text) AS nc
             |  FROM kept),
             |ss AS (SELECT shard, count(*) AS n_docs,
             |    CAST(sum(nc) AS BIGINT) AS n_chars,
             |    md5(string_agg(h, '' ORDER BY doc_id)) AS shard_hash
             |  FROM hh GROUP BY 1),
             |rt AS (SELECT md5(string_agg(shard_hash, '' ORDER BY shard))
             |    AS root_hash FROM ss)
             |SELECT CAST(shard AS BIGINT) AS shard,
             |  CAST(n_docs AS BIGINT) AS n_docs, n_chars,
             |  shard_hash, root_hash
             |FROM ss, rt""".stripMargin)),

    // SCD Type-2 history (q201): the auditable upgrade of the
    // reference's destructive upsert — three snapshot versions
    // (v0 base; v1 drops %11, edits %6; v2 drops %5, edits %9,
    // rebuilt FROM BASE so %11-not-%5 docs delete-then-REAPPEAR)
    // become validity intervals (valid_to NULL while current).
    // Deletions close intervals; re-appearances open new ones.
    Q("q201_scd2_history",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val snaps = base.select(lit(0L).as("version"), col("doc_id"), col("text"))
          .unionByName(base.filter(col("doc_id") % 11 =!= 0)
            .select(lit(1L).as("version"), col("doc_id"),
              when(col("doc_id") % 6 === 0, concat(lit("A "), col("text")))
                .otherwise(col("text")).as("text")))
          .unionByName(base.filter(col("doc_id") % 5 =!= 0)
            .select(lit(2L).as("version"), col("doc_id"),
              when(col("doc_id") % 9 === 0, concat(lit("B "), col("text")))
                .otherwise(col("text")).as("text")))
        graft.ops.Merge.scd2History(snaps, "version", "doc_id", "text")
      },
      Some("""WITH sn AS (
             |  SELECT 0 AS v, doc_id, text FROM documents
             |  UNION ALL
             |  SELECT 1, doc_id, CASE WHEN doc_id % 6 = 0
             |    THEN 'A ' || text ELSE text END
             |  FROM documents WHERE doc_id % 11 <> 0
             |  UNION ALL
             |  SELECT 2, doc_id, CASE WHEN doc_id % 9 = 0
             |    THEN 'B ' || text ELSE text END
             |  FROM documents WHERE doc_id % 5 <> 0),
             |ids AS (SELECT DISTINCT doc_id FROM sn),
             |vs AS (SELECT DISTINCT v FROM sn),
             |grid AS (SELECT ids.doc_id, vs.v FROM ids, vs),
             |st AS (SELECT g.doc_id, g.v, x.text FROM grid g
             |  LEFT JOIN sn x ON g.doc_id = x.doc_id AND g.v = x.v),
             |ch AS (SELECT * FROM (
             |    SELECT doc_id, v, text,
             |      lag(text) OVER (PARTITION BY doc_id ORDER BY v) AS prev
             |    FROM st)
             |  WHERE NOT (text IS NOT DISTINCT FROM prev)),
             |iv AS (SELECT doc_id, text, v AS valid_from,
             |    lead(v) OVER (PARTITION BY doc_id ORDER BY v) - 1
             |      AS valid_to
             |  FROM ch)
             |SELECT doc_id, text,
             |  CAST(valid_from AS BIGINT) AS valid_from,
             |  CAST(valid_to AS BIGINT) AS valid_to
             |FROM iv WHERE text IS NOT NULL""".stripMargin)),

    // Quality-aware waterfill (q202): q193's budget cut with the keep
    // order a production pipeline actually wants — shed the WORST
    // documents first, not hash-random ones. Priority = distinct-token
    // density (10^4 − uniq_bp ascending: most-unique kept first,
    // templated spam cut first); the nested-in-budget property
    // survives any fixed ordering. Same 95% budget as q193 — the diff
    // between the two kept sets is exactly "what quality-awareness
    // buys".
    Q("q202_quality_waterfill",
      (s, d) => Sampling.waterfillSampleBy(
        Tables.documents(s, d), "doc_id", "source", "n_chars", 9500L,
        Seq(expr("""10000 - coalesce(
          cast((size(array_distinct(filter(split(trim(text), '\\s+'),
            x -> x != ''))) * 10000L) DIV
            size(filter(split(trim(text), '\\s+'), x -> x != ''))
            as bigint), 0)""")))
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("n_chars")),
      Some("""WITH a AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
             |  FROM documents GROUP BY 1),
             |t AS (SELECT count(*) AS n, CAST(sum(avail) AS HUGEINT) AS tot
             |  FROM a),
             |s AS (SELECT source, avail,
             |    row_number() OVER (ORDER BY avail, source) AS rn,
             |    CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS HUGEINT) AS p
             |  FROM a),
             |s2 AS (SELECT s.source, s.avail, s.rn, s.p,
             |    t.tot * 9500 // 10000 AS b,
             |    t.n - s.rn + 1 AS m,
             |    (CAST(s.avail AS HUGEINT) * (t.n - s.rn + 1) + s.p
             |      <= t.tot * 9500 // 10000) AS sat
             |  FROM s, t),
             |pv AS (SELECT p AS pp, m AS pm FROM s2 WHERE NOT sat
             |  ORDER BY rn LIMIT 1),
             |al AS (SELECT s2.source,
             |    CAST(CASE WHEN sat THEN avail
             |      ELSE (b - pp) // pm +
             |        (CASE WHEN m <= (b - pp) % pm THEN 1 ELSE 0 END)
             |      END AS BIGINT) AS alloc
             |  FROM s2 LEFT JOIN pv ON TRUE),
             |pr AS (SELECT doc_id, source,
             |    CAST(n_chars AS BIGINT) AS n_chars,
             |    10000 - coalesce(CASE
             |      WHEN len(list_filter(string_split_regex(trim(text),
             |          '\s+'), x -> x <> '')) = 0 THEN NULL
             |      ELSE CAST(len(list_distinct(
             |        list_filter(string_split_regex(trim(text), '\s+'),
             |          x -> x <> ''))) * 10000
             |      // len(list_filter(string_split_regex(trim(text), '\s+'),
             |          x -> x <> '')) AS BIGINT) END, 0) AS ord0
             |  FROM documents),
             |r AS (SELECT doc_id, source, n_chars,
             |    sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY ord0, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum
             |  FROM pr)
             |SELECT r.doc_id, r.source, r.n_chars
             |FROM r JOIN al ON r.source = al.source
             |WHERE r.cum <= al.alloc""".stripMargin)),

    // Watermark planner (q203): at watermark delay W, how many events
    // would a streaming job drop? Measured on the micro-batch model
    // (bucket = one batch; watermark = running max over PRIOR
    // buckets). This event table arrives perfectly ordered, so the
    // query feeds the operator a SIMULATED client-upload schedule —
    // user_id % 3 hours of batching delay, the q58/q66 derived-
    // scenario discipline — and the curve reads the injected delays
    // back: heavy drops at W=0, zero at W >= 2h. Pick W off this
    // table, not from the docs.
    Q("q203_watermark_planner",
      (s, d) => EventAnalytics.watermarkPlanner(
        Tables.events(s, d),
        expr("unix_micros(ts) DIV 3600000000") + col("user_id") % 3,
        expr("unix_micros(ts)"),
        Seq(0L, 1800L, 3600L, 5400L, 7200L, 10800L)),
      Some("""WITH e AS (SELECT epoch_us(ts) AS us,
             |    epoch_us(ts) // 3600000000 + user_id % 3 AS b
             |  FROM events),
             |bm AS (SELECT b, max(us) AS mx FROM e GROUP BY 1),
             |c1 AS (SELECT b, max(mx) OVER (ORDER BY b
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
             |  FROM bm),
             |cm AS (SELECT b, lag(cm) OVER (ORDER BY b) AS pm FROM c1),
             |j AS (SELECT e.us, cm.pm FROM e JOIN cm ON e.b = cm.b),
             |g AS (SELECT CAST(unnest([0, 1800, 3600, 5400, 7200, 10800])
             |    AS BIGINT) AS watermark_s)
             |SELECT CAST(g.watermark_s AS BIGINT) AS watermark_s,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN j.us < j.pm - g.watermark_s * 1000000
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             |  CAST(sum(CASE WHEN j.us < j.pm - g.watermark_s * 1000000
             |    THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
             |    AS dropped_bp
             |FROM j, g GROUP BY g.watermark_s""".stripMargin)),

    // Asset-embedding near-dup (q204): the multimodal near-dup loop
    // CLOSED — Multimodal.assetEmbeddings turns every asset into an
    // ANN-ready vector (real lumaGridQ spatial-luma grid for decoded
    // images — the former feature stub, now pixel truth, spec-pinned
    // on the committed PNG/BMP fixtures; byteMomentsQ centered
    // residue-class byte means otherwise), and this query feeds those
    // vectors through the q45 exact cosine-pair plan. The synthesized
    // payloads here are text bytes (q123's asset contract), so the
    // driver-gated branch is byteMomentsQ — whose exact integers the
    // DuckDB oracle REBUILDS from hex(encode(text)), making the whole
    // asset→embedding→near-dup chain hash-verifiable cross-engine.
    // Vector components are exact integers < 2.55e6 (exact as Float),
    // so pair dots/norms are integer-exact in double on both engines
    // and the only float surface is the final round4 cosine. Exact
    // pairs here = oracle ground truth; the 100 TB path is the SAME
    // vectors through Similarity.cosineNearDupPairs' LSH buckets
    // (MultimodalSpec pins LSH ≡ exact on these embeddings).
    Q("q204_asset_neardup",
      (s, d) => {
        import s.implicits._
        val assets = Tables.documents(s, d)
          .filter(col("n_chars") > 0)
          .select(col("doc_id").cast("string").as("path"),
            lit("binary").as("modality"),
            octet_length(col("text")).cast("long").as("length"),
            col("text").cast("binary").as("content"))
          .as[graft.multimodal.RawAsset]
        // staged: the self-join consumes the decoded vectors twice —
        // without the stage each side would re-run the whole decode
        val vecs = graft.ops.Staged.stage(
          graft.multimodal.Multimodal.assetEmbeddings(assets, 16)
            .select(col("path").cast("long").as("id"), col("features")))
        val a = vecs.select(col("id").as("id_a"), col("features").as("va"))
        val b = vecs.select(col("id").as("id_b"), col("features").as("vb"))
        a.join(b, col("id_a") < col("id_b"))
          .withColumn("sim", Num.roundz(
            graft.functions.CosineSimilarityExpr.cosineSim(
              col("va"), col("vb")), 4))
          .filter(col("sim") >= 0.9)
          .select("id_a", "id_b", "sim")
      },
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
             |    octet_length(encode(text)) AS L
             |  FROM documents WHERE n_chars > 0),
             |by AS (SELECT doc_id, L, j,
             |    ('0x' || substr(h, j*2+1, 2))::BIGINT AS v
             |  FROM (SELECT doc_id, L, h, unnest(range(L)) AS j FROM b)),
             |res AS (SELECT doc_id, j % 16 AS i, sum(v) AS s,
             |    count(*) AS c
             |  FROM by GROUP BY 1, 2),
             |tot AS (SELECT doc_id, sum(v) * 10000 // max(L) AS dm
             |  FROM by GROUP BY 1),
             |grid AS (SELECT doc_id, unnest(range(16)) AS i FROM b),
             |f AS (SELECT g.doc_id, g.i,
             |    coalesce(r.s * 10000 // r.c - t.dm, 0) AS f
             |  FROM grid g LEFT JOIN res r
             |    ON g.doc_id = r.doc_id AND g.i = r.i
             |  JOIN tot t ON g.doc_id = t.doc_id),
             |vecs AS (SELECT doc_id, list(f ORDER BY i)::DOUBLE[] AS fv
             |  FROM f GROUP BY 1),
             |nz AS (SELECT * FROM vecs
             |  WHERE len(list_filter(fv, x -> x <> 0)) > 0)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  round(list_dot_product(a.fv, b.fv) /
             |    (sqrt(list_dot_product(a.fv, a.fv)) *
             |     sqrt(list_dot_product(b.fv, b.fv))), 4) + 0.0 AS sim
             |FROM nz a JOIN nz b ON a.doc_id < b.doc_id
             |WHERE round(list_dot_product(a.fv, b.fv) /
             |    (sqrt(list_dot_product(a.fv, a.fv)) *
             |     sqrt(list_dot_product(b.fv, b.fv))), 4) + 0.0 >= 0.9
             |""".stripMargin)),

    // HTML main-content extraction (q205): the intake step before
    // every gate the engine has — tag-strip + per-block link-density
    // boilerplate scoring (HtmlExtract.mainContent, JusText's
    // load-bearing rule as pure Catalyst expressions, zero shuffles).
    // The corpus is plain text, so the query SYNTHESIZES a realistic
    // page around each document (the q58/q66 derived-scenario
    // discipline): stripped head with style+script, a nav of three
    // short link items, the document as the content paragraph, a LONG
    // (~350 char) but link-dense related-articles block — longer than
    // minChars, so only the DENSITY rule can drop it — an adversarial
    // body script whose string literal contains "</p>" (a fake
    // closing tag that must be stripped before segmentation, else the
    // segment count shifts), and a link-only footer. The document
    // text is HTML-ESCAPED into the content paragraph (& → &amp;
    // first, then < → &lt; — what a real renderer emits), which the
    // extraction's entity decode (amp LAST) maps back to the original
    // bytes — so the oracle's closed form holds for ANY fixture text,
    // not just metacharacter-free corpora (ADVICE r10), and entity
    // decoding is exercised corpus-wide instead of only on the
    // adversarial block. The ORACLE is
    // independent ground truth derived from the PAGE SPEC, not a
    // mirror of the extraction pipeline: the five boilerplate
    // segments are known by construction (escaping guarantees the
    // content paragraph can never leak a tag into segmentation), and
    // the kept content is exactly the whitespace-collapsed document
    // when it clears minChars=280 (~median, so both branches run
    // corpus-wide) — if any regex, entity, or split rule misbehaves,
    // the md5s diverge.
    Q("q205_html_main_content",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pages = docs.select(col("doc_id"), concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style>p{margin:0}</style></head><body>" +
            "<script>track(\"</p> not content \");</script>" +
            "<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/s/"),
          col("source"),
          lit("\">Section</a></li><li><a href=\"/l/"), col("lang"),
          lit("\">Language</a></li></ul></nav><div class=\"content\"><p>"),
          regexp_replace(regexp_replace(col("text"), "&", "&amp;"),
            "<", "&lt;"),
          lit("</p></div><div>Related articles selected for readers of "),
          col("source"),
          lit(": <a href=\"/r/1\">one more long piece about warp " +
            "preparation and sizing on this route</a>, <a href=\"/r/2\">" +
            "another recommended article on shed geometry and harness " +
            "timing</a>, <a href=\"/r/3\">a third suggested reading link " +
            "covering weft insertion diagnostics</a> — curated weekly by " +
            "the editors, updated every shift change for the "),
          col("lang"),
          lit(" edition with fresh picks.</div><footer><a href=\"/c\">" +
            "Contact</a> | <a href=\"/t\">Terms</a> | <a href=\"/r\">RSS" +
            "</a></footer></body></html>")).as("html"))
        graft.ingest.HtmlExtract.mainContent("doc_id", "html",
            minChars = 280)(pages)
          .select(col("doc_id"), col("n_segments"), col("n_kept"),
            length(col("main_text")).cast("long").as("n_chars_main"),
            md5(col("main_text")).as("main_md5"))
      },
      Some("""WITH v AS (SELECT doc_id,
             |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS vt
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(5 + (CASE WHEN vt <> '' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_segments,
             |  CAST(CASE WHEN len(vt) >= 280 THEN 1 ELSE 0 END
             |    AS BIGINT) AS n_kept,
             |  CAST(len(CASE WHEN len(vt) >= 280 THEN vt ELSE '' END)
             |    AS BIGINT) AS n_chars_main,
             |  md5(CASE WHEN len(vt) >= 280 THEN vt ELSE '' END)
             |    AS main_md5
             |FROM v""".stripMargin)),

    // URL canonicalization + URL-grain dedup (q206): the crawl-side
    // identity step (ingest/Urls.withCanonical — pure Catalyst
    // regexp/string expressions, RE2-subset so DuckDB runs the
    // byte-identical patterns). The corpus has no URL column, so the
    // query SYNTHESIZES a messy-but-deterministic URL per document
    // (the q58/q66/q205 derived-scenario discipline), exercising every
    // canonicalization rule corpus-wide: scheme case (HTTP/HttpS),
    // userinfo (%19), WWW. prefix (%3), host case (upper(source) on
    // evens), trailing root-dot (%13), a real :8080 that must SURVIVE
    // (%7) vs default :80 / leading-zero :0443 that must DROP,
    // duplicate+trailing slashes, three tracking-param orderings that
    // all collapse to `id=PID&page=2`, a tracking-only query whose `?`
    // must vanish (%11), fragments (%4==2), and relative URLs (%17)
    // that must map to NULL — reject visible, not passthrough. PID =
    // doc_id DIV 4, so the four docs of a quad collide on path iff
    // they also share scheme parity + source + lang — REAL collisions
    // fall out of canonical-string equality (n_variants > 1), both
    // engines computing them independently. One Exchange total: the
    // window over url_canon IS the URL-grain dedup (keeper = min
    // doc_id per canonical identity).
    Q("q206_url_canonicalize",
      (s, d) => {
        val canon = graft.ingest.Urls.withCanonical(
          syntheticUrls(Tables.documents(s, d)), "url")
        val w = Window.partitionBy(col("url_canon"))
        canon.select(col("doc_id"), col("url_canon"), col("url_host"),
          col("url_site"),
          when(col("url_canon").isNotNull, count(lit(1)).over(w))
            .cast("bigint").as("n_variants"),
          when(col("url_canon").isNotNull,
            (col("doc_id") === min(col("doc_id")).over(w)).cast("bigint"))
            .as("is_keeper"))
      },
      Some(urlOracleCtes +
        """
          |SELECT doc_id, url_canon, url_host, url_site,
          |  CASE WHEN url_canon IS NOT NULL
          |    THEN count(*) OVER (PARTITION BY url_canon) END AS n_variants,
          |  CASE WHEN url_canon IS NOT NULL THEN
          |    CAST(doc_id = min(doc_id) OVER (PARTITION BY url_canon)
          |      AS BIGINT) END AS is_keeper
          |FROM k""".stripMargin)),

    // Per-host crawl quota (q207): q206 cashed in — the composition a
    // crawl intake actually runs, under ONE oracle: canonicalize →
    // URL-grain dedup (keeper = min doc per canonical identity,
    // rejects excluded — they have no identity to quota) → q187/q193's
    // max-min-fair waterfill at an 80% character budget keyed by
    // CANONICAL HOST (big hosts get capped, small hosts keep
    // everything — per-host politeness/quota is the standard
    // crawl-side fairness grain, and the verdict's "domain quotas"
    // gap). The DuckDB oracle re-executes the whole chain — the
    // shared q206 CTEs, the group-dedup, and the full waterfill
    // closed form — so the hash gate certifies the three-operator
    // composition end to end, not per-stage luck. Shuffle story:
    // canonicalization scan-side; ONE Exchange for the url_canon
    // dedup; ONE id-equi-join back to sizes; the allocation is
    // group-domain math broadcast onto the corpus; the prefix cut is
    // a per-host window (never a global sort — q193's plan pin).
    Q("q207_host_quota",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // fan out before the canonicalization chain (its regex folds
        // are the query's CPU, profiled 2.6 s single-task at sf0.1) and
        // STAGE kd: the waterfill reads its input twice (group-grain
        // aggregate + corpus-grain window) — unstaged, each branch
        // re-ran the whole canon+dedup+join subtree
        val canon = graft.ingest.Urls.withCanonical(
            graft.ops.Skew.fanOutForCpu(syntheticUrls(docs),
              Seq(col("doc_id"))), "url")
          .where(col("url_canon").isNotNull)
        val keepers = canon.groupBy(col("url_canon"))
          .agg(min(col("doc_id")).as("doc_id"),
            min(col("url_host")).as("url_host"))
        val kd = graft.ops.Staged.stageCut(keepers
          .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
          .select(col("doc_id"), col("url_host"), col("n_chars")))
        Sampling.waterfillSample(kd, "doc_id", "url_host", "n_chars", 8000L)
          .select(col("doc_id"), col("source").as("url_host"),
            col("n_chars").cast("long").as("n_chars"))
      },
      Some(urlOracleCtes +
        """,
          |keep AS (SELECT url_canon, min(doc_id) AS doc_id FROM k
          |  WHERE url_canon IS NOT NULL GROUP BY url_canon),
          |kd AS (SELECT keep.doc_id, k2.url_host AS g,
          |    CAST(d.n_chars AS BIGINT) AS n_chars
          |  FROM keep JOIN k k2 ON k2.doc_id = keep.doc_id
          |  JOIN documents d ON d.doc_id = keep.doc_id)""".stripMargin +
        sqlWaterfillFromKd("url_host"))),

    // Percent-decoding + dot-segment resolution (q208): the round-10
    // verdict's top gap — real crawl feeds carry `%7E`/`/a/../b`
    // forms, and without RFC 3986 §6.2.2.2 unreserved-octet decoding
    // and §5.2.4 dot-segment removal, `http://a/%7Ex` and
    // `http://a/~x` are DISTINCT dedup identities (silent under-merge
    // feeding q206/q207). Same derived-scenario discipline as q206,
    // new synthesis ([[syntheticUrls2]]): per quad (PID = doc_id DIV
    // 4), four spellings of ONE identity — plain, percent-encoded
    // (host `d%4Fcs...%6Frg` with case-mixed hex, path `/%61/…/%7E`,
    // query `t=v%61l`), dot-segmented (`/a/x/../LANG/./~PID`), and
    // combined-with-underflow (`/../a/%2E/…/%2E%2E/~PID` — escapes
    // decode INTO dot segments that then resolve) — all collapsing to
    // `http://docs.example.org/a/LANG/~PID?id=PID&t=val&z=a%2Fb`,
    // where the reserved `%2F` stays BYTE-EXACT (decoding it would
    // change identity). A %9 deep-nest prefix (`/b/c/../..`) tests
    // multi-pass popping; %13 appends `:065535` (leading-zero fold to
    // the boundary-valid :65535); %23 `:65536` and %29 a 23-digit
    // port (ADVICE's BIGINT-overflow adversary) must REJECT all three
    // columns — cast-free validity, no engine overflow; %17 stays the
    // relative-URL reject. Collisions fall out of canonical-string
    // equality exactly as in q206 (quad members collide iff same lang
    // + query parity + port branch); the oracle re-runs the WHOLE
    // chain through the shared urlParseCtes — the decode/dot regexes
    // are interpolated from ingest/Urls' constants, so the two
    // engines cannot drift. Plan shape identical to q206: scan-side
    // canonicalization, ONE Exchange (the url_canon window).
    Q("q208_url_decode_dots",
      (s, d) => {
        val canon = graft.ingest.Urls.withCanonical(
          syntheticUrls2(Tables.documents(s, d)), "url")
        val w = Window.partitionBy(col("url_canon"))
        canon.select(col("doc_id"), col("url_canon"), col("url_host"),
          col("url_site"),
          when(col("url_canon").isNotNull, count(lit(1)).over(w))
            .cast("bigint").as("n_variants"),
          when(col("url_canon").isNotNull,
            (col("doc_id") === min(col("doc_id")).over(w)).cast("bigint"))
            .as("is_keeper"))
      },
      Some("""WITH u AS (SELECT doc_id,
          |  CASE WHEN doc_id % 17 = 0
          |  THEN 'relative/' || CAST(doc_id // 4 AS VARCHAR)
          |  ELSE 'http://'
          |    || (CASE WHEN doc_id % 4 = 1 THEN 'd%4Fcs.example.%6Frg'
          |         WHEN doc_id % 4 = 3 THEN 'DOCS.example.org'
          |         ELSE 'docs.example.org' END)
          |    || (CASE WHEN doc_id % 23 = 0 THEN ':65536'
          |         WHEN doc_id % 29 = 0 THEN ':99999999999999999999999'
          |         WHEN doc_id % 13 = 0 THEN ':065535' ELSE '' END)
          |    || (CASE WHEN doc_id % 9 = 0 THEN '/b/c/../..' ELSE '' END)
          |    || (CASE WHEN doc_id % 4 = 0 THEN '/a/' || lang || '/~'
          |           || CAST(doc_id // 4 AS VARCHAR)
          |         WHEN doc_id % 4 = 1 THEN '/%61/' || lang || '/%7E'
          |           || CAST(doc_id // 4 AS VARCHAR)
          |         WHEN doc_id % 4 = 2 THEN '/a/x/../' || lang || '/./~'
          |           || CAST(doc_id // 4 AS VARCHAR)
          |         ELSE '/../a/%2E/' || lang || '/y/%2E%2E/~'
          |           || CAST(doc_id // 4 AS VARCHAR) END)
          |    || (CASE WHEN doc_id % 2 = 0 THEN '?id='
          |           || CAST(doc_id // 4 AS VARCHAR) || '&t=val&z=a%2Fb'
          |         ELSE '?t=v%61l&z=a%2Fb&id='
          |           || CAST(doc_id // 4 AS VARCHAR) END)
          |  END AS url FROM documents),
          |""".stripMargin + urlParseCtes +
        """
          |SELECT doc_id, url_canon, url_host, url_site,
          |  CASE WHEN url_canon IS NOT NULL
          |    THEN count(*) OVER (PARTITION BY url_canon) END AS n_variants,
          |  CASE WHEN url_canon IS NOT NULL THEN
          |    CAST(doc_id = min(doc_id) OVER (PARTITION BY url_canon)
          |      AS BIGINT) END AS is_keeper
          |FROM k""".stripMargin)),

    // PSL-backed registrable domain (q209): the verdict's url_site
    // gap — the last-2-labels fallback is WRONG for *.co.uk/*.com.br
    // (every co.uk tenant merges into one "site", so a registrable-
    // domain quota starves them collectively). The Public Suffix List
    // is reference DATA, not engine logic: ingest/Urls.loadPsl parses
    // the committed fixture subset (real publicsuffix.org format —
    // comments, wildcard *.ck, exception !www.ck) into match keys,
    // and Urls.withPslSite computes suffix+1 with ZERO corpus
    // Exchange: one host-tail candidate per key depth, each left-
    // BROADCAST-joined against the ≤#rules depth partition, selection
    // pure-expression (exception wins, else deepest, else implicit
    // *). Synthesis exercises every PSL rule form: multi-label
    // normal (w.aPID.co.uk → aPID.co.uk, where the fallback collapses
    // to 'co.uk'), com.br, plain com, wildcard (*.ck makes
    // shop.zPID.ck its own 3-label site), exception (subPID.www.ck →
    // www.ck), an unlisted TLD (implicit-*), a host that IS a public
    // suffix (co.uk → itself, no registrable domain), and dotless
    // localhost. The fallback column rides along so the fixture
    // demonstrates exactly WHERE the two disagree. Oracle re-runs the
    // whole chain — PSL file parse via read_text, the same depth
    // joins, the same selection — on the same committed fixture.
    Q("q209_psl_site",
      (s, d) => {
        requirePslFixtures()
        val pid = expr("doc_id DIV 4").cast("string")
        val host =
          when(col("doc_id") % 11 === 0, lit("localhost"))
            .when(col("doc_id") % 7 === 0, concat(lit("w.a"), pid, lit(".co.uk")))
            .when(col("doc_id") % 7 === 1, concat(lit("b"), pid, lit(".com.br")))
            .when(col("doc_id") % 7 === 2, concat(lit("x"), pid, lit(".example.com")))
            .when(col("doc_id") % 7 === 3, concat(lit("shop.z"), pid, lit(".ck")))
            .when(col("doc_id") % 7 === 4, concat(lit("sub"), pid, lit(".www.ck")))
            .when(col("doc_id") % 7 === 5, concat(lit("q"), pid, lit(".test")))
            .otherwise(lit("co.uk"))
        val hosts = Tables.documents(s, d).select(col("doc_id"), host.as("host"))
        val psl = graft.ingest.Urls.loadPsl(s, s"$pslFixtureRoot/psl.dat")
        graft.ingest.Urls.withPslSite(hosts, "host", psl)
          .withColumn("url_site_fallback",
            when(regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1) === "",
              col("host"))
              .otherwise(regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1)))
          .select(col("doc_id"), col("host"), col("url_site_psl"),
            col("url_site_fallback"))
      },
      Some(s"""WITH hostsrc AS (SELECT doc_id,
          |  CASE WHEN doc_id % 11 = 0 THEN 'localhost'
          |    WHEN doc_id % 7 = 0 THEN 'w.a' || CAST(doc_id // 4 AS VARCHAR) || '.co.uk'
          |    WHEN doc_id % 7 = 1 THEN 'b' || CAST(doc_id // 4 AS VARCHAR) || '.com.br'
          |    WHEN doc_id % 7 = 2 THEN 'x' || CAST(doc_id // 4 AS VARCHAR) || '.example.com'
          |    WHEN doc_id % 7 = 3 THEN 'shop.z' || CAST(doc_id // 4 AS VARCHAR) || '.ck'
          |    WHEN doc_id % 7 = 4 THEN 'sub' || CAST(doc_id // 4 AS VARCHAR) || '.www.ck'
          |    WHEN doc_id % 7 = 5 THEN 'q' || CAST(doc_id // 4 AS VARCHAR) || '.test'
          |    ELSE 'co.uk' END AS host
          |  FROM documents)""".stripMargin + sqlPslCtes +
        s"""
          |SELECT doc_id, host, url_site_psl,
          |  CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) = '' THEN host
          |    ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END AS url_site_fallback
          |FROM sited""".stripMargin)),

    // Registrable-domain crawl quota (q210): the URL family closed
    // end to end — the composition a crawl intake runs when its
    // fairness grain is the REGISTRABLE DOMAIN rather than q207's
    // host: canonicalize (q208's full chain: percent-decode, dot
    // segments, port validity, tracking params) → URL-grain dedup
    // (keeper = min doc per canonical identity; rejects excluded) →
    // PSL site resolution on the keeper's canonical host (q209's
    // depth-joins — exactly where the last-2-labels fallback would
    // merge every co.uk tenant into one starved quota group) →
    // q187/q193's max-min-fair waterfill at an 80% character budget
    // keyed by url_site_psl. The synthesis varies hosts across the
    // PSL rule forms WITH crawl noise the canonicalizer must fold
    // first (scheme case, WWW. on the co.uk arm — whose site survives
    // the www fold, userinfo, trailing root-dot on the .com arm, //
    // path, tracking params, %17 relative rejects), and quads collide
    // on canonical identity before any quota math. The DuckDB oracle
    // re-executes all FOUR operators through the shared CTE chains
    // (urlParseCtes + sqlPslCtes + sqlWaterfillFromKd — one
    // definition per stage across q206-q210, zero drift). Shuffle
    // story: canonicalization scan-side, ONE corpus Exchange for the
    // url_canon dedup, 4 broadcast PSL joins (zero Exchange), one
    // id-equi-join back to sizes, broadcast allocation, per-site
    // prefix window — never a global sort.
    Q("q210_site_quota",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // same two fixes as q207: fan out the scan-side canon chain,
        // stage kd against the waterfill's double read
        val canon = graft.ingest.Urls.withCanonical(
            graft.ops.Skew.fanOutForCpu(syntheticUrls3(docs),
              Seq(col("doc_id"))), "url")
          .where(col("url_canon").isNotNull)
        val keepers = canon.groupBy(col("url_canon"))
          .agg(min(col("doc_id")).as("doc_id"),
            min(col("url_host")).as("url_host"))
        val psl = graft.ingest.Urls.loadPsl(s, s"$pslFixtureRoot/psl.dat")
        val sited = graft.ingest.Urls.withPslSite(keepers, "url_host", psl)
        val kd = graft.ops.Staged.stageCut(sited
          .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
          .select(col("doc_id"), col("url_site_psl").as("site"),
            col("n_chars")))
        Sampling.waterfillSample(kd, "doc_id", "site", "n_chars", 8000L)
          .select(col("doc_id"), col("source").as("site"),
            col("n_chars").cast("long").as("n_chars"))
      },
      Some("""WITH u AS (SELECT doc_id,
          |  CASE WHEN doc_id % 17 = 0
          |  THEN 'page/' || CAST(doc_id // 4 AS VARCHAR)
          |  ELSE (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END)
          |    || '://'
          |    || (CASE WHEN doc_id % 19 = 0 THEN 'u:p@' ELSE '' END)
          |    || (CASE
          |         WHEN doc_id % 11 = 0 THEN 'localhost'
          |         WHEN doc_id % 7 = 0 THEN 'WWW.a' || CAST(doc_id % 4 AS VARCHAR) || '.co.uk'
          |         WHEN doc_id % 7 = 1 THEN 'b' || CAST(doc_id % 3 AS VARCHAR) || '.Com.BR'
          |         WHEN doc_id % 7 = 2 THEN 'x' || CAST(doc_id % 5 AS VARCHAR) || '.example.com.'
          |         WHEN doc_id % 7 = 3 THEN 'shop.z' || CAST(doc_id % 2 AS VARCHAR) || '.ck'
          |         WHEN doc_id % 7 = 4 THEN 'sub' || CAST(doc_id % 3 AS VARCHAR) || '.www.ck'
          |         WHEN doc_id % 7 = 5 THEN 'q' || CAST(doc_id % 4 AS VARCHAR) || '.test'
          |         ELSE 'co.uk' END)
          |    || '//d/' || lang || '/' || CAST(doc_id // 4 AS VARCHAR)
          |    || '?id=' || CAST(doc_id // 4 AS VARCHAR) || '&utm_source=x'
          |  END AS url FROM documents),
          |""".stripMargin + urlParseCtes +
        """,
          |keep AS (SELECT url_canon, min(doc_id) AS doc_id FROM k
          |  WHERE url_canon IS NOT NULL GROUP BY url_canon),
          |hostsrc AS (SELECT keep.doc_id, k2.url_host AS host
          |  FROM keep JOIN k k2 ON k2.doc_id = keep.doc_id)""".stripMargin +
        sqlPslCtes +
        """,
          |kd AS (SELECT s.doc_id, s.url_site_psl AS g,
          |    CAST(d.n_chars AS BIGINT) AS n_chars
          |  FROM sited s JOIN documents d ON d.doc_id = s.doc_id)""".stripMargin +
        sqlWaterfillFromKd("site")))
  )

  /** The q206/q207 synthetic messy-URL projection (the q58/q66/q205
    * derived-scenario discipline — the corpus has no URL column, so a
    * deterministic messy URL is built per document, exercising every
    * canonicalization rule corpus-wide; see q206's registration
    * comment for the per-modulus design). */
  private def syntheticUrls(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pid = expr("doc_id DIV 4").cast("string")
    val messy = concat(
      when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("HttpS")),
      lit("://"),
      when(col("doc_id") % 19 === 0, lit("user:pw@")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
      when(col("doc_id") % 2 === 0, upper(col("source")))
        .otherwise(col("source")),
      lit(".Example.COM"),
      when(col("doc_id") % 13 === 0, lit(".")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit(":8080"))
        .when(col("doc_id") % 2 === 0 && col("doc_id") % 5 === 0, lit(":80"))
        .when(col("doc_id") % 2 === 1 && col("doc_id") % 5 === 1,
          lit(":0443"))
        .otherwise(lit("")),
      lit("//articles//"), col("lang"), lit("/"), pid,
      when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
      lit("?"),
      when(col("doc_id") % 11 === 0, lit("utm_source=feed&gclid=1"))
        .when(col("doc_id") % 3 === 0,
          concat(lit("utm_source=feed&id="), pid,
            lit("&page=2&utm_campaign=x")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("page=2&fbclid=abc&id="), pid))
        .otherwise(concat(lit("id="), pid, lit("&page=2"))),
      when(col("doc_id") % 4 === 2, lit("#section-2")).otherwise(lit("")))
    docs.select(col("doc_id"),
      when(col("doc_id") % 17 === 0,
        concat(lit("/relative/"), col("lang"), lit("/"), pid))
        .otherwise(messy).as("url"))
  }

  /** q208's synthesis (its oracle mirror is inlined in q208's
    * registration): four spellings of one identity per quad — see
    * q208's registration comment for the per-modulus design. */
  private def syntheticUrls2(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pid = expr("doc_id DIV 4").cast("string")
    val host =
      when(col("doc_id") % 4 === 1, lit("d%4Fcs.example.%6Frg"))
        .when(col("doc_id") % 4 === 3, lit("DOCS.example.org"))
        .otherwise(lit("docs.example.org"))
    val port =
      when(col("doc_id") % 23 === 0, lit(":65536"))
        .when(col("doc_id") % 29 === 0, lit(":99999999999999999999999"))
        .when(col("doc_id") % 13 === 0, lit(":065535"))
        .otherwise(lit(""))
    val deep =
      when(col("doc_id") % 9 === 0, lit("/b/c/../..")).otherwise(lit(""))
    val path =
      when(col("doc_id") % 4 === 0,
        concat(lit("/a/"), col("lang"), lit("/~"), pid))
        .when(col("doc_id") % 4 === 1,
          concat(lit("/%61/"), col("lang"), lit("/%7E"), pid))
        .when(col("doc_id") % 4 === 2,
          concat(lit("/a/x/../"), col("lang"), lit("/./~"), pid))
        .otherwise(
          concat(lit("/../a/%2E/"), col("lang"), lit("/y/%2E%2E/~"), pid))
    val query =
      when(col("doc_id") % 2 === 0,
        concat(lit("?id="), pid, lit("&t=val&z=a%2Fb")))
        .otherwise(concat(lit("?t=v%61l&z=a%2Fb&id="), pid))
    val messy = concat(lit("http://"), host, port, deep, path, query)
    docs.select(col("doc_id"),
      when(col("doc_id") % 17 === 0, concat(lit("relative/"), pid))
        .otherwise(messy).as("url"))
  }

  /** q210's synthesis (oracle mirror inlined in its registration):
    * PSL-exercising hosts under crawl noise the canonicalizer must
    * fold first — see q210's registration comment. */
  private def syntheticUrls3(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pid = expr("doc_id DIV 4").cast("string")
    val host =
      when(col("doc_id") % 11 === 0, lit("localhost"))
        .when(col("doc_id") % 7 === 0,
          concat(lit("WWW.a"), (col("doc_id") % 4).cast("string"), lit(".co.uk")))
        .when(col("doc_id") % 7 === 1,
          concat(lit("b"), (col("doc_id") % 3).cast("string"), lit(".Com.BR")))
        .when(col("doc_id") % 7 === 2,
          concat(lit("x"), (col("doc_id") % 5).cast("string"), lit(".example.com.")))
        .when(col("doc_id") % 7 === 3,
          concat(lit("shop.z"), (col("doc_id") % 2).cast("string"), lit(".ck")))
        .when(col("doc_id") % 7 === 4,
          concat(lit("sub"), (col("doc_id") % 3).cast("string"), lit(".www.ck")))
        .when(col("doc_id") % 7 === 5,
          concat(lit("q"), (col("doc_id") % 4).cast("string"), lit(".test")))
        .otherwise(lit("co.uk"))
    val messy = concat(
      when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("http")),
      lit("://"),
      when(col("doc_id") % 19 === 0, lit("u:p@")).otherwise(lit("")),
      host,
      lit("//d/"), col("lang"), lit("/"), pid,
      lit("?id="), pid, lit("&utm_source=x"))
    docs.select(col("doc_id"),
      when(col("doc_id") % 17 === 0, concat(lit("page/"), pid))
        .otherwise(messy).as("url"))
  }

  /** DuckDB mirror of [[graft.ingest.Urls.percentDecodeUnreserved]]
    * applied to expression `e`: split on `%`, decode fragments whose
    * 2-hex prefix matches the SHARED [[graft.ingest.Urls.unresHexRe]]
    * (interpolated, not retyped — zero drift surface), hex value via
    * strpos arithmetic (DuckDB has no `conv`; both paths are gated by
    * the identical regex so they only ever see valid hex), rejoin.
    * `coalesce(array_to_string(...), '')` because DuckDB returns NULL
    * for an empty-list join where Spark's array_join returns ''. */
  private def sqlPercentDecode(e: String): String =
    s"string_split($e, '%')[1] || coalesce(array_to_string(" +
      s"list_transform(string_split($e, '%')[2:], x -> " +
      s"CASE WHEN regexp_matches(lower(substr(x, 1, 2)), " +
      s"'${graft.ingest.Urls.unresHexRe}') " +
      s"THEN chr(CAST((strpos('0123456789abcdef', lower(substr(x, 1, 1))) - 1) " +
      s"* 16 + strpos('0123456789abcdef', lower(substr(x, 2, 1))) - 1 AS INT)) " +
      s"|| substr(x, 3) ELSE '%' || x END), ''), '')"

  /** DuckDB mirror of [[graft.ingest.Urls.resolveDotSegments]]: the
    * same single-dot pass, [[graft.ingest.Urls.dotSegmentDepth]] pop
    * passes, and the underflow clamp — every pattern interpolated
    * from the Spark-side constants. */
  private def sqlDotResolve(e: String): String = {
    import graft.ingest.Urls.{singleDotRe, popSegmentRe, underflowRe, dotSegmentDepth}
    val p1 = s"regexp_replace($e, '$singleDotRe', '/', 'g')"
    val popped = (1 to dotSegmentDepth).foldLeft(p1)((acc, _) =>
      s"regexp_replace($acc, '$popSegmentRe', '/', 'g')")
    s"regexp_replace($popped, '$underflowRe', '/', 'g')"
  }

  /** The q207/q210 shared waterfill closed form (q187/q193's math):
    * FROM a prior CTE `kd` = (doc_id, g, n_chars) to the kept rows at
    * the 80% budget, with `g` aliased back to the query's grain name
    * in the final select. One definition serves the host-grain (q207)
    * and registrable-domain-grain (q210) quotas — zero drift. */
  private def sqlWaterfillFromKd(gAlias: String): String =
    s""",
      |a AS (SELECT g, CAST(sum(n_chars) AS BIGINT) AS avail
      |  FROM kd GROUP BY 1),
      |t AS (SELECT count(*) AS n, CAST(sum(avail) AS HUGEINT) AS tot
      |  FROM a),
      |s AS (SELECT g, avail,
      |    row_number() OVER (ORDER BY avail, g) AS rn,
      |    CAST(coalesce(sum(avail) OVER (ORDER BY avail, g
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS HUGEINT) AS p
      |  FROM a),
      |s2 AS (SELECT s.g, s.avail, s.rn, s.p,
      |    t.tot * 8000 // 10000 AS b,
      |    t.n - s.rn + 1 AS m,
      |    (CAST(s.avail AS HUGEINT) * (t.n - s.rn + 1) + s.p
      |      <= t.tot * 8000 // 10000) AS sat
      |  FROM s, t),
      |pv AS (SELECT p AS pp, m AS pm FROM s2 WHERE NOT sat
      |  ORDER BY rn LIMIT 1),
      |al AS (SELECT s2.g,
      |    CAST(CASE WHEN sat THEN avail
      |      ELSE (b - pp) // pm +
      |        (CASE WHEN m <= (b - pp) % pm THEN 1 ELSE 0 END)
      |      END AS BIGINT) AS alloc
      |  FROM s2 LEFT JOIN pv ON TRUE),
      |r AS (SELECT doc_id, g, n_chars,
      |    sum(n_chars) OVER (PARTITION BY g
      |      ORDER BY md5('wf:' || CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM kd)
      |SELECT r.doc_id, r.g AS $gAlias, r.n_chars
      |FROM r JOIN al ON r.g = al.g
      |WHERE r.cum <= al.alloc""".stripMargin

  /** The q209/q210 shared PSL oracle chain: FROM a prior CTE
    * `hostsrc` = (doc_id, host) to CTE `sited` = (doc_id, host,
    * url_site_psl) — the [[graft.ingest.Urls.loadPsl]] parse
    * (read_text on the same committed fixture both engines read) and
    * the [[graft.ingest.Urls.withPslSite]] depth-join + selection,
    * re-expressed in SQL once and reused by both gates. */
  private def sqlPslCtes: String =
    s""",
      |rl AS (SELECT trim(line) AS line FROM (
      |    SELECT unnest(string_split(content, chr(10))) AS line
      |    FROM read_text('$pslFixtureRoot/psl.dat'))),
      |pr AS (SELECT lower(CASE WHEN line LIKE '!%' THEN substr(line, 2)
      |      WHEN line LIKE '*.%' THEN substr(line, 3)
      |      ELSE line END) AS key,
      |    line LIKE '!%' AS exc, line LIKE '*.%' AS wild
      |  FROM rl WHERE line <> '' AND NOT line LIKE '//%'),
      |pk AS (SELECT key, CAST(len(string_split(key, '.')) AS INT) AS klab, exc,
      |    CAST(CASE WHEN exc THEN len(string_split(key, '.')) - 1
      |      WHEN wild THEN len(string_split(key, '.')) + 1
      |      ELSE len(string_split(key, '.')) END AS INT) AS ps_len
      |  FROM pr),
      |psl AS (SELECT key, klab,
      |    max(CASE WHEN exc THEN ps_len END) AS exc_ps,
      |    max(CASE WHEN NOT exc THEN ps_len END) AS norm_ps
      |  FROM pk WHERE klab <= 4 GROUP BY 1, 2),
      |hx AS (SELECT doc_id, host, string_split(host, '.') AS hl,
      |    CAST(len(string_split(host, '.')) AS INT) AS hn FROM hostsrc),
      |jj AS (SELECT h.doc_id, h.host, h.hl, h.hn,
      |    p1.exc_ps AS e1, p1.norm_ps AS m1,
      |    p2.exc_ps AS e2, p2.norm_ps AS m2,
      |    p3.exc_ps AS e3, p3.norm_ps AS m3,
      |    p4.exc_ps AS e4, p4.norm_ps AS m4
      |  FROM hx h
      |  LEFT JOIN psl p1 ON p1.klab = 1 AND h.hn >= 1
      |    AND array_to_string(list_slice(h.hl, h.hn, h.hn), '.') = p1.key
      |  LEFT JOIN psl p2 ON p2.klab = 2 AND h.hn >= 2
      |    AND array_to_string(list_slice(h.hl, h.hn - 1, h.hn), '.') = p2.key
      |  LEFT JOIN psl p3 ON p3.klab = 3 AND h.hn >= 3
      |    AND array_to_string(list_slice(h.hl, h.hn - 2, h.hn), '.') = p3.key
      |  LEFT JOIN psl p4 ON p4.klab = 4 AND h.hn >= 4
      |    AND array_to_string(list_slice(h.hl, h.hn - 3, h.hn), '.') = p4.key),
      |sited AS (SELECT doc_id, host,
      |    CASE WHEN hn > ps
      |      THEN array_to_string(list_slice(hl, hn - ps, hn), '.')
      |      ELSE host END AS url_site_psl
      |  FROM (SELECT doc_id, host, hl, hn,
      |      coalesce(e4, e3, e2, e1,
      |        CASE WHEN greatest(coalesce(m4, 0), coalesce(m3, 0),
      |            coalesce(m2, 0), coalesce(m1, 0)) > 0
      |          THEN greatest(coalesce(m4, 0), coalesce(m3, 0),
      |            coalesce(m2, 0), coalesce(m1, 0)) END,
      |        1) AS ps FROM jj))""".stripMargin

  /** The q206/q207/q208 shared oracle parse chain: FROM a synthesis
    * CTE `u` = (doc_id, url) → percent-decode → parse → host/port
    * fold (out-of-range ports reject) → dot-segment resolution
    * (residual `..` rejects) → canonical assembly, ending at CTE `k`
    * = (doc_id, url_canon, url_host, url_site). Every regex is the
    * byte-identical RE2-subset pattern the Spark side runs — the
    * decode/dot patterns are INTERPOLATED from [[graft.ingest.Urls]]'
    * constants, so the two engines cannot drift. */
  private lazy val urlParseCtes: String =
    s"""p AS (SELECT doc_id,
      |  lower(regexp_extract(u2, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
      |  regexp_extract(u2, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
      |  regexp_extract(u2, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
      |  regexp_extract(u2, '^[^?#]*\\?([^#]*)', 1) AS rawq
      |  FROM (SELECT doc_id, ${sqlPercentDecode("url")} AS u2 FROM u)),
      |h AS (SELECT doc_id, sch, rawpath, rawq,
      |  regexp_replace(
      |    regexp_replace(
      |      lower(regexp_replace(regexp_replace(auth, '^[^@]*@', ''),
      |        ':[0-9]+$$', '')),
      |      '\\.$$', ''),
      |    '^www\\.', '') AS host,
      |  regexp_extract(regexp_replace(auth, '^[^@]*@', ''),
      |    ':([0-9]+)$$', 1) AS portraw
      |  FROM p),
      |n AS (SELECT *, regexp_replace(portraw, '^0+', '') AS pz FROM h),
      |n2 AS (SELECT doc_id, sch, rawpath, rawq, host,
      |  CASE WHEN portraw = '' THEN ''
      |    WHEN pz = '' THEN '0' ELSE pz END AS port,
      |  CASE WHEN portraw = '' OR pz = '' THEN TRUE
      |    WHEN length(pz) <= 5 THEN CAST(pz AS INT) <= 65535
      |    ELSE FALSE END AS portok
      |  FROM n),
      |pd AS (SELECT doc_id, sch, rawq, host, port, portok,
      |  ${sqlDotResolve("regexp_replace(rawpath, '/{2,}', '/', 'g')")} AS pathd
      |  FROM n2),
      |c AS (SELECT doc_id, sch, host,
      |  (sch = 'http' OR sch = 'https') AND host <> '' AND portok
      |    AND NOT regexp_matches(pathd, '${graft.ingest.Urls.residualDotRe}') AS ok,
      |  CASE WHEN port = '' OR (sch = 'http' AND port = '80')
      |    OR (sch = 'https' AND port = '443') THEN ''
      |    ELSE ':' || port END AS portpart,
      |  CASE WHEN pathd = '' THEN '/'
      |    WHEN pathd <> '/' AND pathd LIKE '%/'
      |    THEN substr(pathd, 1, len(pathd) - 1)
      |    ELSE pathd END AS path,
      |  coalesce(array_to_string(
      |    list_sort(list_filter(string_split(rawq, '&'),
      |      x -> x <> '' AND NOT regexp_matches(x,
      |        '${graft.ingest.Urls.trackingParamRe}'))),
      |    '&'), '') AS q
      |  FROM pd),
      |k AS (SELECT doc_id,
      |  CASE WHEN ok THEN sch || '://' || host || portpart || path
      |    || (CASE WHEN q = '' THEN '' ELSE '?' || q END) END AS url_canon,
      |  CASE WHEN ok THEN host END AS url_host,
      |  CASE WHEN ok THEN
      |    (CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) = ''
      |      THEN host
      |      ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END)
      |  END AS url_site
      |  FROM c)""".stripMargin

  /** q206/q207's full oracle prefix: the messy-URL synthesis (CTE `u`,
    * mirroring [[syntheticUrls]] modulus for modulus) + the shared
    * [[urlParseCtes]]. */
  private lazy val urlOracleCtes: String =
    """WITH u AS (SELECT doc_id,
      |  CASE WHEN doc_id % 17 = 0
      |  THEN '/relative/' || lang || '/' || CAST(doc_id // 4 AS VARCHAR)
      |  ELSE (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'HttpS' END)
      |    || '://'
      |    || (CASE WHEN doc_id % 19 = 0 THEN 'user:pw@' ELSE '' END)
      |    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
      |    || '.Example.COM'
      |    || (CASE WHEN doc_id % 13 = 0 THEN '.' ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN ':8080'
      |         WHEN doc_id % 2 = 0 AND doc_id % 5 = 0 THEN ':80'
      |         WHEN doc_id % 2 = 1 AND doc_id % 5 = 1 THEN ':0443'
      |         ELSE '' END)
      |    || '//articles//' || lang || '/' || CAST(doc_id // 4 AS VARCHAR)
      |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      |    || '?'
      |    || (CASE WHEN doc_id % 11 = 0 THEN 'utm_source=feed&gclid=1'
      |         WHEN doc_id % 3 = 0 THEN 'utm_source=feed&id='
      |           || CAST(doc_id // 4 AS VARCHAR) || '&page=2&utm_campaign=x'
      |         WHEN doc_id % 3 = 1 THEN 'page=2&fbclid=abc&id='
      |           || CAST(doc_id // 4 AS VARCHAR)
      |         ELSE 'id=' || CAST(doc_id // 4 AS VARCHAR) || '&page=2' END)
      |    || (CASE WHEN doc_id % 4 = 2 THEN '#section-2' ELSE '' END)
      |  END AS url FROM documents),
      |""".stripMargin + urlParseCtes

  /** The exact-integer power-iteration pipeline (q139/q140's shared
    * oracle prefix): quantize → integer mean → centered values → scatter
    * matrix → md5-seeded start vector → three HUGEINT mat-vec rounds,
    * each renormalized to ×10⁴ scale by positive-operand integer
    * division → sign canonicalization. Mirrors
    * [[graft.ops.Spectral.pc1Quantized]] step for step. */
  private lazy val pc1OracleCtes: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  WHERE len(embedding) = 64),
      |x AS (SELECT vec_id, i, CAST(round(v[i+1]*10000) AS BIGINT) AS xq
      |  FROM e, range(64) AS r(i)),
      |st AS (SELECT i, sum(xq) AS s, count(*) AS n FROM x GROUP BY i),
      |mu AS (SELECT i, CASE WHEN s >= 0 THEN (2*s + n) // (2*n)
      |  ELSE -((2*(-s) + n) // (2*n)) END AS mu FROM st),
      |c AS (SELECT x.vec_id, x.i, x.xq - mu.mu AS c FROM x JOIN mu USING (i)),
      |a AS (SELECT cj.i AS j, ck.i AS k, sum(cj.c * ck.c) AS a
      |  FROM c cj JOIN c ck ON cj.vec_id = ck.vec_id GROUP BY 1, 2),
      |v0 AS (SELECT j, CAST(CASE WHEN substr(md5('pc|' || CAST(j AS VARCHAR)), 1, 1) >= '8'
      |  THEN 10000 ELSE -10000 END AS BIGINT) AS v FROM range(64) AS r(j)),
      |w1 AS (SELECT a.j, sum(CAST(a.a AS HUGEINT) * v0.v) AS w
      |  FROM a JOIN v0 ON a.k = v0.j GROUP BY 1),
      |m1 AS (SELECT max(abs(w)) AS m FROM w1),
      |v1 AS (SELECT j, CAST(CASE WHEN w >= 0 THEN (w*10000) // m
      |  ELSE -(((-w)*10000) // m) END AS BIGINT) AS v FROM w1, m1),
      |w2 AS (SELECT a.j, sum(CAST(a.a AS HUGEINT) * v1.v) AS w
      |  FROM a JOIN v1 ON a.k = v1.j GROUP BY 1),
      |m2 AS (SELECT max(abs(w)) AS m FROM w2),
      |v2 AS (SELECT j, CAST(CASE WHEN w >= 0 THEN (w*10000) // m
      |  ELSE -(((-w)*10000) // m) END AS BIGINT) AS v FROM w2, m2),
      |w3 AS (SELECT a.j, sum(CAST(a.a AS HUGEINT) * v2.v) AS w
      |  FROM a JOIN v2 ON a.k = v2.j GROUP BY 1),
      |m3 AS (SELECT max(abs(w)) AS m FROM w3),
      |v3 AS (SELECT j, CAST(CASE WHEN w >= 0 THEN (w*10000) // m
      |  ELSE -(((-w)*10000) // m) END AS BIGINT) AS v FROM w3, m3),
      |sg AS (SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg FROM v3
      |  ORDER BY abs(v) DESC, j LIMIT 1),
      |vv AS (SELECT j, CAST(v * sg AS BIGINT) AS v FROM v3, sg)""".stripMargin

  /** Transitive closure + min over the reachable set — shared by q61 and
    * q71 (two clustering formulations, one contract). Quadratic closure
    * is fine at verify scale; the Spark sides are the iterative
    * formulations that scale. */
  private lazy val dupClustersOracle: String =
    """WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS doc, shingle FROM (
      |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 2, 0)),
      |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents))),
      |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      |  GROUP BY 1, 2),
      |pairs AS (SELECT doc_a, doc_b FROM inter
      |  JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
      |  WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.03),
      |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
      |SELECT src AS doc, min(dst) AS cluster FROM reach GROUP BY 1""".stripMargin
}
