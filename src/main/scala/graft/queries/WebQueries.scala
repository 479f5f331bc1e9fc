package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Urls
import graft.sources.Tables

/** Web-provenance curation operators: URL canonicalization dedup and the
  * host-level policy rollup — the two passes a crawl-derived corpus runs
  * BEFORE content dedup (collapsing re-crawls by canonical URL is a
  * narrow map + one key agg, orders of magnitude cheaper than MinHash).
  * The fixture has no URL column, so a deterministic messy URL is
  * injected per doc ([[graft.ops.Urls.syntheticRawUrl]], the q177
  * posture) and the REAL canonicalizer runs on it.
  */
object WebQueries {

  /** q193: URL-canonicalization dedup — each canonical URL with its crawl
    * multiplicity: how many docs land on it, how many DISTINCT raw forms
    * they arrived under, and the keeper (min doc_id, the survivorship
    * rule q93 uses). Scale shape: canonicalization is a narrow per-row
    * string map fused into the scan; the only exchange is the
    * (canonical_url) map-side-combined agg — linear at any corpus size,
    * and the group key is a bounded-width URL string (a digest-key
    * variant would apply here exactly as in q178 if measurement ever
    * shows the key bytes dominating the exchange). */
  def q193UrlCanonical(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Urls.syntheticRawUrl(col("doc_id"), col("source")).as("raw_url"))
      .select(col("doc_id"), col("raw_url"),
        Urls.canonicalUrl(col("raw_url")).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_url")).as("n_raw_forms"),
        min(col("doc_id")).as("keeper_doc_id"))

  /** q194: host-level curation rollup — per host: docs, distinct
    * canonical URLs, and the re-crawl duplication share in exact basis
    * points (the number a domain blocklist/throttle policy is stated
    * in; RefinedWeb and CCNet both gate on per-domain stats before any
    * content pass). Scale shape: the (host, canonical_url) agg map-side
    * combines, then collapses to one row per host — two aggs sharing
    * the host-prefixed key, no join, linear. */
  def q194HostRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Urls.canonicalUrl(
          Urls.syntheticRawUrl(col("doc_id"), col("source"))).as("u"))
      .select(col("doc_id"), col("u"), Urls.hostOf(col("u")).as("host"))
      .groupBy(col("host"), col("u"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("host"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_urls"))
      .select(col("host"), col("n_docs"), col("n_urls"),
        expr("(2 * (n_docs - n_urls) * 10000 + n_docs) DIV (2 * n_docs)")
          .as("dup_bp"))

  /** q199: the dedup funnel — corpus survival through the successive
    * layers a real intake runs IN ORDER OF COST: (1) canonical-URL
    * keepers (q193's rule — narrow map + one key agg), (2) exact-text
    * keepers (q18's normKey), (3) the q82 chunk gate (docs ≥ 50%
    * duplicated 32-token chunks dropped). One row per stage with
    * surviving docs and chars — the report that justifies the layering
    * (each layer only pays for what the cheaper ones missed). Each layer
    * keeps min-doc_id (q93's survivorship rule); the chunk-frequency
    * table is computed among LAYER-2 SURVIVORS (dup evidence already
    * deduped away must not re-flag its keeper). Scale shape: two
    * partitioned windows (canonical_url, norm key) + the chunk-digest
    * agg — every exchange is keyed and NARROW (both dedup keys derive in
    * the scan projection; text never rides a window — r11), nothing
    * quadratic; the stage aggregates recompute the narrow upstream maps
    * per branch (at 100 TB you persist each survivor frame; at bench SF
    * recompute of the narrow stages is cheaper than caching fat rows —
    * q20's measured posture). */
  def q199DedupFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NARROW window payloads (r11, guide §2.3): both dedup keys derive in
    // the scan projection and `text` is dropped BEFORE the first window,
    // so the funnel's exchanges (u-window, k-window, each recomputed per
    // stage branch) carry ~60-byte keyed rows instead of full documents.
    // The chunk layer re-reads tokens from the scan and semi-joins the
    // layer-2 survivor ids instead of inheriting text through both
    // windows — AQE broadcasts the id set at bench scales; at 100 TB it
    // degrades to one keyed exchange of the token stream, still cheaper
    // than shipping text through two windows per branch.
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        Urls.canonicalUrl(
          Urls.syntheticRawUrl(col("doc_id"), col("source"))).as("u"),
        graft.ops.Dedup.normKey(col("text")).as("k"))
    val urlKeep = docs
      .withColumn("m", min(col("doc_id")).over(Window.partitionBy(col("u"))))
      .filter(col("doc_id") === col("m")).drop("m", "u")
    val exactKeep = urlKeep
      .withColumn("m", min(col("doc_id")).over(Window.partitionBy(col("k"))))
      .filter(col("doc_id") === col("m")).drop("m", "k")
    // q82's chunk machinery over layer-2 survivors only; binary chunk
    // digests (winDigest's r11 bijection argument: ck is an internal
    // agg/join key, unhex halves its bytes)
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
      .join(exactKeep.select("doc_id"), Seq("doc_id"), "left_semi")
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          floor((size(col("toks")) + 31) / 32).cast("int") - 1)).as("ci"))
      .select(col("doc_id"),
        unhex(md5(concat_ws(" ", slice(col("toks"), col("ci") * 32 + 1, lit(32)))))
          .as("ck"))
    val freq = keyed.groupBy(col("ck")).agg(count(lit(1)).as("nk"))
    val dropped = keyed.join(freq, Seq("ck"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nc"),
        sum(when(col("nk") > 1, 1L).otherwise(0L)).as("nd"))
      .filter(col("nd") * 2 >= col("nc"))
      .select("doc_id")
    val chunkKeep = exactKeep.join(dropped, Seq("doc_id"), "left_anti")
    def stage(df: DataFrame, n: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("docs_out"),
          sum(col("n_chars")).as("chars_out"))
        .select(lit(n.toLong).as("stage"), lit(name).as("layer"),
          col("docs_out"), col("chars_out"))
    stage(docs, 0, "0_intake")
      .unionAll(stage(urlKeep, 1, "1_url"))
      .unionAll(stage(exactKeep, 2, "2_exact"))
      .unionAll(stage(chunkKeep, 3, "3_chunk"))
  }

  // ---- DuckDB oracle twins ------------------------------------------------

  /** The injected raw URL — doc_id % 3 variants (Urls.syntheticRawUrl). */
  // NOTE: no continuation line here may BEGIN with '||' — this fragment is
  // spliced into outer s"""...""".stripMargin templates, which would eat
  // one pipe of a line-leading '||' (first non-blank char looks like a
  // margin). Operators therefore sit at line ends.
  private val rawUrlSql =
    """CASE doc_id % 3
      |  WHEN 0 THEN 'http://www.' || source || '.example.com/articles/' ||
      |    (doc_id // 3) || '?id=' || (doc_id // 3) ||
      |    '&utm_source=feed#sec' || (doc_id % 5)
      |  WHEN 1 THEN 'HTTP://' || upper(source) || '.EXAMPLE.COM:80/articles/' ||
      |    (doc_id // 3) || '/?utm_campaign=x&id=' || (doc_id // 3)
      |  ELSE 'http://' || source || '.example.com/articles/' ||
      |    (doc_id // 3) || '?id=' || (doc_id // 3)
      |END""".stripMargin

  /** Urls.canonicalUrl, step for step, over a column named `raw_url`;
    * spliced as continuation CTEs after a `raw` CTE. */
  private val canonicalSql =
    """s1 AS (SELECT doc_id, raw_url,
      |  split_part(raw_url, '#', 1) AS nofrag FROM raw),
      |s2 AS (SELECT doc_id, raw_url,
      |  split_part(nofrag, '?', 1) AS base,
      |  CASE WHEN contains(nofrag, '?')
      |       THEN split_part(nofrag, '?', 2) ELSE '' END AS query
      |  FROM s1),
      |s3 AS (SELECT doc_id, raw_url, query,
      |  substr(base, 8) AS rest,
      |  split_part(substr(base, 8), '/', 1) AS host0
      |  FROM s2),
      |s4 AS (SELECT doc_id, raw_url, query,
      |  regexp_replace(regexp_replace(lower(host0), '^www\.', ''),
      |    ':80$', '') AS host,
      |  substr(rest, len(host0) + 1) AS path0
      |  FROM s3),
      |s5 AS (SELECT doc_id, raw_url, query, host,
      |  rtrim(CASE WHEN path0 = '' THEN '/' ELSE path0 END, '/') AS path1
      |  FROM s4),
      |s6 AS (SELECT doc_id, raw_url, host,
      |  CASE WHEN path1 = '' THEN '/' ELSE path1 END AS path,
      |  array_to_string(list_sort(list_filter(string_split(query, '&'),
      |    p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS params
      |  FROM s5),
      |canon AS (SELECT doc_id, raw_url,
      |  'http://' || host || path ||
      |    CASE WHEN params = '' THEN '' ELSE '?' || params END
      |    AS canonical_url
      |  FROM s6)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q193_url_canonical" ->
      s"""WITH raw AS (SELECT doc_id, $rawUrlSql AS raw_url FROM documents),
         |$canonicalSql
         |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_forms,
         |  MIN(doc_id) AS keeper_doc_id
         |FROM canon GROUP BY canonical_url""".stripMargin,

    "q194_host_rollup" ->
      s"""WITH raw AS (SELECT doc_id, $rawUrlSql AS raw_url FROM documents),
         |$canonicalSql,
         |h AS (SELECT split_part(substr(canonical_url, 8), '/', 1) AS host,
         |  canonical_url, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM canon GROUP BY 1, 2),
         |a AS (SELECT host, CAST(SUM(c) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_urls FROM h GROUP BY 1)
         |SELECT host, n_docs, n_urls,
         |  (2 * (n_docs - n_urls) * 10000 + n_docs) // (2 * n_docs) AS dup_bp
         |FROM a""".stripMargin,

    // layer CTEs in cost order: url keeper -> exact keeper -> chunk gate;
    // each stage row is a tiny aggregate over the survivor CTE
    "q199_dedup_funnel" ->
      s"""WITH raw AS (SELECT doc_id, $rawUrlSql AS raw_url FROM documents),
         |$canonicalSql,
         |l1 AS (SELECT d.doc_id, d.text, d.n_chars FROM documents d
         |  JOIN (SELECT MIN(doc_id) AS m FROM canon GROUP BY canonical_url) k
         |    ON d.doc_id = k.m),
         |l2 AS (SELECT doc_id, text, n_chars FROM (
         |  SELECT doc_id, text, n_chars, MIN(doc_id) OVER (
         |    PARTITION BY md5(lower(substr(text, 1, 120)))) AS m FROM l1)
         |  WHERE doc_id = m),
         |t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
         |  x -> len(x) > 0) AS toks FROM l2),
         |c AS (SELECT doc_id, toks,
         |  unnest(generate_series(0,
         |    CAST(FLOOR((len(toks) + 31) / 32.0) AS INT) - 1)) AS ci
         |  FROM t WHERE len(toks) > 0),
         |x AS (SELECT doc_id,
         |  md5(array_to_string(toks[ci * 32 + 1 : ci * 32 + 32], ' ')) AS ck
         |  FROM c),
         |f AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS nk FROM x GROUP BY 1),
         |dropped AS (SELECT doc_id FROM x JOIN f USING (ck)
         |  GROUP BY doc_id
         |  HAVING 2 * SUM(CASE WHEN nk > 1 THEN 1 ELSE 0 END) >= COUNT(*)),
         |l3 AS (SELECT l2.* FROM l2 ANTI JOIN dropped USING (doc_id))
         |SELECT CAST(0 AS BIGINT) AS stage, '0_intake' AS layer,
         |  CAST(COUNT(*) AS BIGINT) AS docs_out,
         |  CAST(SUM(n_chars) AS BIGINT) AS chars_out FROM documents
         |UNION ALL SELECT 1, '1_url', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(n_chars) AS BIGINT) FROM l1
         |UNION ALL SELECT 2, '2_exact', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(n_chars) AS BIGINT) FROM l2
         |UNION ALL SELECT 3, '3_chunk', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(n_chars) AS BIGINT) FROM l3""".stripMargin
  )
}
