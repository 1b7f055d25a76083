package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain canonicalization and host-level dedup rollup — the standard
  * FIRST stage of a pretraining curation pipeline (C4 and CCNet both open
  * with it), and the one the r13 verdict named as the remaining gap
  * (item 8). The reference corpus has no URL column, so the entries PLANT
  * deterministic URLs derived from doc_id (the px01 planted-PII pattern:
  * identical concatenation on both engines), then run a GENERIC
  * canonicalizer over the raw string — the operator under test is the
  * string algebra, not the plant.
  *
  * Canonicalization rules (each pinned in UrlCurationSpec):
  *   - fragment stripped; scheme and authority lowercased
  *   - default port dropped (http:80 / https:443), non-default kept
  *   - empty path becomes "/"
  *   - tracking params removed (utm_*, gclid, fbclid, msclkid, ref,
  *     igshid), other params kept IN ORIGINAL ORDER
  *   - eTLD+1 from an embedded public-suffix SUBSET (multi-label suffixes
  *     like co.uk and github.io match longest-first; default = last two
  *     labels; single-label hosts pass through). A deployment swaps in the
  *     full PSL the same way — the CASE chain is generated from the list.
  *
  * Dedup is per canonical URL, FIRST-SEEN WINS (min doc_id), the C4 rule.
  *
  * Scale posture: everything is deterministic per-row string algebra
  * (codegen'd, no UDFs) until the dedup window — ONE hash exchange on
  * canon_url (row_number + count share the partitioning) — and ur02 adds
  * one exchange on etld1 plus a broadcast of the 1-row token total. No
  * global windows, no collects; at 100 TB the canonical URL is exactly the
  * key a host-level shard would partition by anyway.
  */
object UrlCuration {

  /** Params removed by canonicalization. Kept to the Java∩RE2 regex
    * intersection (px01 rule): no backrefs, no lookaround.
    */
  private[pipeline] val TrackingRe =
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref|igshid)(=|$)"

  /** Embedded public-suffix subset: every multi-label suffix the planted
    * hosts exercise plus common spares. Longest-first is irrelevant here
    * (all two-label) but the generator sorts anyway to stay correct if a
    * three-label suffix is added.
    */
  private[pipeline] val Suffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "co.jp",
    "com.br", "github.io",
  ).sortBy(s => -s.count(_ == '.'))

  /** Planted host families (by canonical group g % 8) — chosen to exercise
    * every eTLD+1 branch: plain .com/.org/.net, multi-label co.uk/ac.uk/
    * com.au, and github.io where the SUFFIX is two labels so eTLD+1 is the
    * full three-label host.
    */
  private[pipeline] val Hosts: Seq[String] = Seq(
    "alpha.example.com",    // etld1 example.com
    "beta.sample.co.uk",    // etld1 sample.co.uk
    "docs.github.io",       // github.io is the suffix -> etld1 docs.github.io
    "example.org",          // host == etld1
    "news.daily.co.uk",     // etld1 daily.co.uk
    "cdn.media.example.net", // 4 labels, default rule -> example.net
    "archive.uni.ac.uk",    // etld1 uni.ac.uk
    "shop.retail.com.au",   // etld1 retail.com.au
  )

  /** Canonical-group modulus: docs with equal doc_id % G share a canonical
    * URL (their raw urls differ in case/tracking/fragment/default-port) —
    * the dedup has real work at every SF including sf0.001's 50 docs.
    */
  private[pipeline] val G = 20L

  // ---------------------------------------------------------------- plant

  /** Raw planted URL as a Spark column over doc_id. Canonical-identity
    * parts (scheme kind, host, non-default port, path, id param) derive
    * from g = doc_id % G; cosmetic variation (case, default port, tracking
    * params, param order, fragment) from doc_id itself.
    */
  private[graft] def urlCol: Column = {
    val v = col("doc_id")
    val g = v % G
    val gs = g.cast("string")
    val vs = v.cast("string")
    val sch = when(g % 2 === 0, "http").otherwise("https")
    val schRaw = when(v % 2 === 0, upper(sch)).otherwise(sch)
    val hostC = Hosts.zipWithIndex.tail.foldLeft(when(g % 8 === 0, Hosts.head)) {
      case (acc, (h, i)) => acc.when(g % 8 === i, h)
    }
    val hostRaw = when(v % 3 === 0, upper(hostC)).otherwise(hostC)
    val portRaw = when(g % 10 === 0, ":8080")
      .when(v % 5 === 0, when(g % 2 === 0, ":80").otherwise(":443"))
      .otherwise("")
    val trk = concat(
      when(v % 2 === 0, concat(lit("utm_source=s"), vs))
        .otherwise(concat(lit("utm_campaign=c"), vs)),
      when(v % 3 === 0, concat(lit("&fbclid=f"), vs)).otherwise(lit("")))
    val qRaw = when(v % 7 < 3, concat(trk, lit("&id="), gs))
      .otherwise(concat(lit("id="), gs, lit("&"), trk))
    val frag = when(v % 3 === 1, concat(lit("#sec"), (v % 7).cast("string")))
      .otherwise(lit(""))
    concat(schRaw, lit("://"), hostRaw, portRaw, lit("/p/"), gs, lit("?"), qRaw, frag)
  }

  /** The same plant as DuckDB SQL (CTE body producing doc_id, url[, t]). */
  private def plantSql(withTokens: Boolean): String = {
    val hostCase = "CASE g % 8 " +
      Hosts.zipWithIndex.map { case (h, i) => s"WHEN $i THEN '$h'" }.mkString(" ") +
      " END"
    val tok = if (withTokens) ", CAST(len(string_split(text, ' ')) AS BIGINT) AS t" else ""
    s"""p AS (SELECT doc_id, doc_id % $G AS g${if (withTokens) ", text" else ""} FROM documents),
       |parts AS (SELECT doc_id, g$tok,
       |    CASE WHEN g % 2 = 0 THEN 'http' ELSE 'https' END AS sch,
       |    $hostCase AS hostc
       |  FROM p),
       |trkd AS (SELECT *,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'utm_source=s' || CAST(doc_id AS VARCHAR)
       |          ELSE 'utm_campaign=c' || CAST(doc_id AS VARCHAR) END) ||
       |    (CASE WHEN doc_id % 3 = 0 THEN '&fbclid=f' || CAST(doc_id AS VARCHAR)
       |          ELSE '' END) AS trk
       |  FROM parts),
       |raw AS (SELECT doc_id${if (withTokens) ", t" else ""},
       |    (CASE WHEN doc_id % 2 = 0 THEN upper(sch) ELSE sch END) || '://' ||
       |    (CASE WHEN doc_id % 3 = 0 THEN upper(hostc) ELSE hostc END) ||
       |    (CASE WHEN g % 10 = 0 THEN ':8080'
       |          WHEN doc_id % 5 = 0 THEN (CASE WHEN g % 2 = 0 THEN ':80' ELSE ':443' END)
       |          ELSE '' END) ||
       |    '/p/' || CAST(g AS VARCHAR) || '?' ||
       |    (CASE WHEN doc_id % 7 < 3 THEN trk || '&id=' || CAST(g AS VARCHAR)
       |          ELSE 'id=' || CAST(g AS VARCHAR) || '&' || trk END) ||
       |    (CASE WHEN doc_id % 3 = 1 THEN '#sec' || CAST(doc_id % 7 AS VARCHAR)
       |          ELSE '' END) AS url
       |  FROM trkd)""".stripMargin
  }

  // ------------------------------------------------------- canonicalizer

  /** Generic canonicalizer: (canon_url, etld1) columns from a raw `url`
    * column. Pure codegen'd string expressions.
    */
  private[graft] def canonCols(url: Column): (Column, Column) = {
    val u0 = regexp_replace(url, "#.*$", "")
    val schC = lower(regexp_extract(u0, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u0, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val host = regexp_replace(auth, ":[0-9]+$", "")
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(rawPath === "", "/").otherwise(rawPath)
    val q = when(pathq.like("%?%"), regexp_extract(pathq, "\\?(.*)$", 1))
      .otherwise(lit(""))
    val portC = when(port === "", "")
      .when(schC === "http" && port === "80", "")
      .when(schC === "https" && port === "443", "")
      .otherwise(concat(lit(":"), port))
    val qC = array_join(
      filter(split(q, "&"), p => p =!= "" && !p.rlike(TrackingRe)), "&")
    val canon = concat(schC, lit("://"), host, portC, path,
      when(qC === "", "").otherwise(concat(lit("?"), qC)))
    val dflt = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val single = host.rlike("^[^.]*$")
    val withSuffixes = Suffixes.tail.foldLeft(
      when(host.like("%." + Suffixes.head),
        regexp_extract(host, "([^.]+\\." + Suffixes.head.replace(".", "\\.") + ")$", 1))) {
      case (acc, s) =>
        acc.when(host.like("%." + s),
          regexp_extract(host, "([^.]+\\." + s.replace(".", "\\.") + ")$", 1))
    }
    val etld1 = withSuffixes.when(single, host).otherwise(dflt)
    (canon, etld1)
  }

  /** The same canonicalizer as DuckDB CTEs: raw(doc_id, url[, t]) →
    * canon(doc_id, url[, t], canon_url, etld1).
    */
  private def canonSql(withTokens: Boolean): String = {
    val t = if (withTokens) ", t" else ""
    val etld1Case = "CASE " + Suffixes.map { s =>
      val pat = "([^.]+\\." + s.replace(".", "\\.") + ")$"
      s"WHEN host LIKE '%.$s' THEN regexp_extract(host, '$pat', 1)"
    }.mkString(" ") +
      " WHEN host NOT LIKE '%.%' THEN host" +
      " ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END"
    s"""c1 AS (SELECT doc_id, url$t, regexp_replace(url, '#.*$$', '') AS u0 FROM raw),
       |c2 AS (SELECT doc_id, url$t,
       |    lower(regexp_extract(u0, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
       |    regexp_replace(u0, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
       |  FROM c1),
       |c3 AS (SELECT doc_id, url$t, sch,
       |    lower(regexp_extract(rest, '^([^/?]*)', 1)) AS auth,
       |    regexp_replace(rest, '^[^/?]*', '') AS pathq
       |  FROM c2),
       |c4 AS (SELECT doc_id, url$t, sch,
       |    regexp_replace(auth, ':[0-9]+$$', '') AS host,
       |    regexp_extract(auth, ':([0-9]+)$$', 1) AS port,
       |    CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = '' THEN '/'
       |         ELSE regexp_extract(pathq, '^([^?]*)', 1) END AS path,
       |    CASE WHEN pathq LIKE '%?%' THEN regexp_extract(pathq, '\\?(.*)$$', 1)
       |         ELSE '' END AS q
       |  FROM c3),
       |c5 AS (SELECT *,
       |    array_to_string(list_filter(string_split(q, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x, '$TrackingRe')), '&') AS qc
       |  FROM c4),
       |canon AS (SELECT doc_id, url$t, host,
       |    sch || '://' || host ||
       |    (CASE WHEN port = '' THEN ''
       |          WHEN sch = 'http' AND port = '80' THEN ''
       |          WHEN sch = 'https' AND port = '443' THEN ''
       |          ELSE ':' || port END) ||
       |    path ||
       |    (CASE WHEN qc = '' THEN '' ELSE '?' || qc END) AS canon_url,
       |    $etld1Case AS etld1
       |  FROM c5)""".stripMargin
  }

  /** The plant+canon oracle CTE pair (no token column) for reuse by the
    * streaming twin st21 — st20/lt01 convention: the streaming entry's
    * oracle is the batch entry's, verbatim.
    */
  private[graft] def oracleCtes: String =
    s"${plantSql(withTokens = false)},\n${canonSql(withTokens = false)}"

  // ---------------------------------------------------------------- defs

  val defs: Seq[QueryDef] = Seq(

    // ----- ur01: canonicalize every planted URL, mark the first-seen doc
    // per canonical URL (the C4 keep rule) and count its duplicates. The
    // raw url rides along as the witness that both engines planted and
    // parsed the identical string.
    QueryDef.sql(
      "ur01_url_canonical",
      s"""WITH ${plantSql(withTokens = false)},
         |${canonSql(withTokens = false)}
         |SELECT doc_id, url, canon_url, etld1,
         |  (row_number() OVER (PARTITION BY canon_url ORDER BY doc_id) = 1) AS first_seen,
         |  CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS url_dups
         |FROM canon ORDER BY doc_id""".stripMargin,
    ) { (spark, dir) =>
      val raw = Tables(spark, dir).documents
        .select(col("doc_id"), urlCol.as("url"))
      val (canon, etld1) = canonCols(col("url"))
      val byUrl = Window.partitionBy("canon_url")
      raw
        .select(col("doc_id"), col("url"), canon.as("canon_url"), etld1.as("etld1"))
        .withColumn("first_seen",
          row_number().over(byUrl.orderBy("doc_id")) === 1)
        .withColumn("url_dups", count(lit(1)).over(byUrl).cast("long"))
        .orderBy("doc_id")
    },

    // ----- ur02: per-domain (eTLD+1) rollup feeding mx01's mixture —
    // total docs citing the domain, distinct canonical URLs, tokens of the
    // KEPT (first-seen, post-dedup) docs, and the kept-token share of the
    // corpus. Broadcast 1-row total instead of a global window.
    QueryDef.sql(
      "ur02_domain_rollup",
      s"""WITH ${plantSql(withTokens = true)},
         |${canonSql(withTokens = true)},
         |dedup AS (SELECT etld1, canon_url, t,
         |    row_number() OVER (PARTITION BY canon_url ORDER BY doc_id) AS rn
         |  FROM canon),
         |roll AS (SELECT etld1,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_urls,
         |    CAST(SUM(CASE WHEN rn = 1 THEN t ELSE 0 END) AS BIGINT) AS kept_tokens
         |  FROM dedup GROUP BY etld1)
         |SELECT etld1, n_urls, n_docs, kept_tokens,
         |  CAST(kept_tokens AS DOUBLE) / tot AS token_share
         |FROM roll CROSS JOIN
         |  (SELECT CAST(SUM(CASE WHEN rn = 1 THEN t ELSE 0 END) AS BIGINT) AS tot
         |   FROM dedup)
         |ORDER BY kept_tokens DESC, etld1""".stripMargin,
    ) { (spark, dir) =>
      val raw = Tables(spark, dir).documents
        .select(col("doc_id"), urlCol.as("url"),
          size(split(col("text"), " ")).cast("long").as("t"))
      val (canon, etld1) = canonCols(col("url"))
      val dedup = raw
        .select(col("doc_id"), col("t"), canon.as("canon_url"), etld1.as("etld1"))
        .withColumn("rn",
          row_number().over(Window.partitionBy("canon_url").orderBy("doc_id")))
      val keptT = sum(when(col("rn") === 1, col("t")).otherwise(0L))
      val roll = dedup.groupBy("etld1").agg(
        count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("canon_url")).cast("long").as("n_urls"),
        keptT.cast("long").as("kept_tokens"))
      val tot = dedup.agg(keptT.cast("long").as("tot"))
      roll.crossJoin(broadcast(tot))
        .select(col("etld1"), col("n_urls"), col("n_docs"), col("kept_tokens"),
          (col("kept_tokens").cast("double") / col("tot")).as("token_share"))
        .orderBy(desc("kept_tokens"), asc("etld1"))
    },
  )
}
