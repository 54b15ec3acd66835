"""Driver-facing query suite: every operator family from SURVEY.md §2
expressed over the driver's parquet tables, each paired with ANSI-SQL
DuckDB oracle text (``__spark_entry__.queries()`` / ``oracle_sql()``).

Parity rules used throughout (cross-engine exactness):
* integer arithmetic only where possible; float aggregates are ROUND()ed
  wide enough that summation-order noise (~1e-12) cannot flip a digit;
* the shared 64-bit hash is ``conv(substr(md5(x),1,8),16,10)`` (Spark) ==
  ``('0x' || substr(md5(x),1,8))::BIGINT`` (DuckDB) — 32 bits, safe from
  bigint overflow under small multipliers;
* every computed column is aliased identically on both sides.

Each function also documents which reference behavior (path:line in
/root/reference) it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from acrawler_spark.functions.url import canonicalize_col, fingerprint_col, host_col
from acrawler_spark.functions import processors as P


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# a synthetic URL per event row (used by the crawl-operator queries so they
# run on the driver's tables). Shapes exercise query sort + fragment strip.
def _event_url_col():
    return F.concat(
        F.lit("http://site"),
        (F.col("user_id") % 8).cast("string"),
        F.lit(".test/p/"),
        (F.col("event_id") % 500).cast("string"),
        F.when(F.col("event_id") % 3 == 0,
               F.concat(F.lit("?b=2&a=1&c="), (F.col("event_id") % 7).cast("string")))
         .when(F.col("event_id") % 3 == 1, F.lit("#frag"))
         .otherwise(F.lit("")),
    )


_EVENT_URL_SQL = (
    "'http://site' || (user_id % 8)::VARCHAR || '.test/p/' || (event_id % 500)::VARCHAR || "
    "CASE WHEN event_id % 3 = 0 THEN '?b=2&a=1&c=' || (event_id % 7)::VARCHAR "
    "WHEN event_id % 3 = 1 THEN '#frag' ELSE '' END"
)


# ---------------------------------------------------------------------------
# §2.2 + §2.7: URL canonicalization (reference http.py:120-126)
# ---------------------------------------------------------------------------

def q_url_canonicalize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("url", _event_url_col())
    return ev.select("event_id", "url", canonicalize_col(F.col("url")).alias("url_canon"))


SQL_URL_CANONICALIZE = f"""
WITH u AS (SELECT event_id, {_EVENT_URL_SQL} AS url FROM events),
p AS (
  SELECT event_id, url,
         split_part(url, '#', 1) AS base,
         split_part(split_part(url, '#', 1), '?', 1) AS pre
  FROM u
)
SELECT event_id, url,
       CASE WHEN strpos(base, '?') > 0
            THEN pre || '?' || array_to_string(list_sort(string_split(substr(base, strpos(base,'?') + 1), '&')), '&')
            ELSE pre END AS url_canon
FROM p
"""


# §2.3: sha1 fingerprint (reference http.py:138-145). DuckDB 1.0 has no
# sha1, so the oracle checks DuckDB-computable derivatives on the SAME rows:
# md5(url_canon), the fingerprint's length (40) and hex-charset flag. sha1
# exactness itself is pinned by tests/test_kernel.py against the reference
# golden value (tests/test_request.py:8-10).

def q_url_fingerprint(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("url", _event_url_col())
    canon = canonicalize_col(F.col("url"))
    fp = fingerprint_col(canon)
    return ev.select(
        "event_id",
        canon.alias("url_canon"),
        F.md5(canon).alias("canon_md5"),
        F.length(fp).alias("fp_len"),
        fp.rlike("^[0-9a-f]{40}$").alias("fp_is_hex"),
        host_col(F.col("url")).alias("host"),
    )


SQL_URL_FINGERPRINT = f"""
WITH u AS (SELECT event_id, {_EVENT_URL_SQL} AS url FROM events),
p AS (
  SELECT event_id, url,
         split_part(url, '#', 1) AS base,
         split_part(split_part(url, '#', 1), '?', 1) AS pre
  FROM u
),
c AS (
  SELECT event_id, url,
         CASE WHEN strpos(base, '?') > 0
              THEN pre || '?' || array_to_string(list_sort(string_split(substr(base, strpos(base,'?') + 1), '&')), '&')
              ELSE pre END AS url_canon
  FROM p
)
SELECT event_id, url_canon,
       md5(url_canon) AS canon_md5,
       40 AS fp_len,
       true AS fp_is_hex,
       split_part(split_part(url, '://', 2), '/', 1) AS host
FROM c
"""


# ---------------------------------------------------------------------------
# §2.4: frontier ranking — priority/score order (task.py:92-93, FIFO 29-30)
# ---------------------------------------------------------------------------

def q_frontier_rank(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 3).cast("int").alias("priority"),
        (F.col("event_id") % 100).cast("double").alias("exetime"),
    )
    keys = [F.col("priority").desc(), F.col("exetime").asc(), F.col("event_id").asc()]
    # top-k first (TakeOrderedAndProject — distributed, no global sort),
    # then rank within the bounded 100-row set; never a full-table
    # single-partition WindowExec
    top = ev.orderBy(*keys).limit(100)
    w = Window.partitionBy(F.lit(0)).orderBy(*keys)
    return (
        top.withColumn("score", F.col("priority") * F.lit(1e10) - F.col("exetime"))
        .withColumn("rank", F.row_number().over(w))
        .select("event_id", "priority", "exetime", "score", "rank")
    )


SQL_FRONTIER_RANK = """
WITH f AS (
  SELECT event_id,
         (event_id % 3)::INT AS priority,
         (event_id % 100)::DOUBLE AS exetime
  FROM events
)
SELECT event_id, priority, exetime,
       priority * 1e10 - exetime AS score,
       rank
FROM (
  SELECT *, row_number() OVER (ORDER BY priority DESC, exetime ASC, event_id ASC) AS rank
  FROM f
)
WHERE rank <= 100
"""


# ---------------------------------------------------------------------------
# §2.5: per-host politeness budget (counter.py:70-109)
# ---------------------------------------------------------------------------

def q_host_budget(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "host", F.concat(F.lit("site"), (F.col("user_id") % 8).cast("string"), F.lit(".test"))
    )
    budget = F.when(F.col("host") == "site1.test", F.lit(2)).otherwise(F.lit(3))
    w = Window.partitionBy("host").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("budget", budget)
        .filter(F.col("rn") <= F.col("budget"))
        .select("host", "event_id", "rn", "budget")
    )


SQL_HOST_BUDGET = """
WITH e AS (
  SELECT event_id, value,
         'site' || (user_id % 8)::VARCHAR || '.test' AS host
  FROM events
), r AS (
  SELECT host, event_id,
         row_number() OVER (PARTITION BY host ORDER BY value DESC, event_id ASC) AS rn,
         CASE WHEN host = 'site1.test' THEN 2 ELSE 3 END AS budget
  FROM e
)
SELECT host, event_id, rn, budget FROM r WHERE rn <= budget
"""


# ---------------------------------------------------------------------------
# §2.3: seen-set anti-join admission (scheduler.py:282-291)
# ---------------------------------------------------------------------------

def q_seen_antijoin(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("url", _event_url_col())
    canon = canonicalize_col(F.col("url"))
    cand = ev.select("event_id", F.md5(canon).alias("key"))
    seen = cand.filter(F.col("event_id") < 300).select("key")
    return cand.join(seen, "key", "left_anti").select("event_id", "key")


SQL_SEEN_ANTIJOIN = f"""
WITH u AS (SELECT event_id, {_EVENT_URL_SQL} AS url FROM events),
p AS (
  SELECT event_id,
         split_part(url, '#', 1) AS base,
         split_part(split_part(url, '#', 1), '?', 1) AS pre
  FROM u
),
cand AS (
  SELECT event_id,
         md5(CASE WHEN strpos(base,'?') > 0
              THEN pre || '?' || array_to_string(list_sort(string_split(substr(base, strpos(base,'?') + 1), '&')), '&')
              ELSE pre END) AS key
  FROM p
),
seen AS (SELECT key FROM cand WHERE event_id < 300)
SELECT event_id, key FROM cand
WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.key = cand.key)
"""


# §2.3: within-round dedup — first-discovered-wins (SURVEY §7 determinism)

def q_within_round_dedup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("url", _event_url_col())
    key = F.md5(canonicalize_col(F.col("url")))
    return (
        ev.select(key.alias("key"), F.col("event_id").alias("discovery_idx"))
        .groupBy("key")
        .agg(
            F.min("discovery_idx").alias("first_discovery"),
            F.count("*").alias("n_discovered"),
        )
    )


SQL_WITHIN_ROUND_DEDUP = f"""
WITH u AS (SELECT event_id, {_EVENT_URL_SQL} AS url FROM events),
p AS (
  SELECT event_id,
         split_part(url, '#', 1) AS base,
         split_part(split_part(url, '#', 1), '?', 1) AS pre
  FROM u
),
cand AS (
  SELECT event_id AS discovery_idx,
         md5(CASE WHEN strpos(base,'?') > 0
              THEN pre || '?' || array_to_string(list_sort(string_split(substr(base, strpos(base,'?') + 1), '&')), '&')
              ELSE pre END) AS key
  FROM p
)
SELECT key, min(discovery_idx) AS first_discovery, count(*) AS n_discovered
FROM cand GROUP BY key
"""


# ---------------------------------------------------------------------------
# §2.2 + §2.6: status filter & retry lifecycle (http.py:270-281,
# crawler.py:98-114; status_allowed=[503], max_tries=3)
# ---------------------------------------------------------------------------

def q_status_retry(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    status = (
        F.when(F.col("event_id") % 10 <= 1, F.lit(404))
        .when(F.col("event_id") % 10 == 2, F.lit(503))
        .otherwise(F.lit(200))
    )
    ok = (F.col("status") == 200) | (F.col("status") == 503)  # allowed list
    d = ev.withColumn("status", status).withColumn("ok", ok)
    d = d.withColumn("attempts", F.when(F.col("ok"), F.lit(1)).otherwise(F.lit(4)))
    return d.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("ok").cast("long")).alias("n_success"),
        F.sum((~F.col("ok")).cast("long")).alias("n_dropped"),
        F.sum("attempts").alias("total_attempts"),
    )


SQL_STATUS_RETRY = """
WITH d AS (
  SELECT event_type,
         CASE WHEN event_id % 10 <= 1 THEN 404
              WHEN event_id % 10 = 2 THEN 503
              ELSE 200 END AS status
  FROM events
), o AS (
  SELECT event_type, (status = 200 OR status = 503) AS ok FROM d
)
SELECT event_type,
       count(*) AS n,
       sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_success,
       sum(CASE WHEN ok THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
       sum(CASE WHEN ok THEN 1 ELSE 4 END)::BIGINT AS total_attempts
FROM o GROUP BY event_type
"""


# §2.2: exetime eligibility gate (scheduler.py:148-160)

def q_exetime_gate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 100).cast("double").alias("exetime"),
        F.concat(F.lit("site"), (F.col("user_id") % 8).cast("string")).alias("host"),
    )
    return ev.groupBy("host").agg(
        F.sum((F.col("exetime") <= 50.0).cast("long")).alias("n_due"),
        F.sum((F.col("exetime") > 50.0).cast("long")).alias("n_waiting"),
    )


SQL_EXETIME_GATE = """
SELECT 'site' || (user_id % 8)::VARCHAR AS host,
       sum(CASE WHEN (event_id % 100)::DOUBLE <= 50.0 THEN 1 ELSE 0 END)::BIGINT AS n_due,
       sum(CASE WHEN (event_id % 100)::DOUBLE > 50.0 THEN 1 ELSE 0 END)::BIGINT AS n_waiting
FROM events GROUP BY 1
"""


# §2.6: recrawl scheduling (crawler.py:122-126)

def q_recrawl_schedule(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    recrawl = F.when(F.col("event_id") % 5 == 0, F.lit(30)).otherwise(F.lit(0))
    d = ev.select(
        "event_id",
        (F.col("event_id") % 100).cast("double").alias("last_crawl_time"),
        recrawl.cast("long").alias("recrawl"),
    )
    return d.filter(F.col("recrawl") > 0).select(
        "event_id",
        "recrawl",
        (F.col("last_crawl_time") + F.col("recrawl")).alias("next_exetime"),
        F.lit(0).alias("tries"),
    )


SQL_RECRAWL_SCHEDULE = """
SELECT event_id,
       30::BIGINT AS recrawl,
       (event_id % 100)::DOUBLE + 30 AS next_exetime,
       0 AS tries
FROM events WHERE event_id % 5 = 0
"""


# ---------------------------------------------------------------------------
# §2.7: link extraction + explode (parser.py:84-98)
# ---------------------------------------------------------------------------

def q_link_explode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    links = F.array_distinct(F.regexp_extract_all(F.col("text"), F.lit("[a-z]{6,}"), F.lit(0)))
    return (
        docs.select(F.explode(links).alias("word"))
        .withColumn("link", F.concat(F.lit("http://"), F.col("word"), F.lit(".test/")))
        .groupBy("link")
        .agg(F.count("*").alias("indegree"))
    )


SQL_LINK_EXPLODE = """
SELECT 'http://' || word || '.test/' AS link, count(*) AS indegree
FROM (
  SELECT unnest(list_distinct(regexp_extract_all(text, '[a-z]{6,}'))) AS word
  FROM documents
)
GROUP BY 1
"""


# §2.7: meta merge parent->child, child wins (crawler.py:77)

def q_meta_merge(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    parent = F.create_map(
        F.lit("u"), F.col("user_id").cast("string"),
        F.lit("e"), F.col("event_type"),
    )
    child = F.create_map(
        F.lit("e"), F.lit("override"),
        F.lit("v"), F.round(F.col("value")).cast("long").cast("string"),
    )
    # child-wins merge (crawler.py:77 `{**task.meta, **new_task.meta}`),
    # duplicate-free by construction so it is independent of the session's
    # spark.sql.mapKeyDedupPolicy (the driver harness runs EXCEPTION default)
    merged = F.map_concat(
        F.map_filter(parent, lambda k, _v: ~F.map_contains_key(child, k)), child
    )
    # stringify sorted for a portable value representation
    entries = F.transform(
        F.array_sort(F.map_keys(merged)), lambda k: F.concat(k, F.lit("="), merged[k])
    )
    return ev.select("event_id", F.array_join(entries, ",").alias("merged_meta"))


SQL_META_MERGE = """
SELECT event_id,
       'e=override,u=' || user_id::VARCHAR || ',v=' || round(value)::BIGINT::VARCHAR AS merged_meta
FROM events
"""


# ---------------------------------------------------------------------------
# §2.8: field processors (processors.py:26-285)
# ---------------------------------------------------------------------------

def q_processors_numeric(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    s_int = F.concat(F.col("n_chars").cast("string"), F.lit(" reviews"))
    s_float = F.concat(F.lit("$ "), (F.col("doc_id") % 9).cast("string"), F.lit(".5k"))
    d = docs.select("doc_id", s_int.alias("s_int"), s_float.alias("s_float"))
    return d.select(
        "doc_id",
        P.to_int()(F.col("s_int")).alias("as_int"),
        P.to_float()(F.col("s_float")).alias("as_float"),
    )


SQL_PROCESSORS_NUMERIC = r"""
WITH d AS (
  SELECT doc_id,
         n_chars::VARCHAR || ' reviews' AS s_int,
         '$ ' || (doc_id % 9)::VARCHAR || '.5k' AS s_float
  FROM documents
)
SELECT doc_id,
       CASE WHEN regexp_extract(s_int, '\D*(\d+).*', 1) <> ''
            THEN regexp_extract(s_int, '\D*(\d+).*', 1)::BIGINT END AS as_int,
       CASE WHEN regexp_extract(s_float, '\D*(\d*\.?\d*).*', 1) <> ''
            THEN regexp_extract(s_float, '\D*(\d*\.?\d*).*', 1)::DOUBLE END AS as_float
FROM d
"""


def q_processors_date(spark, sf_dir):
    # custom unambiguous regex (the reference's default regex quirk —
    # day backtracking — is pinned in tests/test_processors.py instead,
    # where both engines share one regex engine's semantics)
    docs = _t(spark, sf_dir, "documents")
    s = F.concat(
        F.lit("published 2019-"),
        F.lpad(((F.col("doc_id") % 12) + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") % 27) + 1).cast("string"), 2, "0"),
        F.lit(" edited"),
    )
    rx = r".*(\d{4})-(\d{2})-(\d{2}).*"
    d = docs.select("doc_id", s.alias("s"))
    return d.select("doc_id", P.to_date(regex=rx)(F.col("s")).alias("as_date"))


SQL_PROCESSORS_DATE = r"""
WITH d AS (
  SELECT doc_id,
         'published 2019-' || lpad(((doc_id % 12) + 1)::VARCHAR, 2, '0') || '-' ||
         lpad(((doc_id % 27) + 1)::VARCHAR, 2, '0') || ' edited' AS s
  FROM documents
)
SELECT doc_id,
       make_date(regexp_extract(s, '.*(\d{4})-(\d{2})-(\d{2}).*', 1)::INT,
                 regexp_extract(s, '.*(\d{4})-(\d{2})-(\d{2}).*', 2)::INT,
                 regexp_extract(s, '.*(\d{4})-(\d{2})-(\d{2}).*', 3)::INT) AS as_date
FROM d
"""


# ---------------------------------------------------------------------------
# §2.9: counters / metrics aggregation (counter.py:148-154)
# ---------------------------------------------------------------------------

def q_metrics_counters(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") > 5.0).cast("long")).alias("n_success"),
        F.sum((F.col("value") <= 5.0).cast("long")).alias("n_fail"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_METRICS_COUNTERS = """
SELECT event_type,
       count(*) AS n,
       sum(CASE WHEN value > 5.0 THEN 1 ELSE 0 END)::BIGINT AS n_success,
       sum(CASE WHEN value <= 5.0 THEN 1 ELSE 0 END)::BIGINT AS n_fail,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


# §2.9: ancestor-group rollup (counter.py:132,144-146)

def q_ancestor_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").alias("ancestor")).agg(
        F.count("*").alias("unfinished"),
        F.countDistinct("event_type").alias("n_families"),
        F.max("event_id").alias("last_task"),
    )


SQL_ANCESTOR_ROLLUP = """
SELECT user_id AS ancestor,
       count(*) AS unfinished,
       count(DISTINCT event_type) AS n_families,
       max(event_id) AS last_task
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# §2.1 sinks: skip-if-exists anti-join (http.py:536-543) and
# upsert last-wins (ItemToMongo, handlers.py:223-230)
# ---------------------------------------------------------------------------

def q_skip_if_exists(spark, sf_dir):
    # manifest = "already downloaded" subset (every 3rd order's parts)
    part = _t(spark, sf_dir, "part")
    manifest = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 3 == 0)
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    return part.join(manifest, "p_partkey", "left_anti").select("p_partkey", "p_name")


SQL_SKIP_IF_EXISTS = """
SELECT p_partkey, p_name FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_orderkey % 3 = 0
)
"""


def q_upsert_last_wins(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", "event_id").alias("last_event_id"),
        F.max_by("value", "event_id").alias("last_value"),
        F.max_by("event_type", "event_id").alias("last_type"),
    )


SQL_UPSERT_LAST_WINS = """
SELECT user_id,
       arg_max(event_id, event_id) AS last_event_id,
       arg_max(value, event_id) AS last_value,
       arg_max(event_type, event_id) AS last_type
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Multimodal binary columns (operators/multimodal.py): JVM-side metadata
# over opaque payloads + frame-sampling explode shape. Payloads are derived
# deterministically from documents.text so both engines hash the same bytes.
# ---------------------------------------------------------------------------

def q_media_metadata(spark, sf_dir):
    from acrawler_spark.operators.multimodal import attach_media_metadata

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return attach_media_metadata(docs, "payload", kind="image").select(
        "media_id", "kind", "n_bytes", "checksum"
    )


SQL_MEDIA_METADATA = """
SELECT doc_id AS media_id,
       'image' AS kind,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


def q_media_frame_sample(spark, sf_dir):
    from acrawler_spark.operators.multimodal import frame_sample

    # ascii-sanitized payload: byte offsets == char offsets in both engines
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.regexp_replace("text", r"[^\x20-\x7e]", ""), "utf-8").alias("payload"),
    )
    return frame_sample(docs, every_n=2).select(
        "media_id", "frame_idx", F.length("frame").alias("frame_len")
    )


SQL_MEDIA_FRAME_SAMPLE = r"""
WITH a AS (
  SELECT doc_id AS media_id, regexp_replace(text, '[^\x20-\x7e]', '', 'g') AS s
  FROM documents
),
f AS (
  SELECT media_id, i AS frame_idx, strlen(substr(s, (i * 1024 + 1)::BIGINT, 1024)) AS frame_len
  FROM a, unnest(range(0, (strlen(s) // 1024) + 1)) AS t(i)
)
SELECT media_id, frame_idx::INT AS frame_idx, frame_len::INT AS frame_len
FROM f
WHERE frame_idx % 2 = 0 AND frame_len > 0
"""




def q_media_features(spark, sf_dir):
    """The mapInPandas decode stage as a driver query (fake decode —
    deterministic byte-chunk means, operators/multimodal.py:60-75): the
    whole Arrow batch path (payload binary -> features) gets a DuckDB
    oracle. Feature vector (float32) excluded; the double stats are the
    cross-engine contract."""
    from acrawler_spark.operators.multimodal import decode_features_df

    # ascii-sanitized payload: byte offsets == char offsets in both engines
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.regexp_replace("text", r"[^\x20-\x7e]", ""), "utf-8").alias("payload"),
    )
    return decode_features_df(docs, decode_stub="fake").select(
        "media_id",
        "kind",
        "n_bytes",
        F.round("feat_mean", 6).alias("feat_mean"),
        F.round("feat_std", 6).alias("feat_std"),
        "n_frames",
    )


# np.array_split chunking of n bytes into 8 parts: first (n % 8) chunks get
# (n // 8 + 1) bytes, the rest (n // 8); std is two-pass population std,
# matching np.std's float64 evaluation order to well past 6 decimals.
# Chunk set is padded to EXACTLY 8 via a range(0,8) cross join (empty
# chunks mean 0.0, matching the fake decoder's `c.mean() if c.size else
# 0.0`), and a zeros row is emitted at n=0 (the decoder returns
# np.zeros(8)) — so parity holds for payloads shorter than 8 bytes too,
# not just the long fixture documents (ADVICE r3 #3).
SQL_MEDIA_FEATURES = r"""
WITH a AS (
  SELECT doc_id AS media_id, regexp_replace(text, '[^\x20-\x7e]', '', 'g') AS s
  FROM documents
),
b AS (SELECT media_id, s, strlen(s) AS n FROM a),
bytes AS (
  SELECT media_id, n,
         ord(substr(s, (i + 1)::BIGINT, 1)) AS v,
         CASE WHEN i < (n % 8) * ((n // 8) + 1)
              THEN i // ((n // 8) + 1)
              ELSE (n % 8) + (i - (n % 8) * ((n // 8) + 1)) // (n // 8) END AS chunk
  FROM b, unnest(range(0, n)) AS t(i)
),
chunkmeans AS (
  SELECT media_id, chunk, avg(v) AS cm FROM bytes GROUP BY 1, 2
),
chunks AS (
  SELECT b.media_id, t.ci AS chunk, coalesce(c.cm, 0.0) AS cm
  FROM b CROSS JOIN unnest(range(0, 8)) AS t(ci)
  LEFT JOIN chunkmeans c ON c.media_id = b.media_id AND c.chunk = t.ci
),
m AS (SELECT media_id, avg(cm) AS fm, count(*) AS nf FROM chunks GROUP BY 1),
st AS (
  SELECT c.media_id, sqrt(avg((c.cm - m.fm) * (c.cm - m.fm))) AS fstd
  FROM chunks c JOIN m USING (media_id) GROUP BY 1
)
SELECT m.media_id, 'image' AS kind, b.n AS n_bytes,
       round(m.fm, 6) AS feat_mean, round(st.fstd, 6) AS feat_std,
       m.nf::INT AS n_frames
FROM m JOIN st USING (media_id) JOIN b USING (media_id)
"""


# ---------------------------------------------------------------------------
# §2.5: MAX_REQUESTS_SPECIAL_HOST — substring-matched per-pattern caps,
# min-combined, suppressing the uniform cap (counter.py:76-88; the operator
# is politeness.budget_col — used here directly, so the driver gate checks
# the production expression, not a re-derivation).
# ---------------------------------------------------------------------------

_SPECIALS = {"ite1": 4, "e1.t": 2, "site3": 1}  # 'site1.test' matches TWO
# patterns (min wins = 2); 'site3.test' one; other hosts are unlimited
# (uniform=0 -> budget 1<<30, every row admitted) — both operator paths.


def q_special_host_budget(spark, sf_dir):
    from acrawler_spark.operators.politeness import budget_col

    ev = _t(spark, sf_dir, "events").withColumn(
        "host", F.concat(F.lit("site"), (F.col("user_id") % 8).cast("string"), F.lit(".test"))
    )
    w = Window.partitionBy("host").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.withColumn("budget", budget_col(F.col("host"), 0, _SPECIALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("budget"))
        .select("host", "event_id", "rn", "budget")
    )


SQL_SPECIAL_HOST_BUDGET = """
WITH e AS (
  SELECT event_id, value, 'site' || (user_id % 8)::VARCHAR || '.test' AS host
  FROM events
), b AS (
  SELECT host, event_id, value,
    CASE WHEN strpos(host,'ite1')>0 OR strpos(host,'e1.t')>0 OR strpos(host,'site3')>0
      THEN least(CASE WHEN strpos(host,'ite1')>0 THEN 4 ELSE 1073741824 END,
                 CASE WHEN strpos(host,'e1.t')>0 THEN 2 ELSE 1073741824 END,
                 CASE WHEN strpos(host,'site3')>0 THEN 1 ELSE 1073741824 END)
      ELSE 1073741824 END AS budget
  FROM e
), r AS (
  SELECT host, event_id, budget,
    row_number() OVER (PARTITION BY host ORDER BY value DESC, event_id ASC) AS rn
  FROM b
)
SELECT host, event_id, rn, budget FROM r WHERE rn <= budget
"""


# ---------------------------------------------------------------------------
# §2.7: follow_limit slice semantics (http.py:387-435: paginate/follow cap
# the links taken per page, FIRST-k in document order) — the engine's
# F.slice + posexplode shape (plans/engine.py follow branch) as a query.
# ---------------------------------------------------------------------------

def q_follow_limit_slice(spark, sf_dir, limit: int = 5):
    docs = _t(spark, sf_dir, "documents")
    links = F.regexp_extract_all(F.col("text"), F.lit("[a-z]{6,}"), F.lit(0))
    return (
        docs.select("doc_id", F.posexplode(F.slice(links, 1, limit)).alias("pos", "word"))
        .select(
            "doc_id",
            "pos",
            F.concat(F.lit("http://"), F.col("word"), F.lit(".test/")).alias("link"),
        )
    )


SQL_FOLLOW_LIMIT_SLICE = """
WITH l AS (
  SELECT doc_id, (regexp_extract_all(text, '[a-z]{6,}'))[1:5] AS sl FROM documents
)
SELECT doc_id,
       unnest(generate_series(0, len(sl)-1)) AS pos,
       'http://' || unnest(sl) || '.test/' AS link
FROM l
WHERE len(sl) > 0
"""


# ---------------------------------------------------------------------------
# §2.5 north-rule addition: robots.txt admission gate (operators/robots.py).
# The driver query runs the PRODUCTION apply_robots split (broadcast rules,
# JVM exists-over-prefixes) on an events-derived frontier and labels every
# row allowed/blocked; the oracle re-derives the same prefix semantics in
# SQL. Rules cover all operator paths: multi-prefix host, block-everything
# prefix, empty disallow list, non-matching prefix, and hosts absent from
# the rules table.
# ---------------------------------------------------------------------------

_ROBOTS_RULES = {
    "site0.test": {"disallow": ["/p/1", "/p/3"]},
    "site2.test": {"disallow": ["/p/"]},
    "site4.test": {"disallow": []},
    "site6.test": {"disallow": ["/x/"]},
}


def q_robots_gate(spark, sf_dir):
    from acrawler_spark.operators.robots import apply_robots, rules_df

    ev = _t(spark, sf_dir, "events").withColumn("url", _event_url_col())
    frontier = ev.select(
        "event_id",
        canonicalize_col(F.col("url")).alias("url_canon"),
        host_col(F.col("url")).alias("host"),
    )
    allowed, blocked = apply_robots(frontier, rules_df(spark, _ROBOTS_RULES))
    return allowed.withColumn("blocked", F.lit(False)).unionByName(
        blocked.withColumn("blocked", F.lit(True))
    )


SQL_ROBOTS_GATE = f"""
WITH u AS (SELECT event_id, {_EVENT_URL_SQL} AS url FROM events),
p AS (
  SELECT event_id, url,
         split_part(url, '#', 1) AS base,
         split_part(split_part(url, '#', 1), '?', 1) AS pre
  FROM u
),
c AS (
  SELECT event_id,
         CASE WHEN strpos(base, '?') > 0
              THEN pre || '?' || array_to_string(list_sort(string_split(substr(base, strpos(base,'?') + 1), '&')), '&')
              ELSE pre END AS url_canon,
         split_part(split_part(url, '://', 2), '/', 1) AS host
  FROM p
),
g AS (
  SELECT event_id, url_canon, host,
         regexp_replace(url_canon, '^https?://[^/]+', '') AS path
  FROM c
)
SELECT event_id, url_canon, host,
       (   (host = 'site0.test' AND (path LIKE '/p/1%' OR path LIKE '/p/3%'))
        OR (host = 'site2.test' AND path LIKE '/p/%')
        OR (host = 'site6.test' AND path LIKE '/x/%')) AS blocked
FROM g
"""


REGISTRY: dict[str, tuple] = {
    # name: (spark_fn, oracle_sql or None)
    "url_canonicalize": (q_url_canonicalize, SQL_URL_CANONICALIZE),
    "url_fingerprint": (q_url_fingerprint, SQL_URL_FINGERPRINT),
    "frontier_rank": (q_frontier_rank, SQL_FRONTIER_RANK),
    "host_budget": (q_host_budget, SQL_HOST_BUDGET),
    "seen_antijoin": (q_seen_antijoin, SQL_SEEN_ANTIJOIN),
    "within_round_dedup": (q_within_round_dedup, SQL_WITHIN_ROUND_DEDUP),
    "status_retry": (q_status_retry, SQL_STATUS_RETRY),
    "exetime_gate": (q_exetime_gate, SQL_EXETIME_GATE),
    "recrawl_schedule": (q_recrawl_schedule, SQL_RECRAWL_SCHEDULE),
    "link_explode": (q_link_explode, SQL_LINK_EXPLODE),
    "meta_merge": (q_meta_merge, SQL_META_MERGE),
    "processors_numeric": (q_processors_numeric, SQL_PROCESSORS_NUMERIC),
    "processors_date": (q_processors_date, SQL_PROCESSORS_DATE),
    "metrics_counters": (q_metrics_counters, SQL_METRICS_COUNTERS),
    "ancestor_rollup": (q_ancestor_rollup, SQL_ANCESTOR_ROLLUP),
    "skip_if_exists": (q_skip_if_exists, SQL_SKIP_IF_EXISTS),
    "upsert_last_wins": (q_upsert_last_wins, SQL_UPSERT_LAST_WINS),
    "media_metadata": (q_media_metadata, SQL_MEDIA_METADATA),
    "media_frame_sample": (q_media_frame_sample, SQL_MEDIA_FRAME_SAMPLE),
    "media_features": (q_media_features, SQL_MEDIA_FEATURES),
    "special_host_budget": (q_special_host_budget, SQL_SPECIAL_HOST_BUDGET),
    "follow_limit_slice": (q_follow_limit_slice, SQL_FOLLOW_LIMIT_SLICE),
    "robots_gate": (q_robots_gate, SQL_ROBOTS_GATE),
}
