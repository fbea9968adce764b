"""Text-analysis + dedup queries over ``documents``.

The DuckDB oracles reproduce every pipeline stage — tokenization, shingling,
md5-minhash, LSH banding, SimHash bit votes — bit-for-bit (shared dialect
fragments below), so even the probabilistic operators are hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.functions.hashing import hash64
from arrow_parquet_logs_spark.functions.numeric import qfloor
from arrow_parquet_logs_spark.operators import dedup as D
from arrow_parquet_logs_spark.operators import text as X
from arrow_parquet_logs_spark.queries.catalog import register, scratch_dir
from arrow_parquet_logs_spark.sources.tables import load_table

# ---- DuckDB dialect fragments (mirror operators.text exactly) -------------
_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
# word 3-gram shingles with whole-doc fallback (mirrors text.shingles)
_SH3 = (
    "CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(range(0, len(t)-2), "
    "i -> array_to_string(list_slice(t, i+1, i+3), ' '))) "
    "ELSE [array_to_string(t, ' ')] END"
)
_H64 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
_STOP = "('the','a','an','of','and','to','in','is','it','that')"

_SHINGLE_CTE = f"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SH3} AS s FROM toks)
"""

_VERIFY_SQL = """
    SELECT a_id, b_id,
           CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
    FROM (
        SELECT c.a_id, c.b_id,
               len(list_intersect(sa.s, sb.s)) AS common,
               len(sa.s) AS na, len(sb.s) AS nb
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.a_id
        JOIN sh sb ON sb.doc_id = c.b_id
    )
    WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.6
"""


@register(
    "docs_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
           n_chars
    FROM documents ORDER BY doc_id
    """,
    tags=("text",),
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(X.tokens("text")).cast("int").alias("n_tokens"), "n_chars"
    ).orderBy("doc_id")


@register(
    "docs_token_freq",
    oracle=f"""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest({_TOKS}) AS token FROM documents)
    GROUP BY token ORDER BY n DESC, token LIMIT 50
    """,
    tags=("text", "agg", "topk"),
    bench=True,
)
def docs_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency: explode → two-phase agg (map-side combine on
    token) → top-50 TakeOrdered. The classic wordcount, minus any RDDs."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(X.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(50)
    )


@register(
    "docs_lang_facet",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
    tags=("text", "agg"),
)
def docs_lang_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "docs_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY keep_id
    """,
    tags=("dedup",),
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content hash, keep canonical min-id. The
    shuffle key is the 32-byte md5, not the document body."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_groups(docs).orderBy("keep_id")


@register(
    "docs_lang_id",
    oracle=f"""
    WITH profiles(lang, marker) AS (VALUES
        ('en','the'),('en','and'),('en','of'),
        ('de','der'),('de','und'),('de','nicht'),
        ('es','de'),('es','la'),('es','que'),
        ('fr','le'),('fr','et'),('fr','les'),
        ('it','di'),('it','che'),('it','la'),
        ('pt','de'),('pt','que'),('pt','um')),
    toks AS (SELECT doc_id, unnest(list_distinct({_TOKS})) AS token FROM documents),
    scores AS (
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS score
        FROM toks JOIN profiles ON token = marker GROUP BY doc_id, lang
    ),
    best AS (
        SELECT doc_id, lang, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        FROM scores
    )
    SELECT d.doc_id,
           COALESCE(b.lang, 'und') AS pred_lang,
           CAST(COALESCE(b.score, 0) AS INTEGER) AS marker_hits
    FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
    ORDER BY d.doc_id
    """,
    tags=("text", "langid"),
)
def docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID against a broadcast marker profile."""
    docs = load_table(spark, sf_dir, "documents")
    return X.lang_id(docs, spark).orderBy("doc_id")


@register(
    "docs_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars_m,
           CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
           CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS INTEGER) AS alpha_chars,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INTEGER) AS digit_chars,
           CAST(len(list_filter({_TOKS}, tk -> tk IN {_STOP})) AS DOUBLE) / len({_TOKS}) AS stopword_ratio,
           floor((
             0.3 * least(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0)
             + 0.4 * (CAST(len(list_filter({_TOKS}, tk -> tk IN {_STOP})) AS DOUBLE) / len({_TOKS}))
             + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text))
           ) * 1000000) / 1000000 AS quality_score
    FROM documents ORDER BY doc_id
    """,
    tags=("text", "quality"),
    bench=True,
)
def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface-feature quality scoring — pure codegen expressions, fixed
    evaluation order so scores are bit-stable everywhere."""
    docs = load_table(spark, sf_dir, "documents")
    return X.quality_features(docs).orderBy("doc_id")


@register(
    "docs_fingerprint",
    oracle=f"""
    WITH {_SHINGLE_CTE}
    SELECT t.doc_id,
           md5(array_to_string(t.t, ' ')) AS md5_fp,
           list_min(list_transform(sh.s, g -> {_H64.format(x='g')})) AS minshingle_fp
    FROM toks t JOIN sh ON sh.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("text", "fingerprint"),
)
def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of the normalized token stream + the
    min-shingle-hash (1-permutation minhash) — both portable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    sh = X.distinct_shingles("text", 3)
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", toks)).alias("md5_fp"),
        F.array_min(F.transform(sh, lambda g: hash64(g))).alias("minshingle_fp"),
    ).orderBy("doc_id")


_JACCARD_ORACLE = f"""
    WITH {_SHINGLE_CTE},
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
    )
    {_VERIFY_SQL}
    """


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (threshold 0.6) via inverted-index
    self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.6)


@register(
    "dedup_ngram_jaccard_fast",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "jaccard", "pandas"),
    bench=True,
)
def dedup_ngram_jaccard_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact-Jaccard pipeline with the shingle stage as one Arrow-
    batched mapInPandas pass — identical output under the identical oracle;
    the Catalyst expression form above stays as the oracle-shaped
    reference."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.6, pandas_shingles=True)


@register(
    "dedup_jaccard_prefix",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "jaccard", "prefix-filter"),
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (PPJoin/AllPairs family):
    only each document's first |A|-ceil(t|A|)+1 lexicographically-ordered
    shingles enter the inverted index — a provably lossless ~(1-t) shrink
    of the quadratic-risk join — with exact array_intersect verification.
    Output identical to `dedup_ngram_jaccard`, pinned by the SAME oracle
    (operators.dedup.jaccard_prefix_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_prefix_pairs(docs, threshold=0.6)


def _minhash_sig_sql() -> str:
    # exploded rows + k columnar min-aggregates, not nested list lambdas:
    # identical integer values, but DuckDB executes the aggregate form ~50×
    # faster (the lambda form re-evaluates an interpreted closure per
    # (doc, i, shingle) triple — 64 s at sf0.1 vs ~1 s for this)
    from arrow_parquet_logs_spark.functions.hashing import MINHASH_P, minhash_coeffs

    a, b = minhash_coeffs(32)
    mins = ", ".join(
        f"min(({a[i]} * h + {b[i]}) % {MINHASH_P}) AS s{i}" for i in range(32)
    )
    sig_list = "[" + ", ".join(f"s{i}" for i in range(32)) + "]"
    return f"""
    hb AS (
        SELECT doc_id, unnest(list_transform(s, g -> {_H64.format(x='g')} % {MINHASH_P})) AS h
        FROM sh
    ),
    sigagg AS (SELECT doc_id, {mins} FROM hb GROUP BY doc_id),
    sigs AS (SELECT doc_id, {sig_list} AS sig FROM sigagg)"""


# exact-collapse twin of operators.dedup._exact_collapse: byte-identical
# documents emit star edges (canonical -> member, jaccard exactly 1.0) and
# only the canonical representative enters the MinHash pipeline
_MINHASH_ORACLE = f"""
    WITH grp AS (SELECT doc_id, md5(text) AS h FROM documents),
    reps AS (SELECT h, min(doc_id) AS rep FROM grp GROUP BY h),
    star AS (
        SELECT r.rep AS a_id, g.doc_id AS b_id, CAST(1.0 AS DOUBLE) AS jaccard
        FROM grp g JOIN reps r USING (h) WHERE g.doc_id != r.rep
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
        SELECT tk.doc_id, {_SH3} AS s
        FROM toks tk JOIN reps r ON tk.doc_id = r.rep
    ),
    {_minhash_sig_sql()},
    bands AS (
        SELECT doc_id,
               unnest(list_transform(range(0, 8), b -> md5(concat(CAST(b AS VARCHAR), ':',
                   array_to_string(list_slice(sig, b*4+1, b*4+4), ','))))) AS band_key
        FROM sigs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT * FROM ({_VERIFY_SQL})
    UNION ALL
    SELECT * FROM star
    """


@register(
    "dedup_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8×4) candidate pairs, Jaccard-verified at 0.6.
    The oracle reproduces signatures and banding exactly (portable md5
    hashes), so the probabilistic pipeline is still hash-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, threshold=0.6)


@register(
    "dedup_minhash_lsh_fast",
    oracle=_MINHASH_ORACLE,
    tags=("dedup", "minhash", "lsh", "pandas"),
    bench=True,
)
def dedup_minhash_lsh_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same MinHash-LSH pipeline with the signature stage as one Arrow-
    batched mapInPandas pass (numpy affine matrix per doc) — identical
    output under the identical oracle, ~5× faster: the Catalyst shingle
    builder evaluates interpreted higher-order functions per element. The
    expression form above stays registered as the oracle-shaped reference."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_pandas(docs, threshold=0.6)


@register(
    "docs_export_shards",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text,
               {_H64.format(x="concat('shard:', CAST(doc_id AS VARCHAR))")} % 16 AS shard,
               {_H64.format(x="concat(CAST(doc_id AS VARCHAR), ':', md5(text))")} AS fp
        FROM documents WHERE doc_id < 1000
    )
    SELECT CAST(shard AS INTEGER) AS shard,
           CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(fp) AS content_hash
    FROM t GROUP BY shard ORDER BY shard
    """,
    tags=("text", "export", "shards", "manifest", "sink"),
)
def docs_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-set export under the hash gate: a document
    slice is written as 16 content-stable ``shard=`` parquet partitions
    with an atomic order-independent integrity manifest
    (`operators.text.export_training_shards`), and the returned rows are
    the manifest READ BACK FROM DISK — so shard assignment drift, a
    dropped/duplicated row, or a broken manifest publish all land as a
    hash mismatch against the oracle's recomputation from the source
    table. The xor-of-fingerprints hash commutes, making the check
    partition-count- and order-invariant: the property that lets a 1000-
    executor export be verified shard-by-shard without a global sort."""

    from arrow_parquet_logs_spark.operators.text import export_training_shards

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    path = scratch_dir(prefix="shard_export_") + "/out"
    return export_training_shards(docs, path).orderBy("shard")


@register(
    "docs_jsonl_ingest",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(1 AS BIGINT) AS n_corrupt
    FROM documents WHERE doc_id < 500 ORDER BY doc_id
    """,
    tags=("text", "ingest", "jsonl", "source"),
)
def docs_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-JSONL corpus ingest — the wire format most public text corpora
    actually arrive in (C4, The Pile, Common Crawl derivatives are all
    newline-delimited JSON, usually gzipped). Round-trips a document slice
    through ``.json.gz`` files plus one deliberately malformed plain line,
    and reads back the 100 TB way:

    - **explicit schema** — no schema-inference pre-pass over the corpus
      (inference is a full extra scan at scale);
    - **PERMISSIVE + columnNameOfCorruptRecord** — the poison line is
      quarantined into the corrupt column instead of failing the job or
      (worse) silently vanishing; the query counts it and excludes it;
    - mixed compression in one directory (gzip + plain) — Spark resolves
      per-file codecs from extensions, no per-run config. Gzip files are
      NOT splittable: one file = one task, so writers shard output (here:
      Spark's own partitioned writer) rather than emitting one giant .gz.

    The oracle is the identity over the slice plus the corrupt count —
    any encode/decode drift (escaping, unicode, null handling) or a
    quarantine miss lands as a hash mismatch."""
    import os

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    path = scratch_dir(prefix="jsonl_ingest_") + "/corpus"
    docs.select("doc_id", "text").write.mode("overwrite").option(
        "compression", "gzip"
    ).json(path)
    with open(os.path.join(path, "poison.json"), "w", encoding="utf-8") as fh:
        fh.write('{"doc_id": 999999, "text": NOT_VALID_JSON}\n')

    back = (
        spark.read.schema("doc_id long, text string, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
        # Spark refuses corrupt-column-only queries on raw JSON (the parser
        # prunes to referenced columns, so _bad alone would see nothing to
        # fail) — persist the parsed batch once, then both the quarantine
        # count and the clean projection read the same parse
        .persist()
    )
    n_corrupt = back.where(F.col("_bad").isNotNull()).count()
    return (
        back.where(F.col("_bad").isNull() & F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.length("text").alias("n_chars"),
        )
        .withColumn("n_corrupt", F.lit(n_corrupt).cast("long"))
        .orderBy("doc_id")
    )


@register(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SH3} AS s FROM toks),
    {_minhash_sig_sql()},
    bands AS (
        SELECT doc_id,
               unnest(list_transform(range(0, 8), b -> md5(concat(CAST(b AS VARCHAR), ':',
                   array_to_string(list_slice(sig, b*4+1, b*4+4), ','))))) AS band_key
        FROM sigs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
        WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
    )
    SELECT * FROM ({_VERIFY_SQL}) ORDER BY a_id, b_id
    """,
    tags=("dedup", "minhash", "lsh", "incremental", "index"),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state ingest dedup: the corpus (doc_id % 10 != 0) is indexed
    ONCE (`materialize_minhash_index` — its band keys land in parquet),
    then an incoming batch (doc_id % 10 == 0) is deduped against it by
    `minhash_pairs_incremental`: the batch re-shingles only itself, joins
    its fresh band keys against the STORED corpus keys, and exact-verifies
    candidates with a candidate-sized corpus text lookup. The oracle
    replays the whole minhash pipeline over all documents and keeps the
    pairs touching the batch — so a stored key that stopped colliding with
    a freshly computed one (coefficient drift, shingle normalization
    drift: the failure mode of any persistent signature index) lands as a
    hash mismatch."""

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 0
    corpus, batch = docs.where(~is_new), docs.where(is_new)
    path = scratch_dir(prefix="minhash_idx_") + "/idx"
    D.materialize_minhash_index(corpus, path)
    return D.minhash_pairs_incremental(spark, path, batch, corpus).orderBy("a_id", "b_id")


@register(
    "dedup_lsh_cdc_merge",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SH3} AS s FROM toks),
    {_minhash_sig_sql()},
    bands AS (
        SELECT doc_id,
               unnest(list_transform(range(0, 8), b -> md5(concat(CAST(b AS VARCHAR), ':',
                   array_to_string(list_slice(sig, b*4+1, b*4+4), ','))))) AS band_key
        FROM sigs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT * FROM ({_VERIFY_SQL}) ORDER BY a_id, b_id
    """,
    tags=("dedup", "minhash", "lsh", "cdc", "versioned-table", "ingest"),
)
def dedup_lsh_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-MERGE — the ingestion-time composition (VERDICT r8 #7b):
    documents land in a `VersionedTable` through OCC MERGEs, each commit's
    CHANGE FEED (`table.changes`, the Delta-CDF shape) drives the
    incremental MinHash-LSH index — the new rows are deduped against the
    stored band keys (`minhash_pairs_incremental`: the batch re-shingles
    only itself; candidate text lookups TIME-TRAVEL to the pre-merge
    snapshot, so verification never races a concurrent writer) and then
    appended to the index (`append_to_minhash_index`), keeping index ≡
    table at every version.

    The gate: the accumulated pair stream across all commits must
    hash-match the oracle's one-shot full-corpus LSH run — each pair is
    found exactly once, by the commit that inserted its later endpoint,
    so the union needs no dedup and any drift (a stored key no longer
    colliding with a fresh one, a CDC row missed or double-fed) lands as
    a mismatch. The companion append ≡ rebuild index invariant is pinned
    through the same CDC routing at unit scale
    (tests/test_versioned_table.py) — re-proving it here would cost a
    second full-corpus signature pass per run for no new information.

    Scale shape: per commit, cost ∝ batch size + candidate count (band-key
    equi-join against the stored index; candidate-sized semi-join text
    lookup) — never a corpus re-scan; the one-time full-corpus work lives
    in the initial index build, exactly where a 100 TB deployment pays it."""

    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = scratch_dir(prefix="cdc_lsh_")
    t = VersionedTable(spark, f"{root}/tbl", key_cols=["doc_id"])
    t.write(docs.where(F.col("doc_id") % 3 == 0))
    idx = f"{root}/idx"
    D.materialize_minhash_index(t.read(), idx, pandas_sigs=True)
    # pairs inside the initial load: the one-time batch pass (pandas
    # signature stage — bit-identical to the expression form, ~5x faster)
    parts = [D.minhash_lsh_pairs_pandas(t.read(), threshold=0.6, collapse_exact=False)]
    for i in (1, 2):
        pre_v = t.history()[-1]["version"]
        t.upsert(docs.where(F.col("doc_id") % 3 == i))
        post_v = t.history()[-1]["version"]
        feed = t.changes(pre_v, post_v)
        ins = feed.where(F.col("_change_type") == "insert").select("doc_id", "text")
        corpus_prev = t.read(version=pre_v)  # time-travel text lookup
        parts.append(
            D.minhash_pairs_incremental(
                spark, idx, ins, corpus_prev, threshold=0.6, pandas_sigs=True
            )
        )
        D.append_to_minhash_index(ins, idx, pandas_sigs=True)
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.orderBy("a_id", "b_id")


@register(
    "dedup_cdc_cluster_maintain",
    oracle=f"""
    WITH RECURSIVE toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SH3} AS s FROM toks),
    {_minhash_sig_sql()},
    bands AS (
        SELECT doc_id,
               unnest(list_transform(range(0, 8), b -> md5(concat(CAST(b AS VARCHAR), ':',
                   array_to_string(list_slice(sig, b*4+1, b*4+4), ','))))) AS band_key
        FROM sigs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    pairs AS (SELECT a_id, b_id FROM ({_VERIFY_SQL})),
    cedges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION SELECT b_id, a_id FROM pairs
    ),
    cnodes AS (SELECT DISTINCT src AS id FROM cedges),
    reach(src, dst) AS (
        SELECT id, id FROM cnodes
        UNION
        SELECT r.src, e.dst FROM reach r JOIN cedges e ON r.dst = e.src
    )
    SELECT src AS doc_id,
           MIN(dst) AS cluster_id,
           src = MIN(dst) AS is_canonical
    FROM reach GROUP BY src ORDER BY doc_id
    """,
    tags=("dedup", "minhash", "lsh", "cdc", "clusters", "incremental",
          "versioned-table", "ingest"),
)
def dedup_cdc_cluster_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CLUSTER maintenance over the CDC dedup feed (VERDICT r9
    #1) — the composition that makes `dedup_lsh_cdc_merge` a complete
    ingestion-time dedup pipeline: each commit's incremental pair stream
    folds into a persistent cluster-assignment table
    (`update_clusters_incremental` + `VersionedTable` MERGE), so dedup
    policy reads STABLE cluster ids at every version without ever
    re-running `connected_components` on the corpus. The hard case — a
    bridging pair merging two clusters formed in earlier commits — is the
    normal case here: label-space union-find over the commit's pairs
    relabels exactly the touched clusters' members (the rewrite scope is
    unit-pinned via the MERGE's change feed in
    tests/test_versioned_table.py).

    The gate: the accumulated assignments after the last commit must
    hash-match a ONE-SHOT clustering oracle of the final corpus (the
    `dedup_clusters` recursive-CTE transitive closure over the full-corpus
    LSH pairs) — labels, membership, and canonical flags all replayed from
    scratch, so a mis-merged, missed, or stale-labeled cluster lands as a
    mismatch.

    Scale shape: per commit — batch-sized signature work, candidate-sized
    verification (`minhash_pairs_incremental`), a pair-batch-sized label
    closure, and ONE dup-docs-sized state scan against a broadcast
    changed-label set; the write is touched-clusters-only. No stage ever
    re-scans the corpus after the initial index build."""

    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = scratch_dir(prefix="cdc_clu_")
    t = VersionedTable(spark, f"{root}/tbl", key_cols=["doc_id"])
    t.write(docs.where(F.col("doc_id") % 3 == 0))
    idx = f"{root}/idx"
    D.materialize_minhash_index(t.read(), idx, pandas_sigs=True)
    cstate = VersionedTable(spark, f"{root}/clusters", key_cols=["doc_id"])
    have_state = False

    def fold(pairs) -> None:
        nonlocal have_state
        upd = D.update_clusters_incremental(
            cstate.read() if have_state else None, pairs
        )
        if not upd.isEmpty():
            (cstate.upsert if have_state else cstate.write)(upd)
            have_state = True

    fold(D.minhash_lsh_pairs_pandas(t.read(), threshold=0.6, collapse_exact=False))
    for i in (1, 2):
        pre_v = t.history()[-1]["version"]
        t.upsert(docs.where(F.col("doc_id") % 3 == i))
        post_v = t.history()[-1]["version"]
        feed = t.changes(pre_v, post_v)
        ins = feed.where(F.col("_change_type") == "insert").select("doc_id", "text")
        fold(
            D.minhash_pairs_incremental(
                spark, idx, ins, t.read(version=pre_v), threshold=0.6, pandas_sigs=True
            )
        )
        D.append_to_minhash_index(ins, idx, pandas_sigs=True)
    if not have_state:
        # dup-free corpus: no commit ever produced pairs, so the clusters
        # table was never written — return the empty typed frame rather
        # than failing the read (ADVICE r10)
        return spark.createDataFrame(
            [], "doc_id bigint, cluster_id bigint, is_canonical boolean"
        )
    return cstate.read().select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    ).orderBy("doc_id")


@register(
    "docs_chunking",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    starts AS (SELECT doc_id, t, range(0, greatest(len(t) - 50, 0) + 1, 40) AS ss FROM toks)
    SELECT doc_id,
           unnest(ss) AS chunk_start,
           unnest(list_transform(ss, s -> array_to_string(list_slice(t, s + 1, s + 50), ' '))) AS chunk_text,
           unnest(list_transform(ss, s -> CAST(least(len(t) - s, 50) AS INTEGER))) AS chunk_tokens
    FROM starts
    ORDER BY doc_id, chunk_start
    """,
    tags=("text", "chunking"),
)
def docs_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-token windows, stride 40 → 10
    overlap) — the context-window prep stage of a training pipeline. Pure
    row-local array expressions: no shuffle, output rows ∝ tokens/stride."""
    # token array hoisted to a column: lambda bodies re-evaluate inline
    # expressions per element (SCALING.md round 10)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", X.tokens("text").alias("_t")
    )
    tok = F.col("_t")
    starts = F.sequence(F.lit(0), F.greatest(F.size(tok) - F.lit(50), F.lit(0)), F.lit(40))
    chunk = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("chunk_start"),
            F.concat_ws(" ", F.slice(tok, s + F.lit(1), 50)).alias("chunk_text"),
            F.least(F.size(tok) - s, F.lit(50)).cast("int").alias("chunk_tokens"),
        ),
    )
    return (
        docs.select("doc_id", F.explode(chunk).alias("c"))
        .select("doc_id", "c.chunk_start", "c.chunk_text", "c.chunk_tokens")
        .orderBy("doc_id", "chunk_start")
    )


@register(
    "docs_redact_entities",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(text, '\b(customer|key|value)\b', '<ENT>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '\b(customer|key|value)\b')) AS INTEGER) AS n_redacted
    FROM documents ORDER BY doc_id
    """,
    tags=("text", "redaction"),
)
def docs_redact_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-based redaction/scrubbing (the PII-masking operator shape):
    regexp_replace + match counting, fully codegen — swap the pattern for
    email/phone/SSN classes in a real pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    pat = r"\b(customer|key|value)\b"
    return docs.select(
        "doc_id",
        F.regexp_replace("text", pat, "<ENT>").alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).cast("int").alias("n_redacted"),
    ).orderBy("doc_id")


@register(
    "docs_split_assignment",
    oracle=f"""
    SELECT doc_id,
           CAST({_H64.format(x="concat('split:', CAST(doc_id AS VARCHAR))")} % 100 AS INTEGER) AS bucket,
           CASE WHEN {_H64.format(x="concat('split:', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
                WHEN {_H64.format(x="concat('split:', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents ORDER BY doc_id
    """,
    tags=("text", "split"),
)
def docs_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-stable hash bucket
    (80/10/10). Hash-based splitting survives reshuffles, re-ingestion, and
    incremental appends — the property random() splits lose."""
    from arrow_parquet_logs_spark.functions.hashing import hash64

    docs = load_table(spark, sf_dir, "documents")
    bucket = (hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100).cast("int")
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    ).orderBy("doc_id")


@register(
    "docs_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, token),
    df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token, tfidf FROM (
        SELECT doc_id, token, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
        FROM scored
    ) WHERE rn <= 3 AND doc_id < 100
    ORDER BY doc_id, tfidf DESC, token
    """,
    tags=("text", "tfidf"),
)
def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: per-doc term frequency ⋈ corpus document frequency (the DF
    table is vocabulary-sized → broadcast), idf = ln(N/df), top-3 terms per
    doc. Two shuffles total: (doc, token) and token."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(X.tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(F.broadcast(df_), "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "token", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "token")
    )


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_CTE},
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    pairs AS (
        SELECT a_id, b_id FROM (
            SELECT c.a_id, c.b_id,
                   len(list_intersect(sa.s, sb.s)) AS common,
                   len(sa.s) AS na, len(sb.s) AS nb
            FROM (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id) c
            JOIN sh sa ON sa.doc_id = c.a_id
            JOIN sh sb ON sb.doc_id = c.b_id
        ) WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.6
    ),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION SELECT b_id, a_id FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id,
           MIN(dst) AS cluster_id,
           src = MIN(dst) AS is_canonical
    FROM reach GROUP BY src ORDER BY doc_id
    """,
    tags=("dedup", "clusters", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters from near-dup pairs: pairs chain (A~B, B~C ⇒ one
    cluster), so keep-one-per-cluster needs connected components — iterative
    min-label propagation in Spark, checked against a recursive-CTE
    transitive closure in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.6)
    return D.connected_components(pairs).orderBy("doc_id")


_SIMHASH_CTE = f"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tc AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT doc_id, unnest(t) AS token FROM toks)
        GROUP BY doc_id, token
    ),
    th AS (SELECT doc_id, {_H64.format(x='token')} AS th, cnt FROM tc),
    votes AS (
        SELECT doc_id, j, SUM(CASE WHEN ((th >> j) & 1) = 1 THEN cnt ELSE -cnt END) AS vj
        FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS j) js
        GROUP BY doc_id, j
    ),
    sig AS (
        SELECT doc_id, CAST(SUM(CASE WHEN vj > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    )
"""


@register(
    "docs_simhash",
    oracle=f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM sig ORDER BY doc_id",
    tags=("dedup", "simhash"),
)
def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash signatures (frequency-weighted md5 bit votes; 60 =
    the significant bits of the portable hash)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs).select(F.col("sid").alias("doc_id"), "simhash").orderBy("doc_id")


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH {_SIMHASH_CTE}
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3). Spark joins on 16-bit pigeonhole
    chunks (guaranteed recall at that radius); the oracle brute-forces —
    identical output, which is exactly the point of the guarantee."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, max_hamming=3)


@register(
    "docs_stratified_sample",
    oracle=f"""
    SELECT lang, doc_id, rn
    FROM (
        SELECT lang, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_H64.format(x="concat('strat:', CAST(doc_id AS VARCHAR))")}, doc_id
               ) AS INT) AS rn
        FROM documents
    )
    WHERE rn <= 30
    ORDER BY lang, rn
    """,
    tags=("text", "sample", "stratified"),
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsample: at most 30 docs per language,
    chosen by content-stable hash order (not random()) — re-ingestion,
    repartitioning, and incremental appends all reproduce the same sample,
    the property training-mix construction needs. One window shuffle on the
    stratum key; at 100 TB swap row_number for a per-stratum hash-threshold
    filter (no global ordering) when strata are huge."""
    from arrow_parquet_logs_spark.functions.hashing import hash64
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    order_key = hash64(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(order_key, "doc_id")
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("int").alias("rn"))
        .where(F.col("rn") <= 30)
        .orderBy("lang", "rn")
    )


@register(
    "dedup_edit_distance",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    fp AS (
        SELECT sh.doc_id, d.text,
               list_min(list_transform(sh.s, g -> {_H64.format(x='g')})) AS mfp
        FROM sh JOIN documents d ON d.doc_id = sh.doc_id
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist
    FROM fp a JOIN fp b ON a.mfp = b.mfp AND a.doc_id < b.doc_id
    WHERE abs(length(a.text) - length(b.text)) <= 40
      AND levenshtein(a.text, b.text) <= 40
    ORDER BY a_id, b_id
    """,
    tags=("dedup", "levenshtein", "blocking"),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage-style near-dup: block on the 1-permutation minhash
    fingerprint (docs sharing their min shingle hash), verify blocked pairs
    with exact Levenshtein ≤ 40. The classic blocking+verification shape:
    the equi-join on the fingerprint bounds the quadratic stage, and the
    expensive verification is defended in depth — the sf1 probe caught the
    naive form grinding 10^11 DP cells in one task (980k candidate pairs ×
    300×300 full Levenshtein, single upstream partition):

    - **length pre-filter** (lossless: edit distance ≥ length difference)
      drops ~80% of candidates before any DP runs — in BOTH engines;
    - **identity fast path**: duplicate-dense corpora make most surviving
      candidates byte-identical; ``a = b → 0`` skips their DP entirely;
    - **thresholded levenshtein(a, b, 40)** (banded DP, Spark-side): cost
      O(k·n) not O(n·m), returns -1 above the threshold — same predicate;
    - **repartition before the DP stage**: the join emits from however few
      tasks the scan had; a CPU-bound stage must be spread across cores
      explicitly, parquet split sizing won't do it (IO-sized, not
      CPU-sized).

    Levenshtein is definition-identical in Spark and DuckDB, so the
    verification stage stays oracle-exact under all four defenses."""
    from arrow_parquet_logs_spark.operators.text import distinct_shingles

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        "text",
        F.array_min(F.transform(distinct_shingles("text", 3), lambda g: hash64(g))).alias("mfp"),
    ).persist()  # the shingle+md5 fingerprint pass is interpreted-HOF CPU;
    # without the cache the self-join recomputes it for BOTH sides
    a = fp.select(F.col("doc_id").alias("a_id"), F.col("text").alias("a_text"), "mfp")
    b = fp.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"), "mfp")
    cand = (
        a.join(b, "mfp")
        .where(F.col("a_id") < F.col("b_id"))
        .where(F.abs(F.length("a_text") - F.length("b_text")) <= 40)
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")), "a_id", "b_id")
    )
    dist = F.when(F.col("a_text") == F.col("b_text"), F.lit(0)).otherwise(
        F.expr("levenshtein(a_text, b_text, 40)")
    )
    return (
        cand.select("a_id", "b_id", dist.cast("int").alias("edit_dist"))
        .where(F.col("edit_dist") >= 0)
        .orderBy("a_id", "b_id")
    )


@register(
    "docs_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 \t\n]')) AS INT) AS n_pieces,
           CAST(len({_TOKS}) AS INT) AS n_words,
           floor((CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 \t\n]')) AS DOUBLE)
                 / len({_TOKS})) * 1000000) / 1000000 AS pieces_per_word
    FROM documents ORDER BY doc_id
    """,
    tags=("text", "tokenize", "bpe"),
)
def docs_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: alpha runs, single digits, and punctuation as
    separate pieces (the GPT-2-pattern shape minus lookahead, so the regex
    is valid in both Java and RE2 dialects) next to the whitespace word
    count — pieces_per_word is the fertility proxy training-cost estimates
    use. Pure codegen regex, one scan, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.size(
        F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 \t\n]', 0)")
    )
    words = F.size(X.tokens("text"))
    return docs.select(
        "doc_id",
        pieces.cast("int").alias("n_pieces"),
        words.cast("int").alias("n_words"),
        qfloor(pieces.cast("double") / words).alias("pieces_per_word"),
    ).orderBy("doc_id")


@register(
    "docs_repetition_signals",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    base AS (
        SELECT doc_id,
               len(t) AS n_tokens,
               len(list_distinct(t)) AS n_distinct,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
                    ELSE [] END AS g
        FROM toks),
    top AS (
        SELECT doc_id, max(cnt) AS max_cnt FROM (
            SELECT doc_id, tok, count(*) AS cnt
            FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
            GROUP BY doc_id, tok)
        GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n_tokens AS INT) AS n_tokens,
           floor((CAST(b.n_distinct AS DOUBLE) / b.n_tokens) * 1000000) / 1000000 AS distinct_ratio,
           floor((CAST(t.max_cnt AS DOUBLE) / b.n_tokens) * 1000000) / 1000000 AS top_token_frac,
           CASE WHEN len(b.g) = 0 THEN 0.0
                ELSE floor((CAST(len(b.g) - len(list_distinct(b.g)) AS DOUBLE) / len(b.g)) * 1000000) / 1000000
           END AS dup_bigram_frac
    FROM base b JOIN top t ON b.doc_id = t.doc_id
    ORDER BY b.doc_id
    """,
    tags=("text", "quality", "repetition"),
)
def docs_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: type/token
    (distinct) ratio, most-frequent-token mass, and duplicate-bigram
    fraction — the filters LLM data pipelines use to drop boilerplate and
    degenerate repetition. distinct/bigram stats are pure array expressions
    (one scan, no shuffle); the top-token mass uses the scalable
    explode → (doc_id, token) partial-count idiom rather than a per-doc sort,
    so skewed huge documents still aggregate map-side. The tokenizer never
    yields an empty list (''→['']), so the n_tokens denominator is safe;
    the bigram list is CASE-guarded because Spark's sequence(0, -1)
    descends instead of returning empty."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", X.tokens("text").alias("t"))
    grams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.col("t")[i], F.col("t")[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        grams.alias("g"),
    )
    top = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_cnt"))
    )
    ng = F.size("g")
    return (
        base.join(top, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            qfloor(F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
                "distinct_ratio"
            ),
            qfloor(F.col("max_cnt").cast("double") / F.col("n_tokens")).alias(
                "top_token_frac"
            ),
            F.when(ng == 0, F.lit(0.0))
            .otherwise(qfloor((ng - F.size(F.array_distinct("g"))).cast("double") / ng))
            .alias("dup_bigram_frac"),
        )
        .orderBy("doc_id")
    )


_BM25_TERMS = ("spark", "data", "join")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_tf_sql(term: str) -> str:
    return f"len(list_filter(t, x -> x = '{term}')) AS tf_{term}"


def _bm25_w_sql(term: str) -> str:
    k1, b = _BM25_K1, _BM25_B
    return (
        f"ln(1 + (n_docs - df_{term} + 0.5) / (df_{term} + 0.5))"
        f" * (tf_{term} * {k1 + 1})"
        f" / (tf_{term} + {k1} * ({1 - b} + ({b} * dl) / avgdl))"
    )


def bm25_scores(docs: DataFrame) -> DataFrame:
    """Per-document rounded BM25 scores for the fixed ``_BM25_TERMS`` query
    (k1=1.2, b=0.75) — the scan → 1-row stats agg → scan-side projection
    shape ``docs_bm25_retrieval`` documents. Returns ``(doc_id, bm25)``
    for docs with a positive score, unranked; callers rank/limit. Shared
    by the plain retrieval query and the hybrid RRF fusion
    (queries/vectorq.py), so the two stay score-identical by
    construction."""
    toks = docs.select("doc_id", X.tokens("text").alias("t"))

    def tf_col(term: str) -> F.Column:
        return F.size(F.filter("t", lambda x: x == F.lit(term)))

    per = toks.select(
        "doc_id",
        F.size("t").alias("dl"),
        *[tf_col(term).alias(f"tf_{term}") for term in _BM25_TERMS],
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, F.lit(1))).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def w(term: str) -> F.Column:
        tf, df = F.col(f"tf_{term}"), F.col(f"df_{term}")
        idf = F.log(F.lit(1) + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)))
        k1, b = _BM25_K1, _BM25_B
        return (
            idf
            * (tf * F.lit(k1 + 1))
            / (tf + F.lit(k1) * (F.lit(1 - b) + (F.lit(b) * F.col("dl")) / F.col("avgdl")))
        )

    score = w(_BM25_TERMS[0])
    for term in _BM25_TERMS[1:]:
        score = score + w(term)
    return (
        per.crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("s"))
        .where(F.col("s") > 0)
        .select("doc_id", F.round("s", 6).alias("bm25"))
    )


@register(
    "docs_bm25_retrieval",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    per AS (SELECT doc_id, len(t) AS dl,
                   {", ".join(_bm25_tf_sql(t) for t in _BM25_TERMS)}
            FROM toks),
    st AS (SELECT count(*) AS n_docs,
                  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
                  {", ".join(f"count(CASE WHEN tf_{t} > 0 THEN 1 END) AS df_{t}" for t in _BM25_TERMS)}
           FROM per)
    SELECT doc_id, round(s, 6) AS bm25
    FROM (SELECT doc_id, {" + ".join(f"({_bm25_w_sql(t)})" for t in _BM25_TERMS)} AS s
          FROM per, st)
    WHERE s > 0
    ORDER BY round(s, 6) DESC, doc_id LIMIT 10
    """,
    tags=("text", "retrieval", "bm25"),
)
def docs_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for a fixed term query (k1=1.2, b=0.75) — the
    retrieval scorer a training-data pipeline uses for quality-weighted
    sampling and search-style eval. One corpus scan computes per-doc term
    frequencies as array expressions (no explode, no shuffle); document
    frequencies and avgdl reduce to ONE scalar row that broadcasts back, so
    the whole query is scan → 1-row agg → scan-side projection → top-k.
    Every double op evaluates in one pinned order (terms summed
    left-to-right) so scores are engine- and partition-invariant; ranking is
    on the rounded score with doc_id tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(docs)
    return (
        scored.withColumn("_r", F.col("bm25"))
        .orderBy(F.col("_r").desc(), "doc_id")
        .drop("_r")
        .limit(10)
    )


@register(
    "pipeline_training_set",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_minhash_sig_sql()},
    bands AS (
        SELECT doc_id,
               unnest(list_transform(range(0, 8), b -> md5(concat(CAST(b AS VARCHAR), ':',
                   array_to_string(list_slice(sig, b*4+1, b*4+4), ','))))) AS band_key
        FROM sigs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    ver AS (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.a_id
        JOIN sh sb ON sb.doc_id = c.b_id
        WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.6
    ),
    exact AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
    ),
    kept1 AS (SELECT doc_id FROM exact WHERE rn = 1),
    dropped AS (
        SELECT DISTINCT v.b_id AS doc_id FROM ver v
        JOIN kept1 ka ON ka.doc_id = v.a_id
        JOIN kept1 kb ON kb.doc_id = v.b_id
    ),
    kept2 AS (
        SELECT k.doc_id FROM kept1 k
        LEFT JOIN dropped d ON k.doc_id = d.doc_id WHERE d.doc_id IS NULL
    ),
    q AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               floor((
                 0.3 * least(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0)
                 + 0.4 * (CAST(len(list_filter({_TOKS}, tk -> tk IN {_STOP})) AS DOUBLE) / len({_TOKS}))
                 + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text))
               ) * 1000000) / 1000000 AS quality_score
        FROM documents
    )
    SELECT k.doc_id,
           CASE WHEN {_H64.format(x="concat('split:', CAST(k.doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
                WHEN {_H64.format(x="concat('split:', CAST(k.doc_id AS VARCHAR))")} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           q.n_tokens,
           q.quality_score
    FROM kept2 k JOIN q ON k.doc_id = q.doc_id
    WHERE q.quality_score >= 0.5
    ORDER BY k.doc_id
    """,
    tags=("pipeline", "dedup", "quality", "split"),
    bench=True,
)
def pipeline_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-set pipeline, composed from this repo's own
    operators: exact dedup (keep lowest doc_id per identical text) →
    MinHash-LSH near-dup drop (a surviving smaller doc suppresses its ≥0.6
    Jaccard partner) → surface-quality filter (score ≥ 0.5) → content-stable
    80/10/10 split assignment. Every stage is the operator the registry
    already verifies individually; this query pins their COMPOSITION under
    one oracle hash. Scale shape: one window on the text fingerprint, the
    LSH band join (density-bounded), one broadcast-able drop list, and
    scan-side quality/split expressions — no stage is corpus-quadratic."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
    kept1 = docs.withColumn("rn", rn).where(F.col("rn") == 1).drop("rn")
    # kept1 is already exact-deduped by the window above — skip the
    # operator's own exact-collapse (it would be a no-op plus one shuffle)
    pairs = D.minhash_lsh_pairs_pandas(kept1, threshold=0.6, collapse_exact=False)
    dropped = pairs.select(F.col("b_id").alias("doc_id")).distinct()
    kept2 = kept1.join(dropped, "doc_id", "left_anti")
    feats = X.quality_features(kept2).select("doc_id", "n_tokens", "quality_score")
    bucket = (
        hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    ).cast("int")
    return (
        feats.where(F.col("quality_score") >= 0.5)
        .select(
            "doc_id",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
            "n_tokens",
            "quality_score",
        )
        .orderBy("doc_id")
    )


@register(
    "docs_weighted_sample",
    oracle=f"""
    WITH q AS (
        SELECT doc_id,
               floor((
                 0.3 * least(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0)
                 + 0.4 * (CAST(len(list_filter({_TOKS}, tk -> tk IN {_STOP})) AS DOUBLE) / len({_TOKS}))
                 + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text))
               ) * 1000000) / 1000000 AS w
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, w,
               round(pow(({_H64.format(x="concat('samp:', CAST(doc_id AS VARCHAR))")} % 1000000 + 0.5) / 1000000.0,
                         1.0 / w), 6) AS samp_key
        FROM q WHERE w > 0
    )
    SELECT doc_id, w AS weight, samp_key
    FROM keyed ORDER BY samp_key DESC, doc_id LIMIT 100
    """,
    tags=("sample", "weighted", "quality"),
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis-Spirtsis A-ES): each doc
    draws a content-stable uniform u from the portable hash and ranks by
    u^(1/w) with w = quality score — the top-k IS a weighted-without-
    replacement sample, reproducible across engines, reshuffles, and
    re-ingestion (unlike rand()-based sampling). One scan + one TakeOrdered;
    at 100 TB the same expression feeds a per-partition top-k merge. Ranking
    is on the rounded key with doc_id tie-break."""
    from arrow_parquet_logs_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    q = quality_features(docs).select("doc_id", F.col("quality_score").alias("w"))
    u = (
        hash64(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))) % 1_000_000
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    key = F.round(F.pow(u, F.lit(1.0) / F.col("w")), 6)
    return (
        q.where(F.col("w") > 0)
        .select("doc_id", F.col("w").alias("weight"), key.alias("samp_key"))
        .orderBy(F.col("samp_key").desc(), "doc_id")
        .limit(100)
    )


@register(
    "docs_posexplode_tokens",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 50)
    SELECT doc_id, CAST(i AS INT) AS pos, t[i+1] AS token
    FROM toks, unnest(range(0, least(len(t), 10))) AS u(i)
    ORDER BY doc_id, pos
    """,
    tags=("text", "explode", "lateral"),
)
def docs_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (LATERAL VIEW posexplode): token stream with
    ordinal positions — the flatten-with-index shape sequence-labeling
    pipelines need. Row-local expansion, no shuffle; the pushed doc_id
    filter bounds the blowup."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    head = F.slice(X.tokens("text"), 1, 10)
    return (
        docs.select("doc_id", F.posexplode(head).alias("pos", "token"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "token")
        .orderBy("doc_id", "pos")
    )


@register(
    "docs_benchmark_contamination",
    oracle=f"""
    WITH bt AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 97 = 0),
    bsh AS (SELECT DISTINCT g FROM (SELECT unnest({_SH3}) AS g FROM bt)),
    tt AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 97 != 0),
    tsh AS (SELECT doc_id, unnest({_SH3}) AS g FROM tt),
    hits AS (
        SELECT tsh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM tsh JOIN bsh USING (g) GROUP BY tsh.doc_id
    )
    SELECT doc_id, n_shared FROM hits WHERE n_shared >= 3 ORDER BY doc_id
    """,
    tags=("text", "contamination", "dedup"),
)
def docs_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan — the pretraining hygiene pass: flag
    training documents sharing ≥3 distinct word 3-gram shingles with any
    document in a held-out benchmark set (here: every 97th doc stands in
    for the benchmark). Scale shape: the benchmark's distinct shingle set
    is small by definition → broadcast semi-structure, so the corpus-side
    scan is shuffle-free until the per-doc count; candidates ∝ true
    overlap. The shingle normalization is the dedup family's (mirrors
    operators.text.distinct_shingles), so one vocabulary serves both."""
    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 97 == 0
    bsh = (
        docs.where(is_bench)
        .select(F.explode(X.distinct_shingles("text", 3)).alias("g"))
        .distinct()
    )
    tsh = docs.where(~is_bench).select(
        "doc_id", F.explode(X.distinct_shingles("text", 3)).alias("g")
    )
    return (
        tsh.join(F.broadcast(bsh), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 3)
        .orderBy("doc_id")
    )


@register(
    "docs_bloom_decontamination",
    oracle=f"""
    WITH bt AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 89 = 0),
    bsh AS (SELECT DISTINCT g FROM (SELECT unnest({_SH3}) AS g FROM bt)),
    tt AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 89 != 0),
    tsh AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, unnest({_SH3}) AS g FROM tt)),
    hits AS (
        SELECT tsh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM tsh JOIN bsh USING (g) GROUP BY tsh.doc_id
    )
    SELECT doc_id, n_shared FROM hits WHERE n_shared >= 2 ORDER BY doc_id
    """,
    tags=("text", "contamination", "bloom", "dedup"),
)
def docs_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the NON-broadcast-scale variant of
    `docs_benchmark_contamination`. When the blocklist is itself huge (an
    entire eval corpus, a rights-holder opt-out list), its shingle ROWS
    can't broadcast; a Bloom filter broadcasts BITS (2²⁰ bits ≈ 128 KB
    regardless of blocklist size). Two phases keep the output EXACT:

    1. probe every training (doc, shingle) against the broadcast bitmap
       (`operators.text.bloom_might_contain`, k=3 portable-hash probes) —
       no false negatives by construction, so nothing contaminated slips
       through;
    2. exact-verify only the BF-positive survivors with a real join
       against the blocklist shingles — the join input is the tiny
       surviving fraction, so the shuffle is candidate-sized, not
       corpus-sized.

    Because phase 2 restores exactness, the oracle is the plain exact
    contamination SQL — the Bloom layer must be output-invisible, and a
    hash/bit/word-layout bug that dropped a true member would surface as a
    missing row. Flags docs sharing ≥2 word-3-gram shingles with the
    benchmark slice (every 89th doc)."""
    from arrow_parquet_logs_spark.operators.text import (
        bloom_bitmap,
        bloom_might_contain,
        bloom_size_for,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 89 == 0
    bsh = (
        docs.where(is_bench)
        .select(F.explode(X.distinct_shingles("text", 3)).alias("g"))
        .distinct()
        .persist()
    )
    # auto-size the bitmap from the key cardinality (floors at 2^20, so at
    # test SFs this is the historical default and the oracle is unchanged)
    m_bits = bloom_size_for(bsh, "g")
    bloom = bloom_bitmap(bsh, "g", m_bits=m_bits)
    tsh = docs.where(~is_bench).select(
        "doc_id", F.explode(X.distinct_shingles("text", 3)).alias("g")
    )
    cand = bloom_might_contain(tsh, bloom, "g", m_bits=m_bits)
    return (
        cand.join(bsh, "g")  # exact verify: BF false positives die here
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 2)
        .orderBy("doc_id")
    )


@register(
    "docs_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               CAST({_H64.format(x="concat('pack:', CAST(doc_id AS VARCHAR))")} % 16 AS INT) AS shard
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens, shard,
               COALESCE(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        FROM t
    )
    SELECT doc_id, n_tokens, shard,
           CAST(cum // 2048 AS BIGINT) AS pack_id,
           CAST(cum % 2048 AS BIGINT) AS pack_offset
    FROM c ORDER BY doc_id
    """,
    tags=("text", "packing", "window"),
)
def docs_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: concatenate-and-chunk
    assignment of every document to a fixed 2048-token pack, sharded.

    Each doc lands in a content-stable shard (portable hash, 16 shards);
    within a shard, a running token sum (exclusive cumsum window) places
    the doc at its starting offset and pack_id = offset ÷ budget — the
    standard GPT-style packing, computed declaratively. Scale shape:
    packing is embarrassingly parallel across shards (global concatenation
    order is irrelevant to training), so the only shuffle is the shard
    window — no single-task global ordering, ever; at 100 TB shards ≈
    writer-task count."""
    from arrow_parquet_logs_spark.functions.hashing import hash64
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(X.tokens("text")).cast("bigint").alias("n_tokens"),
        (hash64(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))) % 16)
        .cast("int")
        .alias("shard"),
    )
    w = W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    c = t.withColumn("cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.selectExpr(
        "doc_id",
        "n_tokens",
        "shard",
        "CAST(cum DIV 2048 AS BIGINT) AS pack_id",
        "CAST(cum % 2048 AS BIGINT) AS pack_offset",
    ).orderBy("doc_id")


@register(
    "docs_table_profile",
    oracle="""
    SELECT 'doc_id' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(doc_id) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_val, CAST(max(doc_id) AS VARCHAR) AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(count(*) AS BIGINT), CAST(count(lang) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(count(*) AS BIGINT), CAST(count(source) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT), CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(n_chars) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    ORDER BY column_name
    """,
    tags=("profile", "quality", "agg"),
)
def docs_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the ANALYZE / data-quality pass every ingestion run
    needs): per-column row count, non-null count, exact distinct count, and
    string-cast min/max — computed in ONE aggregation pass over the table,
    then unpivoted locally (no per-column scans). At 100 TB swap the exact
    distincts for approx_count_distinct (the sketch twin the registry
    already gates) — the plan shape is identical."""
    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    row = docs.agg(*aggs)
    stacked = row.selectExpr(
        "stack({n}, {args}) AS (column_name, n_nonnull, n_distinct, min_val, max_val)".format(
            n=len(cols),
            args=", ".join(f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols),
        ),
        "n_rows",
    )
    return stacked.select(
        "column_name", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val"
    ).orderBy("column_name")


@register(
    "docs_mixture_plan",
    oracle="""
    WITH stats AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs, n_tokens,
               CASE WHEN source IN ('src0','src1','src2') THEN 3.0 ELSE 1.0 END AS weight
        FROM stats
    ),
    tot AS (SELECT SUM(weight) AS wsum FROM w)
    SELECT source, n_docs, n_tokens,
           CAST(floor(100000.0 * weight / wsum) AS BIGINT) AS token_budget,
           floor(least(floor(100000.0 * weight / wsum) / n_tokens, 1.0) * 1000000) / 1000000
               AS sampling_rate,
           CAST(floor(least(floor(100000.0 * weight / wsum) / n_tokens, 1.0) * 1000000) / 1000000
                >= 1.0 AS BOOLEAN) AS needs_upsampling
    FROM w, tot ORDER BY source
    """,
    tags=("mixture", "sampling", "pipeline"),
)
def docs_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture planning: given per-source upweights (3× for the
    curated src0-2 here) and a 100k-token budget, compute each source's
    token allocation and the Bernoulli sampling rate that realizes it —
    the step that turns 'weights in a config' into scan-side sample()
    predicates. One aggregation (token totals per source) plus a 1-row
    broadcast of the weight normalizer; rate quantized to 1e-6 exactly
    like the hash-sampler buckets, so the plan is engine-invariant.
    Sources whose rate saturates at 1.0 are flagged for upsampling
    (repeat-epoch) handling."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(X.tokens("text"))).cast("bigint").alias("n_tokens"),
    )
    w = stats.withColumn(
        "weight",
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit(3.0)).otherwise(F.lit(1.0)),
    )
    tot = w.agg(F.sum("weight").alias("wsum"))
    budget = F.floor(F.lit(100000.0) * F.col("weight") / F.col("wsum")).cast("bigint")
    joined = w.crossJoin(F.broadcast(tot)).withColumn("token_budget", budget)
    rate = (
        F.floor(
            F.least(F.col("token_budget") / F.col("n_tokens"), F.lit(1.0)) * 1000000
        )
        / 1000000
    )
    return (
        joined.withColumn("sampling_rate", rate)
        .withColumn("needs_upsampling", (F.col("sampling_rate") >= 1.0).cast("boolean"))
        .select(
            "source", "n_docs", "n_tokens", "token_budget", "sampling_rate", "needs_upsampling"
        )
        .orderBy("source")
    )


@register(
    "docs_unigram_lm_score",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    freq AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t, CAST(count(DISTINCT token) AS BIGINT) AS v FROM toks),
    lp AS (
        SELECT token,
               CAST(floor(ln((CAST(c AS DOUBLE) + 1.0) / CAST(t + v AS DOUBLE)) * 1000000) AS BIGINT)
                   AS lnp_micro
        FROM freq CROSS JOIN tot
    )
    SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(-sum(lnp_micro) AS BIGINT) AS nll_micro,
           round(exp(CAST(-sum(lnp_micro) AS DOUBLE) / 1000000.0 / count(*)), 6) AS ppl
    FROM toks d JOIN lp USING (token)
    GROUP BY d.doc_id ORDER BY d.doc_id
    """,
    tags=("text", "quality", "lm"),
)
def docs_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring: fit an add-one-smoothed
    unigram LM on the corpus itself, then score every document by its
    per-token negative log-likelihood and perplexity. The classic
    perplexity filter (low ppl ⇒ ordinary prose, high ppl ⇒ gibberish /
    boilerplate soup), here with the LM and the scoring in one plan.

    Scale shape: the LM is the vocabulary table — token counts from one
    map-side-combined aggregation, broadcast back onto the token stream,
    so scoring is a shuffle per (doc, token) group and nothing more. At
    100 TB the vocabulary (even web-scale ~10⁸ types) still broadcasts or
    bucket-joins; no stage is corpus-quadratic. Determinism: per-token
    ln p is floor-quantized to integer micro-nats (order-independent
    BIGINT sums); only the final exp/round touches ULP territory, and
    round(,6) after exp is tie-free (irrational)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(X.tokens("text")).alias("token"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(
        F.count(F.lit(1)).alias("t"), F.countDistinct("token").alias("v")
    )
    lp = freq.crossJoin(F.broadcast(tot)).select(
        "token",
        F.floor(
            F.log(
                (F.col("c").cast("double") + F.lit(1.0))
                / (F.col("t") + F.col("v")).cast("double")
            )
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("lnp_micro"),
    )
    return (
        toks.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("lnp_micro")).cast("bigint").alias("nll_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "nll_micro",
            F.round(
                F.exp(
                    F.col("nll_micro").cast("double")
                    / F.lit(1000000.0)
                    / F.col("n_tokens")
                ),
                6,
            ).alias("ppl"),
        )
        .orderBy("doc_id")
    )


@register(
    "docs_importance_weights",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents),
    freq_r AS (SELECT token, CAST(count(*) AS BIGINT) AS cr FROM toks GROUP BY token),
    freq_t AS (SELECT token, CAST(count(*) AS BIGINT) AS ct FROM toks WHERE lang = 'en' GROUP BY token),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS tr,
               CAST(count(DISTINCT token) AS BIGINT) AS v,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
        FROM toks
    ),
    lw AS (
        SELECT r.token,
               CAST(floor(ln((CAST(COALESCE(t.ct, 0) AS DOUBLE) + 1.0) / CAST(tot.tt + tot.v AS DOUBLE)) * 1000000) AS BIGINT)
             - CAST(floor(ln((CAST(r.cr AS DOUBLE) + 1.0) / CAST(tot.tr + tot.v AS DOUBLE)) * 1000000) AS BIGINT)
                   AS lw_micro
        FROM freq_r r LEFT JOIN freq_t t USING (token) CROSS JOIN tot
    )
    SELECT d.doc_id, any_value(d.lang) AS lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(lw_micro) AS BIGINT) AS weight_micro
    FROM toks d JOIN lw USING (token)
    GROUP BY d.doc_id
    ORDER BY weight_micro DESC, d.doc_id LIMIT 100
    """,
    tags=("text", "sampling", "lm"),
)
def docs_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, public): score every
    document by the log-likelihood ratio between a *target* unigram
    distribution (here: the English subset stands in for "high-quality
    target domain") and the *raw* corpus distribution, both add-one
    smoothed over the shared vocabulary. Documents whose token mix looks
    more like the target than the background rank first — the standard
    recipe for importance-resampling a web crawl toward a curated domain.

    Scale shape: both LMs come from the same one-pass token aggregation
    (conditional count for the target side), the per-token log-ratio table
    is vocabulary-sized → broadcast, and each doc's weight is an
    order-independent integer sum of micro-nat ratios. Top-100 is
    TakeOrdered with a doc_id tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(X.tokens("text")).alias("token"))
    freq = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("bigint").alias("ct"),
    )
    tot = toks.agg(
        F.count(F.lit(1)).alias("tr"),
        F.countDistinct("token").alias("v"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("bigint").alias("tt"),
    )

    def _lnp_micro(count_col: Column, denom_col: Column) -> Column:
        return F.floor(
            F.log((count_col.cast("double") + F.lit(1.0)) / denom_col.cast("double"))
            * F.lit(1000000.0)
        ).cast("bigint")

    lw = freq.crossJoin(F.broadcast(tot)).select(
        "token",
        (
            _lnp_micro(F.col("ct"), F.col("tt") + F.col("v"))
            - _lnp_micro(F.col("cr"), F.col("tr") + F.col("v"))
        ).alias("lw_micro"),
    )
    return (
        toks.join(F.broadcast(lw), "token")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("lang")).alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lw_micro").cast("bigint").alias("weight_micro"),
        )
        .orderBy(F.col("weight_micro").desc(), "doc_id")
        .limit(100)
    )


@register(
    "docs_substring_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    wins AS (
        SELECT doc_id,
               {_H64.format(x="array_to_string(list_slice(t, i+1, i+8), ' ')")} AS h
        FROM (
            SELECT doc_id, t,
                   unnest(CASE WHEN len(t) >= 8 THEN range(0, len(t)-7, 4) ELSE [0] END) AS i
            FROM toks
        )
    ),
    shared AS (
        SELECT h, 1 AS dup FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(COALESCE(s.dup, 0)) AS BIGINT) AS n_dup_windows,
           CAST(sum(COALESCE(s.dup, 0)) > 0 AS BOOLEAN) AS has_shared_span
    FROM wins w LEFT JOIN shared s USING (h)
    GROUP BY w.doc_id ORDER BY w.doc_id
    """,
    tags=("text", "dedup", "substring"),
)
def docs_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (the Lee et al. "Deduplicating
    Training Data" op, public): hash overlapping 8-token windows (stride
    4; short docs fall back to one whole-doc window) and flag every window
    whose hash recurs in ≥2 distinct documents. Per doc: window count,
    duplicated-window count, and a boolean "contains a shared span" — the
    signal substring-level dedup uses to cut boilerplate that document-
    level near-dup misses.

    Scale shape: windows ∝ tokens/stride (linear, no explode blow-up); the
    shared-hash set is duplicate-density-bounded, so the flag join's build
    side shrinks to true boilerplate at scale; both aggregations are
    map-side combined. The 60-bit portable hash keeps collision rate
    ~n²/2⁶⁰ (negligible at 100 TB window counts) and lets the oracle
    reproduce every hash bit-for-bit."""
    # D.spread: the window hashing pipelines off the scan; a single-file
    # corpus would md5 every window in one task (sf1-probe defect class)
    docs = D.spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", X.tokens("text").alias("t"))
    starts = F.when(
        F.size("t") >= 8, F.sequence(F.lit(0), F.size("t") - 8, F.lit(4))
    ).otherwise(F.array(F.lit(0)))
    wins = (
        toks.select("doc_id", "t", F.explode(starts).alias("i"))
        .select("doc_id", hash64(F.concat_ws(" ", F.expr("slice(t, i+1, 8)"))).alias("h"))
    )
    shared = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("dup"))
    )
    return (
        wins.join(shared, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).cast("bigint").alias("n_dup_windows"),
        )
        .withColumn("has_shared_span", (F.col("n_dup_windows") > 0).cast("boolean"))
        .orderBy("doc_id")
    )


@register(
    "docs_pii_scrub",
    oracle=r"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com or '
                    || '555-123-4567 at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
               AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INTEGER) AS n_phone,
           CAST(len(regexp_extract_all(t, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS INTEGER) AS n_ipv4,
           sha256(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
               '\b\d{1,3}(\.\d{1,3}){3}\b', '[IP]', 'g')
           ) AS clean_sha256
    FROM seeded ORDER BY doc_id
    """,
    tags=("text", "pii", "redaction"),
)
def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators.text.pii_scrub) under the hash gate: every
    document is seeded with synthetic PII built from doc_id arithmetic
    (identically in both engines — the shipped corpus has none of its own),
    then match counts per class AND the sha256 of the fully-redacted text
    must agree. The patterns live in the Java∩RE2 regex dialect so the SQL
    oracle runs the byte-identical patterns; hashing the redacted text pins
    replacement semantics (all-occurrences, sequential order), not just
    detection."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567 at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )
    out = X.pii_scrub(seeded)
    return out.select(
        "doc_id",
        F.col("n_email").cast("int"),
        F.col("n_phone").cast("int"),
        F.col("n_ipv4").cast("int"),
        F.sha2("clean_text", 256).alias("clean_sha256"),
    ).orderBy("doc_id")


# shared seeding for the span-level dedup queries: two 10-token blocks are
# prepended to every document — a global boilerplate sentence (present in all
# docs) and a group-shared sentence (present in each run of 10 doc_ids) — so
# block-aligned duplication exists deterministically in both engines.
_SPAN_SEED_PREFIX = (
    "legal boilerplate footer all rights reserved contact support team today "
    "shared group sentence number alpha beta gamma delta epsilon "
)

_SPAN_SEED_SQL = f"""
    seeded AS (
        SELECT doc_id,
               '{_SPAN_SEED_PREFIX}' || CAST(doc_id // 10 AS VARCHAR) || ' ' || text AS text
        FROM documents
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM seeded),
    starts AS (SELECT doc_id, t, range(0, CAST((len(t) - 1) // 10 AS BIGINT) + 1) AS ss FROM toks),
    ch AS (
        SELECT doc_id,
               unnest(ss) AS pos,
               unnest(list_transform(ss, i -> array_to_string(list_slice(t, i*10 + 1, i*10 + 10), ' '))) AS chunk
        FROM starts
    )
"""


def _span_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(_SPAN_SEED_PREFIX),
            F.expr("CAST(doc_id DIV 10 AS STRING)"),
            F.lit(" "),
            F.col("text"),
        ).alias("text"),
    )


def _span_result(out: DataFrame) -> DataFrame:
    return out.select(
        "doc_id",
        "n_chunks",
        "n_dropped",
        F.sha2("clean_text", 256).alias("clean_sha256"),
    ).orderBy("doc_id")


# exact-substring dedup oracle over the seeded corpus — replays windows, the
# multiplicity-2 test, position coverage, and reassembly; shared verbatim by
# the exact-string row and the fingerprint-mode row (fingerprinting is a key
# REPRESENTATION, the output contract is identical)
_EXSUB_SEEDED_ORACLE = f"""
    WITH seeded AS (
        SELECT doc_id,
               '{_SPAN_SEED_PREFIX}' || CAST(doc_id // 10 AS VARCHAR) || ' ' || text AS text
        FROM documents
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM seeded),
    tok AS (
        SELECT doc_id, unnest(range(0, len(t))) AS tpos, unnest(t) AS token
        FROM toks
    ),
    wins AS (
        SELECT doc_id,
               unnest(range(0, greatest(len(t) - 9, 0))) AS p,
               unnest(list_transform(range(0, greatest(len(t) - 9, 0)),
                   i -> array_to_string(list_slice(t, i + 1, i + 10), ' '))) AS wkey
        FROM toks
    ),
    dup AS (SELECT wkey FROM wins GROUP BY wkey HAVING count(*) >= 2),
    cov AS (
        SELECT DISTINCT doc_id, tpos FROM (
            SELECT w.doc_id, unnest(range(w.p, w.p + 10)) AS tpos
            FROM wins w JOIN dup d ON d.wkey = w.wkey
        )
    ),
    flagged AS (
        SELECT t.doc_id, t.tpos, t.token, (c.tpos IS NOT NULL) AS is_cut
        FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.tpos = t.tpos
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_tokens,
           CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END) AS INTEGER) AS n_removed,
           sha256(coalesce(string_agg(token, ' ' ORDER BY tpos) FILTER (WHERE NOT is_cut), '')) AS clean_sha256
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """


@register(
    "docs_span_dedup",
    oracle=f"""
    WITH {_SPAN_SEED_SQL},
    flagged AS (
        SELECT doc_id, pos, chunk,
               row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) > 1 AS is_dup
        FROM ch
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_chunks,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS INTEGER) AS n_dropped,
           sha256(coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE NOT is_dup), '')) AS clean_sha256
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "dedup", "c4"),
)
def docs_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicate-span removal (operators.text.span_dedup) under the
    hash gate: every 10-token block keeps only its globally-first occurrence
    (min (doc_id, pos)); the reassembled per-doc text is sha256-compared, so
    keep-first ordering, cross-doc removal, AND reassembly order are all
    pinned. The corpus is seeded with a global boilerplate block (survives
    only in doc 0) and a per-10-doc group block (survives in the first doc
    of each group). One shuffle on block text + one on doc_id — linear,
    the 100 TB plan is identical."""
    return _span_result(X.span_dedup(_span_seeded(spark, sf_dir)))


@register(
    "docs_exact_substring_dedup",
    oracle=_EXSUB_SEEDED_ORACLE,
    tags=("text", "dedup", "exact-substring", "lee2022"),
)
def docs_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level exact-substring dedup (VERDICT r9 #6 — the Lee et al.
    2022 ExactSubstr shape, `operators.text.exact_substring_dedup`): every
    occurrence of any ≥10-token substring duplicated anywhere in the
    corpus is suppressed — unlike `docs_span_dedup`'s C4 keep-first, NO
    occurrence is privileged, and stride-1 windows catch duplicates at
    arbitrary alignment. On the seeded corpus the 19-token global
    boilerplate prefix vanishes from ALL docs (where span_dedup keeps it
    in doc 0), the per-10-doc group seed vanishes from its whole group,
    and windows sliding across the seed/text boundary cut the first
    tokens of genuinely duplicated document bodies wherever they repeat.
    The sha256 of each reassembled doc pins removal set AND order; the
    oracle replays windows, the multiplicity-2 test, position coverage,
    and reassembly exactly."""
    out = X.exact_substring_dedup(_span_seeded(spark, sf_dir), min_len=10)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.sha2("clean_text", 256).alias("clean_sha256"),
    ).orderBy("doc_id")


@register(
    "docs_exact_substring_dedup_fp",
    oracle=_EXSUB_SEEDED_ORACLE,
    tags=("text", "dedup", "exact-substring", "lee2022", "fingerprint"),
)
def docs_exact_substring_dedup_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB MODE of `docs_exact_substring_dedup` (VERDICT r10 #1):
    identical operator, but the window key is the 96-bit Rabin-Karp-style
    fingerprint — ``struct(xxhash64(window_tokens), hash(window_tokens))``
    hashed straight off the token-array slice, no window string ever built
    — instead of the exact ~10-token string. At target scale the window
    key IS most of the duplicate-detection shuffle (one key per corpus
    token through a hash aggregate + equi-join), so a 12-byte key halves
    shuffle bytes; the price is a ~W²/2^97 expected false window merge
    (collision math in `operators.text._window_frame` — ~6×10⁻⁶ occurrences
    at 10¹² windows, each suppressing one span, never cascading).

    The gate is the POINT of the row: the oracle is the exact-string
    replay, verbatim the one `docs_exact_substring_dedup` runs against —
    the fingerprint mode must reproduce the exact mode's reassembled-text
    hashes bit-for-bit on the oracle corpus, making "same answer, smaller
    key" a measured fact rather than prose."""
    out = X.exact_substring_dedup(
        _span_seeded(spark, sf_dir), min_len=10, fingerprint=True
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.sha2("clean_text", 256).alias("clean_sha256"),
    ).orderBy("doc_id")


@register(
    "docs_substring_dedup_stats",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id,
               '{_SPAN_SEED_PREFIX}' || CAST(doc_id // 10 AS VARCHAR) || ' ' || text AS text
        FROM documents
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM seeded),
    wins AS (
        SELECT doc_id,
               unnest(range(0, greatest(len(t) - 9, 0))) AS p,
               unnest(list_transform(range(0, greatest(len(t) - 9, 0)),
                   i -> array_to_string(list_slice(t, i + 1, i + 10), ' '))) AS wkey
        FROM toks
    ),
    dup AS (SELECT wkey FROM wins GROUP BY wkey HAVING count(*) >= 2),
    cov AS (
        SELECT DISTINCT doc_id, tpos FROM (
            SELECT w.doc_id, unnest(range(w.p, w.p + 10)) AS tpos
            FROM wins w JOIN dup d ON d.wkey = w.wkey
        )
    ),
    rem AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_removed FROM cov GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.t) AS INTEGER) AS n_tokens,
           coalesce(r.n_removed, 0) AS n_removed
    FROM toks t LEFT JOIN rem r ON r.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("text", "dedup", "exact-substring", "lee2022", "stats"),
)
def docs_substring_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-only exact-substring dedup (VERDICT r10 #2 —
    `operators.text.substring_dedup_stats`): ``(doc_id, n_tokens,
    n_removed)`` with NO reassembled text. Admission filters, duplicate-
    mass dashboards, and dedup-debt accounting consume the counts, not
    ``clean_text`` — and reassembly (posexplode every corpus token, join
    the position set, per-doc collect+sort) is what dominates the full
    rewrite's wall-time. This path ends at a per-doc count of the covered-
    position set joined onto a token-count scan: the corpus text is read,
    windowed, and counted, never rebuilt. The oracle replays windows, the
    multiplicity-2 test, coverage, and the count join on the same seeded
    corpus as the full-rewrite row, so both rows' n_removed are mutually
    cross-checkable."""
    return (
        X.substring_dedup_stats(_span_seeded(spark, sf_dir), min_len=10)
        .orderBy("doc_id")
    )


@register(
    "docs_benchmark_decontamination",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id,
               '{_SPAN_SEED_PREFIX}' || CAST(doc_id // 10 AS VARCHAR) || ' ' || text AS text
        FROM documents
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM seeded),
    bkeys AS (
        SELECT DISTINCT unnest(list_transform(range(0, greatest(len(t) - 9, 0)),
            i -> array_to_string(list_slice(t, i + 1, i + 10), ' '))) AS wkey
        FROM toks WHERE doc_id % 7 = 0
    ),
    ttoks AS (SELECT doc_id, t FROM toks WHERE doc_id % 7 <> 0),
    tok AS (
        SELECT doc_id, unnest(range(0, len(t))) AS tpos, unnest(t) AS token
        FROM ttoks
    ),
    wins AS (
        SELECT doc_id,
               unnest(range(0, greatest(len(t) - 9, 0))) AS p,
               unnest(list_transform(range(0, greatest(len(t) - 9, 0)),
                   i -> array_to_string(list_slice(t, i + 1, i + 10), ' '))) AS wkey
        FROM ttoks
    ),
    cov AS (
        SELECT DISTINCT doc_id, tpos FROM (
            SELECT w.doc_id, unnest(range(w.p, w.p + 10)) AS tpos
            FROM wins w JOIN bkeys b ON b.wkey = w.wkey
        )
    ),
    flagged AS (
        SELECT t.doc_id, t.tpos, t.token, (c.tpos IS NOT NULL) AS is_cut
        FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.tpos = t.tpos
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_tokens,
           CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END) AS INTEGER) AS n_removed,
           sha256(coalesce(string_agg(token, ' ' ORDER BY tpos) FILTER (WHERE NOT is_cut), '')) AS clean_sha256
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "dedup", "decontamination", "exact-substring", "lee2022"),
)
def docs_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination (`operators.text.benchmark_decontaminate`)
    — the published n-gram-overlap scrub (GPT-3 appendix C; Lee et al. 2022
    across splits): docs with ``doc_id % 7 = 0`` of the seeded corpus act
    as the benchmark/eval set, every other doc is training data, and every
    training token inside a ≥10-token window that ALSO occurs anywhere in
    the benchmark is suppressed, the text reassembled, and sha256-pinned.

    What this pins that the self-dedup rows can't: the criterion is
    membership in the REFERENCE set, not corpus multiplicity — a span
    duplicated across training docs but absent from the benchmark survives
    (unit-pinned in test_text_ops), while a span appearing ONCE in training
    and once in the benchmark is scrubbed (multiplicity-2 self-dedup over
    the union would behave identically only by accident of seeding; here
    each side is windowed separately). On the seeded corpus the global
    19-token boilerplate prefix and the group seeds of every group
    containing a multiple of 7 vanish from training docs, plus any genuine
    body overlap with benchmark docs.

    Scale shape (the row's second point): the benchmark key set is
    broadcast — the corpus windows meet it in a broadcast LEFT SEMI join
    with NO corpus-side Exchange (plan-pinned), vs the self-dedup rows'
    corpus-wide window-count shuffle. At 100 TB the eval set is MBs, so
    decontamination costs one corpus scan + the reassembly it shares with
    the family.

    Completes the contamination family: `docs_benchmark_contamination`
    FLAGS docs by shared 3-gram shingles (doc-level audit),
    `docs_bloom_decontamination` does the same when the blocklist can't
    broadcast (fixed-size bitmap + exact re-verify), and this row SCRUBS
    at token-position granularity with reassembly — flag, flag-at-scale,
    and rewrite are the three consumer shapes pipelines actually run."""
    seeded = _span_seeded(spark, sf_dir)
    out = X.benchmark_decontaminate(
        seeded.where((F.col("doc_id") % 7) != 0),
        seeded.where((F.col("doc_id") % 7) == 0).select("text"),
        min_len=10,
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.sha2("clean_text", 256).alias("clean_sha256"),
    ).orderBy("doc_id")


@register(
    "docs_substring_dedup_cdc",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tok AS (
        SELECT doc_id, unnest(range(0, len(t))) AS tpos, unnest(t) AS token
        FROM toks
    ),
    wins AS (
        SELECT doc_id,
               unnest(range(0, greatest(len(t) - 9, 0))) AS p,
               unnest(list_transform(range(0, greatest(len(t) - 9, 0)),
                   i -> array_to_string(list_slice(t, i + 1, i + 10), ' '))) AS wkey
        FROM toks
    ),
    dup AS (SELECT wkey FROM wins GROUP BY wkey HAVING count(*) >= 2),
    cov AS (
        SELECT DISTINCT doc_id, tpos FROM (
            SELECT w.doc_id, unnest(range(w.p, w.p + 10)) AS tpos
            FROM wins w JOIN dup d ON d.wkey = w.wkey
        )
    ),
    flagged AS (
        SELECT t.doc_id, t.tpos, t.token, (c.tpos IS NOT NULL) AS is_cut
        FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.tpos = t.tpos
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_tokens,
           CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END) AS INTEGER) AS n_removed,
           sha256(coalesce(string_agg(token, ' ' ORDER BY tpos) FILTER (WHERE NOT is_cut), '')) AS clean_sha256
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "dedup", "exact-substring", "lee2022", "cdc",
          "versioned-table", "incremental", "ingest"),
)
def docs_substring_dedup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup as an INGEST-TIME operator — the CDC
    composition of `docs_exact_substring_dedup` (the `dedup_lsh_cdc_merge`
    pattern applied to the Lee et al. 2022 operator): documents land in a
    `VersionedTable` through OCC MERGEs; each commit's change feed probes
    a persistent positional WINDOW INDEX
    (`operators.text.substring_dedup_incremental`) and is then appended to
    it, keeping index ≡ corpus at every version.

    The property this row pins is the one batch dedup never faces:
    suppress-ALL semantics means an incoming duplicate RETROACTIVELY
    poisons already-admitted text (the stored first occurrence must be
    suppressed too — dedup debt). The per-commit delta therefore carries
    both directions of the probe join, and the ACCUMULATED position set
    across the initial load + every commit must reproduce the one-shot
    coverage of the final corpus — the oracle replays windows, the
    multiplicity-2 test, coverage, and reassembly from the raw final
    documents, so a missed retro-poisoning, a double-fed CDC row, or an
    index/corpus drift lands as a hash mismatch on the reassembled text.

    Per commit: batch-sized windowing, one index equi-join — the index is
    written ``bucket_by=16`` on the window key (round 11), so the probe
    join's index side reaches the join with NO Exchange and only the
    batch windows shuffle (plan-pinned in tests/test_scale_plans.py);
    matched-window position explodes; never a corpus re-window after the
    initial index build. Coverage is a SET (union + distinct), so replays
    are idempotent by construction."""

    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = scratch_dir(prefix="cdc_substr_")
    t = VersionedTable(spark, f"{root}/tbl", key_cols=["doc_id"])
    t.write(docs.where(F.col("doc_id") % 3 == 0))
    idx = f"{root}/idx"
    X.materialize_window_index(t.read(), idx, bucket_by=16)
    parts = [X.substring_coverage(t.read())]
    for i in (1, 2):
        pre_v = t.history()[-1]["version"]
        t.upsert(docs.where(F.col("doc_id") % 3 == i))
        post_v = t.history()[-1]["version"]
        ins = (
            t.changes(pre_v, post_v)
            .where(F.col("_change_type") == "insert")
            .select("doc_id", "text")
        )
        parts.append(X.substring_dedup_incremental(spark, idx, ins))
        X.append_to_window_index(ins, idx)
    cov = parts[0]
    for p_ in parts[1:]:
        cov = cov.unionByName(p_)
    out = X.reassemble_minus_coverage(t.read(), cov.distinct())
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.sha2("clean_text", 256).alias("clean_sha256"),
    ).orderBy("doc_id")


@register(
    "docs_boilerplate_scrub",
    oracle=f"""
    WITH {_SPAN_SEED_SQL},
    hot AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(DISTINCT doc_id) >= 50),
    flagged AS (
        SELECT c.doc_id, c.pos, c.chunk, (h.chunk IS NOT NULL) AS is_hot
        FROM ch c LEFT JOIN hot h ON h.chunk = c.chunk
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_chunks,
           CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS INTEGER) AS n_dropped,
           sha256(coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE NOT is_hot), '')) AS clean_sha256
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "boilerplate", "quality"),
)
def docs_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style boilerplate removal (operators.text.boilerplate_scrub):
    10-token blocks appearing in ≥50 distinct docs are cut from every doc —
    the seeded global footer (df=500) is scrubbed everywhere while the
    per-10-doc group block (df=10) survives, so the df-threshold itself is
    hash-gated. Plan: map-side-combinable DF aggregate → tiny hot set →
    broadcast left join (the same aggregate→broadcast shape as the n-gram
    df-cap); no sort of the full block index."""
    return _span_result(
        X.boilerplate_scrub(_span_seeded(spark, sf_dir), min_docs=50)
    )


@register(
    "docs_url_domains",
    oracle=r"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                    || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                    || ' and http://cdn.example.org/static/app.js' AS t
        FROM documents
    ),
    u AS (
        SELECT doc_id,
               unnest(regexp_extract_all(t, 'https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9./_%-]*)?')) AS url
        FROM seeded
    )
    SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
           CAST(count(*) AS INTEGER) AS n_urls,
           CAST(count(DISTINCT doc_id) AS INTEGER) AS n_docs
    FROM u GROUP BY 1 ORDER BY n_urls DESC, domain
    """,
    tags=("text", "url", "extraction"),
)
def docs_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain rollup (operators.text.url_extract) — the
    crawl-pipeline stage behind domain blocklists and source mixing. Docs are
    seeded with one per-doc-group URL and one global CDN URL (the corpus has
    none of its own); URL pattern lives in the Java∩RE2 dialect so both
    engines extract byte-identical matches. Plan: codegen regexp scan →
    explode → low-cardinality domain agg (map-side combine), no join."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and http://cdn.example.org/static/app.js"),
        ).alias("text"),
    )
    return (
        X.url_extract(seeded)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_urls"),
            F.count_distinct("doc_id").cast("int").alias("n_docs"),
        )
        .orderBy(F.desc("n_urls"), "domain")
    )


@register(
    "docs_regexp_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
           COALESCE(regexp_extract(text, '[0-9]+', 0), '') AS first_number,
           regexp_replace(text, '[0-9]+', '#', 'g') AS masked,
           CAST(regexp_matches(text, '[0-9]') AS BOOLEAN) AS has_digit
    FROM documents WHERE doc_id < 500 ORDER BY doc_id
    """,
    tags=("text", "regex", "scalar"),
)
def docs_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family breadth on the dialect-portable subset (plain
    character classes — identical semantics in Java regex and RE2/DuckDB,
    the same Java∩RE2 discipline as the PII scrub): extract-all count,
    first match, global replacement mask, boolean containment. Each stays
    whole-stage-codegen JVM-side."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"))).cast("int").alias("n_numbers"),
        F.regexp_extract("text", "[0-9]+", 0).alias("first_number"),
        F.regexp_replace("text", "[0-9]+", "#").alias("masked"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
    ).orderBy("doc_id")


_QSCORE = f"""floor((
             0.3 * least(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0)
             + 0.4 * (CAST(len(list_filter({_TOKS}, tk -> tk IN {_STOP})) AS DOUBLE) / len({_TOKS}))
             + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text))
           ) * 1000000) / 1000000"""


@register(
    "docs_token_budget_selection",
    oracle=f"""
    WITH q AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               {_QSCORE} AS quality_score
        FROM documents
    ),
    c AS (
        SELECT *, SUM(n_tokens) OVER (
            ORDER BY quality_score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM q
    )
    SELECT doc_id, n_tokens, quality_score FROM c
    WHERE cum <= 20000 ORDER BY doc_id
    """,
    tags=("text", "quality", "curation", "selection", "window"),
)
def docs_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted corpus selection: keep the highest-quality documents
    whose inclusive running token total (quality desc, doc_id tie-break)
    fits a 20k-token budget — the "best data under a compute budget" step
    every training-mix pipeline runs.

    Scale shape — deliberately NOT the oracle's single global window (a
    one-partition cumsum over the corpus is the classic driver-shaped
    bottleneck). Quality scores are floored to 1e-6, so they are DISCRETE:

    1. aggregate token sums per distinct score (map-side combinable; at
       most 1e6 rows regardless of corpus size),
    2. one window over the per-score aggregates finds the cut: scores
       whose buckets fit entirely, plus at most one PARTIAL score,
    3. only the partial score's documents — the tie group — get a
       doc-level cumsum, keyed to fill the remaining budget.

    The global sort the oracle performs never happens over documents;
    the only per-document shuffles are the score aggregation and the
    candidate-sized tie window. Output is selection-identical to the
    naive window by construction. (The plan lives in
    `operators.text.token_budget_select`, shared with the cluster-level
    composition row.)"""
    docs = load_table(spark, sf_dir, "documents")
    q = X.quality_features(docs).select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"), "quality_score"
    )
    return X.token_budget_select(q, 20_000).orderBy("doc_id")


@register(
    "docs_cluster_budget_selection",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_CTE},
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    pairs AS (
        SELECT a_id, b_id FROM (
            SELECT c.a_id, c.b_id,
                   len(list_intersect(sa.s, sb.s)) AS common,
                   len(sa.s) AS na, len(sb.s) AS nb
            FROM (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id) c
            JOIN sh sa ON sa.doc_id = c.a_id
            JOIN sh sb ON sb.doc_id = c.b_id
        ) WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.6
    ),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION SELECT b_id, a_id FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    assign AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
    q AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               {_QSCORE} AS quality_score
        FROM documents
    ),
    surv AS (
        SELECT q.doc_id, q.n_tokens, q.quality_score,
               row_number() OVER (
                   PARTITION BY coalesce(a.cluster_id, q.doc_id)
                   ORDER BY q.quality_score DESC, q.doc_id) AS rn
        FROM q LEFT JOIN assign a ON a.doc_id = q.doc_id
    ),
    kept AS (SELECT doc_id, n_tokens, quality_score FROM surv WHERE rn = 1),
    c AS (
        SELECT *, SUM(n_tokens) OVER (
            ORDER BY quality_score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM kept
    )
    SELECT doc_id, n_tokens, quality_score FROM c
    WHERE cum <= 20000 ORDER BY doc_id
    """,
    tags=("pipeline", "dedup", "clusters", "quality", "selection", "curation"),
)
def docs_cluster_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level fuzzy dedup feeding the token-budget selector
    (VERDICT r10 #6 — the corpus-curation composition the registry didn't
    yet pin): near-dup pairs (n-gram Jaccard ≥ 0.6) → connected components
    → ONE SURVIVOR PER CLUSTER chosen by quality ARGMAX (not min doc_id —
    the SemDeDup-style keep-best policy at cluster granularity, tie-broken
    by id), non-clustered docs survive as singletons → token-budget
    selection over the survivors (`operators.text.token_budget_select`,
    the same discrete-score two-stage plan the plain selection row runs).
    The one oracle hash pins the INTERACTION: a cluster's budget
    contribution is its best member's tokens, so a mis-merged cluster, a
    wrong argmax, or budget accounting over non-survivors all land as a
    selection diff.

    Scale shape: pair generation is the priced/banded plan, components are
    dup-docs-sized, the argmax window partitions by cluster id (groups =
    cluster sizes), and the budget stage never globally sorts documents —
    no corpus-sized single-partition stage anywhere."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    q = X.quality_features(docs).select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"), "quality_score"
    )
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.6)
    assign = D.connected_components(pairs).select("doc_id", "cluster_id")
    grp = q.join(assign, "doc_id", "left").withColumn(
        "_grp", F.coalesce("cluster_id", "doc_id")
    )
    aw = W.partitionBy("_grp").orderBy(F.col("quality_score").desc(), F.col("doc_id"))
    kept = (
        grp.withColumn("_rn", F.row_number().over(aw))
        .where(F.col("_rn") == 1)
        .select("doc_id", "n_tokens", "quality_score")
    )
    return X.token_budget_select(kept, 20_000).orderBy("doc_id")


@register(
    "docs_expectations",
    oracle="""
    WITH m AS (
        SELECT
            CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS doc_id_nulls,
            CAST(count(doc_id) - count(DISTINCT doc_id) AS DOUBLE) AS doc_id_dups,
            CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS text_nulls,
            CAST(sum(CASE WHEN lang IS NOT NULL
                          AND lang NOT IN ('en','de','fr','es','zh')
                     THEN 1 ELSE 0 END) AS DOUBLE) AS lang_bad,
            CAST(sum(CASE WHEN n_chars IS NOT NULL AND (n_chars < 1 OR n_chars > 10000)
                     THEN 1 ELSE 0 END) AS DOUBLE) AS nchars_bad,
            CAST(sum(CASE WHEN source IS NOT NULL
                          AND NOT regexp_matches(source, '^src[0-9]+$')
                     THEN 1 ELSE 0 END) AS DOUBLE) AS source_bad,
            CAST(greatest(0, 100 - count(*)) AS DOUBLE) AS row_shortfall,
            CAST(sum(CASE WHEN NOT coalesce(n_chars = length(text), FALSE)
                     THEN 1 ELSE 0 END) AS DOUBLE) AS nchars_drift,
            CAST(sum(CASE WHEN NOT coalesce(n_chars >= 100, FALSE)
                     THEN 1 ELSE 0 END) AS DOUBLE) AS short_docs
        FROM documents
    )
    SELECT * FROM (
        SELECT 'doc_id_not_null' AS check_name, 'doc_id' AS col_name,
               'no NULL values' AS expected, doc_id_nulls AS observed,
               CAST(0.0 AS DOUBLE) AS threshold, doc_id_nulls <= 0.0 AS passed FROM m
        UNION ALL
        SELECT 'doc_id_unique', 'doc_id', 'values are distinct', doc_id_dups,
               CAST(0.0 AS DOUBLE), doc_id_dups <= 0.0 FROM m
        UNION ALL
        SELECT 'text_not_null', 'text', 'no NULL values', text_nulls,
               CAST(0.0 AS DOUBLE), text_nulls <= 0.0 FROM m
        UNION ALL
        SELECT 'lang_in_set', 'lang', 'non-null values in allowed set of 5', lang_bad,
               CAST(0.0 AS DOUBLE), lang_bad <= 0.0 FROM m
        UNION ALL
        SELECT 'n_chars_between', 'n_chars', 'non-null values in [1, 10000]', nchars_bad,
               CAST(0.0 AS DOUBLE), nchars_bad <= 0.0 FROM m
        UNION ALL
        SELECT 'source_matches', 'source', 'non-null values match src-id format', source_bad,
               CAST(0.0 AS DOUBLE), source_bad <= 0.0 FROM m
        UNION ALL
        SELECT 'table_row_count_at_least', '', 'at least 100 rows', row_shortfall,
               CAST(0.0 AS DOUBLE), row_shortfall <= 0.0 FROM m
        UNION ALL
        SELECT 'n_chars_consistent', 'n_chars', 'n_chars equals length of text', nchars_drift,
               CAST(0.0 AS DOUBLE), nchars_drift <= 0.0 FROM m
        UNION ALL
        SELECT 'n_chars_at_least_100', 'n_chars', 'documents have at least 100 chars',
               short_docs, CAST(0.0 AS DOUBLE), short_docs <= 0.0 FROM m
    ) ORDER BY check_name
    """,
    tags=("text", "quality", "expectations", "constraints"),
)
def docs_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the Deequ / Great-Expectations shape,
    SURVEY §2.11 pipeline surface): nine constraints over ``documents`` —
    null-freedom, key uniqueness, set membership, range, regex conformance,
    row-count floor, a cross-column consistency contract, and one check
    DESIGNED to fail on this corpus (a 100-char length floor) so the report
    provably carries failures, not just confirmations. All nine compile into
    ONE aggregation pass (`operators.expectations.evaluate_expectations`);
    every observed value is an integer violation count, so the report is
    bit-stable under any partitioning. The oracle recomputes each count in
    plain SQL — a drifted predicate, a mis-thresholded pass flag, or a
    miscounted violation all land as a hash mismatch."""
    from arrow_parquet_logs_spark.operators.expectations import (
        evaluate_expectations,
        expect_between,
        expect_in_set,
        expect_matches,
        expect_not_null,
        expect_row_count_at_least,
        expect_satisfies,
        expect_unique,
    )

    docs = load_table(spark, sf_dir, "documents")
    checks = [
        expect_not_null("doc_id"),
        expect_unique("doc_id"),
        expect_not_null("text"),
        expect_in_set("lang", ("en", "de", "fr", "es", "zh")),
        expect_between("n_chars", 1, 10000),
        expect_matches("source", r"^src[0-9]+$", label="src-id format"),
        expect_row_count_at_least(100),
        expect_satisfies(
            "n_chars_consistent", "n_chars",
            F.col("n_chars") == F.length("text"),
            "n_chars equals length of text",
        ),
        expect_satisfies(
            "n_chars_at_least_100", "n_chars",
            F.col("n_chars") >= 100,
            "documents have at least 100 chars",
        ),
    ]
    return evaluate_expectations(docs, checks)


@register(
    "docs_csv_ingest",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(2 AS BIGINT) AS n_corrupt
    FROM documents WHERE doc_id >= 100 AND doc_id < 400 ORDER BY doc_id
    """,
    tags=("text", "ingest", "csv", "source"),
)
def docs_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV corpus ingest with corrupt-row quarantine — completing the text
    source matrix (parquet / Arrow IPC / gzip-JSONL / CSV). A document
    slice round-trips through headered CSV files plus two poison lines (a
    type-mismatched key, an extra-column row), read back the 100 TB way:

    - **explicit schema** (CSV inference costs a full extra pass AND
      type-guesses differently per sample — never at scale);
    - **PERMISSIVE + columnNameOfCorruptRecord**: both poison rows land in
      the quarantine column (Spark's CSV parser half-fills the data columns
      for them, so the filter keys on the quarantine column, not on NULLs);
    - header=true per file (safe under splittable reads: Spark drops the
      header token per file, not per partition);
    - default single-line mode — splittable, unlike ``multiLine=true`` which
      forces one task per file and is only needed for embedded newlines
      (quoted commas are fine either way, as the poison probe pins).

    Oracle: identity over the slice + the exact quarantine count — encode/
    decode drift (quoting, unicode) or a quarantine miss is a hash mismatch."""
    import os

    docs = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 400)
    )
    path = scratch_dir(prefix="csv_ingest_") + "/corpus"
    docs.select("doc_id", "text").write.mode("overwrite").option(
        "header", True
    ).csv(path)
    with open(os.path.join(path, "poison.csv"), "w", encoding="utf-8") as fh:
        fh.write("doc_id,text\nnot_an_int,looks ok otherwise\n1,too,many,columns\n")

    back = (
        spark.read.schema("doc_id long, text string, _bad string")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
        # same rationale as docs_jsonl_ingest: corrupt-column queries must
        # observe the same parse as the clean projection
        .persist()
    )
    n_corrupt = back.where(F.col("_bad").isNotNull()).count()
    return (
        back.where(F.col("_bad").isNull())
        .select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.length("text").alias("n_chars"),
        )
        .withColumn("n_corrupt", F.lit(n_corrupt).cast("long"))
        .orderBy("doc_id")
    )


#: decomposed/precomposed Unicode samples spliced into document text by
#: ``docs_nfc_normalize`` — combining acute/ring/diaeresis+macron sequences,
#: an already-composed é (NFC no-op), and a Hangul jamo pair (NFC composes
#: to the precomposed syllable). Each has a chr()-built twin in the oracle.
_NFC_SAMPLES = (
    "e\u0301cole",                # e + COMBINING ACUTE -> \u00e9
    "A\u030aNGSTRO\u0308M",      # A + RING, O + DIAERESIS
    "already \u00e9",             # precomposed: NFC identity
    "o\u0308\u0304 mark",        # o+diaeresis composes, the macron stays combining
    "\u1100\u1161 hangul",       # jamo pair -> U+AC00
)


@register(
    "docs_nfc_normalize",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             substr(text, 1, 20) || ' ' ||
             CASE doc_id % 5
               WHEN 0 THEN 'e' || chr(769) || 'cole'
               WHEN 1 THEN 'A' || chr(778) || 'NGSTRO' || chr(776) || 'M'
               WHEN 2 THEN 'already ' || chr(233)
               WHEN 3 THEN 'o' || chr(776) || chr(772) || ' mark'
               ELSE chr(4352) || chr(4449) || ' hangul'
             END AS raw
      FROM documents
    )
    SELECT doc_id,
           CAST(length(raw) AS INTEGER) AS raw_len,
           nfc_normalize(raw) AS nfc_text,
           CAST(length(nfc_normalize(raw)) AS INTEGER) AS nfc_len,
           nfc_normalize(raw) <> raw AS changed
    FROM s ORDER BY doc_id
    """,
    tags=("text", "map-in-arrow", "unicode", "normalize"),
)
def docs_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (operators.text.normalize_text): document
    text spliced with decomposed combining sequences, precomposed
    characters, and Hangul jamo, normalized by the Arrow C++ utf8proc
    kernel via ``mapInArrow`` — no Python per row, no shuffle. The oracle
    rebuilds the identical codepoint sequences with chr() and normalizes
    with DuckDB's ``nfc_normalize`` (also utf8proc-backed), so the hash
    gate compares two independent engines' full Unicode composition
    tables byte-for-byte — composition pairs, blocked compositions
    (ö + macron has no precomposed form), and algorithmic Hangul LV
    composition all land in the digest."""
    docs = load_table(spark, sf_dir, "documents")
    sample = F.element_at(
        F.array(*[F.lit(s) for s in _NFC_SAMPLES]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    raw = docs.select(
        "doc_id",
        F.concat(F.substring("text", 1, 20), F.lit(" "), sample).alias("nfc_text"),
    ).withColumn("raw_len", F.length("nfc_text")).withColumn(
        "raw_copy", F.col("nfc_text")
    )
    out = X.normalize_text(raw, "nfc_text", form="NFC")
    return out.select(
        "doc_id",
        "raw_len",
        "nfc_text",
        F.length("nfc_text").alias("nfc_len"),
        (F.col("nfc_text") != F.col("raw_copy")).alias("changed"),
    ).orderBy("doc_id")


@register(
    "docs_orc_ingest",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents
    WHERE doc_id >= 200 AND doc_id < 600 AND lang IN ('en', 'de')
    ORDER BY doc_id
    """,
    tags=("text", "source", "orc", "partition-pruning"),
)
def docs_orc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the remaining columnar format in the source matrix
    (parquet / Arrow IPC / gzip-JSONL / CSV / ORC), read the 100 TB way:

    - **hive-partitioned write** (``partitionBy(lang)``): the read-back
      filter ``lang IN ('en','de')`` resolves at PLANNING time against
      directory names — non-matching partitions are never opened;
    - **explicit schema on read** (no footer-sampling inference pass);
    - zlib compression (the ORC default most lakes carry).

    The query returns the slice itself, ordered — so any round-trip drift
    (string encoding, NULL handling, long overflow, partition-column
    type coercion back from directory keys) is a hash mismatch against
    the parquet-sourced oracle, which never touches ORC at all."""

    docs = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 600)
    )
    path = scratch_dir(prefix="orc_ingest_") + "/corpus"
    docs.write.mode("overwrite").option("compression", "zlib").partitionBy(
        "lang"
    ).orc(path)
    back = (
        spark.read.schema("doc_id long, text string, source string, n_chars long, lang string")
        .orc(path)
        .where(F.col("lang").isin("en", "de"))
    )
    return back.select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id")


@register(
    "docs_xml_ingest",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents
    WHERE doc_id >= 300 AND doc_id < 700 AND lang IN ('en', 'fr')
    ORDER BY doc_id
    """,
    tags=("text", "source", "xml", "partition-pruning"),
)
def docs_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip through Spark 4's NATIVE xml data source (spark-xml
    graduated into core in 4.0 — no external package), completing the
    source matrix: parquet / Arrow IPC / gzip-JSONL / CSV / ORC / XML.

    Read the 100 TB way even though XML is the interchange laggard:

    - **hive-partitioned write** (``partitionBy(lang)``) so the read-back
      ``lang IN ('en','fr')`` prunes whole directories at planning time;
    - **explicit schema on read** — XML inference is a full extra pass
      that also widens everything it can't prove, so production readers
      must pin the schema;
    - ``rowTag`` framing (one ``<doc>`` element per row).

    The hash gate is the XML-specific trap coverage: document text is
    free-form prose, so entity escaping (& < > quotes), whitespace
    preservation inside element bodies, and long/partition-key type
    round-trips all have to survive writer→parser→DataFrame intact to
    match the parquet-sourced oracle, which never touches XML."""

    docs = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 700)
    )
    path = scratch_dir(prefix="xml_ingest_") + "/corpus"
    docs.write.mode("overwrite").format("xml").option("rowTag", "doc").partitionBy(
        "lang"
    ).save(path)
    back = (
        spark.read.schema("doc_id long, text string, source string, n_chars long, lang string")
        .format("xml")
        .option("rowTag", "doc")
        .load(path)
        .where(F.col("lang").isin("en", "fr"))
    )
    return back.select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id")


def _bpe_oracle(n_merges: int) -> str:
    """DuckDB replay of the BPE training loop: same initial encoding
    (chr(31)-delimited chars + chr(30) end-of-word), same overlapping pair
    statistics weighted by word frequency, same (count desc, left, right)
    tie-break, same leftmost-non-overlapping replace() merge — both
    engines' replace() resumes scanning after each replacement, so even
    self-overlapping runs (a a a) merge identically."""
    cte = f"""
    w AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest({_TOKS}) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    e0 AS MATERIALIZED (
      SELECT f,
             chr(31) || array_to_string(
               list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
               chr(31)) || chr(31) || chr(30) || chr(31) AS s
      FROM w
    )"""
    for k in range(1, n_merges + 1):
        prev = f"e{k - 1}"
        cte += f""",
    p{k} AS MATERIALIZED (
      SELECT sym[CAST(i AS INT)] AS l, sym[CAST(i AS INT) + 1] AS r,
             CAST(sum(f) AS BIGINT) AS cnt
      FROM (SELECT f, string_split(s, chr(31)) AS sym FROM {prev}),
           unnest(range(2, len(sym) - 1)) AS t(i)
      GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (
      SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
    ),
    e{k} AS MATERIALIZED (
      SELECT f, replace(s, chr(31) || b.l || chr(31) || b.r || chr(31),
                           chr(31) || b.l || b.r || chr(31)) AS s
      FROM {prev}, b{k} b
    )"""
    picks = "\n      UNION ALL ".join(
        f'SELECT {k} AS rank, l, r, cnt AS pair_count FROM b{k}'
        for k in range(1, n_merges + 1)
    )
    return (
        f"WITH {cte}\n"
        f"SELECT CAST(rank AS INTEGER) AS rank,"
        f" replace(l, chr(30), '</w>') AS \"left\","
        f" replace(r, chr(30), '</w>') AS \"right\","
        f" pair_count\n"
        f"FROM ({picks})\nORDER BY rank"
    )


@register(
    "docs_bpe_train",
    oracle=_bpe_oracle(5),
    tags=("text", "tokenizer", "bpe", "iterative"),
)
def docs_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding TOKENIZER TRAINING (operators.text.bpe_train) —
    the corpus collapses to distinct words with frequencies, then five
    rounds of: overlapping adjacent-pair statistics (frequency-weighted),
    deterministic argmax (count desc, lexicographic tie-break), and a
    leftmost-non-overlapping merge applied to every word's symbol string.
    Returns the learned merge table in rank order — exactly what a
    tokenizer build step persists.

    The oracle replays all five rounds in chained DuckDB CTEs over the
    identical sentinel-delimited encoding, so pair statistics, tie-breaks,
    and replace() merge semantics are cross-engine-pinned bit-for-bit.
    Scale: pair work is O(vocabulary), never O(corpus); per round one
    explode + one aggregation + a single-row argmax to the driver."""
    from arrow_parquet_logs_spark.operators.text import BPE_EOW, bpe_train, tokens

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    merges = bpe_train(words, n_merges=5)
    rows = [
        (k + 1, l.replace(BPE_EOW, "</w>"), r.replace(BPE_EOW, "</w>"), c)
        for k, (l, r, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count long"
    ).orderBy("rank")


@register(
    "docs_bpe_tokenize",
    oracle=(
        # reuse the 5-round training replay, then apply the learned merges
        # to every word of the sliced docs and count resulting BPE symbols
        _bpe_oracle(5)
        .split("\nSELECT CAST(rank AS INTEGER)")[0]
        + """,
    docw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents WHERE doc_id < 300
      ) WHERE word <> ''
    ),
    a0 AS (
      SELECT doc_id,
             chr(31) || array_to_string(
               list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
               chr(31)) || chr(31) || chr(30) || chr(31) AS s
      FROM docw
    ),
    a1 AS (SELECT doc_id, replace(s, chr(31)||b.l||chr(31)||b.r||chr(31), chr(31)||b.l||b.r||chr(31)) AS s FROM a0, b1 b),
    a2 AS (SELECT doc_id, replace(s, chr(31)||b.l||chr(31)||b.r||chr(31), chr(31)||b.l||b.r||chr(31)) AS s FROM a1, b2 b),
    a3 AS (SELECT doc_id, replace(s, chr(31)||b.l||chr(31)||b.r||chr(31), chr(31)||b.l||b.r||chr(31)) AS s FROM a2, b3 b),
    a4 AS (SELECT doc_id, replace(s, chr(31)||b.l||chr(31)||b.r||chr(31), chr(31)||b.l||b.r||chr(31)) AS s FROM a3, b4 b),
    a5 AS (SELECT doc_id, replace(s, chr(31)||b.l||chr(31)||b.r||chr(31), chr(31)||b.l||b.r||chr(31)) AS s FROM a4, b5 b)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(string_split(s, chr(31))) - 2) AS BIGINT) AS n_bpe_tokens
    FROM a5 GROUP BY doc_id ORDER BY doc_id"""
    ),
    tags=("text", "tokenizer", "bpe"),
)
def docs_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: the merges learned by `docs_bpe_train` (same
    corpus, same 5 rounds) applied in rank order to every word of a
    document slice; output is per-document word and BPE-token counts
    (end-of-word symbols included — one per word at minimum). Both the
    training AND the application replay in the oracle, so a drift in
    either stage lands as a hash mismatch. Application is a narrow
    projection (chained literal replaces, whole-stage codegen), no
    Python, no shuffle beyond the final per-doc count."""
    from arrow_parquet_logs_spark.operators.text import (
        BPE_SEP,
        bpe_encode_expr,
        bpe_train,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    merges = bpe_train(words, n_merges=5)
    docw = (
        docs.where(F.col("doc_id") < 300)
        .select("doc_id", F.explode(tokens("text")).alias("word"))
        .where(F.col("word") != "")
    )
    s = bpe_encode_expr(F.col("word"))
    for l, r, _ in merges:
        s = F.replace(s, F.lit(BPE_SEP + l + BPE_SEP + r + BPE_SEP),
                      F.lit(BPE_SEP + l + r + BPE_SEP))
    return (
        docw.select("doc_id", (F.size(F.split(s, BPE_SEP)) - 2).cast("long").alias("nt"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nt").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "docs_token_lift",
    oracle=r"""
    WITH dt AS MATERIALIZED (
      SELECT DISTINCT doc_id, t
      FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    dfc AS MATERIALIZED (
      SELECT t, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY t
    ),
    p AS (
      SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS n_xy
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY 1, 2 HAVING count(*) >= 20
    )
    SELECT p.t1, p.t2, p.n_xy, d1.df AS df1, d2.df AS df2,
           floor((CAST(p.n_xy AS DOUBLE) * (SELECT n_docs FROM n))
                 / (CAST(d1.df AS DOUBLE) * CAST(d2.df AS DOUBLE))
                 * 1000000) / 1000000 AS lift
    FROM p JOIN dfc d1 ON d1.t = p.t1 JOIN dfc d2 ON d2.t = p.t2
    ORDER BY lift DESC, t1, t2 LIMIT 30
    """,
    tags=("text", "association", "market-basket", "pmi"),
    bench=True,
)
def docs_token_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association LIFT over document token sets — for each
    co-occurring token pair, observed-co-occurrence over
    independence-expected co-occurrence (lift = n_xy·N / (n_x·n_y), the
    exponential of PMI, same ranking): the corpus-statistics primitive
    behind collocation extraction, topic seeding, and "frequently appear
    together" features. Shape at scale: one explode→distinct to (doc,
    token) rows, a doc-keyed self-join whose fan-out is C(k,2) per doc on
    the DISTINCT token set (bounded by doc length, and in production by a
    df-cap that drops stopword-grade tokens before the join — the same
    defense as the shingle index), document frequencies broadcast back
    onto the support-filtered pairs, a top-30 TakeOrdered. No vocabulary-
    sized shuffle anywhere.

    Determinism: lift is integer-exact double math — all three factors
    are integers below 2⁵³ (exact in double), one multiply each side, one
    IEEE division identical bit-for-bit across engines — then
    qfloor-quantized, with a (t1, t2) tie-break. min-support 20 keeps the
    pair frame stable under any partitioning."""
    from arrow_parquet_logs_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # the (doc, distinct-token) relation is ROW-LOCAL: every token of a doc
    # comes from that doc's one text cell, so the distinct token set is a
    # per-row array expression — the old explode→DISTINCT paid a
    # (doc, token)-keyed exchange to deduplicate rows that were never
    # spread across partitions to begin with (guide §2.4). Row-local
    # array_distinct is equivalent to the oracle's SELECT DISTINCT doc_id,
    # t ONLY while doc_id is unique per input row (true for the shipped
    # documents table); a source with duplicated doc rows would double-
    # count df and n_xy here where the oracle would dedup them.
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.filter(tokens("text"), lambda t: t != ""))).alias("t"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfc = dt.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # the doc-keyed self-join stays (codegen join beats both an interpreted
    # C(k,2) HOF explode and a Python Counter pass — A/B'd, OPTIMIZATION_
    # r11.md), but its two sides now share ONE doc_id exchange over the
    # row-local dt instead of the old distinct's (doc_id, t) exchange plus
    # two incompatible doc_id re-exchanges.
    a, b = dt.alias("a"), dt.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.t").alias("t1"), F.col("b.t").alias("t2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .where(F.col("n_xy") >= 20)
    )
    d1 = dfc.select(F.col("t").alias("t1"), F.col("df").alias("df1"))
    d2 = dfc.select(F.col("t").alias("t2"), F.col("df").alias("df2"))
    out = (
        pairs.join(F.broadcast(d1), "t1")
        .join(F.broadcast(d2), "t2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "t1", "t2", "n_xy", "df1", "df2",
            qfloor(
                (F.col("n_xy").cast("double") * F.col("n_docs"))
                / (F.col("df1").cast("double") * F.col("df2").cast("double"))
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "t1", "t2").limit(30)


@register(
    "docs_split_drift_tvd",
    oracle=f"""
    WITH s AS MATERIALIZED (
      SELECT lang,
             CASE WHEN {_H64.format(x="concat('split:', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
                  WHEN {_H64.format(x="concat('split:', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    a AS (SELECT lang, CAST(count(*) AS BIGINT) AS a FROM s WHERE split = 'train' GROUP BY lang),
    b AS (SELECT lang, CAST(count(*) AS BIGINT) AS b FROM s WHERE split = 'test' GROUP BY lang),
    ta AS (SELECT CAST(count(*) AS BIGINT) AS ta FROM s WHERE split = 'train'),
    tb AS (SELECT CAST(count(*) AS BIGINT) AS tb FROM s WHERE split = 'test')
    SELECT COALESCE(a.lang, b.lang) AS lang,
           COALESCE(a.a, 0) AS n_train, COALESCE(b.b, 0) AS n_test,
           floor((CAST(abs(COALESCE(a.a, 0) * (SELECT tb FROM tb)
                           - COALESCE(b.b, 0) * (SELECT ta FROM ta)) AS DOUBLE)
                  / (2.0 * CAST((SELECT ta FROM ta) AS DOUBLE)
                         * CAST((SELECT tb FROM tb) AS DOUBLE)))
                 * 1000000) / 1000000 AS tvd_contrib
    FROM a FULL OUTER JOIN b ON a.lang = b.lang
    ORDER BY lang
    """,
    tags=("text", "split", "drift", "tvd"),
)
def docs_split_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift screen between the hash-assigned train and test
    splits: per-language contribution to the TOTAL VARIATION DISTANCE
    (½·Σ|p−q|; the contributions sum to the TVD). The production gate a
    data pipeline runs before shipping a split — a language (or domain,
    or source) whose share shifted between splits shows up as a fat
    contribution row; languages present in only ONE split are the acute
    failure and come from the full-outer margin join, not silently
    dropped.

    Chosen over KL for the same reason the engine's money math is
    decimal: TVD is RATIONAL in the counts — |a·B − b·A| / (2·A·B) with
    every product an exact-in-double integer and one final IEEE division
    — so the gate needs no cross-engine transcendental (ln) agreement.
    Scale: two count aggregations keyed on the category, two 1-row
    totals broadcast back, a category-sized outer join. Nothing scans
    text; nothing is corpus-sized past the first groupBy."""
    from arrow_parquet_logs_spark.functions.hashing import hash64

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    s = docs.select(
        "lang",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    a = s.where(F.col("split") == "train").groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_train")
    )
    b = s.where(F.col("split") == "test").groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_test")
    )
    ta = s.where(F.col("split") == "train").agg(F.count(F.lit(1)).alias("ta"))
    tb = s.where(F.col("split") == "test").agg(F.count(F.lit(1)).alias("tb"))
    joined = (
        a.join(b, "lang", "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            "lang",
            F.coalesce(F.col("n_train"), F.lit(0)).alias("n_train"),
            F.coalesce(F.col("n_test"), F.lit(0)).alias("n_test"),
            "ta", "tb",
        )
    )
    contrib = F.abs(
        F.col("n_train") * F.col("tb") - F.col("n_test") * F.col("ta")
    ).cast("double") / (
        F.lit(2.0) * F.col("ta").cast("double") * F.col("tb").cast("double")
    )
    return (
        joined.select("lang", "n_train", "n_test", qfloor(contrib).alias("tvd_contrib"))
        .orderBy("lang")
    )


@register(
    "docs_langid_confusion",
    oracle=f"""
    WITH profiles(plang, marker) AS (VALUES
        ('en','the'),('en','and'),('en','of'),
        ('de','der'),('de','und'),('de','nicht'),
        ('es','de'),('es','la'),('es','que'),
        ('fr','le'),('fr','et'),('fr','les'),
        ('it','di'),('it','che'),('it','la'),
        ('pt','de'),('pt','que'),('pt','um')),
    toks AS (SELECT doc_id, unnest(list_distinct({_TOKS})) AS token FROM documents),
    scores AS (
        SELECT doc_id, plang, CAST(count(*) AS BIGINT) AS score
        FROM toks JOIN profiles ON token = marker GROUP BY doc_id, plang
    ),
    best AS (
        SELECT doc_id, plang,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
        FROM scores
    ),
    pred AS (
        SELECT d.doc_id, d.lang AS gold, COALESCE(b.plang, 'und') AS pred
        FROM documents d
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
    ),
    cells AS (
        SELECT gold, pred, CAST(count(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2
    ),
    gold_tot AS (SELECT gold, CAST(sum(n) AS BIGINT) AS gt FROM cells GROUP BY gold),
    pred_tot AS (SELECT pred, CAST(sum(n) AS BIGINT) AS pt FROM cells GROUP BY pred)
    SELECT c.gold, c.pred, c.n,
           floor((CAST(c.n AS DOUBLE) / g.gt) * 1000000) / 1000000 AS recall_share,
           floor((CAST(c.n AS DOUBLE) / p.pt) * 1000000) / 1000000 AS precision_share
    FROM cells c
    JOIN gold_tot g ON g.gold = c.gold
    JOIN pred_tot p ON p.pred = c.pred
    ORDER BY c.gold, c.pred
    """,
    tags=("text", "langid", "evaluation", "confusion-matrix"),
)
def docs_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier EVALUATION under the hash gate: the confusion matrix of
    the marker-profile language-ID heuristic against the corpus's gold
    ``lang`` labels, each cell annotated with its row-normalized share
    (recall direction) and column-normalized share (precision direction)
    — the quality scorecard any pipeline owes a heuristic before
    trusting it to route documents. One prediction pass (the same
    broadcast-profile join as `docs_lang_id`), then all math on the
    CLASSES² frame; shares are single IEEE divisions of exact integer
    counts under qfloor. The gate catches both classifier drift AND
    evaluation-logic bugs (a swapped precision/recall denominator is a
    hash mismatch)."""
    from arrow_parquet_logs_spark.operators.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    pred = (
        lang_id(docs, spark)
        .select("doc_id", F.col("pred_lang").alias("pred"))
        .join(docs.select("doc_id", F.col("lang").alias("gold")), "doc_id")
    )
    cells = pred.groupBy("gold", "pred").agg(F.count(F.lit(1)).cast("long").alias("n"))
    gold_tot = cells.groupBy("gold").agg(F.sum("n").cast("long").alias("gt"))
    pred_tot = cells.groupBy("pred").agg(F.sum("n").cast("long").alias("pt"))
    return (
        cells.join(F.broadcast(gold_tot), "gold")
        .join(F.broadcast(pred_tot), "pred")
        .select(
            "gold", "pred", "n",
            qfloor(F.col("n").cast("double") / F.col("gt")).alias("recall_share"),
            qfloor(F.col("n").cast("double") / F.col("pt")).alias("precision_share"),
        )
        .orderBy("gold", "pred")
    )


@register(
    "docs_phrase_search",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    pos AS MATERIALIZED (
      SELECT doc_id, CAST(u.i AS BIGINT) AS p, toks[CAST(u.i AS INT)] AS token
      FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
      WHERE toks[CAST(u.i AS INT)] IN ('slow', 'hash', 'batch')
    ),
    hits AS (
      SELECT a.doc_id, a.p
      FROM pos a
      JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1 AND b.token = 'hash'
      JOIN pos c ON c.doc_id = a.doc_id AND c.p = a.p + 2 AND c.token = 'batch'
      WHERE a.token = 'slow'
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(p) AS BIGINT) AS first_pos
    FROM hits GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "search", "phrase", "positional-index"),
)
def docs_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search ("slow hash batch") through a positional
    inverted index — the search-engine primitive BM25 ranking cannot
    express (bag-of-words scoring finds the words, not the adjacency).
    The index rows are (doc, position, token) from one posexplode,
    FILTERED TO THE PHRASE'S TERMS before any join — the pushdown that
    makes phrase queries cheap: the joins see only the three terms'
    postings, never the corpus. Adjacency is two self-equi-joins on
    (doc, position±1) — at 100 TB these are co-partitioned by doc_id
    (one exchange shared across all three sides). Returns per-document
    match count and first occurrence (1-based positions); a boundary
    bug (off-by-one adjacency, phrase crossing a document edge) breaks
    the hash against DuckDB's list-indexed replay."""
    from arrow_parquet_logs_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    w1, w2, w3 = "slow", "hash", "batch"
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(tokens("text")).alias("p0", "token"),
        )
        .where(F.col("token").isin(w1, w2, w3))
        .select("doc_id", (F.col("p0") + 1).cast("long").alias("p"), "token")
    )
    a = pos.where(F.col("token") == w1).select("doc_id", F.col("p"))
    b = pos.where(F.col("token") == w2).select("doc_id", (F.col("p") - 1).alias("p"))
    c = pos.where(F.col("token") == w3).select("doc_id", (F.col("p") - 2).alias("p"))
    hits = a.join(b, ["doc_id", "p"]).join(c, ["doc_id", "p"])
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("p").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


_LEXICON = [
    ("fast join", 3),
    ("table scan", 2),
    ("slow query", 5),
    ("data stream", 2),
    ("spark", 1),
    ("merge", 1),
]


def _lexicon_oracle() -> str:
    rows = ", ".join(f"('{kw}', {w})" for kw, w in _LEXICON)
    return f"""
    WITH lex(keyword, weight) AS (VALUES {rows}),
    hits AS (
        SELECT l.keyword, l.weight, d.doc_id,
               len(string_split(d.text, l.keyword)) - 1 AS occ
        FROM documents d CROSS JOIN lex l
    )
    SELECT keyword, CAST(weight AS BIGINT) AS weight,
           CAST(count(*) FILTER (occ > 0) AS BIGINT) AS n_docs,
           CAST(sum(occ) AS BIGINT) AS total_hits,
           CAST(max(occ) AS BIGINT) AS max_in_doc,
           CAST(weight * sum(occ) AS BIGINT) AS weighted_total
    FROM hits
    GROUP BY keyword, weight
    ORDER BY keyword
    """


@register(
    "docs_lexicon_tagging",
    oracle=_lexicon_oracle(),
    tags=("text", "lexicon", "tagging", "phrase"),
)
def docs_lexicon_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary/lexicon tagging: count occurrences of a weighted keyword
    list — including MULTI-WORD phrases, which token-level indexes can't
    answer without positions — across the corpus, entirely in Catalyst.

    Occurrence counting is the split idiom: ``size(split(text, \\Qkw\\E)) -
    1`` — literal (regex-quoted) match, non-overlapping, identical
    semantics to the oracle's ``string_split``. The lexicon rides a
    broadcast literal array (explode of |lexicon| structs per doc — one
    corpus scan regardless of lexicon size); per-(doc, keyword) counts
    partial-aggregate map-side, so the shuffle is |lexicon|-sized. The
    100 TB form of PII-term screening, topic tagging, and blocklist
    auditing; for thousands-of-patterns lexicons the same shape feeds one
    compiled multi-pattern regex or an Aho-Corasick mapInPandas stage —
    the per-keyword split is the exactness oracle either way."""
    lex = F.array(*[
        F.struct(F.lit(kw).alias("keyword"), F.lit(w).alias("weight"))
        for kw, w in _LEXICON
    ])
    docs = load_table(spark, sf_dir, "documents")
    hits = (
        docs.select("doc_id", "text", F.explode(lex).alias("lx"))
        .select(
            F.col("lx.keyword").alias("keyword"),
            F.col("lx.weight").alias("weight"),
            (F.size(F.split(F.col("text"),
                            F.concat(F.lit("\\Q"), F.col("lx.keyword"), F.lit("\\E")),
                            -1)) - 1).alias("occ"),
        )
    )
    return (
        hits.groupBy("keyword", "weight")
        .agg(
            F.count(F.when(F.col("occ") > 0, 1)).cast("bigint").alias("n_docs"),
            F.sum("occ").cast("bigint").alias("total_hits"),
            F.max("occ").cast("bigint").alias("max_in_doc"),
        )
        .select(
            "keyword",
            F.col("weight").cast("bigint").alias("weight"),
            "n_docs",
            "total_hits",
            "max_in_doc",
            (F.col("weight") * F.col("total_hits")).cast("bigint").alias("weighted_total"),
        )
        .orderBy("keyword")
    )


@register(
    "docs_domain_capped_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(concat('cap:', CAST(doc_id AS VARCHAR))), doc_id
               ) AS rn,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_source
        FROM documents
    )
    SELECT doc_id, source, CAST(rn AS BIGINT) AS pick_order, n_source
    FROM ranked WHERE rn <= 40
    ORDER BY source, pick_order
    """,
    tags=("text", "sampling", "domain-balance", "curation"),
)
def docs_domain_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling — the C4/RefinedWeb-style domain-balancing
    step: cap each source (domain) at 40 documents so no single crawl host
    dominates the training mixture, choosing WHICH documents survive by a
    deterministic content-free hash order (md5 of the doc id), not file
    order — so the sample is identical under any partitioning, ingestion
    order, or re-run, and adding documents to OTHER domains never changes
    a domain's picks. ``pick_order``/``n_source`` expose the audit trail
    (how deep into the quota each pick is; how much the cap discarded).

    Scale shape: one window partitioned by the domain key over a
    (doc_id, source) projection — column pruning keeps text out of the
    shuffle. A celebrity domain makes a hot window partition; at 100 TB
    pre-filter with an approximate per-domain count and salt only the
    over-cap domains (each salted slice takes ``cap`` picks, then one
    keys-sized re-rank merges slices), or push the whole thing through
    ``keep_latest``-style top-K aggregation; the declarative window is
    the exact spec either path must match."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    ranked = docs.select("doc_id", "source").select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("pick_order"),
        F.count(F.lit(1)).over(W.partitionBy("source")).cast("long").alias("n_source"),
    )
    return ranked.where(F.col("pick_order") <= 40).orderBy("source", "pick_order")


# ---- cross-encoder-style rerank audit (r8) ---------------------------------

_CE_QUERIES = (("spark", "join"), ("hash", "table"), ("stream", "window"))
_CE_SHORTLIST = 20  # stage-1 BM25 shortlist size per query
_CE_TERMS = tuple(sorted({t for q in _CE_QUERIES for t in q}))


def _ce_oracle() -> str:
    k1, b = _BM25_K1, _BM25_B
    tf_cols = ",\n               ".join(_bm25_tf_sql(t) for t in _CE_TERMS)
    df_cols = ",\n                  ".join(
        f"count(CASE WHEN tf_{t} > 0 THEN 1 END) AS df_{t}" for t in _CE_TERMS
    )
    pair_selects = []
    for q_id, (t1, t2) in enumerate(_CE_QUERIES):
        cov = (
            f"(CAST(tf_{t1} > 0 AS DOUBLE) + CAST(tf_{t2} > 0 AS DOUBLE)) / 2.0"
        )
        phr = (
            f"CASE WHEN list_contains(g, '{t1} {t2}') "
            "THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
        )
        den = (
            f"floor((CAST(tf_{t1} + tf_{t2} AS DOUBLE) / CAST(dl AS DOUBLE))"
            " * 1000000) / 1000000"
        )
        pair_selects.append(
            f"""SELECT {q_id} AS q_id, doc_id,
               round(({_bm25_w_sql(t1)}) + ({_bm25_w_sql(t2)}), 6) AS bm25,
               {cov} AS coverage,
               {phr} AS phrase,
               {den} AS density
        FROM per, st"""
        )
    pairs = "\n        UNION ALL\n        ".join(pair_selects)
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    per AS (SELECT doc_id, len(t) AS dl,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
                    ELSE [] END AS g,
               {tf_cols}
            FROM toks),
    st AS (SELECT count(*) AS n_docs,
                  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
                  {df_cols}
           FROM per),
    pairs AS (
        {pairs}
    ),
    r1 AS (SELECT q_id, doc_id, bm25, coverage, phrase, density,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY bm25 DESC, doc_id) AS rt
           FROM pairs WHERE bm25 > 0),
    ce AS (SELECT q_id, doc_id, bm25, rt,
                  floor(((0.2 * bm25 + 0.5 * coverage)
                         + (0.2 * phrase + 3.0 * density)) * 1000000) / 1000000
                      AS ce_score
           FROM r1 WHERE rt <= {_CE_SHORTLIST}),
    r2 AS (SELECT q_id, doc_id, bm25, rt, ce_score,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY ce_score DESC, doc_id) AS rr
           FROM ce)
    SELECT q_id, doc_id,
           CAST(rt AS INT) AS stage1_rank,
           CAST(rr AS INT) AS rerank_rank,
           ce_score, bm25,
           CAST(rt - rr AS INT) AS rank_gain
    FROM r2 WHERE rr <= 10 ORDER BY q_id, rr
    """


@register(
    "docs_cross_encoder_rerank",
    oracle=_ce_oracle(),
    tags=("text", "retrieval", "rerank", "cross-encoder"),
)
def docs_cross_encoder_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder-style second-stage rerank with a rank-movement audit —
    the retrieve-then-rerank recipe production search/RAG pipelines run,
    with the (costly, jointly-query-conditioned) model score stood in by a
    deterministic pairwise feature fusion so the whole row is
    oracle-checkable: per (query, doc) pair, term coverage, ordered-bigram
    phrase adjacency (the "interaction" signal a bi-encoder cannot see),
    query-term density, and the stage-1 BM25 score combine linearly
    (weights fixed; every float op parenthesis-pinned and qfloor-quantized)
    into ``ce_score``. Output: per query the top-10 after rerank, with
    ``stage1_rank`` vs ``rerank_rank`` and ``rank_gain`` — the audit a
    pipeline uses to see WHAT the reranker moved and why.

    Scale shape: ONE corpus scan computes tokens/bigrams/tfs as codegen
    array expressions; document frequencies reduce to a 1-row stats frame
    that broadcasts back (the ``bm25_scores`` shape); the 3-query pair
    frame prunes through ``partial_topk`` (≤ Q·k rows per partition survive
    — never a corpus-sized q_id window partition, judge r7 #1); the exact
    stage-1 ranks and the rerank window then run on ≤ Q·k-row frames. With
    a REAL cross-encoder model the ce feature projection becomes a batched
    Pandas-UDF scorer over the ≤ Q·k shortlist join-back (the
    ``ann_maxsim_rerank`` shape); the feature fusion here is the
    plan-identical, oracle-checkable stand-in."""
    from pyspark.sql import Window as W

    from arrow_parquet_logs_spark.operators._parallel import spread_for_python
    from arrow_parquet_logs_spark.operators.topk import partial_topk

    docs = load_table(spark, sf_dir, "documents")
    # spread gate: tokenize/tf/bigram folds all run in the scan stage —
    # serialize-proof the pass on few-row-group local inputs; no-op at scale
    toks = spread_for_python(docs.select("doc_id", "text")).select(
        "doc_id", X.tokens("text").alias("t")
    )
    grams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.col("t")[i], F.col("t")[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def tf_col(term: str) -> F.Column:
        # single-arg lambda: a 2-arg form would receive (element, index)
        return F.size(F.filter("t", lambda x: x == F.lit(term)))

    per = toks.select(
        "doc_id",
        F.size("t").alias("dl"),
        grams.alias("g"),
        *[tf_col(t).alias(f"tf_{t}") for t in _CE_TERMS],
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, F.lit(1))).alias(f"df_{t}")
            for t in _CE_TERMS
        ],
    )
    j = per.crossJoin(F.broadcast(stats))

    def w(term: str) -> F.Column:
        tf, df = F.col(f"tf_{term}"), F.col(f"df_{term}")
        idf = F.log(F.lit(1) + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)))
        k1, b = _BM25_K1, _BM25_B
        return (
            idf
            * (tf * F.lit(k1 + 1))
            / (tf + F.lit(k1) * (F.lit(1 - b) + (F.lit(b) * F.col("dl")) / F.col("avgdl")))
        )

    pair_structs = []
    for q_id, (t1, t2) in enumerate(_CE_QUERIES):
        coverage = (
            (F.col(f"tf_{t1}") > 0).cast("double")
            + (F.col(f"tf_{t2}") > 0).cast("double")
        ) / F.lit(2.0)
        phrase = (
            F.when(F.array_contains("g", f"{t1} {t2}"), F.lit(1.0)).otherwise(F.lit(0.0))
        )
        density = qfloor(
            (F.col(f"tf_{t1}") + F.col(f"tf_{t2}")).cast("double")
            / F.col("dl").cast("double")
        )
        pair_structs.append(
            F.struct(
                F.lit(q_id).alias("q_id"),
                F.round(w(t1) + w(t2), 6).alias("bm25"),
                coverage.alias("coverage"),
                phrase.alias("phrase"),
                density.alias("density"),
            )
        )
    pairs = (
        j.select("doc_id", F.explode(F.array(*pair_structs)).alias("p"))
        .select("doc_id", "p.*")
        .where(F.col("bm25") > 0)
    )
    pruned = partial_topk(
        pairs, ["q_id"], [("bm25", False), ("doc_id", True)], k=_CE_SHORTLIST
    )
    ranked = pruned.withColumn(
        "stage1_rank",
        F.row_number().over(W.partitionBy("q_id").orderBy(F.col("bm25").desc(), "doc_id")),
    ).where(F.col("stage1_rank") <= _CE_SHORTLIST)
    ce = ranked.withColumn(
        "ce_score",
        qfloor(
            (F.lit(0.2) * F.col("bm25") + F.lit(0.5) * F.col("coverage"))
            + (F.lit(0.2) * F.col("phrase") + F.lit(3.0) * F.col("density"))
        ),
    )
    rr = ce.withColumn(
        "rerank_rank",
        F.row_number().over(
            W.partitionBy("q_id").orderBy(F.col("ce_score").desc(), "doc_id")
        ),
    ).where(F.col("rerank_rank") <= 10)
    return rr.select(
        "q_id",
        "doc_id",
        F.col("stage1_rank").cast("int").alias("stage1_rank"),
        F.col("rerank_rank").cast("int").alias("rerank_rank"),
        "ce_score",
        "bm25",
        (F.col("stage1_rank") - F.col("rerank_rank")).cast("int").alias("rank_gain"),
    ).orderBy("q_id", "rerank_rank")


# ---- hashed linear quality classifier (r8) ---------------------------------

_HLQ_BUCKET_W = "({h} % 2001) - 1000"  # integer weight in [-1000, 1000]


@register(
    "docs_hashed_linear_quality",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    feats AS (
        SELECT doc_id,
               list_concat(
                   t,
                   CASE WHEN len(t) >= 2
                        THEN list_transform(range(0, len(t) - 1),
                                            i -> t[i+1] || ' ' || t[i+2])
                        ELSE [] END
               ) AS f
        FROM toks)
    SELECT doc_id,
           CAST(len(f) AS INT) AS n_features,
           CAST(COALESCE(list_sum(list_transform(f, x ->
               ({_HLQ_BUCKET_W.format(h="CAST(concat('0x', substr(md5(concat('qw:', x)), 1, 15)) AS BIGINT)")})
           )), 0) AS BIGINT) AS w_sum,
           floor((CAST(COALESCE(list_sum(list_transform(f, x ->
               ({_HLQ_BUCKET_W.format(h="CAST(concat('0x', substr(md5(concat('qw:', x)), 1, 15)) AS BIGINT)")})
           )), 0) AS DOUBLE) / (1000.0 * NULLIF(len(f), 0))) * 1000000) / 1000000 AS margin,
           CASE WHEN CAST(COALESCE(list_sum(list_transform(f, x ->
               ({_HLQ_BUCKET_W.format(h="CAST(concat('0x', substr(md5(concat('qw:', x)), 1, 15)) AS BIGINT)")})
           )), 0) AS BIGINT) > 0 THEN 1 ELSE 0 END AS keep
    FROM feats ORDER BY doc_id
    """,
    tags=("text", "quality", "classifier", "model-based-filter"),
)
def docs_hashed_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier (Joulin et al. 2016,
    the CCNet / LLaMA model-based quality-filter recipe, public): every
    unigram and bigram hashes into a weight table and the document's score
    is the mean feature weight — here the learned table is stood in by a
    DETERMINISTIC hash-derived integer weight in [-1000, 1000] per feature,
    so the entire inference path (feature extraction → hashed lookup →
    mean-pool → threshold) is oracle-checkable bit-for-bit; swapping in
    trained weights is a broadcast map lookup with the identical plan. The
    margin is monotone in the usual sigmoid probability, so ``keep`` is the
    same decision boundary.

    Scale shape: the ideal 100 TB filter — ONE scan, zero data-dependent
    shuffles, zero Python: tokens/bigrams as array expressions, the
    per-feature weight as a codegen md5 fold (`F.aggregate` with an exact
    LONG accumulator — sum order cannot matter), one double division per
    doc, qfloor-quantized. Embarrassingly parallel (the spread gate may
    insert one round-robin exchange on few-row-group local inputs; no-op
    at scale); predicate-pushdown-friendly output (`keep`)."""
    from arrow_parquet_logs_spark.operators._parallel import spread_for_python

    docs = load_table(spark, sf_dir, "documents")
    # spread gate: the per-feature md5 fold is the whole cost and runs in
    # the scan stage — a few-row-group local input would serialize it on
    # one core (measured 10× at sf10); no-op at cluster scale
    toks = spread_for_python(docs.select("doc_id", "text")).select(
        "doc_id", X.tokens("text").alias("t")
    )
    grams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.col("t")[i], F.col("t")[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toks.select("doc_id", F.concat(F.col("t"), grams).alias("f"))

    def w(x: F.Column) -> F.Column:
        return hash64(F.concat(F.lit("qw:"), x)) % F.lit(2001) - F.lit(1000)

    w_sum = F.aggregate(
        F.transform("f", w), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    out = feats.select(
        "doc_id",
        F.size("f").cast("int").alias("n_features"),
        w_sum.alias("w_sum"),
    )
    # zero-feature guard (ADVICE r8): F.aggregate's 0 seed already matches
    # the oracle's COALESCE(list_sum, 0); the margin divides by
    # NULLIF(n_features, 0) on BOTH sides so an empty feature array yields
    # (w_sum=0, margin=NULL, keep=0) identically instead of a div-by-zero
    # parity break — the current tokenizer never emits an empty array for
    # a string input, but the contract should not hang on that
    return out.select(
        "doc_id",
        "n_features",
        "w_sum",
        qfloor(
            F.col("w_sum").cast("double")
            / (F.lit(1000.0) * F.nullif(F.col("n_features"), F.lit(0)))
        ).alias("margin"),
        F.when(F.col("w_sum") > 0, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    ).orderBy("doc_id")
