"""Deduplication operators for LLM training-data pipelines (SURVEY §2.11).

Four escalating strategies over ``documents``:

- exact: content-hash groupBy — one shuffle on a 64-hex key; trivially
  scales (the hash is the shuffle key, so data skew == duplicate skew).
- n-gram Jaccard: exact set similarity on 3-gram shingles, evaluated on
  consecutive-id pairs (O(n) joins — the oracle-checkable form of the
  pairwise verifier LSH uses).
- SimHash: 60-bit locality-sensitive signature per doc from token hashes;
  hamming distance on candidate pairs. Pure column algebra, no UDFs.
- MinHash + LSH banding: the real at-scale near-dup pipeline — shingle ->
  H minhashes -> B bands -> bucket-join -> verify candidates with true
  Jaccard. Only candidate pairs (same band bucket) are ever compared, so
  cost is O(n + candidate pairs), never O(n^2).

Oracle-checked operators use md5-derived hashes (bit-identical in DuckDB);
the LSH index uses crc32 (deterministic, C-speed in the Arrow batch path).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_iceberg_spark.io import load_table
from tutorial_iceberg_spark.registry import register


def words(col: str = "text") -> Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def shingles(col: str = "text", n: int = 3) -> Column:
    """Distinct n-gram word shingles (DuckDB mirror: list_distinct over
    array_to_string(w[i:i+n-1])).

    Docs with < n words produce an EMPTY array. The guard matters: Spark's
    ``sequence(1, 0)`` is the DESCENDING [1, 0] (not empty like DuckDB's
    generate_series), and slice(w, 0, n) then errors at runtime."""
    w = words(col)
    return F.when(
        F.size(w) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def hash64(col: Column, salt: str = "") -> Column:
    """60-bit deterministic hash (first 15 hex of md5), cross-engine."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10).cast(
        "bigint"
    )


@register(
    "x_dedup_exact",
    oracle="""
        SELECT sha256(text) AS content_hash,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS copies
        FROM documents
        GROUP BY 1
        ORDER BY content_hash
    """,
    doc="Exact dedup: content-hash groupBy, keep lowest doc_id per group",
    tags=("dedup", "extension"),
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("copies"))
        .orderBy("content_hash")
    )


@register(
    "x_dedup_ngram_jaccard",
    oracle=r"""
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 2, 0)),
                       i -> array_to_string(w[i:i+2], ' '))) AS s
            FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                  FROM documents)
        )
        SELECT a.doc_id AS left_id,
               b.doc_id AS right_id,
               (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s)))) AS jaccard,
               CASE WHEN (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s)))) >= 0.8
                    THEN 1 ELSE 0 END AS is_near_dup
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        ORDER BY left_id
    """,
    doc="3-gram shingle Jaccard similarity on consecutive-id pairs (the "
    "oracle-checkable pairwise verifier; LSH below restricts which pairs "
    "get this treatment at scale)",
    tags=("dedup", "extension"),
)
def x_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_part = spark.sparkContext.defaultParallelism
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(n_part, F.col("doc_id"))
        .select("doc_id", shingles().alias("s"))
    )
    a = docs.alias("a")
    b = docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    jac = inter.cast("double") / union
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("left_id"),
            F.col("b.doc_id").alias("right_id"),
            jac.alias("jaccard"),
            F.when(jac >= 0.8, 1).otherwise(0).alias("is_near_dup"),
        )
        .orderBy("left_id")
    )


def simhash_frame(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit signed-bit-vote signature from token
    hashes — pure column algebra (explode -> bit votes -> reassemble)."""
    # repartition before the token-explode fan-out (see minhash_signatures)
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    tok = docs.repartition(n_part, F.col("doc_id")).select(
        "doc_id", F.explode(F.array_distinct(words())).alias("token")
    )
    th = tok.select("doc_id", hash64(F.col("token")).alias("h"))
    pos = spark.range(0, 60).select(F.col("id").cast("int").alias("pos"))
    bits = (
        th.crossJoin(F.broadcast(pos))
        .groupBy("doc_id", "pos")
        .agg(
            F.sum(
                F.when(F.expr("shiftright(h, pos)").bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias("s")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), pos)")).otherwise(0)
        ).alias("simhash")
    )


@register(
    "x_dedup_simhash",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
            FROM documents
        ), th AS (
            SELECT doc_id, CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS h
            FROM tok
        ), bits AS (
            SELECT doc_id, p.pos,
                   SUM(CASE WHEN (h >> p.pos) & 1 = 1 THEN 1 ELSE -1 END) AS s
            FROM th, (SELECT unnest(generate_series(0, 59)) AS pos) p
            GROUP BY doc_id, p.pos
        ), sh AS (
            SELECT doc_id,
                   SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS simhash
            FROM bits GROUP BY doc_id
        )
        SELECT a.doc_id AS left_id, b.doc_id AS right_id,
               bit_count(xor(a.simhash, b.simhash)) AS hamming,
               CASE WHEN bit_count(xor(a.simhash, b.simhash)) <= 12
                    THEN 1 ELSE 0 END AS is_near_dup
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        ORDER BY left_id
    """,
    doc="SimHash near-dup: 60-bit signed-bit-vote signature from token "
    "hashes; hamming distance on consecutive pairs. Pure column algebra "
    "(explode -> bit votes -> reassemble), no UDF",
    tags=("dedup", "extension"),
)
def x_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = simhash_frame(spark, docs)
    a, b = sh.alias("a"), sh.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("left_id"),
            F.col("b.doc_id").alias("right_id"),
            hamming.alias("hamming"),
            F.when(hamming <= 12, 1).otherwise(0).alias("is_near_dup"),
        )
        .orderBy("left_id")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH: the scale path. H minhash functions banded into B bands of
# R rows; docs sharing any band bucket become candidates; candidates are
# verified with true Jaccard. Not SQL-oracle-expressible in one statement
# -> rows-only driver check + invariant pytest (LSH candidates must be a
# superset of high-Jaccard consecutive pairs, see tests).
# ---------------------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4  # R = 4 rows per band

# Universal-hash permutation family over a Mersenne prime: each shingle is
# string-hashed ONCE (crc32), then the N_HASHES minhash functions are
# h_i(x) = (a_i*x + b_i) mod P — integer multiply-adds, not repeated string
# hashing. Constants are fixed (seeded) for run-to-run determinism.
_P = 2_147_483_647  # 2^31 - 1; (P-1)*a + b < 2^62, no bigint overflow
import random as _random

_rng = _random.Random(42)
_A = [_rng.randrange(1, _P) for _ in range(N_HASHES)]
_B = [_rng.randrange(0, _P) for _ in range(N_HASHES)]


def _index_batches(batches):
    """Arrow-vectorized shingle index: (doc_id, text) -> (doc_id, hs, sig).

    Why mapInPandas and not column algebra: the per-row column form
    (transform(shingles(), hash) + 16 array_min(transform(...)) folds)
    is correct but runs INTERPRETED — Spark's higher-order functions
    don't participate in whole-stage codegen, and nesting them costs a
    boxed lambda eval per element (~4M evals at sf0.1, measured ~2.8s
    steady-state). The Arrow path moves the same math into one numpy
    batch: crc32 per distinct shingle (zlib, C speed), then ALL 16
    permutations as one (16, total_shingles) vectorized multiply-add-mod
    with np.minimum.reduceat folding per-doc minima. Embarrassingly
    parallel, no shuffle, scales linearly with corpus bytes."""
    import zlib

    import numpy as np
    import pandas as pd

    a = np.array(_A, dtype=np.int64)[:, None]
    b = np.array(_B, dtype=np.int64)[:, None]
    for pdf in batches:
        hs_out: list = []
        chunks: list = []
        lens: list = []
        for t in pdf["text"]:
            w = (t or "").split()
            sh = {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 0))}
            if sh:
                h = np.unique(
                    np.fromiter(
                        (zlib.crc32(s.encode("utf-8")) % _P for s in sh),
                        dtype=np.int64,
                        count=len(sh),
                    )
                )
            else:
                h = np.empty(0, dtype=np.int64)
            hs_out.append(h)
            if len(h):
                chunks.append(h)
                lens.append(len(h))
        sigs: list = [None] * len(hs_out)
        if chunks:
            all_h = np.concatenate(chunks)
            # h < 2^31 and a < 2^31 so a*h + b < 2^62: no int64 overflow.
            perms = (a * all_h[None, :] + b) % _P
            offsets = np.zeros(len(chunks), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            mins = np.minimum.reduceat(perms, offsets, axis=1)
            k = 0
            for i, h in enumerate(hs_out):
                if len(h):
                    sigs[i] = mins[:, k]
                    k += 1
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "hs": hs_out, "sig": sigs}
        )


def doc_index(docs: DataFrame) -> DataFrame:
    """(doc_id, hs, sig): the per-doc dedup index — distinct 31-bit
    shingle hashes plus the 16-slot minhash signature, one Arrow batch
    pass, zero shuffle. Docs too short to produce a shingle are dropped:
    they cannot near-duplicate anything through a shingle index (and an
    empty-key band bucket would otherwise pair ALL of them
    quadratically). Round-robin repartition first spreads the per-row
    work when the input is a handful of file splits."""
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.repartition(n_part)
        .select("doc_id", "text")
        .mapInPandas(
            _index_batches, "doc_id bigint, hs array<bigint>, sig array<bigint>"
        )
        .filter(F.size("hs") > 0)
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id -> array<bigint> of N_HASHES minhash values."""
    return doc_index(docs).select("doc_id", "sig")


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band the signatures and self-join per bucket: only docs agreeing on
    a full band ever meet. Output: distinct (left_id < right_id) pairs."""
    r = N_HASHES // N_BANDS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(",", *[F.col("sig")[bi * r + j].cast("string") for j in range(r)]).alias("key"),
                    )
                    for bi in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("left_id"), F.col("b.doc_id").alias("right_id"))
        .distinct()
    )


@register(
    "x_dedup_minhash_lsh",
    oracle=None,  # multi-stage LSH pipeline: rows-only driver check
    doc="MinHash(16)+LSH(4 bands): shingle -> signature -> band buckets -> "
    "candidate pairs -> true-Jaccard verification >= 0.5. O(n + candidates), "
    "the 100 TB near-dup path; verified against exact Jaccard in pytest",
    tags=("dedup", "extension", "lsh"),
)
def x_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # ONE Arrow batch pass computes everything: the hashed-shingle set
    # (for verification) and the 16 minhashes derived from it — no
    # explode, no aggregation, no shuffle before the banding join.
    # Jaccard over 31-bit hashed shingles equals string Jaccard up to
    # hash collisions — and bigint arrays intersect far cheaper than the
    # original string shingles.
    # The signature+set table is consumed twice (banding, verification).
    # Persist it rather than re-tokenize the corpus: it is the INDEX (one
    # row per doc: 16 ints + the hash set), orders of magnitude smaller
    # than the corpus text; MEMORY_AND_DISK spills gracefully — at extreme
    # scale you would materialize it to a temp parquet instead, which is
    # the same trade expressed durably.
    from pyspark import StorageLevel

    agg = (
        doc_index(docs)
        .withColumnRenamed("hs", "hset")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sig = agg.select("doc_id", "sig")
    cand = lsh_candidate_pairs(sig)
    sets = agg.select("doc_id", "hset")
    # Verification: plain shuffle equi-joins, NO forced broadcasts. The
    # candidate-pair table is only "small" when banding parameters are
    # well-tuned — exactly when a hard broadcast hint is least needed —
    # and each side-lookup intermediate carries the full per-doc shingle
    # array, a multi-GB build side at 100 TB. Shuffling on (doc_id) and
    # then (left_id, right_id) keys partitions both sides evenly; AQE
    # still converts any join to broadcast at runtime if a side turns
    # out to actually be small.
    ls_tab = sets.join(cand, sets.doc_id == F.col("left_id")).select(
        "left_id", "right_id", F.col("hset").alias("ls")
    )
    rs_tab = sets.join(cand, sets.doc_id == F.col("right_id")).select(
        "left_id", "right_id", F.col("hset").alias("rs")
    )
    pairs = ls_tab.join(rs_tab, ["left_id", "right_id"])
    jac = (
        F.size(F.array_intersect(F.col("ls"), F.col("rs"))).cast("double")
        / F.size(F.array_union(F.col("ls"), F.col("rs")))
    )
    return (
        pairs.select("left_id", "right_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("left_id", "right_id")
    )


_CONSTS_SQL = ", ".join(f"({i}, {_A[i]}, {_B[i]})" for i in range(N_HASHES))


def _md5_doc_index(docs: DataFrame) -> DataFrame:
    """md5-hash-family variant of doc_index: identical minhash math, but
    every hash is the cross-engine ``hash64`` idiom (md5 15-hex prefix)
    so a DuckDB oracle can replicate it value-for-value. Column algebra
    (interpreted higher-order functions), so this is the DIFFERENTIAL
    form — doc_index's Arrow/crc32 pass stays the registered scale op."""
    hs = F.array_distinct(
        F.transform(shingles("text", 3), lambda s: hash64(s) % _P)
    )
    def _perm(i: int):
        # closure, NOT a two-arg lambda: transform() passes the element
        # index as a second Column argument when the lambda takes two
        return lambda x: (F.lit(_A[i]) * x + F.lit(_B[i])) % _P

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("hs"), _perm(i)))
            for i in range(N_HASHES)
        ]
    )
    return (
        docs.select("doc_id", hs.alias("hs"))
        .filter(F.size("hs") > 0)
        .select("doc_id", "hs", sig.alias("sig"))
    )


@register(
    "x_dedup_minhash_md5",
    oracle=rf"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ), sh AS (
            SELECT doc_id, list_distinct(list_transform(
                generate_series(1, greatest(len(w) - 2, 0)),
                i -> array_to_string(w[i:i+2], ' '))) AS sh
            FROM tok
        ), hh AS (
            SELECT doc_id, list_distinct(list_transform(sh,
                s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
                     % {_P})) AS hs
            FROM sh WHERE len(sh) > 0
        ), ex AS (
            SELECT doc_id, unnest(hs) AS x FROM hh
        ), consts(i, a, b) AS (
            SELECT * FROM (VALUES {_CONSTS_SQL}) v
        ), m AS (
            SELECT ex.doc_id, c.i, MIN((c.a * ex.x + c.b) % {_P}) AS m
            FROM ex CROSS JOIN consts c GROUP BY ex.doc_id, c.i
        ), bsig AS (
            SELECT doc_id, i // {N_HASHES // N_BANDS} AS band,
                   string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS key
            FROM m GROUP BY 1, 2
        ), cand AS (
            SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
            FROM bsig a JOIN bsig b
              ON a.band = b.band AND a.key = b.key
             AND a.doc_id < b.doc_id
        ), v AS (
            SELECT c.left_id, c.right_id,
                   CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
                       / len(list_distinct(ha.hs || hb.hs)) AS jaccard
            FROM cand c
            JOIN hh ha ON ha.doc_id = c.left_id
            JOIN hh hb ON hb.doc_id = c.right_id
        )
        SELECT left_id, right_id, jaccard FROM v WHERE jaccard >= 0.5
        ORDER BY left_id, right_id
    """,
    doc="MinHash+LSH with the FULL pipeline value-hash-oracled — the "
    "cross-engine differential check the crc32 scale op "
    "(x_dedup_minhash_lsh) cannot have, because DuckDB lacks crc32: "
    "every shingle hashes through the md5-prefix hash64 idiom, the same "
    f"{N_HASHES} fixed universal-hash permutations run on both engines, "
    "band keys / bucket self-join / distinct candidates / hashed-shingle "
    "Jaccard verify all replicate in the oracle SQL, and the final "
    "(pair, jaccard) set must hash-match bit-for-bit. Same banding and "
    "verify code path as the scale op (lsh_candidate_pairs reused); "
    "only the shingle hash family differs. Column-algebra index "
    "(interpreted HOFs) — deliberately NOT the bench path",
    tags=("dedup", "text", "extension"),
)
def x_dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    agg = _md5_doc_index(docs)
    cand = lsh_candidate_pairs(agg.select("doc_id", "sig"))
    sets = agg.select("doc_id", "hs")
    ls_tab = sets.join(cand, sets.doc_id == F.col("left_id")).select(
        "left_id", "right_id", F.col("hs").alias("ls")
    )
    rs_tab = sets.join(cand, sets.doc_id == F.col("right_id")).select(
        "left_id", "right_id", F.col("hs").alias("rs")
    )
    pairs = ls_tab.join(rs_tab, ["left_id", "right_id"])
    jac = (
        F.size(F.array_intersect(F.col("ls"), F.col("rs"))).cast("double")
        / F.size(F.array_union(F.col("ls"), F.col("rs")))
    )
    return (
        pairs.select("left_id", "right_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("left_id", "right_id")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: semantic dedup over the embeddings table.
# Same float64 fold as functions/vector.py, so scores hash-match DuckDB.
# ---------------------------------------------------------------------------


@register(
    "x_dedup_embed_cosine",
    oracle="""
        WITH n AS (
            SELECT vec_id, embedding,
                   sqrt(list_aggregate(list_transform(list_zip(embedding, embedding),
                        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')) AS nrm
            FROM embeddings
        )
        SELECT a.vec_id AS left_id,
               b.vec_id AS right_id,
               list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                   z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
                 / (a.nrm * b.nrm) AS cosine,
               CASE WHEN list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
                      / (a.nrm * b.nrm) >= 0.9
                    THEN 1 ELSE 0 END AS is_near_dup
        FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
        ORDER BY left_id
    """,
    doc="Embedding-cosine near-dup on consecutive-id pairs: the semantic "
    "dedup verifier (bit-exact float64 cosine; at scale the IVF/LSH index in "
    "functions/vector.py supplies the candidate pairs instead of id-adjacency)",
    tags=("dedup", "vector", "extension"),
)
def x_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tutorial_iceberg_spark.functions.vector import dot, norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a, b = emb.alias("a"), emb.alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("left_id"),
            F.col("b.vec_id").alias("right_id"),
            cos.alias("cosine"),
            F.when(cos >= 0.9, 1).otherwise(0).alias("is_near_dup"),
        )
        .orderBy("left_id")
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new-batch-vs-existing-corpus via a df-capped
# shingle posting-list join — the continuous-crawl ingestion gate.
# ---------------------------------------------------------------------------

BATCH_MOD = 5  # demo split: doc_id % 5 == 0 is the "incoming" batch
SHINGLE_DF_CAP = 50  # drop shingles present in more docs than this


INCREMENTAL_DEDUP_ORACLE = rf"""
        WITH sh AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 2, 0)),
                       i -> array_to_string(w[i:i+2], ' ')))) AS s
            FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                  FROM documents)
        ),
        capped AS (
            SELECT doc_id, s FROM sh
            QUALIFY COUNT(*) OVER (PARTITION BY s) <= {SHINGLE_DF_CAP}
        ),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
        pairs AS (
            SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, COUNT(*) AS i
            FROM capped b JOIN capped c ON b.s = c.s
            WHERE b.doc_id % {BATCH_MOD} = 0 AND c.doc_id % {BATCH_MOD} <> 0
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT pairs.batch_id,
                   (CAST(pairs.i AS DOUBLE)
                     / (sb.n + sc.n - pairs.i)) AS jaccard
            FROM pairs
            JOIN sz sb ON sb.doc_id = pairs.batch_id
            JOIN sz sc ON sc.doc_id = pairs.corpus_id
        ),
        summary AS (
            SELECT batch_id, COUNT(*) AS n_candidates,
                   MAX(jaccard) AS best_jaccard
            FROM scored GROUP BY batch_id
        )
        SELECT d.doc_id AS batch_id,
               COALESCE(summary.n_candidates, 0) AS n_candidates,
               COALESCE(summary.best_jaccard, 0.0) AS best_jaccard,
               CASE WHEN COALESCE(summary.best_jaccard, 0.0) >= 0.5
                    THEN 1 ELSE 0 END AS is_dup
        FROM documents d
        LEFT JOIN summary ON summary.batch_id = d.doc_id
        WHERE d.doc_id % {BATCH_MOD} = 0
        ORDER BY batch_id
    """


@register(
    "x_dedup_incremental",
    oracle=INCREMENTAL_DEDUP_ORACLE,
    doc="Incremental dedup (continuous-crawl ingestion gate): score each "
    "INCOMING document against the EXISTING corpus only — the asymmetric "
    "form production pipelines actually run, where the corpus side is a "
    "precomputed index and only the new batch is tokenized fresh. "
    "Mechanics: 3-gram shingle posting lists, shingles with document "
    f"frequency > {SHINGLE_DF_CAP} dropped (stopword-shingle cap — this "
    "bounds the posting-join fanout AND kills the head of the shingle "
    "skew distribution), batch x corpus pairs generated ONLY where a "
    "shingle is shared (inverted-index equi-join sharded on the shingle "
    "key — compare space is co-occurring pairs, never |batch| x |corpus|), "
    "exact Jaccard from intersection counts + capped set sizes, then a "
    "per-batch-doc verdict: candidate count, best score, is_dup at 0.5. "
    "Every batch doc appears (left join), so the gate emits an explicit "
    "keep/drop decision per incoming doc. At 100 TB the corpus posting "
    "list is materialized once (cf. doc_index) and the per-batch cost is "
    "O(batch shingles + shared-shingle pairs)",
    tags=("dedup", "incremental", "extension"),
)
def x_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread: incremental_dedup_verdicts hash-repartitions on doc_id
    # immediately, so the round-robin fan-out was a redundant exchange
    # stacked under it (r16 before-plan: RoundRobin + hash back-to-back)
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "is_batch", F.col("doc_id") % BATCH_MOD == 0
    )
    return incremental_dedup_verdicts(spark, docs)


def incremental_dedup_verdicts(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Batch-vs-corpus dedup verdicts over a tagged corpus: ``docs`` must
    carry (doc_id, text, is_batch boolean). Factored out so the same
    scoring pipeline serves both the predicate-split registered query and
    the lakehouse dedup-at-ingest composite (batch = the rows a snapshot
    append introduced, via incremental_read) — the two must agree
    bit-for-bit when their splits coincide (pytest-gated)."""
    n_part = spark.sparkContext.defaultParallelism
    post = docs.repartition(n_part, "doc_id").select(
        "doc_id", "is_batch", F.explode(shingles()).alias("s")
    )
    # df cap as hot-set anti-join, NOT a COUNT window over the shingle
    # key: the r16 window form shuffled EVERY posting row by shingle with
    # no map-side partial aggregation and funneled all postings of a hot
    # shingle (boilerplate 3-grams) into ONE task — the guide §2.5 skew
    # failure (r16 VERDICT item 2). Here the census aggregates with
    # map-side partials (the shuffle carries (shingle, count) partials,
    # not posting rows), the over-cap set is its SMALL complement (at
    # most total_postings / CAP shingles), and the anti-join drops
    # capped-out postings — broadcast when the hot set is small, AQE-
    # skew-splittable SMJ otherwise; both branches keep their parquet
    # lineage so the planner's size estimates stay input-proportional.
    # Same keep set as df <= CAP exactly. The census branch re-derives
    # the tokenize (2 Generate passes total, still not the r15 form's 8)
    # — measured cheaper at every SF than materializing the UNCAPPED
    # posting list just to share one pass (tools/noop_pair_probe.py).
    # Downstream keeps its bounds: every surviving shingle has <= CAP
    # postings per side, so the b|><|c pair join stays skew-bounded by
    # construction, and capped inherits post's doc_id partitioning so
    # the sizes groupBy needs no exchange.
    hot = (
        post.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
    )
    # capped is materialized ONCE (localCheckpoint): it feeds FOUR
    # consumers below (sizes, batch side, corpus side via sizes x2), and
    # without materialization Catalyst re-derived each one from the scan
    # — the r16-before plan shows the 3-gram tokenize Generate running 8x
    # per query (plans/r16/x_dedup_incremental_before.txt).
    capped = post.join(hot, "s", "left_anti").localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    sz = capped.groupBy("doc_id").agg(F.count("*").alias("n"))
    b = capped.filter(F.col("is_batch")).select(
        F.col("doc_id").alias("batch_id"), "s"
    )
    c = capped.filter(~F.col("is_batch")).select(
        F.col("doc_id").alias("corpus_id"), "s"
    )
    pairs = (
        b.join(c, "s")
        .groupBy("batch_id", "corpus_id")
        .agg(F.count("*").alias("i"))
    )
    sb = sz.select(F.col("doc_id").alias("batch_id"), F.col("n").alias("nb"))
    sc_ = sz.select(F.col("doc_id").alias("corpus_id"), F.col("n").alias("nc"))
    scored = (
        pairs.join(sb, "batch_id")
        .join(sc_, "corpus_id")
        .select(
            "batch_id",
            (
                F.col("i").cast("double")
                / (F.col("nb") + F.col("nc") - F.col("i"))
            ).alias("jaccard"),
        )
    )
    summary = scored.groupBy("batch_id").agg(
        F.count("*").alias("n_candidates"), F.max("jaccard").alias("best_jaccard")
    )
    batch_ids = docs.filter(F.col("is_batch")).select(
        F.col("doc_id").alias("batch_id")
    )
    best = F.coalesce(F.col("best_jaccard"), F.lit(0.0))
    return (
        batch_ids.join(summary, "batch_id", "left")
        .select(
            "batch_id",
            F.coalesce(F.col("n_candidates"), F.lit(0)).alias("n_candidates"),
            best.alias("best_jaccard"),
            F.when(best >= 0.5, 1).otherwise(0).alias("is_dup"),
        )
        .orderBy("batch_id")
    )


FUZZY_PREFIX = 80  # normalized-prefix length for the edit-distance verify
FUZZY_LEV_MAX = 20  # prefix edit distance at or under this = fuzzy dup


@register(
    "x_fuzzy_verify_lev",
    oracle=rf"""
        WITH pre AS (
            SELECT doc_id, substr(lower(trim(text)), 1, {FUZZY_PREFIX}) AS pfx
            FROM documents
        )
        SELECT a.doc_id AS left_id, b.doc_id AS right_id,
               levenshtein(a.pfx, b.pfx) AS lev_prefix,
               CASE WHEN levenshtein(a.pfx, b.pfx) <= {FUZZY_LEV_MAX}
                    THEN 1 ELSE 0 END AS is_fuzzy_dup
        FROM pre a JOIN pre b ON b.doc_id = a.doc_id + 1
        ORDER BY left_id
    """,
    doc=f"Character-level fuzzy-dup verify: EDIT DISTANCE on the "
    f"{FUZZY_PREFIX}-char normalized prefix — catches near-dups token "
    "hashing cannot see (typos, OCR noise, small insertions). Evaluated "
    "on consecutive-id pairs, the module\'s oracle-checkable verifier "
    "convention (same as the n-gram Jaccard and SimHash demos); at scale "
    "the SAME scorer runs over MinHash-LSH band candidates — measured "
    "here that simhash prefix/band bucketing degenerates on common-token-"
    "correlated corpora (4-18% of all pairs collide), which is exactly "
    "why the LSH banding, not signature-prefix bucketing, is the "
    "candidate feed. levenshtein is integer-exact in both engines; "
    "fixed-length prefixes cap the verify at O(prefix^2) per candidate "
    "regardless of document size",
    tags=("dedup", "fuzzy", "extension"),
)
def x_fuzzy_verify_lev(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    pre = docs.select(
        "doc_id",
        F.substring(F.lower(F.trim(F.col("text"))), 1, FUZZY_PREFIX).alias("pfx"),
    )
    a = pre.select(
        F.col("doc_id").alias("left_id"), F.col("pfx").alias("l_pfx")
    )
    b = pre.select(
        F.col("doc_id").alias("right_id"), F.col("pfx").alias("r_pfx")
    )
    lev = F.levenshtein(F.col("l_pfx"), F.col("r_pfx"))
    return (
        a.join(b, F.col("right_id") == F.col("left_id") + 1)
        .select(
            "left_id",
            "right_id",
            lev.alias("lev_prefix"),
            F.when(lev <= FUZZY_LEV_MAX, 1).otherwise(0).alias("is_fuzzy_dup"),
        )
        .orderBy("left_id")
    )


@register(
    "lake_dedup_ingest",
    oracle=INCREMENTAL_DEDUP_ORACLE,
    doc="Dedup-at-ingest composite (the production shape of incremental "
    "dedup): the corpus lives in a lakehouse table; an append commits the "
    "incoming crawl batch as a new snapshot; the batch membership is then "
    "recovered from SNAPSHOT PROVENANCE — incremental_read between the "
    "pre-append snapshot and head — rather than any predicate, and scored "
    "against the pre-append read with the same posting-list pipeline as "
    "x_dedup_incremental. The oracle is deliberately the SAME SQL: with "
    "the append split matching the predicate split, the composite must "
    "reproduce the direct query bit-for-bit — which checks the snapshot "
    "isolation (the batch read sees no corpus rows and vice versa) AND "
    "the scoring in one differential. At 100 TB this is dedup-at-ingest: "
    "each refresh reads only the new snapshot's rows (metadata-planned, "
    "no history scan) plus the shared-shingle slice of the corpus index",
    tags=("lakehouse", "dedup", "incremental", "extension"),
)
def lake_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from tutorial_iceberg_spark import scratch as _scratch
    from tutorial_iceberg_spark.lakehouse.table import LakeTable

    docs = load_table(spark, sf_dir, "documents")
    # Cluster-portable scratch; deferred to the reaper (round-9 ADVICE:
    # no unbounded table-copy accumulation across oracle/bench runs).
    wh = _scratch.defer_cleanup(
        _scratch.scratch_dir("tis_lake", "dedup_ingest", unique=True)
    )
    t = LakeTable.create(
        spark,
        os.path.join(wh, "t"),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
        name="dedup_ingest",
    )
    t.append(docs.filter(F.col("doc_id") % BATCH_MOD != 0))  # existing corpus
    first = t.meta.current_snapshot_id
    t.append(docs.filter(F.col("doc_id") % BATCH_MOD == 0))  # incoming batch
    batch = t.incremental_read(from_snapshot_id=first).withColumn(
        "is_batch", F.lit(True)
    )
    corpus = t.read(snapshot_id=first).withColumn("is_batch", F.lit(False))
    # the verdict pipeline fans the doc frame into 4 consumers (posting
    # lists, df cap, sizes, batch spine); materialize the snapshot reads
    # once instead of re-planning the lakehouse scan per consumer
    tagged = batch.unionByName(corpus).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    return incremental_dedup_verdicts(spark, tagged)
