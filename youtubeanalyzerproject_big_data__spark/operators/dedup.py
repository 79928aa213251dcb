"""Deduplication family for large-scale training-data pipelines.

Five detectors over a document corpus, all shuffle-disciplined for 100 TB:

  * exact          -- hash-groupBy on normalized text: one shuffle keyed by
                      a 128-bit digest, never by the text itself (keeps
                      shuffle rows narrow).
  * minhash_lsh    -- shingle -> K minhashes -> B bands -> bucket self-join.
                      Candidate generation is a groupBy on (band, signature)
                      so only same-bucket docs ever meet; verification
                      re-computes exact Jaccard on candidates only.
  * simhash        -- 32-bit simhash, near-dup = small hamming distance,
                      blocked by 4x8-bit chunks (pigeonhole: distance<=3 =>
                      at least one identical chunk), so again no O(n^2).
  * ngram_jaccard  -- exact word-n-gram Jaccard via shingle-inverted-index
                      self-join (the brute-force oracle for the two above).
  * embedding near-dup -- exact cosine over all pairs (baseline; the LSH
                      route for scale lives in similarity.py).

Hashes are md5-derived (functions/hashing.py) so every stage is reproducible
in the DuckDB oracle -- no Spark-specific hash functions in results.
All stages are built-in Catalyst expressions; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtubeanalyzerproject_big_data__spark.functions.hashing import md5_int32
from youtubeanalyzerproject_big_data__spark.functions.textfns import normalize, word_ngrams
from youtubeanalyzerproject_big_data__spark.functions.vectors import cosine


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (after normalization) documents.

    Returns (keep_id, n_dups, dup_ids_csv): smallest id is kept, the rest
    are the removal set.  Grouping key is md5(normalized) so the shuffle
    carries 32-byte keys, not documents.
    """
    keyed = df.select(F.col(id_col).alias("doc_id"), F.md5(normalize(F.col(text_col))).alias("text_key"))
    return (
        keyed.groupBy("text_key")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("doc_id").cast("string")))).alias("dup_ids_csv"),
        )
        .select("keep_id", "n_dups", "dup_ids_csv")
    )


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc_id, shingle) exploded distinct word-n-gram shingles."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"),
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs (doc1 < doc2, jaccard >= t).

    Inverted-index self-join: docs only pair up when they share a shingle,
    then |A intersect B| is a count per pair and |A u B| = |A|+|B|-inter.
    At scale, frequent shingles create hot keys -- callers should pre-filter
    stop-shingles (df_top-frequency cut) the way web-dedup pipelines do;
    at benchmark scale the skew is negligible.
    """
    sh = _shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc1"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_shingles", "n1"), "doc1")
        .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_shingles", "n2"), "doc2")
        .withColumn("jaccard", F.round(F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )
    return out


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 16) -> DataFrame:
    """(doc_id, minhash array<long>[num_hashes]) from word-n-gram shingles.

    minhash_j(doc) = min over shingles of md5_int32(shingle, seed=j).
    Computed as one explode + single groupBy with num_hashes min() aggregates
    (one shuffle keyed by doc_id, map-side combined).
    """
    sh = _shingles(df, id_col, text_col, n)
    hashed = sh.select(
        "doc_id", *[md5_int32(F.col("shingle"), seed=j).alias(f"h{j}") for j in range(num_hashes)]
    )
    aggs = [F.min(f"h{j}").alias(f"h{j}") for j in range(num_hashes)]
    sigs = hashed.groupBy("doc_id").agg(*aggs)
    return sigs.select("doc_id", F.array(*[f"h{j}" for j in range(num_hashes)]).alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Banding: num_hashes/bands rows per band; docs sharing any full band
    signature become candidates (groupBy on the band key -- candidates meet
    in a bucket, never an O(n^2) cross join).  Candidates are then verified
    with exact n-gram Jaccard >= threshold, so output = ngram_jaccard_pairs
    restricted to LSH-recalled pairs.  Returns (doc1, doc2, jaccard).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes).cache()

    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_", *[F.element_at("minhash", b * rows_per_band + r + 1).cast("string") for r in range(rows_per_band)]
                        ).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")

    left = band_rows.select("band", "sig", F.col("doc_id").alias("doc1"))
    right = band_rows.select("band", "sig", F.col("doc_id").alias("doc2"))
    candidates = (
        left.join(right, ["band", "sig"])
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )

    exact = ngram_jaccard_pairs(df, id_col, text_col, n, threshold=0.0)
    verified = (
        candidates.join(exact, ["doc1", "doc2"])
        .where(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )
    return verified


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """(doc_id, simhash long): sign-aggregated token hashes.

    bit_b(simhash) = 1 iff sum over distinct tokens of
    (+1 if bit_b(md5_int32(token)) else -1) > 0.
    One explode over (token x bit) -- ~64 x tokens rows -- then a single
    groupBy(doc_id); entirely Catalyst expressions.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))).alias("token"),
    ).where(F.col("token") != "")
    hashed = toks.select("doc_id", md5_int32(F.col("token"), seed="simhash").alias("th"))
    bits_df = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "th",
    ).select(
        "doc_id",
        "bit",
        # shiftright builtin needs a literal shift; use the SQL form for a
        # column-valued shift amount.
        F.when(F.expr("shiftright(th, bit)").bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)).alias("vote"),
    )
    bit_votes = bits_df.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return (
        bit_votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(F.lit(0).cast("long"))
            ).cast("long").alias("simhash")
        )
    )


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, bits: int = 32, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming.

    Pigeonhole blocking: split the signature into (max_hamming+1) chunks;
    any pair within distance max_hamming shares at least one exact chunk, so
    candidates come from groupBy on (chunk_idx, chunk_value) -- no O(n^2).
    Returns (doc1, doc2, hamming).
    """
    chunks = max_hamming + 1
    chunk_bits = bits // chunks
    sigs = simhash_signatures(df, id_col, text_col, bits).cache()

    mask = (1 << chunk_bits) - 1
    blocked = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(F.lit(mask)).alias("cval"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", "ck.chunk", "ck.cval")

    left = blocked.select("chunk", "cval", F.col("doc_id").alias("doc1"), F.col("simhash").alias("s1"))
    right = blocked.select("chunk", "cval", F.col("doc_id").alias("doc2"), F.col("simhash").alias("s2"))
    cands = (
        left.join(right, ["chunk", "cval"])
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "s1", "s2")
        .distinct()
    )
    xor = F.col("s1").bitwiseXOR(F.col("s2"))
    return (
        cands.withColumn("hamming", F.bit_count(xor).cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


def embedding_near_dup_pairs(emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (id1 < id2, cosine >= threshold).

    Brute-force all-pairs baseline; correct at any scale but O(n^2) compute.
    The LSH-bucketed path in similarity.py is the 100 TB route; this exact
    variant doubles as its verification oracle.
    """
    from youtubeanalyzerproject_big_data__spark.functions.vectors import dot_arrow, norm

    # Norms once per row (n rows, Catalyst fold); per-pair work is a single
    # Arrow-batched numpy dot (see vectors.dot_arrow for why not the
    # interpreted built-in fold on the n^2 path).
    a = emb.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"), norm(F.col(vec_col)).alias("n1"))
    b = emb.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"), norm(F.col(vec_col)).alias("n2"))
    pairs = a.join(b, F.col("id1") < F.col("id2"))
    d = dot_arrow()
    return (
        pairs.withColumn("cos_sim", d(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")))
        .where(F.col("cos_sim") >= threshold)
        .select("id1", "id2", F.round("cos_sim", 6).alias("cos_sim"))
    )
