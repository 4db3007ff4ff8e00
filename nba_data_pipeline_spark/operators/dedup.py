"""Deduplication operators (SURVEY §2.10 D1-D5 + north-star near-dup).

Exact dedup is a hash-groupBy (first-wins via row_number over a total order,
never nondeterministic dropDuplicates — reference semantics are 'first seen
wins', nba_props_scraper.py:295-302). Near-dup is the LLM-pipeline family:
word-shingle Jaccard, MinHash+LSH (banded signature join — the only shape
that scales to 100 TB: candidates come from equi-joins on band keys, never
an all-pairs comparison), SimHash bit signatures, and embedding-cosine
near-dup behind hyperplane-LSH blocking.

Every hash here is md5-based so a SQL oracle (DuckDB) can reproduce it
bit-for-bit; xxhash64 would be faster but engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nba_data_pipeline_spark.operators.textops import (
    distinct_word_shingles_fast,
    ws_tokens,
)


def keep_first(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """D1: deterministic first-wins dedupe — row_number()==1 over an explicit
    total order (the distributed restatement of the reference's seen-set)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signature(shingles: Column, num_hashes: int) -> list[Column]:
    """MinHash signature: per seed i, the lexicographic min of
    md5(i ':' shingle). String-md5 minhash keeps the oracle reproducible;
    the collision behavior matches classic minhash (min over a random
    permutation approximated by the keyed hash).

    The per-seed closure MUST be single-argument: ``transform`` treats a
    two-arg callable as the (element, index) form, so the once-used
    ``lambda s, i=i`` default-capture idiom silently bound ``i`` to the
    INDEX COLUMN — every seed prefix became the stringified Column object
    (plan-context-dependent, e.g. "Column<'y_2'>:"), making signatures
    valid-looking but unstable across plans and never matching the
    documented seeds (caught by the s11 oracle; pinned by
    test_minhash_signature_seeds_are_stable)."""

    def seeded(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return [
        F.array_min(F.transform(shingles, seeded(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def lsh_band_keys(sig_cols: list[str], rows_per_band: int) -> list[Column]:
    """Banding: md5 over each contiguous signature slice. Docs sharing any
    band key become candidates via an equi-join on (band_idx, band_key)."""
    assert len(sig_cols) % rows_per_band == 0
    bands = []
    for b in range(len(sig_cols) // rows_per_band):
        chunk = sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
        bands.append(F.md5(F.concat_ws("|", *chunk)).alias(f"band_{b}"))
    return bands


def simhash16(token: Column, bit: int) -> Column:
    """±1 contribution of one token to simhash bit ``bit`` (1-based):
    +1 when hex nibble ``bit`` of md5(token) has its high bit set."""
    return F.when(F.substring(F.md5(token), bit, 1) >= "8", 1).otherwise(-1)


def shingle_sets(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, shingle) pairs with per-doc distinct shingles — the base relation
    for Jaccard/minhash. Explodes once; downstream joins are equi-joins."""
    return docs.select(
        F.col(id_col),
        F.explode(distinct_word_shingles_fast(F.col(text_col), k)).alias("shingle"),
    )


def hashed_shingle_sets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, sz, sh_h) pairs — :func:`shingle_sets` with the shingle carried
    as its 64-bit hash from birth, plus the doc's DISTINCT-SHINGLE COUNT
    ``sz`` stamped on every row map-side (it is known for free before the
    explode). For consumers that only ever join/count (jaccard_pairs,
    connected-components edge mining) the string form is dead weight:
    persisting the hashed relation instead of strings cut the d5_cc cache
    mass ~60% at sf300 (15 M docs × ~150 shingles × ~30-byte strings →
    16-byte rows; the int ``sz`` adds 4). Carrying ``sz`` lets
    :func:`jaccard_pairs` fold the per-doc size aggregate and its two
    join-backs into the intersection groupBy — one exchange instead of
    three plan legs (r11). Collision budget as documented on
    :func:`jaccard_pairs`."""
    # single_eval: size() + explode() over the same array would otherwise
    # plan as two ArrowEvalPython nodes (the shingling UDF cloned across
    # the Generate boundary — measured 2x the shingle cost, guide §4.4).
    arr = distinct_word_shingles_fast(
        F.col(text_col), k, single_eval=True
    ).alias("__sh_arr")
    return (
        docs.select(F.col(id_col), arr)
        .select(
            F.col(id_col),
            F.size("__sh_arr").cast("int").alias("sz"),
            F.explode("__sh_arr").alias("shingle"),
        )
        .select(F.col(id_col), "sz", F.xxhash64("shingle").alias("sh_h"))
    )


def jaccard_pairs(sh: DataFrame, id_col: str = "doc_id", min_jaccard: float = 0.0) -> DataFrame:
    """Exact pairwise Jaccard over a (id, shingle) relation for pairs sharing
    ≥1 shingle: |A∩B| from the shingle equi-join, |A|,|B| from per-doc
    counts; jaccard = inter / (|A|+|B|-inter). Integer counts → the double
    division is engine-stable.

    Accepts either a string relation from :func:`shingle_sets` or the
    pre-hashed ``(id, sh_h)`` form from :func:`hashed_shingle_sets` (heavy
    callers persist the hashed form — see there).

    Scale note: hot shingles dominate the self-join; at 100 TB drop
    top-frequency shingles first (they carry no discriminating power) —
    see ``frequent_shingle_filter``.
    """
    # Join on the 64-bit hash of the shingle, not the string: the shuffle
    # moves 8-byte keys instead of ~30-byte 3-word strings. Shingles are
    # distinct per doc, so counts are unchanged (64-bit collisions across
    # ~millions of distinct shingles are ~1e-8 — far below the float
    # round-off the oracle compare already tolerates).
    if "sz" in sh.columns and "sh_h" in sh.columns:
        # hashed_shingle_sets input: ``sz`` rides each row, so |A| and |B|
        # fall out of the intersection groupBy itself (min = the constant)
        # — no per-doc size aggregate, no join-backs (r11; measured ~0.3 s
        # off every consumer at sf0.1, plan: 3 extra legs -> 0).
        a = sh.select(F.col(id_col).alias("id_a"), F.col("sz").alias("za"), "sh_h")
        b = sh.select(F.col(id_col).alias("id_b"), F.col("sz").alias("zb"), "sh_h")
        return (
            a.join(b, "sh_h")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(
                F.count(F.lit(1)).alias("inter"),
                F.min("za").cast("long").alias("sz_a"),
                F.min("zb").cast("long").alias("sz_b"),
            )
            .withColumn(
                "jaccard",
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= min_jaccard)
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if "sh_h" in sh.columns:
        hashed = sh.select(F.col(id_col), "sh_h")
    else:
        hashed = sh.select(F.col(id_col), F.xxhash64("shingle").alias("sh_h"))
    a = hashed.select(F.col(id_col).alias("id_a"), "sh_h")
    b = hashed.select(F.col(id_col).alias("id_b"), "sh_h")
    inter = (
        a.join(b, "sh_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def frequent_shingle_filter(sh: DataFrame, max_doc_freq: int) -> DataFrame:
    """Drop shingles appearing in more than ``max_doc_freq`` docs before the
    candidate join — the standard skew guard for shingle self-joins."""
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    keep = freq.filter(F.col("df") <= max_doc_freq).select("shingle")
    return sh.join(F.broadcast(keep), "shingle")


def prefix_jaccard_pairs(
    docs: DataFrame,
    t_num: int,
    t_den: int,
    n_slices: int = 1,
    r: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """All doc pairs with shingle-Jaccard ≥ ``t_num/t_den`` — exact
    :func:`jaccard_pairs`-at-threshold semantics with a 100 TB-shaped plan:
    a SHUFFLE-FREE prefix filter generates candidates, sequential
    hash-range slices bound every shuffle, and the exact verify touches
    only the (tiny) candidate set. Returns the same columns as
    ``jaccard_pairs`` (id_a, id_b, inter, sz_a, sz_b, jaccard).

    **Candidate filter** (r-generalized prefix filtering, PPJoin family —
    Xiao et al. WWW'08 Lemma 1 extended): under ANY global total order on
    shingles, if ``|A∩B| ≥ α`` then the length-``(|X|−α+r)`` prefixes of A
    and B share at least ``r`` elements. (Proof: order the prefixes; let
    pa ≤ pb be their last elements; every common element ≤ pa lies in both
    prefixes, so if fewer than r do, commons ≤ pa number ≤ r−1 while A has
    only α−r elements past pa — total < α.) With the symmetric length
    filter, α ≥ ⌈t·|X|⌉, so prefix length |X|−⌈t·|X|⌉+r suffices. The
    i-th-smallest shared prefix token (i ≤ r) also obeys the positional
    bound inter ≤ i + min(|A|−pos_a, |B|−pos_b) ≤ r + min(...), so
    pre-filtering matched rows by the r-form bound and then requiring
    ≥ r surviving matches per pair loses nothing.

    **Why the HASH order**: classic PPJoin orders by document frequency so
    prefixes hold the rarest tokens. That order costs a corpus-wide
    df aggregation plus a per-doc ranking window — at 3000× (15M docs,
    2.25B shingle rows) the window's exchange alone (~54 GB) out-spills
    the box. The lemma is order-agnostic, so this plan orders by the
    shingle's own 64-bit hash: each doc's prefix is a map-side
    ``slice(array_sort(hashes), 1, plen)`` — ZERO shuffle to build.
    Measured on the synthetic corpus at sf0.1 (5k docs, 1.13M co-occurring
    pairs): df-order r=1 → 124.8k candidates; hash-order r=3 → 494
    candidates vs 256 true edges, with no df pass at all. r=3 is the lever
    that makes the cheap order competitive: pairs sharing only the odd
    common-vocabulary shingle can never produce 3 shared prefix tokens.

    **Slicing**: the prefix self-join on h runs as ``n_slices`` SEQUENTIAL
    ``pmod(h, n)`` slices; each slice's matched pairs pre-aggregate to
    (id_a, id_b, count) and land in a reliable (disk) checkpoint, which
    truncates lineage so the slice's shuffle files are collectable before
    the next slice runs. Peak scratch ≈ (2·|prefix|)/n_slices + staged
    partials (≈ the pre-group fan-out, itself prefix-pruned). The shingle
    UDF re-runs per slice — CPU traded for the disk bound; on a cluster
    with storage headroom, stage the prefix relation once, partitioned by
    the slice key, and scan one partition per slice.

    **Verify**: candidate ids broadcast-semi-join the corpus, ONLY those
    docs re-shingle into sorted hash arrays, and ``array_intersect``
    computes the exact intersection per pair — identical arithmetic to
    ``jaccard_pairs`` (hashed-shingle collision budget documented there).
    At cluster scale swap the broadcast id filter for a shuffle semi-join
    past ~10^8 candidate docs."""
    spark = docs.sparkSession
    if spark.sparkContext.getCheckpointDir() is None:
        from nba_data_pipeline_spark.io import session_tmpdir

        spark.sparkContext.setCheckpointDir(session_tmpdir("prefix_jacc_ckpt_"))

    hs = F.array_sort(
        F.transform(
            distinct_word_shingles_fast(F.col(text_col), k),
            lambda x: F.xxhash64(x),
        )
    )
    base = docs.select(F.col(id_col).alias("did"), hs.alias("hs")).withColumn(
        "sz", F.size("hs")
    )
    # prefix length for t = num/den: sz - ceil(sz*t) + r, via integer ceil
    plen = (
        F.col("sz")
        - ((F.col("sz") * t_num + t_den - 1) / t_den).cast("long")
        + r
    )
    prefix = base.select(
        "did",
        "sz",
        F.posexplode(F.slice("hs", F.lit(1), plen)).alias("pos0", "h"),
    ).select("did", "sz", (F.col("pos0") + 1).alias("pos"), "h")

    pos_bound = (
        r
        + F.least(
            F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
        )
    ) * (t_num + t_den) >= (F.col("a.sz") + F.col("b.sz")) * t_num

    partials: list[DataFrame] = []
    for s in range(n_slices):
        p_s = (
            prefix.filter(F.pmod(F.col("h"), F.lit(n_slices)) == s)
            if n_slices > 1
            else prefix
        )
        part = (
            p_s.alias("a")
            .join(
                p_s.alias("b"),
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.did") < F.col("b.did"))
                # symmetric length filter for t = num/den
                & (F.col("a.sz") * t_den >= F.col("b.sz") * t_num)
                & (F.col("b.sz") * t_den >= F.col("a.sz") * t_num)
                & pos_bound,
            )
            .groupBy(
                F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("ns"))
        )
        if n_slices > 1:
            # reliable (DISK) checkpoint, not localCheckpoint: partials can
            # reach ~10^8 rows at deep decades and the local variant stores
            # deserialized heap objects first (measured OOM at sf100).
            # Checkpointing also truncates lineage, so the slice's shuffle
            # files become unreachable — the GC nudge lets the
            # ContextCleaner drop them before the next slice shuffles.
            part = part.checkpoint(eager=True)
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001 - cleaner lag only costs disk
                pass
        partials.append(part)
    from functools import reduce

    cand = (
        reduce(DataFrame.unionByName, partials)
        .groupBy("id_a", "id_b")
        .agg(F.sum("ns").alias("ns"))
        .filter(F.col("ns") >= r)
        .select("id_a", "id_b")
        # tiny by construction (r shared prefix tokens); materialize so the
        # verify's three consumers don't re-run the candidate join
        .localCheckpoint(eager=True)
    )
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("did")
    ).distinct()
    docsets = base.join(F.broadcast(cand_ids), "did")
    side_a = docsets.select(
        F.col("did").alias("id_a"),
        F.col("hs").alias("hs_a"),
        F.col("sz").alias("sz_a"),
    )
    side_b = docsets.select(
        F.col("did").alias("id_b"),
        F.col("hs").alias("hs_b"),
        F.col("sz").alias("sz_b"),
    )
    # shuffle-hash, not sort-merge: never sort the array-laden stream (the
    # d9 sf100 lesson); the build side is the slim candidate relation.
    inter = (
        cand.join(side_a.hint("shuffle_hash"), "id_a")
        .join(side_b.hint("shuffle_hash"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= t_num / t_den)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
    )
