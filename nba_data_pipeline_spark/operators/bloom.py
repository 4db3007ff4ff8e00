"""Bit-packed Bloom filter as a relational runtime join filter.

This is the engine-grade form of the Bloom gate (the semi-join-per-hash
variant lives in ``plans/curation_plans.py`` for URL blocklisting): the
build side's keys are hashed k ways with ``xxhash64(key, seed)``, every
probe position is packed into a fixed-size bitmap of 64-bit words with a
``bit_or`` aggregate, and the probe side tests membership through k
broadcast hash joins on the word index plus a native bit-test — the fact
stream is never shuffled and never leaves the JVM.

At 100 TB this is exactly what Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects under a
selective fact⋈dim join: the filter drops most probe rows BEFORE the
join's shuffle, so the exchange carries only (true hits + the bounded
false-positive mass). The bitmap is WORDS*8 bytes regardless of data
scale — always broadcastable — and false positives are removed by the
exact join that follows, so the composition is exact by construction.

Reference semantics: the reference filters row sets only by full dict
membership (e.g. get_nba_prop_data_Version2.py's seen-key checks); this
supplies the scale-correct pre-filter form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prefilter"]

#: Default geometry: 2048 words = 128 Kibit. At n=10k keys that is ~13
#: bits/key → <1% false positives; size up WORDS (one broadcast row per
#: word) as n grows — the probe cost is flat in WORDS.
DEFAULT_WORDS = 2048
DEFAULT_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)


def _probe_pos(key: Column, seed: int, words: int) -> Column:
    """Bit position of one hash probe, in [0, words*64)."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(words * 64))


def bloom_build(
    keys: DataFrame,
    key_col: str,
    words: int = DEFAULT_WORDS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Aggregate the build side's ``key_col`` into a word-indexed bitmap:
    one row per touched 64-bit word, columns ``(w int, bitmap long)``.
    ≤ ``words`` rows by construction — broadcast it at the probe site."""
    key = F.col(key_col)
    positions = keys.select(
        F.explode(
            F.array(*[_probe_pos(key, s, words) for s in seeds])
        ).alias("p")
    )
    return positions.groupBy(
        F.shiftright(F.col("p"), 6).cast("int").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(1L, CAST(pmod(p, 64) AS INT))")
        ).alias("bitmap")
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    words: int = DEFAULT_WORDS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Keep only rows of ``df`` whose ``key_col`` hits all k bloom probes.
    k broadcast hash joins on the word index (map-side, no shuffle of
    ``df``), each with a native bit-test in the join condition; a probe
    word absent from the bitmap is an immediate miss (inner join drops
    it). Output columns = input columns."""
    out = df
    for i, seed in enumerate(seeds):
        b = bloom.select(
            F.col("w").alias(f"__bw{i}"), F.col("bitmap").alias(f"__bm{i}")
        )
        pos = _probe_pos(F.col(key_col), seed, words)
        out = (
            out.withColumn(f"__p{i}", pos)
            .join(
                F.broadcast(b),
                F.shiftright(F.col(f"__p{i}"), 6).cast("int")
                == F.col(f"__bw{i}"),
            )
            .where(
                F.expr(
                    f"(__bm{i} & shiftleft(1L, CAST(pmod(__p{i}, 64) AS INT))) != 0"
                )
            )
            .drop(f"__p{i}", f"__bw{i}", f"__bm{i}")
        )
    return out
