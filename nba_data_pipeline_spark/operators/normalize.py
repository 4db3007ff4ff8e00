"""Schema-normalization operators (SURVEY §2.2 N1-N4, §2.3 F1, §2.4 X17).

The reference repairs pd.read_html's inferred schemas post-hoc: MultiIndex
flattening (Basketball_Refrence_alltables.py:76-101), canonical renaming
applied longest-token-first (:104-131), duplicate-name suffixing (:133-147),
header-repeat row drops (:157-161), and a keep-cast-only-if-≥50%-parses
numeric coercion (:172-184). Here each is a pure DataFrame→DataFrame
function: rename passes are analysis-time (no job), the coercion heuristic
is the one genuinely two-pass operator (column stats → conditional cast).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# Canonical token map (Basketball_Refrence_alltables.py:104-116), applied
# longest-token-first so 'eFG%' wins over 'FG%' (:124).
CANONICAL_TOKENS: dict[str, str] = {
    "eFG%": "eFG_pct",
    "FG%": "FG_pct",
    "3P%": "3P_pct",
    "2P%": "2P_pct",
    "FT%": "FT_pct",
    "TS%": "TS_pct",
    "ORB%": "ORB_pct",
    "DRB%": "DRB_pct",
    "TRB%": "TRB_pct",
    "AST%": "AST_pct",
    "STL%": "STL_pct",
    "BLK%": "BLK_pct",
    "TOV%": "TOV_pct",
    "USG%": "USG_pct",
    "3PM": "3PM",
    "3PTM": "3PM",
    "ORtg": "ORtg",
    "DRtg": "DRtg",
}


def flatten_header(parts: tuple[str, ...] | list[str], sep: str = "_") -> str:
    """N1: join MultiIndex header parts, dropping 'Unnamed: *' placeholders
    (Basketball_Refrence_alltables.py:76-101)."""
    keep = [
        str(p).strip()
        for p in parts
        if p and str(p).strip() and not str(p).startswith("Unnamed")
    ]
    return sep.join(keep) if keep else "col"


def canonical_name(name: str, sep: str = "_") -> str:
    """N2: canonical column rename — longest-token-first token map, '%' →
    '_pct', whitespace → sep (Basketball_Refrence_alltables.py:104-131)."""
    out = re.sub(r"Unnamed:?\s*\S+\s*", "", name).strip() or "col"
    for token in sorted(CANONICAL_TOKENS, key=len, reverse=True):
        if token in out:
            out = out.replace(token, CANONICAL_TOKENS[token])
    out = out.replace("%", "_pct")
    out = re.sub(r"\s+", sep, out.strip())
    return out


def uniquify(names: list[str]) -> list[str]:
    """N3: suffix duplicate column names _1, _2, ...
    (Cleaning_Glass_#1.py:443-450)."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        if n in seen:
            seen[n] += 1
            out.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 0
            out.append(n)
    return out


def normalize_columns(df: DataFrame, sep: str = "_") -> DataFrame:
    """N1+N2+N3 composed: flatten (if caller pre-joined MultiIndex parts the
    flatten is a no-op), canonicalize, uniquify. Analysis-time only — the
    physical plan is untouched (a `Project` of aliases)."""
    flat = [flatten_header(n.split("\x00"), sep) if "\x00" in n else n for n in df.columns]
    canon = [canonical_name(n, sep) for n in flat]
    return df.toDF(*uniquify(canon))


def drop_header_repeats(df: DataFrame, col: str, header_value: str | None = None) -> DataFrame:
    """F1: drop repeated in-band header rows — df[df['Player'] != 'Player']
    (Basketball_Refrence_alltables.py:157-161)."""
    hv = header_value if header_value is not None else col
    return df.filter((F.col(col) != hv) | F.col(col).isNull())


def coerce_numeric(df: DataFrame, cols: list[str] | None = None, threshold: float = 0.5) -> DataFrame:
    """X17: per-column numeric coercion with the keep-if-≥threshold-parses
    rule (Basketball_Refrence_alltables.py:172-184).

    Two passes: (1) ONE aggregate job computing, per candidate column, the
    non-null count and the try_cast-parse count; (2) an analysis-time
    conditional cast for the columns that clear the threshold. The stats
    pass is a single map-side-combined aggregate — at 100 TB this is one
    scan, not a scan per column.
    """
    string_cols = [
        c for c, t in df.dtypes if t == "string" and (cols is None or c in cols)
    ]
    if not string_cols:
        return df
    aggs = []
    for c in string_cols:
        aggs.append(F.count(F.col(c)).alias(f"__n_{c}"))
        aggs.append(F.count(F.col(c).try_cast("double")).alias(f"__p_{c}"))
    stats = df.agg(*aggs).collect()[0]
    out = df
    for c in string_cols:
        n, p = stats[f"__n_{c}"], stats[f"__p_{c}"]
        if n > 0 and p >= threshold * n:
            out = out.withColumn(c, F.col(c).try_cast("double"))
    return out
