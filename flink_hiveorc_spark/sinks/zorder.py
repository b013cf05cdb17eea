"""Z-order (Morton) clustering key for multi-column data skipping.

``write_partitioned(..., cluster_by=[...])`` sorts rows within each
write task so ORC/parquet stripe min-max stats become narrow — but a
single-column sort only narrows THAT column; filters on a second
column still scan every stripe. Interleaving the bits of two (or
more) key columns into one sort key gives every clustered column
partially-narrow ranges at once: the classic space-filling-curve
layout trick (Morton order; used by every lakehouse OPTIMIZE ZORDER
implementation) — at 100 TB it's the difference between pruning on
one predicate dimension and pruning on all of them.

Pure built-in expression (shift/AND/OR chain, whole-stage-codegen'd);
cost is paid once at write time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def zorder_key(cols: list[Column | str], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of each column into one long.

    Columns must be non-negative integers (keys/bucket ids); values
    are masked to ``bits`` bits, so spread SKEWED domains into
    buckets first (e.g. ``F.abs(F.hash(c)) % (1 << bits)`` or a
    rank-based bucket) — masking a domain wider than 2^bits aliases
    distant values onto the same curve position, which only weakens
    (never breaks) the clustering.
    """
    n = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    cs = [c.cast("long").bitwiseAND(F.lit((1 << bits) - 1)) for c in cs]
    out = F.lit(0).cast("long")
    for bit in range(bits):
        for j, c in enumerate(cs):
            # bit `bit` of column j lands at interleaved position
            # bit*n + (n-1-j)  (column 0 = most significant).
            src = F.shiftright(c, bit).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(src, bit * n + (n - 1 - j)))
    return out
