"""Large-scale training-data-pipeline operations over ray.data Datasets.

Beyond the reference's own operators (SURVEY.md §2), these are the
operations a 100 TB training-data pipeline needs: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard), similarity search, text analysis and
relational demos. Every function is a Dataset -> Dataset transform with a
matching DuckDB oracle in ``__ray_entry__.oracle_sql`` where SQL can express
it.

Parity discipline: all float-valued outputs are emitted as fixed-point
integers via ``floor(x * 10^k + 0.5)`` (round half toward +inf), computed
with the same formula on the Ray and SQL sides, so the driver's value-hash
comparison is bit-stable.
"""

from . import (  # noqa: F401
    curate,
    dedup,
    multimodal,
    plots,
    relational,
    similarity,
    sketch,
    textstats,
)


def fp(x: float, k: int) -> int:
    """Fixed-point round-half-up: the Python twin of SQL
    ``CAST(FLOOR(x * 10^k + 0.5) AS BIGINT)``."""
    import math

    return int(math.floor(x * (10**k) + 0.5))
