"""Declared-query inventory (SURVEY.md §2 operator coverage).

Importing this package populates ``QUERIES`` / ``ORACLES`` from every
operator-family module.  ``__spark_entry__.py`` re-exports these for the
driver's correctness gate.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import order mirrors SURVEY §7.2's build order; each import registers
# that family's declared queries.
from . import core  # noqa: F401,E402  (F1-F6, A1/A2/A6, O2)
from . import joins  # noqa: F401,E402  (§2.4 equi/semi/anti/theta joins)
from . import windows  # noqa: F401,E402  (A3-A5, K3, T4)
from . import markov  # noqa: F401,E402  (M1-M4)
from . import scoring  # noqa: F401,E402  (A7, A8)

try:  # families added as the build widens; keep imports resilient
    from . import sketches  # noqa: F401  (K1, K2, K4, K5)
except ImportError:  # pragma: no cover
    pass
try:
    from . import graph  # noqa: F401  (G1-G3)
except ImportError:  # pragma: no cover
    pass
try:
    from . import text  # noqa: F401  (dedup / text analysis)
except ImportError:  # pragma: no cover
    pass
try:
    from . import similarity  # noqa: F401  (ANN / embedding search)
except ImportError:  # pragma: no cover
    pass
try:
    from . import generator_queries  # noqa: F401  (S1)
except ImportError:  # pragma: no cover
    pass
try:
    from . import multimodal_queries  # noqa: F401  (binary columns)
except ImportError:  # pragma: no cover
    pass
try:
    from . import setops  # noqa: F401  (set ops, rollup/cube, as-of join)
except ImportError:  # pragma: no cover
    pass
try:
    from . import analytics  # noqa: F401  (percentiles, having, grouping sets)
except ImportError:  # pragma: no cover
    pass
try:
    from . import streaming_queries  # noqa: F401  (declared streaming T1/T2/T6)
except ImportError:  # pragma: no cover
    pass
try:
    from . import tpch_more  # noqa: F401  (remaining TPC-H shapes J16-J27)
except ImportError:  # pragma: no cover
    pass
try:
    from . import window_fns  # noqa: F401  (lag/lead, ntile, pct_rank, frames)
except ImportError:  # pragma: no cover
    pass
try:
    from . import seriesops  # noqa: F401  (gap-fill, fuzzy match, regex)
except ImportError:  # pragma: no cover
    pass
try:
    from . import storage_queries  # noqa: F401  (S6 write side: compaction)
except ImportError:  # pragma: no cover
    pass
try:
    from . import llm_pipeline  # noqa: F401  (chunk/split/shuffle/pack)
except ImportError:  # pragma: no cover
    pass
