"""Named query registry — the source of truth for ``__spark_entry__``.

Importing this package registers every query module. ``REGISTRY`` maps
name → Query(fn, oracle) and drives queries()/oracle_sql().
"""

from .registry import REGISTRY, Query, register  # noqa: F401

# Import order = SURVEY.md §7 phase order; each module self-registers.
from . import relational    # noqa: E402,F401  Phase 0/1: scans, filters, aggs, joins, sorts
from . import nested        # noqa: E402,F401  Phase 2: array ops, pair mining
from . import windowed      # noqa: E402,F401  Phase 2: lag stack, top-k, argmax
from . import pipelines     # noqa: E402,F401  Phase 3: EP1/EP2/EP3 dashboard composites
from . import temporal      # noqa: E402,F401  Phase 3½: as-of / range join, sessionization
from . import joins         # noqa: E402,F401  join/set-op/grouping-set completeness
from . import functions_surface  # noqa: E402,F401  string/percentile/math scalar surface
from . import datapipe      # noqa: E402,F401  Phase 6: dedup / similarity / text analysis
from ..streaming import windows as _streaming_windows  # noqa: E402,F401  Phase 5
from ..streaming import stateful as _streaming_stateful  # noqa: E402,F401  Phase 5
from ..ml import forecast as _ml_forecast  # noqa: E402,F401  Phase 4
from ..sources import ingest as _sources_ingest  # noqa: E402,F401  S1/S4 sources & sinks
