"""BM25 scoring constants shared by ``operators.retrieval`` and
``operators.retrieval_fusion``.

They live here — in a module that registers nothing — because both
operator modules need them at IMPORT time (oracle f-strings, the
registered batch-query dict), and a top-level import between two
query-registering modules splices the imported module's block into the
importer's registry slot (the driver window is positional; see
registry._OPERATOR_MODULES and
test_registry_registration_order_is_contiguous).
"""

from __future__ import annotations

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 50
# A fixed probe query (mixed-frequency fixture vocabulary), literal so
# the Spark plan and the DuckDB oracle score the identical term set.
BM25_QUERY_TERMS = ("join", "vector", "stream", "window")
