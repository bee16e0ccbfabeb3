"""Historical query-name resolution (RENAMES.json).

The bench driver captures only the last ~2000 characters of stdout, so
three rename waves (rounds 3 and 4, tables in BASELINE.md) compacted
long registry names to keep the full per-query timing map inside the
window.  Every wave rewrote the name→history join: BENCH_r02's
``agg_approx_distinct`` is today's ``andv`` only via TWO hops.

``RENAMES.json`` is the machine-readable form of those tables —
``{"r3": {old: new, ...}, "r4": {...}}`` — and :func:`resolve` chains a
historical key through every wave to its current registry name, so the
driver's longitudinal 2×-regression check (and any human diffing old
CORRECTNESS/BENCH artifacts) can join r1–r4 rows against the current
registry without a hand-maintained mapping.
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent

# Resolution is iterated because renames chain BOTH across rounds
# (r3's new name is r4's old name) and within one round's multiple
# waves (r3: stream_dedup_watermark → stream_dedup → r4: st_dedup).
_MAX_HOPS = 8


@lru_cache(maxsize=1)
def _load() -> dict[str, dict[str, str]]:
    return json.loads((_REPO_ROOT / "RENAMES.json").read_text())


def resolve(name: str) -> str:
    """Map a historical query name to its current registry name (a name
    that was never renamed resolves to itself).  Raises ``ValueError``
    if the mapping cycles — a corrupt RENAMES.json, not a data case."""
    waves = _load()
    for _ in range(_MAX_HOPS):
        nxt = name
        for wave in sorted(waves):
            nxt = waves[wave].get(nxt, nxt)
        if nxt == name:
            return name
        name = nxt
    raise ValueError(f"rename resolution did not terminate for {name!r}")
