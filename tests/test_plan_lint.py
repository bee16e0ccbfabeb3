"""Repo-wide physical-plan lint over EVERY registered query.

The per-operator plan tests (test_plans.py) pin specific shapes; this
is the blanket floor no query may sink below, enforced for the whole
registry so a future registration can't quietly regress it:

* no CartesianProduct anywhere (the one intentional all-pairs form,
  `jaccard`'s verify stage, is candidates-driven and plans as a hash
  join on the block key — if it ever degrades to a cartesian this
  fails);
* no row-at-a-time SCALAR Python UDF (``BatchEvalPython``) — every
  scalar Python escape hatch must be Arrow-vectorized (U1's grep-clean
  claim, now enforced at the plan level where even an `F.udf` smuggled
  in through a helper would surface); ``BatchEvalPythonUDTF`` is exempt
  on measurement (see plans.lint_violations);
* no exchange PARTITIONED BY the document text column — shuffling on
  text means the full payload is the key, the canonical
  does-not-survive-100TB mistake.  (Carried-but-not-keyed columns are
  asserted per-operator via `plans.assert_exchanges_narrow`; the
  partitioning header is what this blanket check can see registry-wide.)

One test, one pass over the registry: plan construction only — nothing
executes except the streaming/incremental queries whose registered
callables run their micro-batches internally.
"""

from __future__ import annotations

import pytest

from newspapers_etl_spark.plans import lint_violations
from newspapers_etl_spark.registry import all_queries


@pytest.mark.heavy
def test_no_query_plans_cartesian_or_partitions_by_text(spark, sf_dir):
    violations: list[str] = []
    for name, fn in sorted(all_queries().items()):
        violations.extend(lint_violations(name, fn(spark, sf_dir)))
    assert not violations, "\n".join(violations)
