"""DuckDB mirror of the distributed Lloyd centroid fit
(``similarity._centroids`` with ``fit_fraction=1.0``) as composable CTE
fragments — what lets the IVF family register value-hash ORACLES instead
of rows-only checks (VERDICT r8 next-round #4).

Faithfulness contract, clause by clause:
- seeds: the first ``k`` NON-NULL vectors in vec_id order, renumbered
  0..k−1 by rank — exactly ``_centroids``' driver pull;
- assignment: argmax of the UNROUNDED double dot product, ties to the
  smallest cell (``_nearest_cell``'s first-wins fold ==
  ``row_number() ... ORDER BY dot DESC, cell``);
- update: per-(cell, position) mean of double-cast components, rounded
  to 9 decimals (the Spark side rounds DRIVER-side for cross-session
  determinism; both engines' rounded doubles agree far above the
  summation-order ulp), empty cells keep their previous centroid;
- the whole recursion only matches when the Spark side fits on the FULL
  corpus (``fit_fraction=1.0``) — Spark's seeded Bernoulli sample is
  XORShiftRandom-partition-dependent and no other engine can replay it,
  which is why the sampled production fit stays a parameter and the
  registered queries use the exact fit.

Float discipline is the bf_topk oracle's (similarity.py): spell out the
sequential double fold (``list_sum`` over ``list_transform``) rather
than DuckDB's float32 ``list_dot_product``, and cast the float32
embedding side to DOUBLE inside the lambda (exact promotion).
"""

from __future__ import annotations

SQL_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "z -> CAST(z[1] AS DOUBLE)*z[2]))"
)
SQL_NORM = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)*x)))"


def lloyd_centroid_ctes(k: int, iters: int, where: str | None = None) -> str:
    """CTE fragment fitting ``c{iters}(cell, cvec)`` over the non-null
    corpus CTE ``nn(vec_id, embedding)`` (which the fragment also
    defines).  Compose as::

        WITH {lloyd_centroid_ctes(8, 2)}, <your query CTEs...>

    ``where`` narrows the FIT corpus (an extra predicate ANDed into
    ``nn``) — the index-maintenance mirror fits on the base slice and
    then assigns the full corpus (operators/ivf_maintenance.py); the
    default leaves the fragment byte-identical to the pre-r10 form
    every existing oracle hashes against.
    """
    extra = f" AND ({where})" if where else ""
    parts = [
        "nn AS (\n"
        "  SELECT vec_id, embedding FROM embeddings\n"
        f"  WHERE embedding IS NOT NULL{extra}\n"
        ")",
        # seeds, renumbered 0..k-1 by vec_id rank; cast to DOUBLE so
        # every c{n} CTE carries the same list type (the Spark literal
        # model is double — float32 -> double promotion is exact)
        "c0 AS (\n"
        "  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,\n"
        "         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec\n"
        f"  FROM (SELECT vec_id, embedding FROM nn ORDER BY vec_id LIMIT {k})\n"
        ")",
    ]
    dot = SQL_DOT.format(a="n_.embedding", b="c.cvec")
    for n in range(1, iters + 1):
        parts.append(
            f"a{n} AS (\n"
            "  SELECT vec_id, embedding, cell FROM (\n"
            "    SELECT n_.vec_id, n_.embedding, c.cell,\n"
            "           row_number() OVER (\n"
            "             PARTITION BY n_.vec_id\n"
            f"             ORDER BY {dot} DESC, c.cell\n"
            "           ) AS rk\n"
            f"    FROM nn n_ CROSS JOIN c{n - 1} c\n"
            "  ) WHERE rk = 1\n"
            ")"
        )
        parts.append(
            f"m{n} AS (\n"
            "  SELECT cell, i - 1 AS pos,\n"
            "         round(avg(CAST(embedding[i] AS DOUBLE)), 9) AS m\n"
            f"  FROM a{n}, unnest(range(1, len(embedding) + 1)) AS t(i)\n"
            "  GROUP BY cell, i\n"
            ")"
        )
        parts.append(
            f"c{n} AS (\n"
            "  SELECT c.cell, coalesce(u.cvec, c.cvec) AS cvec\n"
            f"  FROM c{n - 1} c LEFT JOIN (\n"
            f"    SELECT cell, list(m ORDER BY pos) AS cvec FROM m{n} GROUP BY cell\n"
            "  ) u ON c.cell = u.cell\n"
            ")"
        )
    return ",\n".join(parts)


def final_assignment_cte(name: str, cents: str) -> str:
    """CTE assigning every ``nn`` row to its nearest ``{cents}``
    centroid (argmax dot, ties to the smallest cell) with its L2 norm —
    the corpus side of the IVF search."""
    dot = SQL_DOT.format(a="n_.embedding", b="c.cvec")
    nrm = SQL_NORM.format(a="embedding")
    return (
        f"{name} AS (\n"
        f"  SELECT vec_id, embedding, {nrm} AS nrm, cell FROM (\n"
        "    SELECT n_.vec_id, n_.embedding, c.cell,\n"
        "           row_number() OVER (\n"
        "             PARTITION BY n_.vec_id\n"
        f"             ORDER BY {dot} DESC, c.cell\n"
        "           ) AS rk\n"
        f"    FROM nn n_ CROSS JOIN {cents} c\n"
        "  ) WHERE rk = 1\n"
        ")"
    )


def _subspace_lloyd_parts(corpus: str, sub_dim: int, iters: int) -> list[str]:
    """The per-subspace Lloyd iteration CTEs (``re{t}``/``ru{t}``/
    ``k{t}``) shared by the residual and raw PQ codebook mirrors:
    assignment is the per-(row, subspace) argmin of the 6-dp-rounded
    squared L2 (ties to the smallest code — ``_nearest_code``), the
    update a 9-dp-rounded per-(subspace, code, position) mean, and a
    (subspace, code) pair with no rows keeps its previous slice.
    Requires ``{corpus}(vec_id, rv)`` (double vectors), ``k0(code,
    kvec)`` seeds, and ``rsubs(m)`` in scope."""

    def slice_d(a: str, b: str) -> str:
        lo = f"s.m*{sub_dim} + 1"
        hi = f"s.m*{sub_dim} + {sub_dim}"
        return (
            "list_sum(list_transform("
            f"list_zip(list_slice({a}, {lo}, {hi}), "
            f"list_slice({b}, {lo}, {hi})), "
            "z -> (z[1] - z[2]) * (z[1] - z[2])))"
        )

    parts = []
    for t in range(1, iters + 1):
        parts.append(
            f"re{t} AS (\n"
            "  SELECT vec_id, m, code FROM (\n"
            "    SELECT r.vec_id, s.m, k.code,\n"
            "           row_number() OVER (PARTITION BY r.vec_id, s.m\n"
            f"             ORDER BY round({slice_d('r.rv', 'k.kvec')}, 6),"
            " k.code) AS rk\n"
            f"    FROM {corpus} r CROSS JOIN rsubs s CROSS JOIN k{t - 1} k\n"
            "  ) WHERE rk = 1\n"
            ")",
        )
        parts.append(
            f"ru{t} AS (\n"
            "  SELECT e.m, e.code, list(val ORDER BY pos) AS sl FROM (\n"
            "    SELECT e.m, e.code, d.i - 1 AS pos,\n"
            f"           round(avg(r.rv[e.m*{sub_dim} + d.i]), 9) AS val\n"
            f"    FROM re{t} e JOIN {corpus} r USING (vec_id),\n"
            f"         unnest(range(1, {sub_dim} + 1)) AS d(i)\n"
            "    GROUP BY e.m, e.code, d.i\n"
            "  ) e GROUP BY e.m, e.code\n"
            ")",
        )
        parts.append(
            f"k{t} AS (\n"
            "  SELECT k.code,\n"
            "         flatten(list(coalesce(u.sl,\n"
            f"           list_slice(k.kvec, s.m*{sub_dim} + 1,"
            f" s.m*{sub_dim} + {sub_dim}))\n"
            "           ORDER BY s.m)) AS kvec\n"
            f"  FROM k{t - 1} k CROSS JOIN rsubs s\n"
            f"  LEFT JOIN ru{t} u ON u.m = s.m AND u.code = k.code\n"
            "  GROUP BY k.code\n"
            ")",
        )
    return parts


def residual_codebook_ctes(
    cents: str,
    codes: int,
    subs: int,
    sub_dim: int,
    iters: int,
) -> tuple[str, str, str]:
    """CTE fragment mirroring ``ivfadc.fit_codebook(residual=True)``
    with an exact fit: returns ``(sql, rescorpus, kbook)`` where
    ``rescorpus(vec_id, cell, rv)`` is the residual corpus (x −
    centroid[cell], doubles) and ``kbook(code, kvec)`` is the fitted
    residual codebook after ``iters`` per-subspace Lloyd steps.

    Mirrors, clause by clause:
    - seeds: the first ``codes`` anchors (rank-renumbered), each
      centered on its own nearest cell by argmax dot, ties to the
      smallest cell (``_seed_residual_codebook``);
    - assignment: per (row, subspace) argmin of the 6-dp-ROUNDED
      squared L2 between the residual slice and each codebook slice,
      ties to the smallest code (``_nearest_code``);
    - update: per-(subspace, code, position) mean rounded to 9 dp
      (driver-side rounding in ``fit_codebook``); a (subspace, code)
      pair with no assigned rows keeps its previous slice — codebook
      entries are stitched per code from the per-subspace slices in
      subspace order (``flatten(list(... ORDER BY m))``).

    Requires the ``nn`` and ``{cents}`` CTEs from
    ``lloyd_centroid_ctes`` and a ``corpus`` CTE from
    ``final_assignment_cte`` in scope.
    """
    dot = SQL_DOT.format(a="b.embedding", b="c.cvec")
    center = (
        "list_transform(list_zip({v}, c.cvec), "
        "z -> CAST(z[1] AS DOUBLE) - z[2])"
    )

    parts = [
        "rescorpus AS (\n"
        "  SELECT a.vec_id, a.cell,\n"
        f"         {center.format(v='a.embedding')} AS rv\n"
        f"  FROM corpus a JOIN {cents} c ON a.cell = c.cell\n"
        ")",
        "rcb AS (\n"
        "  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding\n"
        f"  FROM (SELECT vec_id, embedding FROM nn ORDER BY vec_id LIMIT {codes})\n"
        ")",
        "rcbcell AS (\n"
        "  SELECT code, embedding, cell FROM (\n"
        "    SELECT b.code, b.embedding, c.cell,\n"
        "           row_number() OVER (PARTITION BY b.code\n"
        f"             ORDER BY {dot} DESC, c.cell) AS rk\n"
        f"    FROM rcb b CROSS JOIN {cents} c\n"
        "  ) WHERE rk = 1\n"
        ")",
        "k0 AS (\n"
        "  SELECT b.code,\n"
        f"         {center.format(v='b.embedding')} AS kvec\n"
        f"  FROM rcbcell b JOIN {cents} c ON b.cell = c.cell\n"
        ")",
        f"rsubs AS (SELECT unnest(range({subs})) AS m)",
    ]
    parts += _subspace_lloyd_parts("rescorpus", sub_dim, iters)
    return ",\n".join(parts), "rescorpus", f"k{iters}"


def pq_codebook_ctes(
    codes: int, subs: int, sub_dim: int, iters: int
) -> tuple[str, str]:
    """CTE fragment mirroring ``ivfadc.fit_codebook(residual=False,
    fit_fraction=1.0)`` — the RAW-vector per-subspace PQ fit behind the
    ``fit_pq`` bench handle: seeds are the first ``codes`` non-null
    vectors by vec_id rank (``_collect_anchors``), the corpus is the
    double-cast embedding list (float32 → double promotion is exact,
    matching ``x.cast("double")`` inside ``_nearest_code`` and the
    slice transform), and the iterations are the shared
    ``_subspace_lloyd_parts`` recursion.  Self-contained (defines its
    own ``pqnn``/``pqcorpus``); returns ``(sql, kbook)``."""
    parts = [
        "pqnn AS (\n"
        "  SELECT vec_id, embedding FROM embeddings\n"
        "  WHERE embedding IS NOT NULL\n"
        ")",
        "pqcorpus AS (\n"
        "  SELECT vec_id,\n"
        "         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv\n"
        "  FROM pqnn\n"
        ")",
        "k0 AS (\n"
        "  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,\n"
        "         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS kvec\n"
        f"  FROM (SELECT vec_id, embedding FROM pqnn ORDER BY vec_id LIMIT {codes})\n"
        ")",
        f"rsubs AS (SELECT unnest(range({subs})) AS m)",
    ]
    parts += _subspace_lloyd_parts("pqcorpus", sub_dim, iters)
    return ",\n".join(parts), f"k{iters}"


def centroid_model_rows_sql(k: int, iters: int, id_col: str) -> str:
    """Complete query emitting the EXACT-fit Lloyd centroid model as
    ``({id_col}, dim, val)`` rows, 6-dp — the r10 oracle for the
    ``fit_anc`` bench handle once its registered default flips to
    ``fit_fraction=1.0`` (pre-staged; see model_fit.py)."""
    return (
        f"WITH {lloyd_centroid_ctes(k, iters)}\n"
        f"SELECT cell AS {id_col}, i - 1 AS dim, round(cvec[i], 6) AS val\n"
        f"FROM c{iters}, unnest(range(1, len(cvec) + 1)) AS t(i)"
    )


def pq_model_rows_sql(codes: int, subs: int, sub_dim: int, iters: int) -> str:
    """Complete query emitting the EXACT-fit PQ codebook as
    ``(code, dim, val)`` rows, 6-dp — the r10 oracle for ``fit_pq``
    once its registered default flips to ``fit_fraction=1.0``."""
    sql, kbook = pq_codebook_ctes(codes, subs, sub_dim, iters)
    return (
        f"WITH {sql}\n"
        "SELECT code, i - 1 AS dim, round(kvec[i], 6) AS val\n"
        f"FROM {kbook}, unnest(range(1, len(kvec) + 1)) AS t(i)"
    )


def probe_cells_cte(
    name: str, cents: str, n_probes: int, nprobe: int
) -> str:
    """CTE expanding each probe (vec_id < ``n_probes``) to its
    ``nprobe`` nearest cells by dot product, ties to the smaller cell —
    ``_ranked_cells`` / ``ivftk``'s ranked-cell slice."""
    dot = SQL_DOT.format(a="p.embedding", b="c.cvec")
    nrm = SQL_NORM.format(a="p.embedding")
    return (
        f"{name} AS (\n"
        "  SELECT probe_id, pvec, pnrm, cell FROM (\n"
        f"    SELECT p.vec_id AS probe_id, p.embedding AS pvec,\n"
        f"           {nrm} AS pnrm, c.cell,\n"
        "           row_number() OVER (\n"
        "             PARTITION BY p.vec_id\n"
        f"             ORDER BY {dot} DESC, c.cell\n"
        "           ) AS rk\n"
        f"    FROM nn p CROSS JOIN {cents} c\n"
        f"    WHERE p.vec_id < {n_probes}\n"
        f"  ) WHERE rk <= {nprobe}\n"
        ")"
    )
