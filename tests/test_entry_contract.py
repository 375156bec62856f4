"""Driver-contract invariants for __spark_entry__: the grading harness
consumes queries()/oracle_sql()/entry() — shape breakage here costs a
whole round, so it is pinned."""

from __future__ import annotations

import __spark_entry__ as entry


def test_registry_shapes():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    # rows-only entries are the documented exceptions, kept rare:
    # - als_recommend_topk: matrix-factor values have no SQL oracle
    #   (float nondeterminism across BLAS builds); its invariants ARE
    #   oracle-checked via the hash-gated sibling
    #   als_recommend_topk_shape (exact user set, dense top-5 ranks,
    #   monotone ratings) — the exception covers factor VALUES only.
    # - bpe_merges: k dependent arg-max rounds are not SQL-expressible
    #   (recursive CTEs can't re-aggregate per iteration); the merge
    #   SEQUENCE is pinned exactly against a plain-Python BPE oracle in
    #   tests/test_bpe.py, and determinism makes rows-only stable.
    # - bpe_encode_tokens (r9): rank-iterative in-word merge
    #   application — same non-SQL-expressibility as bpe_merges; the
    #   apply semantics are pinned by tests/test_bpe.py's plain-Python
    #   oracle and the apply-reproduces-training invariant.
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"als_recommend_topk", "bpe_merges", "bpe_encode_tokens"}
    assert "als_recommend_topk_shape" in oracles
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())


def test_entry_runs_flagship(spark):
    out = entry.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert out.columns  # stable, named schema
