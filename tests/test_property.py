"""Property-based tests (hypothesis): the custom operators against
independent in-Python oracles on randomized inputs — the places where a
hand-picked example could miss a tie/boundary case (equal timestamps,
duplicate keys, singleton components, tolerance edges).

Example counts are kept small: each example round-trips through Spark
(~100 ms), so these buy breadth of INPUTS, not volume."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_streaming_kafka_spark.operators.asof import asof_join, band_join
from spark_streaming_kafka_spark.operators.dedup import connected_components

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s))


# unique (key, ts) right sides — the operator's documented precondition
right_rows = st.dictionaries(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), st.integers(0, 9),
    min_size=1, max_size=12,
).map(lambda d: [(k, t, float(v)) for (k, t), v in d.items()])
left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
)


@given(left=left_rows, right=right_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(left)],
        "k int, ts timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), v) for k, t, v in right], "k int, ts timestamp, v double"
    )
    got = {
        r["lid"]: (r["m_ts"], r["m_v"])
        for r in asof_join(ldf, rdf, "k", prefix="m_").collect()
    }

    lpd = pd.DataFrame(
        {"k": [k for k, _ in left], "ts": [_ts(t) for _, t in left],
         "lid": range(len(left))}
    ).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(
        {"k": [k for k, _, _ in right], "ts": [_ts(t) for _, t, _ in right],
         "v": [v for _, _, v in right]}
    ).sort_values("ts", kind="stable")
    exp = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    for _, row in exp.iterrows():
        # matched value per pandas; matched ts = max right ts <= left ts
        got_ts, got_v = got[row["lid"]]
        if pd.isna(row["v"]):
            assert got_v is None and got_ts is None
        else:
            assert got_v == row["v"]
            cands = rpd[(rpd["k"] == row["k"]) & (rpd["ts"] <= row["ts"])]
            assert got_ts == cands["ts"].max().to_pydatetime()


@given(left=left_rows, right=left_rows, tol=st.sampled_from([1000, 5000, 20000]))
@settings(**_SETTINGS)
def test_band_join_matches_bruteforce(spark, left, right, tol):
    ldf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(left)],
        "k int, lts timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(right)],
        "k int, rts timestamp, rid int",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in band_join(ldf, rdf, "k", tol, "lts", "rts").collect()
    )
    want = sorted(
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and abs(lt - rt) * 1000 <= tol
    )
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=20
    )
)
@settings(**{**_SETTINGS, "max_examples": 8})  # each example iterates jobs
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


# --- curation properties ---------------------------------------------

bloom_keys = st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=40, unique=True)


@given(keys=bloom_keys)
@settings(**_SETTINGS)
def test_bloom_no_false_negatives_property(spark, keys):
    """Structural guarantee, checked over arbitrary key sets: every key
    that went into the bitmap passes the membership test."""
    from spark_streaming_kafka_spark.operators.curation import (
        bloom_bitmap,
        bloom_might_contain,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bitmap = bloom_bitmap(df, "k", m_bits=1 << 12)
    assert df.filter(
        bloom_might_contain(bitmap, F.col("k"), m_bits=1 << 12)
    ).count() == len(keys)


strata = st.lists(
    st.tuples(st.integers(0, 10**6), st.sampled_from(["a", "b", "c"])),
    min_size=2, max_size=40, unique_by=lambda r: r[0],
)


@given(rows=strata)
@settings(**_SETTINGS)
def test_stratified_sample_subset_and_deterministic(spark, rows):
    """The sample is a subset, keeps every minority-stratum row, and is
    identical under different partitionings."""
    from spark_streaming_kafka_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(rows, "id long, cls string")
    ids = {r["id"] for r in stratified_sample(df, "cls", "id").collect()}
    all_ids = {r[0] for r in rows}
    assert ids <= all_ids
    counts: dict[str, int] = {}
    for _, c in rows:
        counts[c] = counts.get(c, 0) + 1
    mn = min(counts.values())
    minority = {cls for cls, n in counts.items() if n == mn}
    kept_minority = {r[0] for r in rows if r[1] in minority}
    assert kept_minority <= ids  # threshold = scale exactly => all kept
    again = {
        r["id"]
        for r in stratified_sample(df.repartition(5), "cls", "id").collect()
    }
    assert ids == again


# --- repetition features & passage dedup vs Python oracles -------------

doc_texts = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=6,
)


@given(texts=doc_texts)
@settings(**_SETTINGS)
def test_repetition_features_match_python_oracle(spark, texts):
    from collections import Counter

    from spark_streaming_kafka_spark.operators.repetition import (
        repetition_features,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        bigrams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        top = max(Counter(bigrams).values()) / len(bigrams) if bigrams else 0.0
        tris = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        dup = {g for g, c in Counter(tris).items() if c >= 2}
        cov = {p for j, g in enumerate(tris) if g in dup for p in (j, j + 1, j + 2)}
        frac = len(cov) / len(toks) if toks else 0.0
        assert got[i]["n_tokens"] == len(toks)
        assert abs(got[i]["top_2gram_frac"] - round(top, 6)) < 1e-9
        assert abs(got[i]["dup_3gram_frac"] - round(frac, 6)) < 1e-9


@given(texts=doc_texts, span=st.integers(1, 5))
@settings(**_SETTINGS)
def test_passage_dedup_conservation_and_idempotence(spark, texts, span):
    from spark_streaming_kafka_spark.operators.repetition import passage_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = passage_dedup(df, span=span).collect()
    n_toks = {i: len([x for x in t.split(" ") if x]) for i, t in enumerate(texts)}
    # docs with tokens appear exactly once; token-less docs not at all
    assert {r["doc_id"] for r in rows} == {i for i, n in n_toks.items() if n > 0}
    total_passages = sum(r["n_passages"] for r in rows)
    total_kept = sum(r["n_kept"] for r in rows)
    assert total_passages == sum(-(-n // span) for n in n_toks.values() if n > 0)
    # kept = number of DISTINCT passages corpus-wide (first-occurrence rule)
    distinct = {
        " ".join([x for x in t.split(" ") if x][j * span : (j + 1) * span])
        for t in texts
        for j in range(-(-len([x for x in t.split(" ") if x]) // span))
    }
    assert total_kept == len(distinct)
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_passages"]


# --- CDC upsert/diff round-trip ----------------------------------------

kv_rows = st.dictionaries(
    st.integers(0, 12), st.tuples(st.integers(0, 5), st.booleans()),
    min_size=0, max_size=10,
).map(lambda d: [(k, f"v{a}" if b else None, float(a)) for k, (a, b) in d.items()])


@given(base=kv_rows, updates=kv_rows)
@settings(**_SETTINGS)
def test_upsert_matches_dict_merge(spark, base, updates):
    """upsert ≡ dict.update on keyed rows, including NULL update values
    winning whole-row."""
    from spark_streaming_kafka_spark.operators.cdc import upsert

    schema = "k long, a string, b double"
    bdf = spark.createDataFrame(base, schema)
    udf_ = spark.createDataFrame(updates, schema)
    got = {r["k"]: (r["a"], r["b"]) for r in upsert(bdf, udf_, "k").collect()}
    want = {k: (a, b) for k, a, b in base}
    want.update({k: (a, b) for k, a, b in updates})
    assert got == want


@given(old=kv_rows, new=kv_rows)
@settings(**_SETTINGS)
def test_snapshot_diff_matches_dict_compare(spark, old, new):
    from spark_streaming_kafka_spark.operators.cdc import snapshot_diff

    schema = "k long, a string, b double"
    odf = spark.createDataFrame(old, schema)
    ndf = spark.createDataFrame(new, schema)
    got = {r["k"]: r["change"] for r in snapshot_diff(odf, ndf, "k").collect()}
    od = {k: (a, b) for k, a, b in old}
    nd = {k: (a, b) for k, a, b in new}
    want = {}
    for k in od.keys() | nd.keys():
        if k not in nd:
            want[k] = "removed"
        elif k not in od:
            want[k] = "added"
        elif od[k] != nd[k]:
            want[k] = "changed"
    assert got == want


# --- mode / trailing window vs brute force ------------------------------

mode_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 4)), min_size=1, max_size=25
)


@given(rows=mode_rows)
@settings(**_SETTINGS)
def test_group_mode_matches_counter(spark, rows):
    from collections import Counter

    from spark_streaming_kafka_spark.operators.windows import group_mode

    df = spark.createDataFrame(rows, "g int, v int")
    got = {
        r["g"]: (r["mode"], r["mode_count"])
        for r in group_mode(df, "g", "v").collect()
    }
    want = {}
    for g in {g for g, _ in rows}:
        c = Counter(v for gg, v in rows if gg == g)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        want[g] = best
    assert got == want


trail_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 15), st.integers(-5, 5)),
    min_size=1, max_size=20,
)


@given(rows=trail_rows, window=st.integers(0, 6))
@settings(**_SETTINGS)
def test_trailing_range_sum_matches_bruteforce(spark, rows, window):
    from spark_streaming_kafka_spark.operators.windows import (
        trailing_range_sum,
    )

    df = spark.createDataFrame(
        [(g, d, float(v)) for g, d, v in rows], "g int, day long, amt double"
    )
    out = trailing_range_sum(df, "g", "day", "amt", trailing=window)
    for r in out.collect():
        want = sum(
            v
            for g, d, v in rows
            if g == r["g"] and r["day"] - window <= d <= r["day"]
        )
        assert r["trailing_sum"] == float(want)


# --- suffix-array-style substring dedup vs plain-Python oracle --------

# tiny vocab + short docs force shingle collisions, boundary islands,
# within-doc repeats, and fully-covered documents
_doc_texts = st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _py_dup_spans(texts: list[str], k: int) -> dict:
    """Independent reference: dict doc_id -> list of (start, end,
    n_shingles) maximal islands of duplicated k-gram starts."""
    from collections import Counter

    toks = {i: [t for t in txt.split(" ") if t] for i, txt in enumerate(texts)}
    counts = Counter()
    for t in toks.values():
        for p in range(len(t) - k + 1):
            counts[tuple(t[p : p + k])] += 1
    spans = {}
    for i, t in toks.items():
        hits = [
            p for p in range(len(t) - k + 1) if counts[tuple(t[p : p + k])] >= 2
        ]
        out = []
        for p in hits:
            if out and p - out[-1][-1][-1] <= k:
                out[-1].append((p,))
            else:
                out.append([(p,)])
        spans[i] = [
            (grp[0][0], grp[-1][0] + k - 1, len(grp)) for grp in out
        ]
    return spans


@given(texts=_doc_texts, k=st.integers(2, 4))
@settings(**_SETTINGS)
def test_substring_spans_and_rewrite_match_python_oracle(spark, texts, k):
    from spark_streaming_kafka_spark.operators.repetition import (
        repeated_substring_spans,
        substring_dedup_rewrite,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = _py_dup_spans(texts, k)
    got: dict = {}
    for r in repeated_substring_spans(docs, k=k).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_shingles"])
        )
    for i in want:
        assert sorted(got.get(i, [])) == sorted(want[i]), (i, texts, k)

    # rewrite coherence: kept tokens = original minus covered indices
    rw = {r["doc_id"]: r for r in substring_dedup_rewrite(docs, k=k).collect()}
    for i, txt in enumerate(texts):
        t = [x for x in txt.split(" ") if x]
        covered = set()
        for s, e, _ in want[i]:
            covered.update(range(s, e + 1))
        expect = " ".join(x for p, x in enumerate(t) if p not in covered)
        assert rw[i]["clean_text"] == expect, (i, texts, k)
        assert rw[i]["n_cut"] == len(covered)


# KMV bottom-k: random key multisets across groups, random k and fanout —
# the salted two-stage rank must equal the Python bottom-k of each
# group's distinct md5 hashes, including pos ordering (r8: the default
# path changed from a single global rank window to the two-stage form).
kmv_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300)), min_size=1, max_size=60
)


@given(rows=kmv_rows, k=st.sampled_from([1, 2, 7, 16]), fanout=st.sampled_from([1, 3, 8]))
@settings(**{**_SETTINGS, "max_examples": 10})
def test_kmv_sketch_matches_python_bottom_k(spark, rows, k, fanout):
    import hashlib

    from spark_streaming_kafka_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame(
        [(f"g{g}", f"key_{v}") for g, v in rows], "g string, k string"
    )
    got = {}
    for r in kmv_sketch(df, "k", ["g"], k=k, fanout=fanout).collect():
        got.setdefault(r["g"], []).append((r["pos"], r["h"]))
    expect = {}
    for g in {f"g{g}" for g, _ in rows}:
        hs = sorted(
            {
                int(hashlib.md5(f"key_{v}".encode()).hexdigest()[:15], 16)
                for gg, v in rows
                if f"g{gg}" == g
            }
        )[:k]
        expect[g] = [(i + 1, h) for i, h in enumerate(hs)]
    assert {g: sorted(v) for g, v in got.items()} == expect


@given(
    rows=st.dictionaries(
        st.integers(0, 40),
        st.tuples(st.integers(0, 2), st.floats(0.1, 100.0)),
        min_size=1,
        max_size=20,
    ),
    n=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_weighted_sample_matches_python_ares(spark, rows, n):
    """weighted_sample_noreplace == plain-Python A-Res with the same
    hash uniform: identical members AND ranks per group, any weights."""
    import hashlib
    import math

    from spark_streaming_kafka_spark.operators.curation import (
        weighted_sample_noreplace,
    )

    data = [(g, i, w) for i, (g, w) in rows.items()]
    df = spark.createDataFrame(data, "g long, id long, w double")
    got = {
        (r["g"], r["id"]): r["pos"]
        for r in weighted_sample_noreplace(
            df, "w", n, group_cols=["g"], id_col="id"
        ).collect()
    }

    def key(i, w):
        h = int(hashlib.md5(f"wsr_{i}".encode()).hexdigest()[:15], 16)
        return round(math.log((h + 1) / float(1 << 60)) / w, 9)

    expected = {}
    bygroup: dict = {}
    for g, i, w in data:
        bygroup.setdefault(g, []).append((i, w))
    for g, members in bygroup.items():
        ranked = sorted(members, key=lambda iw: (-key(iw[0], iw[1]), iw[0]))
        for pos, (i, _) in enumerate(ranked[:n], 1):
            expected[(g, i)] = pos
    assert got == expected


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    ),
    split=st.integers(1, 7),
)
@settings(**_SETTINGS)
def test_manifest_novelty_equals_batch_on_any_split(spark, docs, split):
    """For ANY history/batch split at an id boundary, the incremental
    manifest scoring of the batch equals the batch operator's rows for
    those ids on the full corpus — the incremental==batch contract."""
    from spark_streaming_kafka_spark.operators.dedup import doc_shingles
    from spark_streaming_kafka_spark.operators.repetition import (
        ngram_novelty,
        ngram_novelty_vs_manifest,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        r["doc_id"]: (r["n_grams"], r["novel_grams"], r["novelty"])
        for r in ngram_novelty(df, k=2).collect()
    }
    history = df.filter(F.col("doc_id") < split)
    batch = df.filter(F.col("doc_id") >= split)
    manifest = doc_shingles(history, k=2).select("shingle").distinct()
    inc = {
        r["doc_id"]: (r["n_grams"], r["novel_grams"], r["novelty"])
        for r in ngram_novelty_vs_manifest(batch, manifest, k=2).collect()
    }
    assert inc == {i: v for i, v in full.items() if i >= split}


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.sampled_from("xyz")),
        min_size=2,
        max_size=24,
        unique_by=lambda e: (e[0], e[1]),
    )
)
@settings(**_SETTINGS)
def test_markov_probs_normalize_and_count_pairs(spark, events):
    """Transition counts equal the per-key consecutive pairs of the
    (ts, id)-sorted sequences, and probabilities sum to 1 per prev
    state (within rounding)."""
    from collections import Counter

    from spark_streaming_kafka_spark.operators.sessionize import (
        markov_transitions,
    )

    rows = [
        (eid, u, _ts(t), s) for eid, (u, t, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = markov_transitions(df).collect()
    seqs: dict = {}
    for eid, u, t, s in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        seqs.setdefault(u, []).append(s)
    expected = Counter(
        (seq[i], seq[i + 1])
        for seq in seqs.values()
        for i in range(len(seq) - 1)
    )
    got = {(r["prev_state"], r["next_state"]): r["n_transitions"] for r in out}
    assert got == dict(expected)
    sums: dict = {}
    for r in out:
        sums[r["prev_state"]] = sums.get(r["prev_state"], 0.0) + r["prob"]
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values())


# --- r10 operators --------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1, max_size=25,
    )
)
@settings(**_SETTINGS)
def test_skyline_properties(spark, pts):
    """Frontier ⊆ input; no member weakly dominated; every non-member
    weakly dominated by someone — the NOT-EXISTS definition verbatim."""
    from spark_streaming_kafka_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(i, x, float(y)) for i, (x, y) in enumerate(pts)],
        "id int, x long, y double",
    )
    got = [(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()]
    fset = set(got)

    def dominated(a):
        return any(
            b[0] >= a[0] and b[1] >= a[1] and b != a
            for b in {(x, float(y)) for x, y in pts}
        )

    for p in fset:
        assert p in {(x, float(y)) for x, y in pts}
        assert not dominated(p)
    for p in {(x, float(y)) for x, y in pts} - fset:
        assert dominated(p)
    # multiplicity: every input row with frontier coords is returned
    assert len(got) == sum(1 for p in pts if (p[0], float(p[1])) in fset)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 40), st.integers(1, 5)),
        min_size=1, max_size=20,
    )
)
@settings(**_SETTINGS)
def test_weighted_median_matches_python_oracle(spark, rows):
    """Smallest value whose cumulative (value-sorted) weight reaches
    half the total — duplicates of (g, v) allowed, tiebreak by id."""
    from spark_streaming_kafka_spark.operators.percentile import (
        weighted_median,
    )

    df = spark.createDataFrame(
        [(g, float(v), float(w), i) for i, (g, v, w) in enumerate(rows)],
        "g int, v double, w double, tb long",
    )
    got = {
        r["g"]: (r["weighted_median"], r["total_weight"])
        for r in weighted_median(df, "g", "v", "w", ["tb"]).collect()
    }
    by_g: dict[int, list[tuple[float, int]]] = {}
    for g, v, w in rows:
        by_g.setdefault(g, []).append((float(v), int(w)))
    for g, items in by_g.items():
        items.sort()
        tot = sum(w for _, w in items)
        cum = 0
        for v, w in items:
            cum += w
            if 2 * cum >= tot:
                assert got[g] == (v, tot), (g, items)
                break


@given(
    seq=st.lists(st.sampled_from(["a", "b", None]), min_size=1, max_size=15)
)
@settings(**_SETTINGS)
def test_scd2_reconstructs_observation_sequence(spark, seq):
    """Run-length property: versions = collapsed runs of the attribute
    sequence (null-safe), validity intervals tile [first_ts, open)."""
    from spark_streaming_kafka_spark.operators.cdc import scd2_history

    rows = [("k", i, _ts(i * 60), v) for i, v in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "key string, event_id long, ts timestamp, attr string"
    )
    out = sorted(
        scd2_history(df, ["key"], "attr", "ts", "event_id").collect(),
        key=lambda r: r["version"],
    )
    runs = []
    for v in seq:
        if not runs or runs[-1] != v:
            runs.append(v)
    assert [r["attr"] for r in out] == runs
    # intervals tile: each version's end is the next version's start
    for a, b in zip(out, out[1:]):
        assert a["effective_to_ms"] == b["effective_from_ms"]
    assert out[-1]["effective_to_ms"] is None


@given(
    gaps=st.lists(st.integers(0, 600), min_size=1, max_size=15),
    dur=st.integers(60, 300),
)
@settings(**_SETTINGS)
def test_merge_intervals_matches_python_sweep(spark, gaps, dur):
    """Islands equal the classic sorted sweep (merge while
    start <= running max end) on any gap pattern and duration."""
    from spark_streaming_kafka_spark.operators.sessionize import (
        merge_intervals,
    )

    ts, times = 0, []
    for g in gaps:
        ts += g
        times.append(ts)
    df = spark.createDataFrame(
        [("u", i, _ts(t)) for i, t in enumerate(times)],
        "user_id string, event_id long, ts timestamp",
    )
    got = sorted(
        (r["island_idx"], r["start_ms"], r["end_ms"], r["n_events"])
        for r in merge_intervals(
            df, ["user_id"], duration_ms=dur * 1000
        ).collect()
    )
    base = int(_ts(0).timestamp() * 1000)
    islands, cur = [], None
    for t in sorted(times):
        s, e = base + t * 1000, base + (t + dur) * 1000
        if cur and s <= cur[1]:
            cur[1] = max(cur[1], e)
            cur[2] += 1
        else:
            cur = [s, e, 1]
            islands.append(cur)
    expect = sorted(
        (i, s, e, n) for i, (s, e, n) in enumerate(islands)
    )
    assert got == expect
