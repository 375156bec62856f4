"""Distributed BPE merge learning vs a plain-Python oracle
(operators/bpe.py)."""

from __future__ import annotations

from collections import Counter

from spark_streaming_kafka_spark.operators.bpe import learn_bpe_merges


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Reference BPE: identical construction (chars + '</w>'), identical
    tie-break (max count, then lexicographic pair), greedy LTR apply."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    seqs = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            f = vocab[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in seqs.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            seqs[w] = res
    return merges, seqs


def test_bpe_matches_python_oracle(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide wider",
        "low newer wide lowest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = learn_bpe_merges(df, n_merges=10)
    want, _ = _py_bpe(texts, 10)
    assert got == want
    assert len(got) == 10  # enough repetition for the full budget


def test_bpe_early_stop_and_empty(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    # every word is a single char: pairs are (char, </w>) each freq 1
    assert learn_bpe_merges(df, n_merges=5) == []
    df2 = spark.createDataFrame([("aa aa",)], "text string")
    got = learn_bpe_merges(df2, n_merges=5)
    assert got == _py_bpe(["aa aa"], 5)[0]
    # (a,a) and (a,</w>) tie at count 2; '<' sorts before 'a', so the
    # deterministic tie-break picks (a, </w>) in both implementations
    assert got[0] == ("a", "</w>")


def test_apply_bpe_reproduces_training_state(spark):
    """Rank-order encoding of the training corpus lands every word at
    the training loop's final symbol sequence (BPE's defining
    consistency property), and unseen words fall back gracefully."""
    from spark_streaming_kafka_spark.operators.bpe import apply_bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide wider",
        "low newer wide lowest",
    ]
    merges, final_seqs = _py_bpe(texts, 10)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    enc = apply_bpe(df, merges)
    for r in enc.collect():
        want = []
        for w in r["text"].split(" "):
            want.extend(final_seqs[w])
        assert r["bpe_tokens"] == want
    # unseen word: only learned merges apply, rest stays character-level
    unseen = spark.createDataFrame([("zzz lowx",)], "text string")
    row = apply_bpe(unseen, merges).collect()[0]
    assert row["bpe_tokens"][:3] == ["z", "z", "z"]


def test_bpe_loop_does_not_mutate_session_conf(spark):
    """Partition control is per-plan: _pair_counts with an explicit
    num_partitions plans exactly ONE exchange (the hash repartition on
    the grouping keys satisfies the aggregate's distribution), and the
    training loop leaves spark.sql.shuffle.partitions untouched."""
    from spark_streaming_kafka_spark.operators.bpe import _pair_counts

    df = spark.createDataFrame([("aa ab aa",)], "text string")
    # symdf built directly (in the loop it is persisted, so only the
    # pair-count subtree's exchanges matter)
    symdf = spark.createDataFrame(
        [(2, ["a", "a", "</w>"]), (1, ["a", "b", "</w>"])],
        "freq long, syms array<string>",
    )
    plan = (
        _pair_counts(symdf, num_partitions=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # repartition only, agg reuses it

    before = spark.conf.get("spark.sql.shuffle.partitions")
    learn_bpe_merges(df, 2)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
