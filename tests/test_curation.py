"""Corpus-curation operators (operators/curation.py): decontamination,
PII scrubbing, stratified sampling, manifest dedup, bloom prefilter."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_spark.operators.curation import (
    benchmark_contamination,
    bloom_bitmap,
    bloom_might_contain,
    manifest_dedup,
    pii_scrub,
    stratified_sample,
)


def test_pii_scrub_redacts_all_planted_forms(spark):
    cases = [
        ("mail me at jane.doe+spam@sub.example.co.uk today", "<EMAIL>"),
        ("call 555-867-5309 now", "<PHONE>"),
        ("also 555.867.5309 works", "<PHONE>"),
        ("server at 192.168.001.1 down", "<IP>"),
        ("plain text stays untouched", None),
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)], "i int, t string")
    out = {r["i"]: r["s"] for r in df.select("i", pii_scrub(F.col("t")).alias("s")).collect()}
    for i, (raw, marker) in enumerate(cases):
        if marker is None:
            assert out[i] == raw
        else:
            assert marker in out[i]
            # no residual digits-or-@ from the planted PII form
            assert "@" not in out[i].replace("<EMAIL>", "")
    assert out[4] == "plain text stays untouched"


def test_pii_scrub_email_not_half_eaten_as_phone(spark):
    # an address with digit runs must become <EMAIL>, not <EMAIL>+<PHONE> debris
    df = spark.createDataFrame([("x 555-123-4567@example.com y",)], "t string")
    s = df.select(pii_scrub(F.col("t")).alias("s")).first()["s"]
    assert s == "x <EMAIL> y"


def test_benchmark_contamination_self_and_disjoint(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # benchmark member
            (1, "alpha beta gamma delta epsilon eta"),    # shares 2 of its shingles? -> partial
            (2, "one two three four five six seven"),     # disjoint
            (3, "tiny doc"),                              # < k words -> 0 shingles
        ],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r["doc_id"]: r for r in benchmark_contamination(docs, bench, k=5).collect()}
    assert out[0]["contamination"] == 1.0          # benchmark self-reports 1.0
    assert out[2]["n_contaminated"] == 0
    assert out[3]["n_shingles"] == 0 and out[3]["contamination"] == 0.0
    # doc 1: shingles {alpha..epsilon, beta..eta}; the first is in the benchmark
    assert out[1]["n_shingles"] == 2 and out[1]["n_contaminated"] == 1
    assert out[1]["contamination"] == 0.5


def test_stratified_sample_balances_and_is_partition_invariant(spark):
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, cls string")
    kept = stratified_sample(df, "cls", "id").groupBy("cls").count().collect()
    by = {r["cls"]: r["count"] for r in kept}
    # expected kept per class ~= minority size (hash-uniform, not exact)
    assert by["small"] == 40                      # minority keeps everything
    assert 20 <= by["big"] <= 60                  # ~40 expected
    a = {r["id"] for r in stratified_sample(df.repartition(1), "cls", "id").collect()}
    b = {r["id"] for r in stratified_sample(df.repartition(7), "cls", "id").collect()}
    assert a == b                                 # partitioning-independent


def test_manifest_dedup_drops_seen_and_within_batch(spark):
    manifest = spark.createDataFrame([("old doc",)], "text string").select(
        F.md5("text").alias("text_hash")
    )
    new = spark.createDataFrame(
        [(10, "old doc"), (11, "fresh"), (12, "fresh"), (13, "unique")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in manifest_dedup(new, manifest).collect()}
    assert set(out) == {11, 13}                   # 10 seen before; 12 dups 11
    assert out[11]["n_copies"] == 2
    assert out[13]["n_copies"] == 1


def test_bloom_never_false_negative_and_prunes(spark):
    keys = spark.range(0, 300).select((F.col("id") * 17).alias("k"))
    bitmap = bloom_bitmap(keys, "k")
    members = keys.filter(bloom_might_contain(bitmap, F.col("k"))).count()
    assert members == 300                         # zero false negatives, ever
    probe = spark.range(100_000, 101_000).select(F.col("id").alias("k"))
    fp = probe.filter(bloom_might_contain(bitmap, F.col("k"))).count()
    # m=2^16, n=300, k=3 -> fp rate ~ (1-e^{-900/65536})^3 ~ 2.5e-6
    assert fp <= 2


def test_contamination_broadcasts_benchmark_never_shuffles_corpus_by_shingle(spark, sf_dir):
    """The corpus side must reach the shingle join without an Exchange
    (the benchmark side broadcasts); the only shuffle is the per-doc
    hit-count aggregation."""
    from spark_streaming_kafka_spark.plans.inspect import explain_str
    from spark_streaming_kafka_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    plan = explain_str(benchmark_contamination(docs, bench), "formatted")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan           # corpus never shuffles by shingle


def test_bloom_prefilter_is_scan_side_no_join(spark, sf_dir):
    """The prefilter must be a Filter over the scan — no join, no
    shuffle — so the pruning happens before any exchange."""
    from spark_streaming_kafka_spark.plans.inspect import explain_str
    from spark_streaming_kafka_spark.sources.readers import load_table

    cust = load_table(spark, sf_dir, "customer").select("c_custkey").limit(50)
    bitmap = bloom_bitmap(cust, "c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    pref = orders.filter(bloom_might_contain(bitmap, F.col("o_custkey")))
    plan = explain_str(pref, "simple")
    assert "Join" not in plan and "Exchange" not in plan


# --- repetition filters & passage dedup (operators/repetition.py) -----

def test_repetition_features_known_values(spark):
    from spark_streaming_kafka_spark.operators.repetition import repetition_features

    rows = [
        (1, "a b a b a b c"),  # bigrams: 'a b'x3,'b a'x2,'b c'x1 -> 3/6;
                               # dup trigrams 'a b a'x2 @0,2 / 'b a b'x2 @1,3
                               # cover positions 0..5 -> 6/7
        (2, "x y z"),          # nothing repeats
        (3, ""),               # degenerate: no tokens
        (4, "q"),              # single token: no bigrams at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert out[1]["n_tokens"] == 7
    assert out[1]["top_2gram_frac"] == 0.5
    assert abs(out[1]["dup_3gram_frac"] - 6 / 7) < 1e-6
    assert out[2]["dup_3gram_frac"] == 0.0
    assert out[3]["n_tokens"] == 0 and out[3]["top_2gram_frac"] == 0.0
    assert out[4]["top_2gram_frac"] == 0.0 and out[4]["dup_3gram_frac"] == 0.0
    assert len(out) == 4  # every document appears, even degenerate ones


def test_passage_dedup_first_occurrence_and_empty_doc(spark):
    from spark_streaming_kafka_spark.operators.repetition import (
        passage_dedup,
        passages,
    )

    rows = [
        (1, "a b a b a b c"),  # passages (span=4): 'a b a b', 'a b c'
        (2, "a b a b x y z w e"),  # first passage duplicates doc1's
        (3, ""),               # token-less: no passages at all
        (5, "a b a b a b c"),  # full duplicate of doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = {(r["doc_id"], r["passage_idx"]): r["passage"]
         for r in passages(df, span=4).collect()}
    assert p[(1, 0)] == "a b a b" and p[(1, 1)] == "a b c"
    assert (3, 0) not in p  # empty doc contributes nothing

    out = {r["doc_id"]: r for r in passage_dedup(df, span=4).collect()}
    assert out[1]["n_kept"] == 2  # doc 1 is the first occurrence of both
    assert out[2]["n_kept"] == 2 and out[2]["n_passages"] == 3
    assert out[5]["n_kept"] == 0 and out[5]["kept_frac"] == 0.0
    assert 3 not in out


# --- token-budgeted mixture (operators/curation.py) -------------------

def test_mixture_rates_equal_and_weighted(spark):
    from spark_streaming_kafka_spark.operators.curation import mixture_rates

    rows = (
        # source A: 10 docs x 10 tokens = 100 tokens
        [(i, "A", "t " * 9 + "t") for i in range(10)]
        # source B: 2 docs x 5 tokens = 10 tokens
        + [(100 + i, "B", "u u u u u") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    eq = {r["source"]: r for r in mixture_rates(df, token_budget=40).collect()}
    assert eq["A"]["tokens_available"] == 100 and eq["A"]["rate"] == 0.2
    assert eq["B"]["tokens_available"] == 10 and eq["B"]["rate"] == 1.0

    wt = {
        r["source"]: r
        for r in mixture_rates(df, 40, weights={"A": 0.75, "B": 0.25}).collect()
    }
    assert wt["A"]["rate"] == 0.3  # 30-token share of a 100-token source
    assert wt["B"]["rate"] == 1.0  # share exceeds availability -> keep all


def test_mixture_sample_keeps_undersized_sources_whole(spark):
    from spark_streaming_kafka_spark.operators.curation import mixture_sample

    rows = [(i, "A", "t " * 9 + "t") for i in range(50)] + [
        (100 + i, "B", "u u u u u") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mixture_sample(df, token_budget=100).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # B's 15 tokens fit inside its 50-token share: every B doc survives
    assert len(by_src.get("B", [])) == 3
    # A (500 tokens, 50-token share -> rate 0.1) must actually downsample
    assert 0 < len(by_src.get("A", [])) < 50
    # deterministic: a second run yields the identical id set
    again = {r["doc_id"] for r in mixture_sample(df, token_budget=100).collect()}
    assert again == {r["doc_id"] for r in out}


def test_mixture_weights_must_cover_all_sources(spark):
    """An explicit weights dict missing an observed source must raise
    (an inner join would silently drop that source from the mixture)."""
    import pytest as _pytest

    from spark_streaming_kafka_spark.operators.curation import mixture_rates

    docs = spark.createDataFrame(
        [(1, "some text here", "web"), (2, "other words", "code")],
        "doc_id long, text string, source string",
    )
    with _pytest.raises(ValueError, match="code"):
        mixture_rates(docs, 100, weights={"web": 1.0})
    # full coverage works, weight 0.0 legitimately excludes a source
    rates = {
        r["source"]: r["rate"]
        for r in mixture_rates(
            docs, 100, weights={"web": 1.0, "code": 0.0}
        ).collect()
    }
    assert rates["code"] == 0.0 and rates["web"] > 0


def test_repeated_substring_spans_exact_boundaries(spark):
    """Hand-computable corpus: k=3 shingles, merged-island boundaries,
    NULL/short docs vanish, within-doc repetition counts too."""
    from spark_streaming_kafka_spark.operators.repetition import (
        repeated_substring_spans,
    )

    rows = [
        # docs 1 and 2 share 'p q r s' -> shingles (p q r), (q r s)
        (1, "a b p q r s c d"),
        (2, "z z2 z3 p q r s y"),
        # doc 3 repeats 'm n o' WITHIN itself, far apart -> two spans
        (3, "m n o g1 g2 g3 g4 g5 g6 m n o"),
        (4, "one two"),  # < k tokens -> no shingles
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_shingles"]
        for r in repeated_substring_spans(docs, k=3).collect()
    }
    # doc 1: hits at pos 2,3 (tokens 2..5 'p q r s') -> one span [2,5]
    assert out[(1, 2, 5)] == 2
    # doc 2: hits at pos 3,4 -> span [3,6]
    assert out[(2, 3, 6)] == 2
    # doc 3: 'm n o' at pos 0 and pos 9; gap 9 > k -> TWO spans
    assert out[(3, 0, 2)] == 1 and out[(3, 9, 11)] == 1
    assert not any(d in (4, 5) for d, _, _ in out)


def test_substring_dedup_rewrite_cuts_all_occurrences(spark):
    from spark_streaming_kafka_spark.operators.repetition import (
        substring_dedup_rewrite,
    )

    rows = [
        (1, "a b p q r s c d"),
        (2, "z z2 z3 p q r s y"),
        (3, "m n o g1 g2 g3 g4 g5 g6 m n o"),  # within-doc repeat
        (4, "one two"),
        (5, None),
        (6, ""),   # token-less but non-NULL: must not hit the
                   # descending-sequence trap
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_cut"])
        for r in substring_dedup_rewrite(docs, k=3).collect()
    }
    assert out[1] == ("a b c d", 8, 4)       # 'p q r s' cut
    assert out[2] == ("z z2 z3 y", 8, 4)
    assert out[3] == ("g1 g2 g3 g4 g5 g6", 12, 6)  # BOTH 'm n o' cut
    assert out[4] == ("one two", 2, 0)       # untouched flows through
    assert out[5] == (None, None, 0)         # NULL text passes as NULL
    assert out[6] == ("", 0, 0)              # empty text stays empty


def test_mixture_temperature_alpha(spark):
    """α=1 reproduces the natural (proportional) allocation; α<1
    shifts budget from the oversized to the undersized source; and
    alpha+weights together is a hard error."""
    import pytest as _pytest

    from spark_streaming_kafka_spark.operators.curation import mixture_rates

    rows = (
        [(i, "A", "t " * 9 + "t") for i in range(10)]   # 100 tokens
        + [(100 + i, "B", "u u u u u") for i in range(2)]  # 10 tokens
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    # α=1 is the natural distribution: every source samples at the SAME
    # rate (budget/total tokens), so relative proportions are preserved
    nat = {r["source"]: r for r in mixture_rates(df, 40, alpha=1.0).collect()}
    assert nat["A"]["rate"] == nat["B"]["rate"] == round(40 / 110, 6)

    # α=0.5 flattens: the small source's rate rises above the large
    # source's (budget shifts from the head to the tail)
    flat = {r["source"]: r for r in mixture_rates(df, 40, alpha=0.5).collect()}
    assert flat["B"]["rate"] > flat["A"]["rate"]
    assert flat["A"]["rate"] < nat["A"]["rate"]

    with _pytest.raises(ValueError, match="not both"):
        mixture_rates(df, 40, weights={"A": 1.0, "B": 0.0}, alpha=0.5)


def test_curation_attrition_accepts_curate_corpus_kwargs(spark):
    # curate_corpus and curation_attrition advertise the same pipeline;
    # the packing-only kwargs (chunk_tokens/shards) must not raise even
    # though the attrition report stops before the packing stage.
    from spark_streaming_kafka_spark.operators.pipeline import curation_attrition

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "web"),
            (2, "alpha beta gamma delta epsilon", "web"),
            (3, "completely different words here entirely", "books"),
            (4, "yet another unrelated document body text", "books"),
        ],
        "doc_id long, text string, source string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = curation_attrition(docs, emb, chunk_tokens=128, shards=4)
    rows = {r["name"]: r["docs"] for r in out.collect()}
    assert rows["input"] == 4
    assert rows["exact_dedup"] == 3  # doc 2 is a byte-identical copy of 1
    assert set(rows) == {
        "input", "exact_dedup", "near_dup_clusters", "semdedup",
        "decontaminated", "calibrated", "mixture",
    }


def test_boilerplate_dictionary_and_ratio(spark):
    from spark_streaming_kafka_spark.operators.curation import (
        boilerplate_ratio,
        boilerplate_shingles,
    )

    # "cookie notice here" is template text on 3 of 4 site-A pages;
    # site B shares the phrase but only on 1 of 2 pages.
    docs = spark.createDataFrame(
        [
            (1, "cookie notice here unique alpha words", "A"),
            (2, "cookie notice here unique beta words", "A"),
            (3, "cookie notice here unique gamma words", "A"),
            (4, "totally organic content only", "A"),
            (5, "cookie notice here something else", "B"),
            (6, "organic page no template", "B"),
        ],
        "doc_id long, text string, source string",
    )
    d = boilerplate_shingles(docs, k=3, min_share=0.75)
    rows = {(r["source"], r["shingle"]): r for r in d.collect()}
    assert ("A", "cookie notice here") in rows
    assert rows[("A", "cookie notice here")]["df"] == 3
    # B's copy is only in 1/2 docs -> below the 0.75 share gate
    assert not any(src == "B" for src, _ in rows)

    r = {x["doc_id"]: x for x in boilerplate_ratio(docs, k=3, min_share=0.75).collect()}
    # doc 1 has 4 distinct trigrams, 2 of which are boilerplate
    # ("cookie notice here" AND "notice here unique" are each in 3/4 docs)
    assert r[1]["n_shingles"] == 4 and r[1]["n_boiler"] == 2
    assert abs(r[1]["boilerplate_ratio"] - 0.5) < 1e-9
    assert r[4]["n_boiler"] == 0
    assert r[5]["n_boiler"] == 0  # dict is per-source


def test_source_cap_sample_deterministic_uniform(spark):
    from spark_streaming_kafka_spark.operators.curation import source_cap_sample

    docs = spark.createDataFrame(
        [(i, f"doc {i}", "big" if i < 40 else "small") for i in range(50)],
        "doc_id long, text string, source string",
    )
    out1 = {(r["doc_id"], r["source"]) for r in source_cap_sample(docs, cap=5).collect()}
    out2 = {(r["doc_id"], r["source"]) for r in source_cap_sample(docs, cap=5).collect()}
    assert out1 == out2  # rerun-invariant
    by_src = {}
    for d, s in out1:
        by_src.setdefault(s, set()).add(d)
    assert len(by_src["big"]) == 5
    assert len(by_src["small"]) == 5
    # hash order, not id order: the kept big-source set is NOT 0..4
    assert by_src["big"] != {0, 1, 2, 3, 4}


def test_source_cap_sample_custom_columns(spark):
    from spark_streaming_kafka_spark.operators.curation import source_cap_sample

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(20)], "id long, site string"
    )
    out = source_cap_sample(docs, cap=3, id_col="id", source_col="site").collect()
    assert len(out) == 6
    assert {r["source"] for r in out} == {"s0", "s1"}


def _neardup_docs(spark):
    """Three near-dup families + singletons (family texts differ by one
    trailing token, so 3-gram Jaccard >= 0.5 pairs them)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for fam in range(3):
        fam_text = base + f" fam{fam}" * 1  # distinct families
        rows.append((fam * 10, fam_text + " one", f"src{fam}"))
        rows.append((fam * 10 + 1, fam_text + " two", f"src{fam + 3}"))
    rows.append((100, "totally different text about ships and sails today", "src0"))
    rows.append((101, "another unrelated document mentioning rivers and stones", "src5"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_leakage_safe_split_never_straddles(spark):
    from spark_streaming_kafka_spark.operators.curation import leakage_safe_split
    from spark_streaming_kafka_spark.operators.dedup import minhash_lsh_pairs

    docs = _neardup_docs(spark)
    out = leakage_safe_split(docs, eval_mod=2).collect()  # eval_mod=2 → both sides populated
    assert len(out) == docs.count()  # every doc assigned exactly once
    split_of = {r["doc_id"]: r["split"] for r in out}
    group_of = {r["doc_id"]: r["group_id"] for r in out}
    pairs = minhash_lsh_pairs(docs, threshold=0.5, verify=True).collect()
    assert pairs, "fixture must contain near-dup pairs"
    for p in pairs:
        assert split_of[p["id_a"]] == split_of[p["id_b"]], "near-dup pair straddles the split"
        assert group_of[p["id_a"]] == group_of[p["id_b"]]
    assert set(split_of.values()) == {"train", "eval"}
    # deterministic across reruns
    again = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, eval_mod=2).collect()}
    assert again == split_of


def test_takedown_propagation_reaches_duplicates(spark):
    from spark_streaming_kafka_spark.operators.curation import takedown_propagation
    from spark_streaming_kafka_spark.functions.hashing import md5_long
    from pyspark.sql import functions as F

    docs = _neardup_docs(spark)
    optout_mod = 2  # ~half the sources opt out → both reasons exercised
    out = {r["doc_id"]: r["reason"] for r in takedown_propagation(docs, optout_mod=optout_mod).collect()}
    direct = {
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            (md5_long(F.concat(F.lit("optout_"), F.col("source"))) % optout_mod == 0).alias("d"),
        ).collect()
        if r["d"]
    }
    assert direct, "fixture must have direct opt-out hits"
    # every direct hit is removed with the direct reason
    for d in direct:
        assert out.get(d) == "source_optout"
    # every near-dup partner of a direct hit is removed too
    from spark_streaming_kafka_spark.operators.dedup import minhash_lsh_pairs

    for p in minhash_lsh_pairs(docs, threshold=0.5, verify=True).collect():
        a, b = p["id_a"], p["id_b"]
        if a in direct and b not in direct:
            assert out.get(b) == "duplicate_of_optout"
        if b in direct and a not in direct:
            assert out.get(a) == "duplicate_of_optout"
    # nothing outside flagged groups is removed
    for did, reason in out.items():
        assert reason in ("source_optout", "duplicate_of_optout")


def test_mixture_epochs_conserves_budget(spark):
    from spark_streaming_kafka_spark.operators.curation import mixture_epochs

    rows = [(i, "tok " * (5 if i % 3 else 50), f"s{i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = mixture_epochs(docs, temperature=0.7, budget_factor=1.0).collect()
    assert {r["source"] for r in out} == {"s0", "s1", "s2"}
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-4
    total = sum(r["tokens"] for r in out)
    realized = sum(r["epochs"] * r["tokens"] for r in out)
    assert abs(realized - total) / total < 1e-4  # Σ epochs·tokens = budget
    # T<1 lifts the small source above its raw share
    by_src = {r["source"]: r for r in out}
    small = min(out, key=lambda r: r["tokens"])
    assert small["weight"] > small["tokens"] / total
    assert small["epochs"] > 1.0  # small high-quality source repeats


def test_content_defined_chunks_covers_and_localizes(spark):
    from spark_streaming_kafka_spark.operators.curation import content_defined_chunks

    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(400)]
    text_a = " ".join(words)
    # same text in another doc → identical chunk sequence
    # an insertion mid-document → only local chunks change
    mutated = words[:200] + ["INSERTED"] + words[200:]
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_a), (3, " ".join(mutated)), (4, "a b"), (5, "")],
        "doc_id long, text string",
    )
    out = content_defined_chunks(docs, k=3, divisor=16).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did in by_doc:
        by_doc[did].sort(key=lambda r: r["chunk_idx"])
    # coverage: chunk token counts sum to the doc's token count
    assert sum(r["n_tokens"] for r in by_doc[1]) == 400
    assert [r["chunk_idx"] for r in by_doc[1]] == list(range(1, len(by_doc[1]) + 1))
    # determinism / content-addressing: identical docs → identical chunks
    assert [(r["n_tokens"], r["chunk_hash"]) for r in by_doc[1]] == [
        (r["n_tokens"], r["chunk_hash"]) for r in by_doc[2]
    ]
    # CDC locality: the insertion changes SOME chunks but most hashes survive
    h1 = [r["chunk_hash"] for r in by_doc[1]]
    h3 = [r["chunk_hash"] for r in by_doc[3]]
    shared = set(h1) & set(h3)
    assert len(shared) >= len(h1) - 3, "an edit must only perturb local chunks"
    # short doc (< k tokens) → one chunk spanning everything
    assert len(by_doc[4]) == 1 and by_doc[4][0]["n_tokens"] == 2
    # empty doc → no rows
    assert 5 not in by_doc


def test_governance_ops_custom_id_column(spark):
    from spark_streaming_kafka_spark.operators.curation import (
        leakage_safe_split,
        takedown_propagation,
    )

    docs = _neardup_docs(spark).withColumnRenamed("doc_id", "uid")
    split = leakage_safe_split(docs, eval_mod=2, id_col="uid").collect()
    assert len(split) == docs.count()
    td = takedown_propagation(docs, optout_mod=2, id_col="uid").collect()
    assert {r["reason"] for r in td} <= {"source_optout", "duplicate_of_optout"}


def test_cross_source_dup_matrix_attribution(spark):
    from spark_streaming_kafka_spark.operators.curation import (
        cross_source_dup_matrix,
    )

    from spark_streaming_kafka_spark.operators.dedup import minhash_lsh_pairs

    docs = _neardup_docs(spark)
    out = {(r["source_a"], r["source_b"]): r["n_pairs"]
           for r in cross_source_dup_matrix(docs).collect()}
    # independent recomputation: attribute the verified pair set by hand
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    expected: dict[tuple, int] = {}
    pairs = minhash_lsh_pairs(docs, threshold=0.5, verify=True).collect()
    assert pairs, "fixture must contain near-dup pairs"
    for p in pairs:
        key = tuple(sorted((src[p["id_a"]], src[p["id_b"]])))
        expected[key] = expected.get(key, 0) + 1
    assert out == expected
    # unordered normalization: every key is (min, max)
    assert all(a <= b for a, b in out)


def test_dup_weighted_docs_group_weight_is_one(spark):
    from spark_streaming_kafka_spark.operators.curation import dup_weighted_docs

    rows = [(1, "same text"), (2, "same text"), (3, "same text"), (4, "unique a"), (5, "unique b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_weighted_docs(docs).collect()}
    assert len(out) == 5  # every doc kept
    for did in (1, 2, 3):
        assert out[did]["dup_count"] == 3
        assert abs(out[did]["weight"] - 1 / 3) < 1e-6
    for did in (4, 5):
        assert out[did]["dup_count"] == 1 and out[did]["weight"] == 1.0


def test_cdc_dedup_rewrite_removes_cross_doc_passages(spark):
    from spark_streaming_kafka_spark.operators.curation import (
        cdc_dedup_rewrite,
        content_defined_chunks,
    )

    import random

    rng = random.Random(11)
    shared = " ".join(f"p{rng.randrange(300)}" for _ in range(80))
    pre = " ".join(f"a{rng.randrange(300)}" for _ in range(40))
    post = " ".join(f"b{rng.randrange(300)}" for _ in range(40))
    docs = spark.createDataFrame(
        [
            (1, shared),                      # the original passage
            (2, pre + " " + shared + " " + post),  # copies it mid-doc
            (3, pre),                         # no overlap with doc 1
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cdc_dedup_rewrite(docs, k=3, divisor=8).collect()}
    assert set(out) == {1, 2, 3}
    # doc 1 is first: everything kept, text unchanged
    assert out[1]["kept_chunks"] == out[1]["n_chunks"]
    assert out[1]["new_text"] == shared
    # doc 2 loses the interior shared chunks (boundary chunks may
    # differ because the copy is embedded in new context)
    assert out[2]["kept_chunks"] < out[2]["n_chunks"]
    # pre appears FIRST in doc 2 (doc_id order), so doc 3's copy of pre
    # loses chunks to doc 2
    assert out[3]["kept_chunks"] <= out[3]["n_chunks"]
    # deterministic under rerun
    again = {r["doc_id"]: r for r in cdc_dedup_rewrite(docs, k=3, divisor=8).collect()}
    assert {d: (r["n_chunks"], r["kept_chunks"], r["new_text"]) for d, r in out.items()} == {
        d: (r["n_chunks"], r["kept_chunks"], r["new_text"]) for d, r in again.items()
    }
    # one survivor per distinct hash: total kept chunks equals the
    # number of distinct chunk hashes in the original corpus
    rebuilt_total = sum(r["kept_chunks"] for r in out.values())
    distinct_original = len(
        {
            r["chunk_hash"]
            for r in content_defined_chunks(docs, k=3, divisor=8).collect()
        }
    )
    assert rebuilt_total == distinct_original


def test_kanonymity_report_flags_small_classes(spark):
    from spark_streaming_kafka_spark.operators.curation import kanonymity_report

    rows = [("US", "A")] * 6 + [("US", "B")] * 2 + [("DE", "A")] * 5
    df = spark.createDataFrame(rows, "nation string, seg string")
    rep = {
        (r["nation"], r["seg"]): (r["class_size"], r["at_risk"])
        for r in kanonymity_report(df, ["nation", "seg"], k=5).collect()
    }
    assert rep[("US", "A")] == (6, False)
    assert rep[("US", "B")] == (2, True)
    assert rep[("DE", "A")] == (5, False)


def test_kanonymity_generalize_picks_narrowest_passing_width(spark):
    from spark_streaming_kafka_spark.operators.curation import (
        kanonymity_generalize,
    )

    # 10 values clustered in [0, 10) and [100, 110): width 10 gives
    # classes of 5+5 within one segment; width 1 isolates single rows.
    vals = [float(v) for v in list(range(5)) + list(range(100, 105))]
    df = spark.createDataFrame([("x", v) for v in vals], "seg string, bal double")
    w, report = kanonymity_generalize(df, ["seg"], "bal", [1.0, 10.0, 1000.0], k=5)
    assert w == 10.0
    sizes = sorted(r["class_size"] for r in report.collect())
    assert sizes == [5, 5]
    # Impossible k -> None + empty report.
    w2, rep2 = kanonymity_generalize(df, ["seg"], "bal", [1.0], k=11)
    assert w2 is None and rep2.count() == 0


def test_per_group_sample_k_exact_and_deterministic(spark):
    from spark_streaming_kafka_spark.operators.curation import per_group_sample_k

    rows = [("a", i) for i in range(20)] + [("b", 100 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "src string, id long")
    out = per_group_sample_k(df, "src", "id", k=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append((r["sample_rank"], r["id"]))
    # exactly min(k, |group|) per group, ranks 1..n
    assert len(by_src["a"]) == 5 and sorted(r for r, _ in by_src["a"]) == [1, 2, 3, 4, 5]
    assert len(by_src["b"]) == 3
    # rerun (and a different partitioning) picks the same ids
    out2 = per_group_sample_k(df.repartition(7), "src", "id", k=5).collect()
    assert {(r["src"], r["id"]) for r in out} == {(r["src"], r["id"]) for r in out2}


def test_kfold_assign_groups_never_straddle_folds(spark):
    from spark_streaming_kafka_spark.operators.curation import kfold_assign

    rows = [(u, i) for u in range(50) for i in range(3)]
    df = spark.createDataFrame(rows, "user long, item long")
    out = kfold_assign(df, "user", k=5).collect()
    folds_per_user = {}
    for r in out:
        folds_per_user.setdefault(r["user"], set()).add(r["fold"])
    assert all(len(s) == 1 for s in folds_per_user.values())
    assert {f for s in folds_per_user.values() for f in s} <= set(range(5))
    # stable under new rows for an existing group
    extra = spark.createDataFrame([(0, 99)], "user long, item long")
    f0 = kfold_assign(extra, "user", k=5).first()["fold"]
    assert f0 == next(iter(folds_per_user[0]))


def test_weighted_sample_noreplace_grouped(spark):
    """r9: exactly min(n, |eligible|) per group, deterministic under
    repartitioning, non-positive/NULL weights excluded, and the weight
    actually biases the draw (Efraimidis-Spirakis key = ln(u)/w)."""
    import math

    from spark_streaming_kafka_spark.operators.curation import (
        weighted_sample_noreplace,
    )

    rows = [("a", i, float(1 + (i % 7))) for i in range(40)] + [
        ("b", 100, 5.0),
        ("b", 101, 0.0),   # excluded: zero weight
        ("b", 102, -2.0),  # excluded: negative weight
        ("b", 103, None),  # excluded: null weight
        ("b", 104, 1.0),
    ]
    df = spark.createDataFrame(rows, "src string, id long, w double")
    out = weighted_sample_noreplace(df, "w", 10, group_cols=["src"], id_col="id")
    got = out.collect()
    by_src: dict = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r)
    assert len(by_src["a"]) == 10
    assert sorted(r["pos"] for r in by_src["a"]) == list(range(1, 11))
    # only the two eligible b rows survive
    assert sorted(r["id"] for r in by_src["b"]) == [100, 104]
    # deterministic under a different partitioning
    got2 = weighted_sample_noreplace(
        df.repartition(7), "w", 10, group_cols=["src"], id_col="id"
    ).collect()
    assert {(r["src"], r["id"], r["pos"]) for r in got} == {
        (r["src"], r["id"], r["pos"]) for r in got2
    }
    # the key matches the A-Res formula computed in plain Python
    import hashlib

    def es_key(i, w):
        h = int(hashlib.md5(f"wsr_{i}".encode()).hexdigest()[:15], 16)
        return round(math.log((h + 1) / float(1 << 60)) / w, 9)

    for r in got:
        assert r["es_key"] == es_key(r["id"], {**{i: float(1 + (i % 7)) for i in range(40)}, 100: 5.0, 104: 1.0}[r["id"]])


def test_weighted_sample_noreplace_weight_bias_and_global(spark):
    """A row with overwhelming weight is drawn ~always across salts;
    the global (ungrouped) path returns exactly n rows ranked 1..n."""
    from spark_streaming_kafka_spark.operators.curation import (
        weighted_sample_noreplace,
    )

    rows = [(0, 1000.0)] + [(i, 1.0) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "id long, w double")
    hits = 0
    for s in range(12):
        picked = {
            r["id"]
            for r in weighted_sample_noreplace(
                df, "w", 3, id_col="id", salt=f"s{s}"
            ).collect()
        }
        assert len(picked) == 3
        hits += 0 in picked
    # P(miss) per draw is ~(1 - 1000/1029)^3-ish; 12 salts all hitting
    # is the overwhelmingly likely outcome — allow one miss for slack
    assert hits >= 11
    out = weighted_sample_noreplace(df, "w", 5, id_col="id").collect()
    assert sorted(r["pos"] for r in out) == [1, 2, 3, 4, 5]


def test_neyman_allocation_sums_and_favors_variable_strata(spark):
    from spark_streaming_kafka_spark.operators.curation import neyman_allocation

    # stratum a: large + high spread; b: same size, near-constant;
    # c: tiny + moderate spread; d: single row (stddev_samp -> NULL -> 0)
    rows = (
        [("a", float(v)) for v in range(100)]
        + [("b", 5.0 + (i % 2) * 0.01) for i in range(100)]
        + [("c", float(v * 10)) for v in range(5)]
        + [("d", 7.0)]
    )
    df = spark.createDataFrame(rows, "s string, v double")
    out = {r["s"]: r for r in neyman_allocation(df, ["s"], "v", 50).collect()}
    assert sum(r["alloc"] for r in out.values()) == 50
    assert out["a"]["alloc"] > out["b"]["alloc"]
    assert out["d"]["alloc"] == 0 and out["d"]["sd"] == 0.0
    assert out["a"]["n_rows"] == 100 and out["c"]["n_rows"] == 5
    # all-constant strata: proportional-to-size fallback, still sums
    const = spark.createDataFrame(
        [("x", 1.0)] * 30 + [("y", 2.0)] * 10, "s string, v double"
    )
    got = {r["s"]: r["alloc"] for r in neyman_allocation(const, ["s"], "v", 20).collect()}
    assert got == {"x": 15, "y": 5}


def test_ngram_novelty_hand_values(spark):
    """r9: novelty = fraction of a doc's distinct k-grams first seen in
    it (ingest order = id order). doc 1 is all-novel, an exact copy is
    all-stale, a half-overlap scores 0.5, <k-token docs produce no row."""
    from spark_streaming_kafka_spark.operators.repetition import ngram_novelty

    rows = [
        (1, "a b c d"),        # grams {a b c, b c d} — both novel
        (2, "a b c d"),        # exact copy — nothing novel
        (3, "b c d e"),        # {b c d (old), c d e (new)} — 0.5
        (4, "x y"),            # < k tokens — no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(df, k=3).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_grams"], out[1]["novel_grams"], out[1]["novelty"]) == (2, 2, 1.0)
    assert (out[2]["novel_grams"], out[2]["novelty"]) == (0, 0.0)
    assert (out[3]["n_grams"], out[3]["novel_grams"], out[3]["novelty"]) == (2, 1, 0.5)
    # partitioning-invariant (first-seen is min(id), not arrival order)
    out2 = {r["doc_id"]: r for r in ngram_novelty(df.repartition(5), k=3).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {k: tuple(v) for k, v in out2.items()}


def test_markov_transitions_hand_values(spark):
    """r9: P(next|prev) from per-user (ts, event_id)-ordered sequences;
    simultaneous events break ties on event_id; rows normalize per
    prev_state."""
    from datetime import datetime

    from spark_streaming_kafka_spark.operators.sessionize import markov_transitions

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1: view -> click -> purchase
        (1, 1, t(1), "view"), (2, 1, t(2), "click"), (3, 1, t(3), "purchase"),
        # u2: view -> view -> click
        (4, 2, t(1), "view"), (5, 2, t(2), "view"), (6, 2, t(3), "click"),
        # u3: tie on ts — event_id orders click(7) before view(8)
        (7, 3, t(5), "click"), (8, 3, t(5), "view"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = {(r["prev_state"], r["next_state"]): r for r in markov_transitions(df).collect()}
    # view -> {click: 2, view: 1} ; click -> {purchase: 1, view: 1}
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "view")]["n_transitions"] == 1
    assert out[("view", "click")]["prob"] == 0.666667
    assert out[("view", "view")]["prob"] == 0.333333
    assert out[("click", "purchase")]["prob"] == 0.5
    assert out[("click", "view")]["prob"] == 0.5  # the tie-ordered u3 pair
    # per-prev probabilities sum to 1 (within rounding)
    sums: dict = {}
    for (p, _), r in out.items():
        sums[p] = sums.get(p, 0.0) + r["prob"]
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values())


def test_manifest_novelty_matches_batch_operator(spark):
    """r9: scoring ordered ingests batch-by-batch against a growing
    gram manifest reproduces ngram_novelty on the concatenated corpus
    exactly — the incremental-equals-batch contract every manifest
    operator in this repo keeps."""
    from spark_streaming_kafka_spark.operators.dedup import doc_shingles
    from spark_streaming_kafka_spark.operators.repetition import (
        ngram_novelty,
        ngram_novelty_vs_manifest,
    )

    rows = [
        (1, "a b c d e"),
        (2, "c d e f"),
        (3, "a b c d"),      # all grams stale by now
        (4, "p q r s"),      # fresh vocabulary
        (5, "p q r s a b c"),
        (6, "p q r z z q p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expected = {
        r["doc_id"]: (r["n_grams"], r["novel_grams"], r["novelty"])
        for r in ngram_novelty(df, k=3).collect()
    }
    got: dict = {}
    for lo, hi in [(1, 2), (3, 4), (5, 6)]:  # three sequential ingests
        batch = df.filter(F.col("doc_id").between(lo, hi))
        history = df.filter(F.col("doc_id") < lo)
        manifest = doc_shingles(history).select("shingle").distinct()
        for r in ngram_novelty_vs_manifest(batch, manifest, k=3).collect():
            got[r["doc_id"]] = (r["n_grams"], r["novel_grams"], r["novelty"])
    assert got == expected
    # within-batch first occurrences count once (docs 5 and 6 share
    # 'p q r', ingested in ONE batch: novel for 5, stale for 6)
    assert got[5][1] > 0 and expected[6][2] < 1.0


def test_sequence_logprob_hand_values(spark):
    """r9: avg ln P(next|prev) per key under the self-fitted matrix,
    and under a FROZEN reference matrix (the drift shape)."""
    import math
    from datetime import datetime

    from spark_streaming_kafka_spark.operators.sessionize import (
        markov_transitions,
        sequence_logprob,
    )

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, 1, t(1), "a"), (2, 1, t(2), "b"),   # u1: a->b
        (3, 2, t(1), "a"), (4, 2, t(2), "a"),   # u2: a->a
        (5, 3, t(1), "a"), (6, 3, t(2), "b"),   # u3: a->b
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    # matrix: P(b|a)=2/3 rounded, P(a|a)=1/3 rounded
    out = {r["user_id"]: r for r in sequence_logprob(df).collect()}
    assert out[1]["n_transitions"] == 1
    assert out[1]["avg_logprob"] == round(math.log(0.666667), 6)
    assert out[2]["avg_logprob"] == round(math.log(0.333333), 6)
    assert out[3]["avg_logprob"] == out[1]["avg_logprob"]
    # frozen-matrix scoring: score u2 under a matrix where a->a is rare
    frozen = markov_transitions(df)
    scored = {
        r["user_id"]: r
        for r in sequence_logprob(
            df.filter(F.col("user_id") == 2), matrix=frozen
        ).collect()
    }
    assert scored[2]["avg_logprob"] == out[2]["avg_logprob"]


def test_manifest_novelty_plan_broadcasts_batch_probe(spark):
    """r9 scale shape: the manifest side must stream through a
    broadcast left-semi probe — at 100 TB the manifest is the big
    side, so any exchange of it (or a sort-merge join) is a scale
    bug. Asserted on the physical plan, like every broadcast claim in
    this repo."""
    from spark_streaming_kafka_spark.operators.repetition import (
        ngram_novelty_vs_manifest,
    )
    from spark_streaming_kafka_spark.plans.inspect import explain_str

    batch = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(10)],
        "doc_id long, text string",
    )
    manifest = spark.createDataFrame(
        [(f"tok{i} tok{i+1} tok{i+2}",) for i in range(100)], "shingle string"
    )
    plan = explain_str(ngram_novelty_vs_manifest(batch, manifest, k=3))
    # the manifest probe is a broadcast semi join, not a shuffled one
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_vocab_coverage_hand_values(spark):
    """r9: coverage at V = cumulative freq of top-V words / total;
    cutoffs beyond the vocab end report full coverage; ties break
    (freq desc, word asc)."""
    from spark_streaming_kafka_spark.operators.bpe import vocab_coverage

    # freqs: a=4, b=3, c=2, d=1 (total 10)
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b c d"), (3, "a b")], "doc_id long, text string"
    )
    out = {r["v_cutoff"]: r for r in vocab_coverage(df, [1, 2, 3, 99]).collect()}
    assert out[1]["covered_tokens"] == 4 and out[1]["coverage"] == 0.4
    assert out[2]["covered_tokens"] == 7 and out[2]["coverage"] == 0.7
    assert out[3]["covered_tokens"] == 9 and out[3]["coverage"] == 0.9
    # beyond the vocab end: full coverage, not a missing row
    assert out[99]["covered_tokens"] == 10 and out[99]["coverage"] == 1.0
    assert all(r["total_tokens"] == 10 for r in out.values())


def test_basket_pairs_lift_hand_values(spark):
    """r9: lift = n_ab * N / (c_a * c_b) over basket incidence; the
    top_items cap drops rare items before pairing."""
    from spark_streaming_kafka_spark.operators.retrieval import basket_pairs_lift

    rows = [
        (1, "x"), (1, "y"),           # x,y together
        (2, "x"), (2, "y"),           # x,y together again
        (3, "x"), (3, "z"),
        (4, "y"),
        (5, "z"), (5, "rare"),        # 'rare' appears in 1 basket
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket_pairs_lift(df, "basket", "item", top_items=3).collect()
    }
    # universe: x (3 baskets), y (3), z (2); N = 5 baskets
    assert ("rare", "z") not in out and ("z", "rare") not in out
    xy = out[("x", "y")]
    assert xy["n_ab"] == 2
    assert xy["support"] == 0.4           # 2 / 5
    assert xy["lift"] == round(2 * 5 / (3 * 3), 6)
    xz = out[("x", "z")]
    assert xz["n_ab"] == 1 and xz["lift"] == round(1 * 5 / (3 * 2), 6)
    # y,z never co-occur: no row (support-0 pairs are absent, not 0)
    assert ("y", "z") not in out


def test_time_decay_sum_hand_values(spark):
    """r9: w = 0.5^(age/half_life) against the pinned reference date —
    a value half_life days old counts exactly half."""
    from datetime import datetime

    from spark_streaming_kafka_spark.operators.windows import time_decay_sum

    rows = [
        ("g", datetime(2024, 1, 11), 100.0),   # age 0 -> w 1
        ("g", datetime(2024, 1, 1), 100.0),    # age 10 = half-life -> w 0.5
        ("h", datetime(2023, 12, 22), 100.0),  # age 20 -> w 0.25
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {
        r["g"]: r
        for r in time_decay_sum(
            df, "ts", "v", ["g"], ref_date="2024-01-11", half_life_days=10.0
        ).collect()
    }
    assert out["g"]["n_rows"] == 2 and out["g"]["decayed_sum"] == 150.0
    assert out["h"]["decayed_sum"] == 25.0
