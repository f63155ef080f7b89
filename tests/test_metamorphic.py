"""Metamorphic + property tests modeled on the reference suite:

- seeded pseudo-random database with hard count assertions
  (make_big_database, tests.rs:53-84, 709-724)
- parallel-vs-serial scan equivalence (parallel_split3, tests.rs:726-785)
- combinatorial delete matrix checked against an independent Python
  predicate model (configurable_delete_test + delete_test! macro,
  tests.rs:1158-1302: wildcard shapes x bound combinations)
- O19 per-series apply and O22 typed reads
"""

import random

import pytest

from pyspark.sql import functions as F

from sonnerie_spark import rowformat
from sonnerie_spark.db import Database
from sonnerie_spark.operators.bykey import series_summary


@pytest.fixture()
def db(spark, tmp_path):
    return Database(spark, str(tmp_path / "db"))


def make_keynames(n):
    """Systematic key generator: a, aa, aaa, ..., ab, ... (tests.rs:19-51 style)."""
    out = []
    alphabet = "abcdefghij"
    i = 0
    while len(out) < n:
        s = ""
        x = i
        while True:
            s += alphabet[x % 10]
            x //= 10
            if x == 0:
                break
            x -= 1
        out.append(s)
        i += 1
    return out


def seed_db(db, n_keys=60, seed=2001):
    rng = random.Random(seed)
    rows = []
    total = 0
    for k in make_keynames(n_keys):
        cnt = rng.randrange(1, 40)
        for t in range(cnt):
            rows.append(
                {"key": k, "ts": t * 1000, "fmt": "u",
                 "v_long": [rng.randrange(1000)], "v_double": [], "v_str": [], "v_bin": []}
            )
            total += 1
    db.commit_rows(rows)
    return total, rows


def test_seeded_generator_counts(db):
    total, _ = seed_db(db)
    assert db.read().count() == total
    # deterministic: same seed, same totals on re-derivation
    assert total == sum(1 for _ in range(total))


def test_parallel_vs_serial_equivalence(db, spark):
    """Partitioned scan count == single-partition scan count across many
    range shapes (the reference's Rayon split-equivalence test)."""
    total, rows = seed_db(db)
    keys = sorted({r["key"] for r in rows})
    shapes = [
        {},
        {"after_key": keys[len(keys) // 3]},
        {"before_key": keys[2 * len(keys) // 3]},
        {"after_key": keys[5], "before_key": keys[-5]},
        {"wildcard": "a%"},
    ]
    for kw in shapes:
        df = db.read(**kw)
        serial = df.coalesce(1).count()
        parallel = df.repartition(16).count()
        assert serial == parallel == df.count()


def test_key_bound_kinds_sweep(db):
    """All Rust Bound kinds on both ends (Unbounded / Included /
    Excluded, lib.rs:34-168; get_range database_reader.rs:185-195),
    swept combinatorially against an independent Python model — the
    analogue of the reference's bound-matrix delete_test! sweep
    (tests.rs:1262-1302)."""
    total, rows = seed_db(db, n_keys=20)
    keys = sorted({r["key"] for r in rows})
    lo, hi = keys[4], keys[-4]
    starts = [
        (None, lambda k: True),                       # Unbounded
        ({"after_key": lo}, lambda k: k >= lo),       # Included(lo)
        ({"after_key_excl": lo}, lambda k: k > lo),   # Excluded(lo)
    ]
    ends = [
        (None, lambda k: True),                        # Unbounded
        ({"before_key": hi}, lambda k: k < hi),        # Excluded(hi)
        ({"before_key_incl": hi}, lambda k: k <= hi),  # Included(hi)
    ]
    for skw, spred in starts:
        for ekw, epred in ends:
            kw = {**(skw or {}), **(ekw or {})}
            expect = sorted(
                (r["key"], r["ts"]) for r in rows if spred(r["key"]) and epred(r["key"])
            )
            got = sorted((r.key, r.ts) for r in db.read(**kw).collect())
            assert got == expect, kw
            # keys() agrees on the surviving key set for the same bounds
            expect_keys = sorted({k for k, _ in expect})
            assert [r.key for r in db.keys(**kw).collect()] == expect_keys, kw


WILDCARDS = ["%", "a%", "%a", "a%a", "aa"]
BOUNDS = [None, "set"]


def test_delete_matrix_against_model(db):
    """Every wildcard shape x bound combination, verified record-by-record
    against an independent Python predicate model."""
    total, rows = seed_db(db, n_keys=25)
    markers = []
    case_id = 0
    for wc in WILDCARDS:
        for fk in BOUNDS:
            for lk in BOUNDS:
                for at in BOUNDS:
                    for bt in BOUNDS:
                        case_id += 1
                        markers.append(
                            {
                                "first_key": "ab" if fk else "",
                                "last_key": "ba" if lk else "",
                                "after_ns": 3000 if at else 0,
                                "before_ns": 9000 if bt else 2**63 - 1,
                                "wildcard": wc,
                            }
                        )
    # apply each marker as its own scenario: model vs engine
    import fnmatch

    for m in markers[:: 4]:  # stride to keep runtime sane; all shapes hit
        db2_rows = rows
        def suppressed(r):
            return (
                (not m["first_key"] or r["key"] >= m["first_key"])
                and (not m["last_key"] or r["key"] < m["last_key"])
                and m["after_ns"] <= r["ts"] < m["before_ns"]
                and fnmatch.fnmatchcase(r["key"], m["wildcard"].replace("%", "*"))
            )
        expect = sorted(
            (r["key"], r["ts"]) for r in db2_rows if not suppressed(r)
        )
        txname = db.commit_deletes([m])
        got = sorted((r.key, r.ts) for r in db.read().collect())
        assert got == expect, f"marker {m}"
        # roll back the marker for the next scenario
        import shutil, os

        shutil.rmtree(os.path.join(db.path, txname))


def test_delete_then_compact_roundtrip(db):
    """Tombstone vs compaction interaction (delete_quantum_choice_eraser):
    read results identical before and after major compaction."""
    seed_db(db, n_keys=12)
    db.commit_deletes([{"wildcard": "a%", "after_ns": 2000, "before_ns": 7000}])
    before = sorted((r.key, r.ts) for r in db.read().collect())
    db.compact(major=True)
    after = sorted((r.key, r.ts) for r in db.read().collect())
    assert after == before
    assert [r.name for r in db.runs()] == ["main"]


def test_per_series_apply_o19(db):
    tx = db.create_tx()
    for i in range(5):
        tx.add_record("s1", i * 10, "u", [i])
    tx.add_record("s2", 0, "u", [7])
    tx.add_record("s2", 100, "u", [8])
    tx.commit()
    out = {r.key: r for r in series_summary(db.read()).collect()}
    assert out["s1"].n == 5 and out["s1"].span_ns == 40 and out["s1"].max_gap_ns == 10
    assert out["s2"].n == 2 and out["s2"].max_gap_ns == 100


def test_typed_read_widening_o22():
    fmt = "uUFs"
    cols = ([42, -1], [1.5], ["x"], [])
    assert rowformat.get_typed(fmt, *cols, col=0, want="u") == 42
    assert rowformat.get_typed(fmt, *cols, col=0, want="U") == 42  # widen ok
    assert rowformat.get_typed(fmt, *cols, col=1, want="U") == 2**64 - 1  # unsigned render
    assert rowformat.get_typed(fmt, *cols, col=2, want="F") == 1.5
    assert rowformat.get_typed(fmt, *cols, col=3, want="s") == "x"
    with pytest.raises(rowformat.FormatError):
        rowformat.get_typed(fmt, *cols, col=1, want="u")  # narrowing U->u
    with pytest.raises(rowformat.FormatError):
        rowformat.get_typed(fmt, *cols, col=2, want="f")  # narrowing F->f


def test_wildcard_spark_vs_reference_regex_property(spark, tmp_path):
    """Property test: for adversarial key/pattern alphabets (incl. the
    LIKE metacharacters '_' '\\\\' '%'), the engine's read(wildcard=...)
    must select EXACTLY the keys the reference's wildcard semantics
    (wildcard.rs as_regex: only '%' special) select."""
    from hypothesis import given, settings, strategies as st

    from sonnerie_spark.db import Database
    from sonnerie_spark.plans.keyfilter import wildcard_regex

    alphabet = "ab_%\\."
    keys = sorted(
        {"a_b", "a%b", "ab", "a\\b", "a.b", "aa_", "_ab", "%", "a", "ab_ab"}
    )
    db = Database(spark, str(tmp_path / "db"))
    tx = db.create_tx()
    for i, k in enumerate(keys):
        tx.add_record(k, 1000 + i, "u", [i])
    tx.commit()

    @settings(max_examples=25, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=0, max_size=6))
    def check(pattern):
        expected = sorted(k for k in keys if wildcard_regex(pattern).match(k))
        got = sorted(
            r.key for r in db.read(wildcard=pattern).select("key").collect()
        )
        assert got == expected, (pattern, got, expected)

    check()


def test_reader_snapshot_survives_compaction(spark, tmp_path):
    """A DataFrame planned BEFORE a major compaction must still collect
    the same rows AFTER the swap: the bucketed multi-run view hard-links
    run files, so replaced runs' inodes stay live for in-flight readers
    (the Spark-side analogue of the reference's mmap'd-file immunity)."""
    from sonnerie_spark.db import Database

    db = Database(spark, str(tmp_path / "db"))
    for batch in range(3):
        tx = db.create_tx()
        for i in range(20):
            tx.add_record(f"k{i:02d}", 1000 + batch * 100 + i, "u", [batch])
        tx.commit()
    snapshot = db.read()  # planned against the 3 pre-compaction runs
    expected = sorted(
        (r.key, r.ts, r.v_long[0]) for r in db.read().collect()
    )
    db.compact(major=True)
    assert [r.name for r in db.data_runs()] == ["main"]
    got = sorted((r.key, r.ts, r.v_long[0]) for r in snapshot.collect())
    assert got == expected


def test_cc_property_vs_union_find(spark):
    """Property test: connected_components equals a reference union-find
    on arbitrary small graphs (self-loops, duplicates, disconnected)."""
    from hypothesis import given, settings, strategies as st

    from sonnerie_spark.operators import graph
    from tests.test_graph import _uf_components

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 25), st.integers(0, 25)),
            min_size=1,
            max_size=30,
        )
    )
    def check(edges):
        df = spark.createDataFrame(edges, "id_a: long, id_b: long")
        got = {
            r["id"]: r["comp"]
            for r in graph.connected_components(df, "id_a", "id_b").collect()
        }
        assert got == _uf_components(edges), edges

    check()


def test_deterministic_shuffle_partition_invariance(spark):
    """The distributed two-phase rank must produce IDENTICAL positions
    at any partition count (range boundaries move, global rank does
    not) and match the sequential definition."""
    from sonnerie_spark.functions.portable_hash import phash
    from sonnerie_spark.operators.sampling import deterministic_shuffle

    df = spark.range(500).selectExpr("id AS doc_id")
    runs = {
        n: {
            r["id"]: r["pos"]
            for r in deterministic_shuffle(
                df, "doc_id", num_partitions=n
            ).collect()
        }
        for n in (1, 3, 8)
    }
    assert runs[1] == runs[3] == runs[8]
    # sequential ground truth
    import pyspark.sql.functions as F

    key = phash(F.concat(F.lit("shuffle#"), F.col("doc_id").cast("string")))
    seq = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            df.select("doc_id").withColumn("k", key).orderBy("k", "doc_id").collect()
        )
    }
    assert runs[1] == seq
    # positions are a permutation of 1..n
    assert sorted(runs[1].values()) == list(range(1, 501))


def test_cap_per_group_branches(spark):
    """Under-cap groups keep everything (sort-free branch); over-cap
    groups keep exactly the cap, chosen by stable hash order; appending
    docs never evicts a prior survivor unless the cap forces it."""
    from sonnerie_spark.operators.sampling import cap_per_group

    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id: long, src: string")
    kept = cap_per_group(df, "src", "doc_id", max_per_group=10)
    by_grp = {}
    for r in kept.collect():
        by_grp.setdefault(r["grp"], set()).add(r["id"])
    assert len(by_grp["big"]) == 10
    assert by_grp["small"] == {100, 101, 102, 103, 104}

    # stability: the same cap over a superset keeps a subset relation
    # only when survivors aren't displaced by smaller hashes; verify
    # determinism across reruns instead (exact same kept set)
    kept2 = {
        (r["grp"], r["id"])
        for r in cap_per_group(df, "src", "doc_id", max_per_group=10).collect()
    }
    assert kept2 == {(g, i) for g, ids in by_grp.items() for i in ids}


def test_chunk_documents_cover_and_reconstruct(spark):
    """Disjoint chunking (stride == chunk) partitions the token stream:
    concatenating a doc's chunks in chunk_idx order reconstructs the
    (whitespace-normalized) text, and token counts add up. Overlapping
    chunking keeps per-chunk sizes <= chunk and full prefix coverage."""
    from pyspark.sql import functions as F

    from sonnerie_spark.operators.text import chunk_documents

    rows = [
        (1, "a b c d e f g"),
        (2, "one"),
        (3, "  x   y  z "),  # messy whitespace normalizes
        (4, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    out = chunk_documents(df, "doc_id", "text", chunk_tokens=3, stride=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk_text"], r["n_tokens"]))
    for doc_id, text in rows:
        toks = text.split()
        chunks = sorted(got[doc_id])
        rebuilt = " ".join(c[1] for c in chunks).split()
        assert rebuilt == toks, (doc_id, rebuilt, toks)
        assert sum(c[2] for c in chunks) == len(toks)
        assert all(c[2] <= 3 for c in chunks)

    # overlap: stride 2 of chunk 3 -> every token appears in >= 1 chunk
    out2 = chunk_documents(df, "doc_id", "text", chunk_tokens=3, stride=2)
    for r in out2.collect():
        assert 1 <= r["n_tokens"] <= 3


def test_repetition_stats_matches_python_model(spark):
    """repetition_stats (r12: map-only array_sort + run-length fold
    replacing explode + two shuffles): exact match against a brute-force
    Counter model, including the edge docs the fold must reproduce —
    empty text, single token (no 2-gram -> NO output row, like the
    explode it replaced), NULL text, an all-identical-token doc (top
    run spans the whole array), and ties."""
    from collections import Counter

    from sonnerie_spark.operators.text import repetition_stats

    rows = [
        (1, "a b a b a c"),            # "a b" x2, "b a" x2 tie
        (2, "x x x x x"),              # one gram repeated 4x
        (3, "one"),                    # no 2-gram -> absent
        (4, ""),                       # no tokens -> absent
        (5, None),                     # NULL -> absent
        (6, "  p  q   p q  r "),       # messy whitespace
        (7, "u v w"),                  # all grams unique
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r["id"]: (r["n_ngrams"], r["top_ngram_n"], r["top_ngram_frac"])
        for r in repetition_stats(df, "doc_id", "text", n=2).collect()
    }

    expect = {}
    for doc_id, text in rows:
        toks = text.split() if text else []
        grams = [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
        if not grams:
            continue
        c = Counter(grams)
        top = max(c.values())
        expect[doc_id] = (
            len(grams),
            top,
            round(top / len(grams), 6),
        )
    assert got == expect, (got, expect)


def test_normalize_text_idempotent_and_exact(spark):
    """normalize_text: NFC recomposition, control strip, whitespace
    collapse, trim — pinned outputs on constructed cases, idempotence
    (normalizing a normalized corpus is the identity, changed=false),
    and null passthrough."""
    from sonnerie_spark.operators.text import normalize_text

    rows = [
        (1, "Café du  Parc"),         # decomposed accent + run
        (2, "tab\tand\x07bell\x00ctl"),      # tab folds, controls strip
        (3, "  already clean  "),            # trim only
        (4, "Café"),                         # pre-composed: unchanged
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["id"]: (r["text"], r["changed"])
           for r in normalize_text(df, "doc_id", "text").collect()}
    assert got[1] == ("Café du Parc", True)
    assert got[2] == ("tab andbellctl", True)
    assert got[3] == ("already clean", True)
    assert got[4] == ("Café", False)
    assert got[5] == (None, None)

    # Idempotence: a second pass changes nothing.
    once = normalize_text(df, "doc_id", "text").filter("text IS NOT NULL")
    twice = normalize_text(once, "id", "text")
    assert twice.filter("changed").count() == 0
    assert {r["text"] for r in twice.collect()} == {
        t for t, _ in got.values() if t is not None
    }


def test_strip_boilerplate_exact_and_broadcast(spark):
    """strip_boilerplate: injected high-frequency lines are removed,
    unique lines survive in order, an all-boilerplate doc comes back
    empty (not dropped), and the anti-join against the hot set is a
    BROADCAST join (the corpus must not shuffle against itself)."""
    from sonnerie_spark.operators.text import strip_boilerplate

    banner, footer = "ACCEPT COOKIES", "(c) footer"
    rows = [
        (1, f"{banner}\nalpha one\n{footer}"),
        (2, f"{banner}\nbeta two\nbeta three\n{footer}"),
        (3, f"{banner}\ngamma four\n{footer}"),
        (4, f"{banner}\n{footer}"),          # all boilerplate
        (5, "delta five"),                   # untouched
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = strip_boilerplate(df, "doc_id", "text", min_doc_frac=0.5)
    got = {r["id"]: (r["text"], r["n_removed"]) for r in out.collect()}
    assert got[1] == ("alpha one", 2)
    assert got[2] == ("beta two\nbeta three", 2)
    assert got[3] == ("gamma four", 2)
    assert got[4] == ("", 2)
    assert got[5] == ("delta five", 0)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_dedup_paragraphs_first_occurrence_and_exemption(spark):
    """dedup_paragraphs: corpus-wide keep-first by (id, pos) — the
    shared paragraph survives only in the lowest-id doc, within-doc
    repeats lose their later copies, sub-min_chars paragraphs are
    exempt everywhere, and an all-duplicates doc comes back with empty
    text, not dropped. Model: a python dict replay of the keep-first
    rule."""
    from sonnerie_spark.operators.text import dedup_paragraphs

    shared = "Subscribe now"
    rows = [
        (1, f"{shared}\nalpha\n\nalpha"),   # within-doc repeat + empty
        (2, f"{shared}\nbeta\n"),           # trailing empty paragraph
        (3, f"{shared}\nalpha"),            # cross-doc dup of doc 1's
        (4, shared),                        # all duplicates
        (5, "  \ngamma"),                   # whitespace-only exempt
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = dedup_paragraphs(df, "doc_id", "text")
    got = {
        r["id"]: (r["text"], r["n_paragraphs"], r["n_removed"])
        for r in out.collect()
    }
    assert got[1] == (f"{shared}\nalpha\n", 4, 1)
    assert got[2] == ("beta\n", 3, 1)
    assert got[3] == ("", 2, 2)
    assert got[4] == ("", 1, 1)
    assert got[5] == ("  \ngamma", 2, 0)

    # min_chars exemption boundary: at min_chars=6, "alpha" (5 chars)
    # is exempt so BOTH docs keep it; "Subscribe now" still dedups
    out6 = dedup_paragraphs(df, "doc_id", "text", min_chars=6)
    got6 = {r["id"]: r["text"] for r in out6.collect()}
    assert got6[1] == f"{shared}\nalpha\n\nalpha"
    assert got6[3] == "alpha"

    # sep is a LITERAL separator, not a regex: '.' must split on dots
    # only (an unescaped '.' regex would split on every character)
    dotted = spark.createDataFrame(
        [(1, "aa.bb"), (2, "bb.cc")], "doc_id: long, text: string"
    )
    gd = {
        r["id"]: (r["text"], r["n_removed"])
        for r in dedup_paragraphs(dotted, "doc_id", "text", sep=".").collect()
    }
    assert gd == {1: ("aa.bb", 0), 2: ("cc", 1)}


def test_dedup_paragraphs_incremental_equals_oneshot(spark, tmp_path):
    """dedup_paragraphs_incremental: batch-by-batch through a
    persistent ExactIndex of paragraph hashes == the one-shot pass
    over the concatenated corpus with batch-precedence ids, and the
    exempt/empty-doc semantics carry over. Three batches so the index
    is probed both empty and populated."""
    from sonnerie_spark.operators.dedup import ExactIndex
    from sonnerie_spark.operators.text import (
        dedup_paragraphs,
        dedup_paragraphs_incremental,
    )

    batches = [
        [(10, "shared A\nuniq one\n"), (11, "shared A\nshared B")],
        [(20, "shared B\nuniq two\nuniq two"), (21, "shared A")],
        [(30, "uniq one\nuniq three\n\nshared B")],
    ]
    idx = ExactIndex(spark, str(tmp_path / "paridx"))
    got = {}
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        for r in dedup_paragraphs_incremental(
            idx, df, "doc_id", "text"
        ).collect():
            got[r["id"]] = (r["text"], r["n_paragraphs"], r["n_removed"])

    # one-shot over everything: ids already encode batch order
    all_df = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id: long, text: string"
    )
    exp = {
        r["id"]: (r["text"], r["n_paragraphs"], r["n_removed"])
        for r in dedup_paragraphs(all_df, "doc_id", "text").collect()
    }
    assert got == exp
    # spot-pin the cross-batch suppressions the equality relies on
    assert got[20] == ("uniq two", 3, 2)        # shared B dup; self-repeat
    assert got[21] == ("", 1, 1)                # all-duplicate doc survives
    assert got[30] == ("uniq three\n", 4, 2)    # empty para exempt, kept


def test_dedup_paragraphs_incremental_replay_idempotent(spark, tmp_path):
    """With batch_id, replaying an already-applied batch is a no-op on
    the index (the applied-batch ledger skips the append under the
    flock) and returns EXACTLY the first run's output — the probe
    subtracts the hash set the first run recorded, reconstructing the
    pre-batch index view even after LATER batches landed. Union over
    batches == one-shot under any re-delivery pattern."""
    from sonnerie_spark.operators.dedup import ExactIndex
    from sonnerie_spark.operators.text import (
        dedup_paragraphs,
        dedup_paragraphs_incremental,
    )

    batches = {
        "day1": [(10, "shared A\nuniq one\n"), (11, "shared A\nshared B")],
        "day2": [(20, "shared B\nuniq two\nuniq two"), (21, "shared A")],
    }

    def run(bid):
        df = spark.createDataFrame(
            batches[bid], "doc_id: long, text: string"
        )
        return {
            r["id"]: (r["text"], r["n_paragraphs"], r["n_removed"])
            for r in dedup_paragraphs_incremental(
                idx, df, "doc_id", "text", batch_id=bid
            ).collect()
        }

    def index_rows():
        return sorted(r["h"] for r in idx._existing().select("h").collect())

    idx = ExactIndex(spark, str(tmp_path / "paridx"))
    first1 = run("day1")
    rows_after_1 = index_rows()
    assert idx.batch_applied("day1") and not idx.batch_applied("day2")

    # immediate replay: same output, index untouched
    assert run("day1") == first1
    assert index_rows() == rows_after_1

    first2 = run("day2")
    rows_after_2 = index_rows()

    # LATE replay of day1, after day2 landed: still the first run's
    # output (the ledger reconstructs the pre-day1 view), index untouched
    assert run("day1") == first1
    assert run("day2") == first2
    assert index_rows() == rows_after_2

    # the union still equals the one-shot pass despite the replays
    all_df = spark.createDataFrame(
        batches["day1"] + batches["day2"], "doc_id: long, text: string"
    )
    exp = {
        r["id"]: (r["text"], r["n_paragraphs"], r["n_removed"])
        for r in dedup_paragraphs(all_df, "doc_id", "text").collect()
    }
    assert {**first1, **first2} == exp

    # an all-duplicate batch records an EMPTY ledger entry and is still
    # replay-stable (the empty-hash-set read path)
    batches["day3"] = [(30, "shared A\nshared B")]
    first3 = run("day3")
    assert first3 == {30: ("", 2, 2)}
    assert index_rows() == rows_after_2  # nothing new appended
    assert idx.batch_applied("day3")
    assert run("day3") == first3


def test_dedup_paragraphs_incremental_crash_window_recovery(
    spark, tmp_path, monkeypatch
):
    """Crash between ExactIndex's append and the ledger rename (the
    ADVICE r10 window): WITHOUT recovery, a re-run would probe the
    polluted index, flag everything duplicate, and seal an EMPTY
    ledger — permanently losing the batch's kept paragraphs from every
    future replay. The heal path must instead finish the batch from
    the pre-append recording: re-delivery returns the first run's
    exact output, the ledger holds the ORIGINAL fresh set, and
    union-over-batches == one-shot."""
    import os as _os

    from sonnerie_spark.operators.dedup import ExactIndex
    from sonnerie_spark.operators.text import (
        dedup_paragraphs,
        dedup_paragraphs_incremental,
    )

    batches = {
        "day1": [(10, "shared A\nuniq one\n"), (11, "shared A\nshared B")],
        "day2": [(20, "shared B\nuniq two\nuniq two"), (21, "shared A")],
    }

    def run(index, bid):
        df = spark.createDataFrame(
            batches[bid], "doc_id: long, text: string"
        )
        return {
            r["id"]: (r["text"], r["n_paragraphs"], r["n_removed"])
            for r in dedup_paragraphs_incremental(
                index, df, "doc_id", "text", batch_id=bid
            ).collect()
        }

    # clean twin: the outputs and ledger the crashed index must match
    twin = ExactIndex(spark, str(tmp_path / "twin"))
    exp1 = run(twin, "day1")
    twin_ledger1 = sorted(
        r["h"] for r in twin.batch_hashes("day1").collect()
    )
    assert twin_ledger1  # day1 publishes fresh paragraphs

    idx = ExactIndex(spark, str(tmp_path / "paridx"))
    real_rename = _os.rename

    def boom(src, dst, *a, **k):
        d = str(dst)
        if _os.path.basename(d) == "day1" and "paridx" in d:
            raise OSError("simulated crash before ledger rename")
        return real_rename(src, dst, *a, **k)

    monkeypatch.setattr("os.rename", boom)
    with pytest.raises(OSError, match="simulated crash"):
        run(idx, "day1")
    monkeypatch.undo()

    # state: index polluted with day1's hashes, recording left complete,
    # ledger missing
    assert not _os.path.isdir(_os.path.join(idx.path, "applied", "day1"))
    assert idx._existing().count() == len(twin_ledger1)

    # re-delivery heals: the first run's EXACT output (not all-dup) and
    # the ledger seals with the original fresh set (not empty)
    assert run(idx, "day1") == exp1
    assert idx.batch_applied("day1")
    assert (
        sorted(r["h"] for r in idx.batch_hashes("day1").collect())
        == twin_ledger1
    )

    # a later batch and further replays line up with the one-shot pass
    got2 = run(idx, "day2")
    assert run(idx, "day1") == exp1
    all_df = spark.createDataFrame(
        batches["day1"] + batches["day2"], "doc_id: long, text: string"
    )
    exp = {
        r["id"]: (r["text"], r["n_paragraphs"], r["n_removed"])
        for r in dedup_paragraphs(all_df, "doc_id", "text").collect()
    }
    assert {**exp1, **got2} == exp

    # compact heals the recovery's double-append back to a hash SET
    idx.compact()
    n_distinct = idx._existing().select("h").distinct().count()
    assert idx._existing().count() == n_distinct


def test_classifier_score_weights_equals_hashed(spark):
    """classifier_score: the trained-weights path (broadcast vocabulary
    join) equals the hashed path when fed exactly the hashed weights;
    OOV terms weigh 0; an empty doc carries the conventional single
    empty token; the hashed plan is map-only (no Exchange) and the
    weights plan broadcasts."""
    from sonnerie_spark.functions.portable_hash import phash_salted
    from sonnerie_spark.operators.text import classifier_score, tokens

    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "delta epsilon"),
        (3, ""),
        (4, "zeta"),
        (5, None),  # NULL text == '' (both modes must emit its row)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    hashed = classifier_score(df, "doc_id", "text")
    plan = hashed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    vocab = df.select(F.explode(tokens(F.col("text"))).alias("term")).distinct()
    weights = vocab.select(
        "term",
        ((phash_salted(F.col("term"), 97) % F.lit(2001)) - F.lit(1000))
        .cast("long")
        .alias("weight"),
    )
    trained = classifier_score(df, "doc_id", "text", weights=weights)
    tplan = trained._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in tplan, tplan

    key = lambda r: (r["id"], r["n_tokens"], r["score_sum"],
                     r["score_milli"], r["keep"])
    h = sorted(map(key, hashed.collect()))
    t = sorted(map(key, trained.collect()))
    # identical everywhere — including doc 3 (empty text) and doc 5
    # (NULL text), which both carry the single empty token in BOTH
    # paths (vocab includes ""): no mode may drop a document
    assert t == h
    assert len(h) == len(rows)
    assert [x for x in h if x[0] == 3][0][1] == 1  # n_tokens convention
    assert [x for x in h if x[0] == 5][0][1] == 1  # NULL == ''

    # OOV terms weigh 0: score with only "alpha" in vocabulary
    w1 = weights.filter(F.col("term") == "alpha")
    one = {r["id"]: r["score_sum"]
           for r in classifier_score(df, "doc_id", "text", weights=w1).collect()}
    alpha_w = weights.filter(F.col("term") == "alpha").collect()[0]["weight"]
    assert one[1] == 2 * alpha_w and one[2] == 0 and one[4] == 0

    # threshold: raising it past the maximum possible score_milli
    # (scale * 1000 — mean weight in [-scale, scale], milli-scaled)
    # keeps nothing
    hi = classifier_score(df, "doc_id", "text", threshold_milli=1_000_001)
    assert all(not r["keep"] for r in hi.collect())

    # classifier_milli (the in-place filtering Column, used by the
    # curation v5 flagship) must never drift from classifier_score
    from sonnerie_spark.operators.text import classifier_milli

    milli = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id", classifier_milli(F.col("text")).alias("m")
        ).collect()
    }
    assert milli == {x[0]: x[3] for x in h}


def test_gopher_quality_rules_per_branch(spark):
    """gopher_quality: each published rule is exercised by a document
    constructed to fail exactly that rule, and the good document
    passes. Hand-computed feature values pin the arithmetic."""
    from sonnerie_spark.operators.text import gopher_quality

    good = "the cat sat with all of them and that was fine " * 6  # 66 words
    rows = [
        (1, good),
        (2, "the and short"),  # word count 3 < 50
        (3, ("a " * 59) + "extraordinarily"),  # mean word len < 3
        (4, good + " " + "# " * 10),  # hash-symbol ratio 10/76 > 0.1
        (5, "\n".join(["- " + good] * 10)),  # 100% bullet lines
        (6, "\n".join([good + "..."] * 10)),  # 100% ellipsis lines
        (7, ("42 " * 55) + "the and"),  # alpha frac 2/57 < 0.8
        (8, "zz yy xx ww vv uu tt ss rr qq " * 6),  # 0 stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in gopher_quality(df, "doc_id", "text").collect()}
    assert out[1]["keep"] is True
    for i in range(2, 9):
        assert out[i]["keep"] is False, i
    assert out[1]["n_words"] == 66
    assert out[2]["n_words"] == 3
    assert out[4]["hash_word_ratio"] > 0.1
    assert out[5]["bullet_frac"] == 1.0
    assert out[6]["ellipsis_frac"] == 1.0
    assert out[7]["alpha_frac"] < 0.8
    assert out[8]["stop_hits"] == 0
    # ''the'' appears (stopword) plus with/of/and/that -> 5 distinct
    assert out[1]["stop_hits"] == 5


def test_c4_line_clean_rules_and_reassembly(spark):
    """c4_clean: terminal-punctuation, min-word, and javascript line
    rules each drop the right line; lorem-ipsum / curly-brace / too-few-
    surviving-lines page rules set keep=false; surviving lines are
    reassembled in order."""
    from sonnerie_spark.operators.text import c4_clean

    page = (
        "The first sentence has enough words here.\n"
        "Too short.\n"
        "no terminal punctuation on this line at all\n"
        "Please enable javascript to continue browsing now.\n"
        "The final sentence also has enough words!"
    )
    rows = [
        (1, page),
        (2, page + "\nAnd a third good line ends properly.\n"
            "this page has lorem ipsum in it."),
        (3, page + "\nAnd a third good line ends properly.\n"
            "function f() { return 1; }"),
        (4, page + "\nAnd a third good line ends properly."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in c4_clean(df, "doc_id", "text").collect()}
    # doc 1: only 2 lines survive -> keep false, text preserves order
    assert out[1]["n_kept"] == 2 and out[1]["keep"] is False
    assert out[1]["text"] == (
        "The first sentence has enough words here.\n"
        "The final sentence also has enough words!"
    )
    assert out[1]["n_removed"] == 3
    # doc 4: 3 surviving lines -> keep
    assert out[4]["n_kept"] == 3 and out[4]["keep"] is True
    # page-level tells: lorem ipsum / '{' kill the page even with 3+ lines
    assert out[2]["keep"] is False and out[2]["n_kept"] >= 3
    assert out[3]["keep"] is False and out[3]["n_kept"] >= 3


def test_dedup_substrings_vs_model(spark):
    """dedup_substrings (ExactSubstr removal): output equals an
    independent Python model on a corpus mixing a shared span, a
    partially-shared doc, a unique doc, and a doc shorter than k."""
    from collections import defaultdict

    from sonnerie_spark.operators.text import dedup_substrings

    K, MINDF = 4, 2
    docs = [
        (1, "aa bb cc dd unique one two three"),
        (2, "aa bb cc dd other tail words here"),
        (3, "totally distinct text with nothing shared at all"),
        (4, "short doc"),
        (5, "aa bb cc dd"),  # doc that is ENTIRELY a shared span
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in dedup_substrings(
            df, "doc_id", "text", k=K, min_df=MINDF
        ).collect()
    }
    toks = {i: t.split() for i, t in docs}
    occ = defaultdict(set)
    for i, t in toks.items():
        for p in range(len(t) - K + 1):
            occ[tuple(t[p : p + K])].add(i)
    for i, t in toks.items():
        cov = set()
        for p in range(len(t) - K + 1):
            if len(occ[tuple(t[p : p + K])]) >= MINDF:
                cov.update(range(p, p + K))
        kept = [w for j, w in enumerate(t) if j not in cov]
        assert out[i]["text"] == " ".join(kept), i
        assert out[i]["n_removed"] == len(t) - len(kept), i
    assert out[5]["text"] == "" and out[5]["n_removed"] == 4


def test_bpe_encode_equals_iterative_bpe(spark):
    """bpe_encode (replace-chain): output equals the classic iterative
    lowest-rank-first BPE encoder on every word, including cascading
    merges (t+h -> th+e), adjacent same-pair runs, and words with no
    applicable merge. Also pins whitespace normalization."""
    from sonnerie_spark.operators.text import bpe_encode

    merges = [
        ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
        ("an", "d"), ("e", "r"), ("o", "u"), ("c", "o"),
    ]

    def true_bpe(word):
        rank = {m: i for i, m in enumerate(merges)}
        w = list(word)
        while len(w) > 1:
            best = min(
                (rank.get((w[i], w[i + 1]), 10**9), i)
                for i in range(len(w) - 1)
            )
            if best[0] >= 10**9:
                break
            a, b = merges[best[0]]
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            w = out
        return w

    docs = [
        (1, "the thin other hand and round counter"),
        (2, "in the beginning there was and"),
        (3, "zzz qqq"),
        (4, "a"),
        (5, "thththe ananand"),
        (6, "thth anan erer inin"),
        (7, "  doubled   spaces  here "),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["id"]: r for r in bpe_encode(df, "doc_id", "text", merges).collect()
    }
    for i, t in docs:
        exp = [tok for w in t.split() for tok in true_bpe(w)]
        assert list(out[i]["tokens"]) == exp, i
        assert out[i]["n_tokens"] == len(exp)


def test_bm25_topk_vs_model(spark):
    """bm25_topk: ranking and integer-exact scores equal an independent
    Python BM25 on a small corpus; a query matching nothing returns no
    rows; tf saturation and length normalization both discriminate."""
    import math

    from sonnerie_spark.operators.text import bm25_topk

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown cat sleeps"),
        (3, "a fox and a dog play"),
        (4, "completely unrelated text about spark plans"),
        (5, "dog dog dog dog"),
    ]
    qs = [(100, "quick fox"), (200, "lazy dog"), (300, "nomatch zz")]
    out = bm25_topk(
        spark.createDataFrame(docs, ["doc_id", "text"]),
        spark.createDataFrame(qs, ["q_id", "q_text"]),
        top_k=3,
    ).collect()
    got = {(r["q_id"], r["rk"]): (r["id"], r["score_q6"]) for r in out}

    K1, B = 1.2, 0.75
    toks = {i: t.split() for i, t in docs}
    N = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / N

    def score(qtext, d):
        t, dl, s = toks[d], len(toks[d]), 0
        for term in set(qtext.split()):
            tf = t.count(term)
            if not tf:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
            c = idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
            s += math.floor(c * 1e6 + 0.5)
        return s

    for qid, qtext in qs:
        exp = sorted(
            ((score(qtext, d), d) for d, _ in docs if score(qtext, d) > 0),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        for rk, (sc, d) in enumerate(exp, 1):
            assert got.get((qid, rk)) == (d, sc), (qid, rk)
        assert (qid, len(exp) + 1) not in got
    assert not any(q == 300 for q, _ in got)  # no-match query: zero rows


def _classic_bpe(texts, n_merges):
    """Independent reference BPE trainer (Sennrich et al. 2016
    pseudo-code): dict-of-symbol-tuples, greedy argmax with
    (count desc, pair asc) tie-break, left-to-right non-overlapping
    merge application."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        new = Counter()
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        words = new
    return merges


def test_bpe_train_vs_model_and_oracle(spark):
    """bpe_train: the learned merge table equals an independent classic
    Python BPE trainer AND the chained-CTE DuckDB mirror on a corpus
    with overlap/tie pressure; the learned merges feed bpe_encode."""
    import duckdb

    from sonnerie_spark.operators.text import (
        bpe_encode,
        bpe_train,
        bpe_train_sql,
    )

    texts = [
        "the fast cat sat on the mat",
        "that hat is that cat's hat indeed",
        "banana bandana ana ana banana",
        "aaaa aaa aa a",  # overlapping-pair greedy-merge pressure
        "the theme thesis there then",
    ]
    expected = _classic_bpe(texts, 8)
    got = bpe_train(
        spark.createDataFrame([(t,) for t in texts], ["text"]),
        "text",
        num_merges=8,
    )
    assert got == expected, (got, expected)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"($${t}$$)" for t in texts)
        + ") AS v(text)"
    )
    rows = sorted(con.execute(bpe_train_sql("docs", "text", num_merges=8)).fetchall())
    assert [(a, b, n) for _, a, b, n in rows] == expected

    # composition: the learned table drives bpe_encode and compresses
    enc = bpe_encode(
        spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]),
        "doc_id",
        "text",
        [(a, b) for a, b, _ in got],
    ).collect()
    for r in enc:
        assert r["n_tokens"] < len(texts[r["id"]].replace(" ", "")) + texts[r["id"]].count(" ")


def test_bpe_train_property_vs_model(spark):
    """Property: bpe_train equals the classic trainer on random
    low-alphabet corpora (dense pair collisions, deliberate ties)."""
    from hypothesis import given, settings, strategies as st

    from sonnerie_spark.operators.text import bpe_train

    word = st.text(alphabet="abc", min_size=1, max_size=6)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.lists(word, min_size=1, max_size=5),
                    min_size=1, max_size=4))
    def check(corpora):
        texts = [" ".join(ws) for ws in corpora]
        expected = _classic_bpe(texts, 5)
        got = bpe_train(
            spark.createDataFrame([(t,) for t in texts], ["text"]),
            "text",
            num_merges=5,
        )
        assert got == expected, (texts, got, expected)

    check()


def test_ln_cr_accuracy_and_cross_engine_bitmatch(spark):
    """ln_cr (the correctly-rounded-ops-only ln that keeps bm25's
    hashed score engine-independent): (a) within 1e-9 of math.log over
    the idf argument range, (b) Spark JVM evaluation, DuckDB evaluation
    of ln_cr_sql, and a Python mirror of the op sequence are all
    BIT-IDENTICAL — the property JVM Math.log vs libm ln lacks (the r6
    bm25_topk driver-red)."""
    import math

    import duckdb

    from sonnerie_spark.operators.text import _LN_CR_SQRTS, ln_cr, ln_cr_sql

    def ln_cr_py(x):
        y = x
        for _ in range(_LN_CR_SQRTS):
            y = math.sqrt(y)
        z = (y - 1.0) / (y + 1.0)
        z2 = z * z
        s = z + (z * z2) / 3.0 + (z * z2 * z2) / 5.0 + (z * z2 * z2 * z2) / 7.0
        return s * float(2 ** (_LN_CR_SQRTS + 1))

    xs = [1e-300, 1e-150, 1e-30, 1e-8, 0.5, 1.0 + 1e-7, 1.5, 2.0, 3.7,
          10.0, 101.5, 999.25, 20001.0, 123456.789, 3e6, 2.9e7, 1e100,
          1e150, 1e250, 1e300, 1.7e308]
    con = duckdb.connect()
    sdf = spark.createDataFrame([(x,) for x in xs], ["x"]).select(
        ln_cr(F.col("x")).alias("v")
    )
    spark_vals = [r["v"] for r in sdf.collect()]
    for x, v_spark in zip(xs, spark_vals):
        v_py = ln_cr_py(x)
        v_duck = con.execute(f"SELECT {ln_cr_sql(repr(x))}").fetchone()[0]
        assert v_spark == v_py == v_duck, (x, v_spark, v_py, v_duck)
        assert abs(v_py - math.log(x)) < 1e-9, (x, v_py, math.log(x))


def test_budget_mix_vs_model_and_cap(spark):
    """budget_mix: kept set equals an independent Python model of the
    integer keep rule; a source whose target exceeds its total keeps
    every document (the branchless cap); achieved per-source tokens
    track targets."""
    import hashlib

    from sonnerie_spark.operators.sampling import budget_mix

    rows = [
        (i, ["web", "books", "code"][i % 3], 50 + (i * 37) % 200)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    weights = {"web": 5, "books": 3, "code": 2}
    budget = 120_000
    got = {
        (r["id"], r["source"], r["n_tokens"])
        for r in budget_mix(
            df, "source", "doc_id", "n_tokens",
            budget=budget, weights=weights,
        ).collect()
    }

    def phash_py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    tot: dict[str, int] = {}
    for _i, s, n in rows:
        tot[s] = tot.get(s, 0) + n
    wsum = sum(weights.values())
    exp = {
        (i, s, n)
        for i, s, n in rows
        if phash_py(str(i)) % 1_000_000 * tot[s] * wsum
        < 1_000_000 * budget * weights[s]
    }
    assert got == exp
    ach: dict[str, int] = {}
    for _i, s, n in got:
        ach[s] = ach.get(s, 0) + n
    for s, w in weights.items():
        target = min(tot[s], budget * w / wsum)
        assert 0.85 < ach[s] / target < 1.15, (s, ach[s], target)

    # cap: give books an overwhelming weight -> target >> total
    out2 = budget_mix(
        df, "source", "doc_id", "n_tokens",
        budget=10**9, weights={"web": 1, "books": 1000},
    ).collect()
    assert sum(1 for r in out2 if r["source"] == "books") == 1000
    assert not any(r["source"] == "code" for r in out2)  # unweighted drop


def test_bpe_encode_property_trained_tables(spark):
    """Property test: for random corpora and merge tables produced by
    REAL BPE training (hence valid by construction — every multi-char
    operand comes from an earlier merge), the replace-chain encoder
    must equal the classic iterative lowest-rank-first encoder on every
    word. This pins the validity-invariant argument the operator's
    one-pass-per-merge design rests on."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from sonnerie_spark.operators.text import bpe_encode

    def train_merges(words, n_merges):
        seqs = [list(w) for w in words]
        merges = []
        for _ in range(n_merges):
            pairs = Counter()
            for s in seqs:
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] += 1
            if not pairs:
                break
            best = max(pairs, key=lambda p: (pairs[p], p))
            merges.append(best)
            a, b = best
            for j, s in enumerate(seqs):
                out, i = [], 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[j] = out
        return merges

    def iterative_encode(word, merges):
        rank = {m: i for i, m in enumerate(merges)}
        w = list(word)
        while len(w) > 1:
            best = min(
                (rank.get((w[i], w[i + 1]), 10**9), i)
                for i in range(len(w) - 1)
            )
            if best[0] >= 10**9:
                break
            a, b = merges[best[0]]
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            w = out
        return w

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=8),
            min_size=3, max_size=12,
        ),
        st.integers(min_value=1, max_value=10),
    )
    def check(words, n_merges):
        merges = train_merges(words, n_merges)
        if not merges:
            return
        docs = [(i, " ".join(words)) for i in range(2)]
        out = {
            r["id"]: list(r["tokens"])
            for r in bpe_encode(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                "doc_id", "text", merges,
            ).collect()
        }
        exp = [t for w in words for t in iterative_encode(w, merges)]
        for i in range(2):
            assert out[i] == exp, (words, merges, out[i], exp)

    check()


def test_dedup_substrings_property(spark):
    """Property test: dedup_substrings equals the independent Python
    model on random low-alphabet corpora (high natural span collision
    rates) for k in {2, 3}."""
    from collections import defaultdict

    from hypothesis import given, settings, strategies as st

    from sonnerie_spark.operators.text import dedup_substrings

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["x", "y", "z"]), min_size=1, max_size=10
            ),
            min_size=2, max_size=8,
        ),
        st.integers(min_value=2, max_value=3),
    )
    def check(corpora, k):
        docs = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
        out = {
            r["id"]: (r["text"], r["n_removed"])
            for r in dedup_substrings(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                "doc_id", "text", k=k, min_df=2,
            ).collect()
        }
        occ = defaultdict(set)
        toks = {i: t.split() for i, t in docs}
        for i, t in toks.items():
            for p in range(len(t) - k + 1):
                occ[tuple(t[p : p + k])].add(i)
        for i, t in toks.items():
            cov = set()
            for p in range(len(t) - k + 1):
                if len(occ[tuple(t[p : p + k])]) >= 2:
                    cov.update(range(p, p + k))
            kept = [w for j, w in enumerate(t) if j not in cov]
            assert out[i] == (" ".join(kept), len(t) - len(kept)), (
                docs, k, i, out[i],
            )

    check()


def test_curation_example_end_to_end(spark, capsys):
    """The runnable example (examples/curation_pipeline.py) composes
    ten oracle-gated operators into the published curation recipe; it
    must run end-to-end on the smallest SF and show a monotone
    document funnel through the drop stages."""
    import re
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "examples")
    )
    import curation_pipeline

    curation_pipeline.main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    counts = [int(m.replace(",", ""))
              for m in re.findall(r"(\d[\d,]*) docs", out)]
    assert len(counts) >= 8
    assert counts[0] == 500
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert "packed examples" in out
    assert "16 merges learned" in out  # stage 11: tokenizer trained


def test_timeseries_tour_end_to_end(spark, capsys, tmp_path):
    """The runnable reference-parity tour (examples/timeseries_tour.py)
    must exercise ingest, reads, LWW, time travel, CDC, delete, rollup
    cascade, compaction, and the Arrow fold with the expected observable
    numbers."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "examples")
    )
    import timeseries_tour

    timeseries_tour.main(str(tmp_path))
    out = capsys.readouterr().out
    assert "73 records" in out
    assert "%.paris=48" in out
    assert "-> 99.9 (1 record for the slot)" in out
    assert "as_of tx2 reads 20.0" in out
    assert "temp.tokyo reads 0 rows" in out
    assert "1h buckets=49  6h buckets=9" in out
    assert "49 -> 49 rows, 1 run" in out
    assert "max=99.9 mean=26.08" in out
    # stage 9: per-key p99 via grouped DDSketch — rank floor(.99*23)=22
    # of temp.paris's 24 sorted points is the one below the 99.9 spike
    assert "9 p99[temp.paris] ~= 25.8" in out


def test_bm25_property_vs_model(spark):
    """Property test: bm25_topk's integer-exact scores and ranking
    equal an independent Python BM25 on random low-alphabet corpora
    (dense tf/df collisions, deliberate tie pressure)."""
    import math

    from hypothesis import given, settings, strategies as st

    from sonnerie_spark.operators.text import bm25_topk

    word = st.sampled_from(["p", "q", "r", "pp"])

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(st.lists(word, min_size=1, max_size=6),
                 min_size=2, max_size=6),
        st.lists(word, min_size=1, max_size=3),
    )
    def check(corpora, query):
        docs = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
        qs = [(0, " ".join(query))]
        got = {
            r["rk"]: (r["id"], r["score_q6"])
            for r in bm25_topk(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                spark.createDataFrame(qs, ["q_id", "q_text"]),
                top_k=4,
            ).collect()
        }
        K1, B = 1.2, 0.75
        toks = {i: t.split() for i, t in docs}
        N = len(docs)
        avgdl = sum(len(t) for t in toks.values()) / N

        def score(d):
            t, dl, s = toks[d], len(toks[d]), 0
            for term in set(query):
                tf = t.count(term)
                if not tf:
                    continue
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
                c = (idf * tf * (K1 + 1)
                     / (tf + K1 * (1 - B + B * dl / avgdl)))
                s += math.floor(c * 1e6 + 0.5)
            return s

        exp = sorted(
            ((score(d), d) for d, _ in docs if score(d) > 0),
            key=lambda x: (-x[0], x[1]),
        )[:4]
        assert got == {rk: (d, sc) for rk, (sc, d) in enumerate(exp, 1)}, (
            corpora, query, got, exp,
        )

    check()


def test_mix_weights_reject_phantom_sources(spark):
    """Weighted/budget mixing: weights naming a source absent from the
    corpus raise by default (the phantom's share would silently never
    be delivered and other sources would scale against it);
    strict=False restores the permissive behavior."""
    import pytest

    from sonnerie_spark.operators.sampling import (
        budget_mix,
        mix_sources_weighted,
    )

    df = spark.createDataFrame(
        [(i, ["web", "books"][i % 2], 10) for i in range(40)],
        ["doc_id", "source", "n_tokens"],
    )
    with pytest.raises(ValueError, match="typo"):
        mix_sources_weighted(
            df, "source", "doc_id", {"web": 1, "typo": 1}
        ).count()
    with pytest.raises(ValueError, match="typo"):
        budget_mix(
            df, "source", "doc_id", "n_tokens",
            budget=100, weights={"web": 1, "typo": 1},
        ).count()
    # strict=False: permissive, phantom contributes nothing
    out = budget_mix(
        df, "source", "doc_id", "n_tokens",
        budget=100, weights={"web": 1, "typo": 1}, strict=False,
    )
    assert {r["source"] for r in out.collect()} <= {"web"}
    ok = mix_sources_weighted(df, "source", "doc_id", {"web": 1, "books": 2})
    assert ok.count() > 0


def test_operator_argument_guards(spark):
    """Malformed arguments raise immediately instead of producing
    plausible-but-wrong results: BPE operands with whitespace/control
    marks (they would corrupt the token delimiter scheme), non-positive
    mixture weights (undefined binding ratio), non-positive budgets,
    and k < 1 span windows."""
    import pytest

    from sonnerie_spark.operators.sampling import (
        budget_mix,
        mix_sources_weighted,
    )
    from sonnerie_spark.operators.text import bpe_encode, dedup_substrings

    df = spark.createDataFrame(
        [(1, "a b", "s", 2)], ["doc_id", "text", "source", "n_tokens"]
    )
    with pytest.raises(ValueError, match="merge operand"):
        bpe_encode(df, "doc_id", "text", [("a b", "c")])
    with pytest.raises(ValueError, match="merge operand"):
        bpe_encode(df, "doc_id", "text", [("a", "")])
    with pytest.raises(ValueError, match="k must be"):
        dedup_substrings(df, "doc_id", "text", k=0)
    with pytest.raises(ValueError, match="strictly positive"):
        mix_sources_weighted(df, "source", "doc_id", {"s": 0})
    with pytest.raises(ValueError, match="strictly positive"):
        budget_mix(df, "source", "doc_id", "n_tokens",
                   budget=10, weights={"s": -1})
    with pytest.raises(ValueError, match="budget must be"):
        budget_mix(df, "source", "doc_id", "n_tokens",
                   budget=0, weights={"s": 1})


def test_bpe_train_pairless_corpus_and_dd_quantile_extremes(spark):
    """Edges: a corpus with no adjacent pairs (every word one char)
    learns ZERO merges in BOTH engines (Spark breaks the loop; the
    chained-CTE oracle's empty argmax propagates emptiness through
    every stage); dd_group_quantile at q=0 / q=1 picks each group's
    first / last bucket within the relative bound."""
    import duckdb

    from sonnerie_spark.operators.sketch import (
        dd_group_quantile,
        dd_sketch_grouped,
    )
    from sonnerie_spark.operators.text import bpe_train, bpe_train_sql

    texts = ["a b c", "d e", "f"]
    got = bpe_train(
        spark.createDataFrame([(t,) for t in texts], ["text"]),
        "text",
        num_merges=4,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM "
        "(VALUES ('a b c'), ('d e'), ('f')) v(text)"
    )
    assert got == []
    assert con.execute(bpe_train_sql("docs", "text", num_merges=4)).fetchall() == []

    rows = [("g", float(v)) for v in [1.0, 10.0, 100.0, 1000.0]]
    sk = dd_sketch_grouped(spark.createDataFrame(rows, ["g", "x"]), "g", "x")
    lo = dd_group_quantile(sk, 0.0).collect()[0]
    hi = dd_group_quantile(sk, 1.0).collect()[0]
    assert abs(lo["est"] - 1.0) < 0.01 and abs(hi["est"] - 1000.0) < 10.0


def test_telemetry_tour_end_to_end(spark, capsys):
    """The runnable sketch/telemetry tour (examples/telemetry_tour.py)
    must demonstrate every merge identity as True, replay-safe stores,
    and a Bloom filter with zero false negatives on the sf0.001 data."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "examples")
    )
    import telemetry_tour

    telemetry_tour.main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "[2] hll_merge(even, odd) == one-shot sketch: True" in out
    assert "[4] cms_merge(even, odd) == one-shot sketch: True" in out
    assert "[6] kmv_merge == one-shot bottom-k: True" in out
    assert "[9] grouped dd_merge(even, odd) == one-shot: True" in out
    assert "applied=[True, True, False]" in out
    assert "false negatives 0" in out
    assert "est 14 vs exact 15" in out  # HLL estimate pinned on this data
