"""BPE trainer/applier vs an in-test pure-Python reference
implementation (the Sennrich algorithm, written independently of the
Spark code) — the same oracle strategy the throttle operator uses:
sequential semantics proven against a trivially-auditable twin."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.dataops import bpe


def _ref_bpe(words: list[str], n: int):
    """Reference BPE: freq-weighted pair counts, argmax (count desc then
    lexicographic), greedy leftmost non-overlapping merge."""
    wf = Counter(words)
    vocab = {w: tuple(list(w) + ["</w>"]) for w in wf}
    merges = []
    for step in range(n):
        pc: Counter = Counter()
        for w, c in wf.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        m = max(pc.values())
        left, right = sorted(p for p, c in pc.items() if c == m)[0]
        merges.append((step, left, right, left + right, m))

        def _merge(s):
            out = []
            for sym in s:
                if out and out[-1] == left and sym == right:
                    out[-1] = left + right
                else:
                    out.append(sym)
            return tuple(out)

        vocab = {w: _merge(s) for w, s in vocab.items()}
    return merges, vocab


WORDS = (
    "low lower lowest low low newer newest wider wide new new "
    "banana bandana aaaa abab"
).split()


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(0, " ".join(WORDS)), (1, " ".join(WORDS[:7]))], ["doc_id", "text"]
    )


def test_train_bpe_matches_reference(spark, corpus):
    merges, vocab = bpe.train_bpe(corpus, n_merges=10)
    ref_merges, ref_vocab = _ref_bpe(WORDS + WORDS[:7], 10)
    got = [
        (m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in merges
    ]
    assert got == ref_merges
    seg = {r["word"]: tuple(r["syms"]) for r in vocab.collect()}
    vocab.unpersist()
    assert seg == ref_vocab


def test_merge_fold_is_greedy_leftmost_nonoverlapping(spark):
    """'aaaa' under (a, a) must segment [aa, aa, </w>] — leftmost pairs,
    never the overlapping middle one; 'aaa' leaves the odd tail."""
    df = spark.createDataFrame([("aaaa",), ("aaa",), ("aba",)], ["word"])
    out = {
        r["word"]: list(r["bpe_syms"])
        for r in bpe.segment_words(
            df, [{"left": "a", "right": "a", "merged": "aa"}]
        ).collect()
    }
    assert out["aaaa"] == ["aa", "aa", "</w>"]
    assert out["aaa"] == ["aa", "a", "</w>"]
    assert out["aba"] == ["a", "b", "a", "</w>"]


def test_merged_token_does_not_rematch_its_own_output(spark):
    """After [a,a]->aa the new 'aa' symbol must not chain-merge with a
    following 'a' in the same pass (symbol equality is exact, not
    prefix)."""
    df = spark.createDataFrame([("aaa",)], ["word"])
    out = bpe.segment_words(df, [{"left": "a", "right": "a"}]).first()["bpe_syms"]
    assert list(out) == ["aa", "a", "</w>"]


def test_train_bpe_early_stop_on_min_pair_count(spark, corpus):
    merges, vocab = bpe.train_bpe(corpus, n_merges=50, min_pair_count=10**9)
    vocab.unpersist()
    assert merges == []


def test_apply_bpe_reassembles_in_token_order(spark, corpus):
    merges, vocab = bpe.train_bpe(corpus, n_merges=5)
    vocab.unpersist()
    ref_merges, ref_vocab = _ref_bpe(WORDS + WORDS[:7], 5)
    out = bpe.apply_bpe(corpus, merges).collect()
    by_doc = {r["doc_id"]: list(r["bpe_tokens"]) for r in out}
    expect0 = [s for w in WORDS for s in ref_vocab[w]]
    expect1 = [s for w in WORDS[:7] for s in ref_vocab[w]]
    assert by_doc[0] == expect0
    assert by_doc[1] == expect1
    assert all(r["n_bpe_tokens"] == len(by_doc[r["doc_id"]]) for r in out)


def test_word_freqs_lowercases_and_drops_empty(spark):
    df = spark.createDataFrame([(0, "The  the THE x")], ["doc_id", "text"])
    wf = {r["word"]: r["freq"] for r in bpe.word_freqs(df).collect()}
    assert wf == {"the": 3, "x": 1}


def test_sql_str_escapes_quotes(spark):
    df = spark.createDataFrame([("a'b",)], ["word"])
    out = bpe.segment_words(df, [{"left": "a", "right": "'"}]).first()["bpe_syms"]
    assert list(out) == ["a'", "b", "</w>"]


def _ref_bpe_batched(words: list[str], n: int, batch_size: int):
    """Pure-Python batched BPE twin: per scan, count pairs, page the
    top max(4M, M+8) candidates (mirroring the trainer's bounded
    collect), select via the SAME ``select_batch``, apply the batch
    sequentially (disjoint merges commute — this also cross-checks the
    trainer's chained-fold composition). Returns (merges, vocab,
    n_scans)."""
    wf = Counter(words)
    vocab = {w: tuple(list(w) + ["</w>"]) for w in wf}
    merges, scans = [], 0
    fetch_k = max(batch_size * 4, batch_size + 8)
    while len(merges) < n:
        scans += 1
        pc: Counter = Counter()
        for w, c in wf.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        cands = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:fetch_k]
        batch = bpe.select_batch(
            [(l, r, c) for (l, r), c in cands],
            batch_size=min(batch_size, n - len(merges)),
        )
        if not batch:
            break
        for left, right, cnt in batch:
            merges.append((len(merges), left, right, left + right, cnt))

            def _merge(s, left=left, right=right):
                out = []
                for sym in s:
                    if out and out[-1] == left and sym == right:
                        out[-1] = left + right
                    else:
                        out.append(sym)
                return tuple(out)

            vocab = {w: _merge(s) for w, s in vocab.items()}
    return merges, vocab, scans


def test_select_batch_skips_symbol_conflicts():
    cands = [("a", "b", 10), ("b", "c", 9), ("ab", "d", 8), ("x", "y", 7)]
    # (b,c) shares b with (a,b); (ab,d) collides with the MERGED token ab.
    assert bpe.select_batch(cands, 3) == [("a", "b", 10), ("x", "y", 7)]
    # A candidate whose OWN merged token equals an earlier selection's
    # symbol is skipped too: applying (x,a') with x+a' == 'ab' would mint
    # new 'ab' occurrences after (a,b) already produced some — and one
    # minting 'a' would re-create a symbol the (a,b) fold consumed.
    assert bpe.select_batch([("ab", "c", 10), ("a", "b", 9), ("d", "e", 8)], 3) == [
        ("ab", "c", 10),
        ("d", "e", 8),
    ]
    # min_pair_count stops the scan at the first sub-threshold candidate
    # (the list is count-sorted, so everything after is below too).
    assert bpe.select_batch(cands, 3, min_pair_count=8) == [("a", "b", 10)]
    # batch_size caps selection before conflicts even matter.
    assert bpe.select_batch(cands, 1) == [("a", "b", 10)]


@pytest.mark.parametrize("m", [2, 3, 4])
def test_batched_train_matches_python_batched_reference(spark, corpus, m):
    merges, vocab = bpe.train_bpe(corpus, n_merges=10, batch_size=m)
    ref_merges, ref_vocab, _ = _ref_bpe_batched(WORDS + WORDS[:7], 10, m)
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges
    ]
    assert got == ref_merges
    seg = {r["word"]: tuple(r["syms"]) for r in vocab.collect()}
    vocab.unpersist()
    assert seg == ref_vocab


def test_batched_scan_count_scales_as_merges_over_m(spark, corpus, monkeypatch):
    """Jobs ∝ n_merges / batch_size: the trainer must issue exactly as
    many count scans as the Python batched twin predicts — strictly
    fewer than one per merge."""
    calls = {"n": 0}
    orig = bpe._pair_counts

    def counting(v):
        calls["n"] += 1
        return orig(v)

    monkeypatch.setattr(bpe, "_pair_counts", counting)
    merges, vocab = bpe.train_bpe(corpus, n_merges=8, batch_size=4)
    vocab.unpersist()
    _, _, ref_scans = _ref_bpe_batched(WORDS + WORDS[:7], 8, 4)
    assert len(merges) == 8
    assert calls["n"] == ref_scans
    assert calls["n"] < 8


def test_batch_size_one_is_bitwise_sequential_greedy(spark, corpus):
    seq, v1 = bpe.train_bpe(corpus, n_merges=6, batch_size=1)
    v1.unpersist()
    ref_merges, _ = _ref_bpe(WORDS + WORDS[:7], 6)
    assert [
        (m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in seq
    ] == ref_merges


def test_batched_divergence_exhibit(spark):
    """The documented M>1 artifact: on 'ab'x10 + 'cd'x6, sequential
    greedy's step 2 is the CREATED pair (ab, </w>) count 10, while the
    M=2 batch — selected on the pre-merge snapshot — takes the disjoint
    (c, d) count 6. Both are valid BPE artifacts; the divergence is the
    price of one scan per M merges."""
    words = ["ab"] * 10 + ["cd"] * 6
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    seq, vs = bpe.train_bpe(df, n_merges=2, batch_size=1)
    vs.unpersist()
    bat, vb = bpe.train_bpe(df, n_merges=2, batch_size=2)
    vb.unpersist()
    assert (seq[0]["left"], seq[0]["right"]) == ("a", "b")
    assert (seq[1]["left"], seq[1]["right"]) == ("ab", "</w>")
    assert (bat[0]["left"], bat[0]["right"]) == ("a", "b")
    assert (bat[1]["left"], bat[1]["right"]) == ("c", "d")


def test_fuzz_batched_bpe_matches_python_twin_random_corpora(spark):
    """Seeded randomized sweep: random small corpora (incl. words with
    quotes and repeated chars that stress the SQL-literal escaping and
    the greedy fold), random batch sizes — the Spark trainer must equal
    the pure-Python batched twin on merges AND final vocab, every time."""
    import random

    rng = random.Random(0xB9E)
    alphabet = list("abcde'\\")
    for trial in range(6):
        n_words = rng.randint(3, 12)
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(n_words)
        ] * rng.randint(1, 3)
        m = rng.choice([1, 2, 3, 5])
        n_merges = rng.randint(1, 9)
        df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
        merges, vocab = bpe.train_bpe(df, n_merges=n_merges, batch_size=m)
        got = [
            (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in merges
        ]
        seg = {r["word"]: tuple(r["syms"]) for r in vocab.collect()}
        vocab.unpersist()
        ref_merges, ref_vocab, _ = _ref_bpe_batched(words, n_merges, m)
        assert got == ref_merges, (trial, words, m, n_merges)
        assert seg == ref_vocab, (trial, words, m, n_merges)


def test_select_batch_properties():
    """Brute properties over random candidate pages: (1) selections are
    pairwise symbol-disjoint incl. merged tokens, (2) selection order
    follows page order, (3) each selection is the FIRST eligible
    candidate at its turn (greedy priority), (4) bounded by batch_size
    and min_pair_count."""
    import random

    rng = random.Random(7)
    syms = ["a", "b", "c", "ab", "bc", "d", "e'", "f"]
    for _ in range(200):
        page = []
        seen_pairs = set()
        for _ in range(rng.randint(0, 12)):
            p = (rng.choice(syms), rng.choice(syms))
            if p in seen_pairs:
                continue
            seen_pairs.add(p)
            page.append((p[0], p[1], rng.randint(1, 50)))
        page.sort(key=lambda t: (-t[2], t[0], t[1]))
        bs = rng.randint(1, 4)
        mpc = rng.randint(1, 10)
        out = bpe.select_batch(page, bs, min_pair_count=mpc)
        assert len(out) <= bs
        assert all(c >= mpc for _, _, c in out)
        # pairwise disjoint incl. merged tokens
        used: set[str] = set()
        idxs = []
        for left, right, cnt in out:
            assert left not in used and right not in used
            assert left + right not in used  # merged-token collision
            used.update((left, right, left + right))
            idxs.append(page.index((left, right, cnt)))
        assert idxs == sorted(idxs)  # follows page order
        # greedy: every page candidate SKIPPED before a selection either
        # conflicts with the used-set at that point or is sub-threshold
        used = set()
        oi = 0
        for pi, (left, right, cnt) in enumerate(page):
            if oi < len(out) and (left, right, cnt) == out[oi]:
                used.update((left, right, left + right))
                oi += 1
                continue
            if oi < len(out):
                assert (
                    left in used
                    or right in used
                    or left + right in used
                    or cnt < mpc
                ), (page, out, pi)
    # (trailing candidates after the batch filled need no justification)


def test_train_bpe_resume_bitwise(spark):
    """Resume (init_merges) == uninterrupted run: train 8, vs train 4
    then resume +4 from the saved prefix — identical rule lists and
    identical final vocab (greedy selection is a pure function of vocab
    state). Holds for batched mode too."""
    docs = spark.createDataFrame(
        [(t,) for t in ["low lower lowest", "new newer newest", "wide wider"] * 3],
        "text string",
    )
    for m in (1, 2):
        full, vfull = bpe.train_bpe(docs, n_merges=8, batch_size=m)
        half, vhalf = bpe.train_bpe(docs, n_merges=4, batch_size=m)
        vhalf.unpersist()
        resumed, vres = bpe.train_bpe(
            docs, n_merges=8, batch_size=m, init_merges=half
        )
        assert resumed == full, m
        a = {r["word"]: tuple(r["syms"]) for r in vres.collect()}
        b = {r["word"]: tuple(r["syms"]) for r in vfull.collect()}
        assert a == b, m
        vfull.unpersist()
        vres.unpersist()


def test_apply_bpe_cached_matches_and_grows_store(spark, corpus, tmp_path):
    """apply_bpe_cached == apply_bpe on every call; the store holds
    exactly the distinct words ever tokenized (second call folds only
    the genuinely-new words)."""
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    store = str(tmp_path / "vocab")
    merges, vocab = bpe.train_bpe(corpus, n_merges=6)
    vocab.unpersist()

    got1 = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.apply_bpe_cached(corpus, merges, store).collect()
    }
    want1 = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.apply_bpe(corpus, merges).collect()
    }
    assert got1 == want1

    t = VersionedTable(spark, store)
    n_words_1 = t.read().count()

    corpus2 = spark.createDataFrame(
        [(7, "low lowest brandnew freshword")], ["doc_id", "text"]
    )
    got2 = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.apply_bpe_cached(corpus2, merges, store).collect()
    }
    want2 = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.apply_bpe(corpus2, merges).collect()
    }
    assert got2 == want2
    # store grew by exactly the two new words; known words not re-added
    assert t.read().count() == n_words_1 + 2
    assert t.read().groupBy("word").count().filter("count > 1").count() == 0
