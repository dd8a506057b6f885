"""Distributed BPE (byte-pair-encoding) vocabulary training and
application — the tokenizer-construction step of an LLM data pipeline
(Sennrich et al. 2016, the algorithm behind GPT-2/LLaMA-style subword
vocabularies), built Spark-first.

Scale shape — the property that makes BPE trainable on a 100 TB corpus:
the corpus is touched ONCE (``word_freqs``: tokenize + count, one
shuffle of (word, count) pairs). Everything after runs on the DISTINCT
word-frequency table (10-100M rows for a web-scale corpus, not
trillions of tokens): each SCAN is

1. one map-only pass producing adjacent symbol pairs
   (``zip_with`` over each word's symbol array — no window, no join),
2. one freq-weighted pair-count aggregation (map-side combinable,
   integer sums -> deterministic),
3. a bounded collect of the top candidate pairs (ties: highest count,
   then lexicographic (left, right) — fully deterministic),
4. one map-only fold pass applying the scan's selected merges greedily
   left-to-right inside every symbol array.

BATCHED training (``batch_size`` = M > 1) is how this reaches a real
30k-50k-merge vocabulary: each scan selects up to M pairs from the SAME
count snapshot, highest-count first, skipping any candidate that shares
a symbol with (or equals the merged token of) an earlier selection in
the batch — and also any candidate whose OWN merged token
``left + right`` collides with an earlier selection's symbols or merged
token (applying such a candidate would mint new occurrences of a symbol
an earlier fold already consumed, breaking disjointness). Under that
full check, symbol-disjoint merges cannot create or destroy each
other's occurrences — the greedy fold ``...a b...`` -> ``...ab...``
only touches adjacencies involving ``a``/``b``/``ab`` — so within a
batch the counts are exact and application order is irrelevant; all M
folds compose into ONE projection. Spark jobs are therefore ~ n_merges / M instead of one
per merge, and the lazy-persist chain depth shrinks by the same factor.

Artifact difference at M > 1 (the standard batched-BPE tradeoff, same
as block-parallel BPE trainers): sequential greedy recounts after every
merge, so (a) a pair CREATED by an earlier merge in the batch — one
involving the new merged symbol — can overtake the batch tail, and
(b) a candidate SKIPPED for sharing a symbol keeps a (possibly reduced)
count that may still beat the tail after the conflicting merge lands.
Batch selection sees neither until the next scan. ``batch_size=1``
disables both effects and is BITWISE the classical Sennrich greedy
loop — the oracled contract (``bpe_merges_docs``) trains at M=1;
``tests/test_bpe.py`` pins M>1 against a pure-Python batched reference
and exhibits the divergence corpus explicitly.

The vocab table is persisted per scan and the previous scan
unpersisted (the connected-components idiom, curate.py) so scan k
does not recompute folds of scans 1..k-1 from scratch.

Greedy merge semantics (the fold in ``_merge_expr``): scan symbols left
to right; when the last emitted symbol is ``left`` and the current one
is ``right``, replace the last emitted symbol with the merged token —
leftmost-first, non-overlapping ("aaaa" under (a,a) -> [aa, aa], never
the overlapping middle pair). The DuckDB oracle reproduces exactly this
with a run/parity formulation (islands of consecutive matching
positions; merge even offsets), proven equivalent by the shared catalog
value hash (``bpe_merges_docs``).

Application (``segment_words`` / ``apply_bpe``) also never re-walks the
corpus naively: DISTINCT words are segmented once (n_merges chained
folds, map-only) and documents get their segmentation by exploding
tokens and broadcast-joining the segmented vocabulary back — per-token
array lookups instead of per-token fold chains.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.checkpoints import (
    lineage_cut,
)

_EOW = "</w>"


def _sql_str(s: str) -> str:
    """A SQL single-quoted literal for ``s`` (symbols come from corpus
    text, so quotes/backslashes must not break the generated fold)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus-wide pass of BPE
    training. Lowercased whitespace tokens; empty tokens dropped."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _char_syms(word: Column) -> Column:
    """Initial symbol sequence: characters plus the end-of-word marker
    (the marker keeps word-final merges distinct from word-internal
    ones, the standard Sennrich formulation)."""
    return F.concat(F.split(word, ""), F.array(F.lit(_EOW)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts from (word, freq, syms) — one
    map-only explode + one aggregation; integer sums, deterministic."""
    pairs = vocab.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda x, y: F.struct(x.alias("left"), y.alias("right")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("freq").cast("bigint").alias("pair_count"))


def _merge_expr(syms_col: str, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of (left, right) inside a
    symbol array, as ONE sequential fold — map-only, no shuffle."""
    a, b, ab = _sql_str(left), _sql_str(right), _sql_str(left + right)
    return F.expr(
        f"aggregate({syms_col}, "
        f"named_struct('out', CAST(array() AS array<string>)), "
        f"(acc, s) -> CASE WHEN size(acc.out) > 0 "
        f"AND element_at(acc.out, -1) = {a} AND s = {b} "
        f"THEN named_struct('out', concat(slice(acc.out, 1, size(acc.out) - 1), "
        f"array({ab}))) "
        f"ELSE named_struct('out', concat(acc.out, array(s))) END).out"
    )


def select_batch(
    candidates: list[tuple[str, str, int]],
    batch_size: int,
    min_pair_count: int = 1,
) -> list[tuple[str, str, int]]:
    """Pick up to ``batch_size`` mutually symbol-disjoint pairs from a
    (left, right, count) list already sorted by (count desc, left,
    right). A candidate is skipped when its left or right symbol — OR
    its own merged token ``left + right`` — was already used by an
    earlier selection, as a pair member or as a merged token (a merged
    token can coincide with a pre-existing symbol, so the used-set
    covers both; the merged-token side of the check matters because a
    candidate whose CONCATENATION equals an earlier selection's symbol
    would create new occurrences of that symbol when applied,
    invalidating the disjointness argument). Pure function: the pytest
    reference replays it verbatim."""
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    for left, right, cnt in candidates:
        if cnt < min_pair_count:
            break
        if left in used or right in used or left + right in used:
            continue
        out.append((left, right, cnt))
        if len(out) == batch_size:
            break
        used.update((left, right, left + right))
    return out


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 1,
    batch_size: int = 1,
    checkpoint_interval: int = 8,
    scan_hook=None,
    fetch_k: int | None = None,
    init_merges: list[dict] | None = None,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    ``(merges, vocab)``: ``merges`` is the ordered rule list
    (step / left / right / merged / pair_count — the tokenizer
    artifact), ``vocab`` the final (word, freq, syms) segmentation of
    every distinct word. Stops early when no pair reaches
    ``min_pair_count``.

    ``batch_size=1`` (default) is classical sequential greedy — one
    count scan per merge, bitwise the Sennrich loop. ``batch_size=M>1``
    is batched BPE: one count scan selects up to M symbol-disjoint
    pairs (see module docstring for the exactness argument and the
    documented divergence from sequential greedy), so Spark jobs scale
    as ~ n_merges / M — the production shape for 30k+ merge
    vocabularies. ``pair_count`` in each rule is measured on its scan's
    snapshot (within a batch, counts are exact under disjointness).
    Driver traffic: one bounded candidate page per scan.

    ``checkpoint_interval``: every N scans the vocab's lineage is cut
    (the MLlib iterative-trainer idiom — ALS/GraphX use the same knob).
    Without it the chained fold projections grow the logical plan
    without bound and Catalyst re-optimization goes super-linear:
    measured on this box, sequential scans double in wall time from
    ~scan 12 and OOM the driver near scan 20; with interval 8 every
    scan stays flat (~0.25 s) through 32+ merges. Uses a RELIABLE
    ``checkpoint`` when ``spark.sparkContext`` has a checkpoint dir
    (recompute-safe on executor loss), else ``localCheckpoint`` —
    non-replicated blocks, so on a real cluster set a checkpoint dir
    for long trainings; the interval bounds the loss either way.

    ``scan_hook``: optional ``(scan_index, wall_sec, n_merges_so_far)``
    callback fired after every completed scan iteration (count job +
    batch fold construction) — the depth-microbench seam
    (tools/bpebench.py) for verifying per-scan cost stays flat across
    many lineage-cut cycles. No effect on training.

    ``fetch_k``: candidate page size per scan (default
    ``max(4*M, M+8)``). The depth microbench measured EFFECTIVE batch
    sizes of ~30 at M=64-256: symbol conflicts, not the M cap, bound a
    batch. On the fixture corpus a 16x-deeper page did NOT lift
    merges/scan (early-training conflicts are structural — each merge
    consumes symbols from a still-small alphabet, so deeper candidates
    conflict too); the knob exists for corpora with broad flat count
    distributions where the default page exhausts before M disjoint
    picks. Bounded driver collect either way, never data-scaled;
    selection semantics unaffected (a larger page only extends the same
    count-ordered candidate list).

    ``init_merges``: RESUME a training from a previously-learned rule
    list (the failure-recovery seam for multi-hour 32k-merge runs: the
    merge list is the checkpointable artifact — a few KB of JSON — so a
    crashed training restarts from its last saved prefix instead of
    scan 0). The initial vocabulary replays the given merges as chained
    map-only folds (lineage-cut every ``checkpoint_interval`` rules),
    ``step`` numbering continues after the prefix, and the returned
    ``merges`` list is PREFIX + NEW — bitwise what an uninterrupted run
    of the same total length would have produced (pinned by test),
    because greedy selection is a pure function of the vocab state."""
    if batch_size < 1 or checkpoint_interval < 1:
        raise ValueError("batch_size and checkpoint_interval must be >= 1")
    # persists are LAZY on purpose: scan k's vocab materializes into the
    # cache during scan k+1's bounded argmax collect (the only action), so
    # each scan is exactly ONE job and recompute depth stays 1 —
    # an eager count() per scan would double the job count for nothing.
    vocab = word_freqs(df, text_col).withColumn(
        "syms", _char_syms(F.col("word"))
    )
    init_merges = list(init_merges or [])
    for i, m in enumerate(init_merges):
        # replay the resumed prefix: same fold, same lineage-cut cadence
        vocab = vocab.withColumn("syms", _merge_expr("syms", m["left"], m["right"]))
        if (i + 1) % checkpoint_interval == 0:
            vocab = lineage_cut(vocab)
    vocab = vocab.persist()
    # Candidate page per scan: headroom for conflict skips. Bounded
    # (default ≤ 4M+8 rows of two short strings + a long) regardless of
    # corpus size — never a data-scaled collect.
    if fetch_k is None:
        fetch_k = max(batch_size * 4, batch_size + 8)
    elif fetch_k < batch_size:
        raise ValueError("fetch_k must be >= batch_size")
    merges: list[dict] = list(init_merges)
    prev: DataFrame | None = None
    scan = 0
    while len(merges) < n_merges:
        room = n_merges - len(merges)
        t0 = time.time()
        page = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(fetch_k)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
        batch = select_batch(
            [(r["left"], r["right"], int(r["pair_count"])) for r in page],
            batch_size=min(batch_size, room),
            min_pair_count=min_pair_count,
        )
        if not batch:
            break
        nxt = vocab
        for left, right, cnt in batch:
            merges.append(
                {
                    "step": len(merges),
                    "left": left,
                    "right": right,
                    "merged": left + right,
                    "pair_count": cnt,
                }
            )
            # Disjoint merges commute; chaining the folds in one select
            # keeps the whole batch a single map-only projection.
            nxt = nxt.withColumn("syms", _merge_expr("syms", left, right))
        scan += 1
        if scan % checkpoint_interval == 0:
            # Lineage cut (see docstring): lazy, so it materializes
            # inside the next scan's collect — still one job per scan.
            nxt = lineage_cut(nxt)
        nxt = nxt.persist()
        prev = vocab
        vocab = nxt
        if scan_hook is not None:
            scan_hook(scan - 1, time.time() - t0, len(merges))
    return merges, vocab


def segment_words(words: DataFrame, merges: list[dict], word_col: str = "word") -> DataFrame:
    """Apply an ordered merge list to a table of distinct words: chars +
    end-of-word marker, then one fold per merge — all map-only. Adds
    ``bpe_syms array<string>``."""
    out = words.withColumn("bpe_syms", _char_syms(F.col(word_col)))
    for m in merges:
        out = out.withColumn("bpe_syms", _merge_expr("bpe_syms", m["left"], m["right"]))
    return out


def apply_bpe(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment every document with a learned merge list. The corpus-scale
    path: explode tokens (keeping position), broadcast-join the
    segmentation of DISTINCT words (folds run once per word, not once
    per occurrence), reassemble per document in token order. Returns
    (id_col, bpe_tokens array<string>, n_bpe_tokens)."""
    toks = _word_positions(df, text_col, id_col)
    seg = segment_words(toks.select("word").distinct(), merges)
    return _reassemble(toks, seg, id_col)


def _word_positions(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, word) token explode shared by the apply paths."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")


def _reassemble(toks: DataFrame, seg: DataFrame, id_col: str) -> DataFrame:
    """Broadcast-join (word -> bpe_syms) back onto positioned tokens and
    rebuild each document's token sequence in order."""
    joined = toks.join(F.broadcast(seg.select("word", "bpe_syms")), "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("bpe_syms")))
                    ),
                    lambda s: s["bpe_syms"],
                )
            ).alias("bpe_tokens")
        )
        .withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("int"))
    )


def apply_bpe_cached(
    df: DataFrame,
    merges: list[dict],
    vocab_store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``apply_bpe`` with a PERSISTED word-segmentation store — the
    production shape for re-tokenizing a GROWING corpus: the fold chain
    (one sequential pass per merge rule, the expensive part at 32k
    rules) runs only for words never seen before; every known word is a
    broadcast lookup against the stored (word, bpe_syms) table
    (``plans/versioned.py``, appended under the versioned-table txn
    protocol's CAS). Steady-state ingest therefore pays fold cost
    proportional to VOCABULARY GROWTH, not batch size.

    Store contract: one store per merge list — the segmentation of a
    word is a pure function of the rules, so changing ``merges`` means a
    new ``vocab_store_path`` (exactly a tokenizer artifact version).
    Single-writer, like the ingest sinks."""
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    spark = df.sparkSession
    toks = _word_positions(df, text_col, id_col)
    words = toks.select("word").distinct()
    t = VersionedTable(spark, vocab_store_path)
    try:
        known = t.read()
    except FileNotFoundError:
        known = None
    if known is None:
        t.commit(
            segment_words(words, merges).select("word", "bpe_syms"),
            mode="overwrite",
        )
    else:
        new_words = words.join(known.select("word"), "word", "left_anti")
        t.commit(
            segment_words(new_words, merges).select("word", "bpe_syms"),
            mode="append",
        )
    # prune the store to THIS batch's words before the broadcast: the
    # full store is corpus-vocabulary-scaled (10-100M words at corpus
    # scale — not broadcastable), while the semi-joined slice is bounded
    # by the batch's distinct words, same as plain apply_bpe
    seg = t.read().join(words, "word", "left_semi")
    return _reassemble(toks, seg, id_col)
