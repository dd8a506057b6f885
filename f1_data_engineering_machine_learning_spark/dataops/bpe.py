"""Distributed BPE (byte-pair-encoding) vocabulary training and
application — the tokenizer-construction step of an LLM data pipeline
(Sennrich et al. 2016, the algorithm behind GPT-2/LLaMA-style subword
vocabularies), built Spark-first.

Scale shape — the property that makes BPE trainable on a 100 TB corpus:
the corpus is touched ONCE (``word_freqs``: tokenize + count, one
shuffle of (word, count) pairs). Everything after runs on the DISTINCT
word-frequency table (10-100M rows for a web-scale corpus, not
trillions of tokens): each merge iteration is

1. one map-only pass producing adjacent symbol pairs
   (``zip_with`` over each word's symbol array — no window, no join),
2. one freq-weighted pair-count aggregation (map-side combinable,
   integer sums -> deterministic),
3. a 1-row collect of the argmax pair (ties: highest count, then
   lexicographic (left, right) — fully deterministic),
4. one map-only fold applying the merge greedily left-to-right inside
   every symbol array.

The vocab table is persisted per round and the previous round
unpersisted (the connected-components idiom, curate.py) so iteration k
does not recompute folds 1..k-1 from scratch.

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 1,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    ``(merges, vocab)``: ``merges`` is the ordered rule list
    (step / left / right / merged / pair_count — the tokenizer
    artifact), ``vocab`` the final (word, freq, syms) segmentation of
    every distinct word. Stops early when no pair reaches
    ``min_pair_count``. Driver traffic: ONE row per iteration."""
    # persists are LAZY on purpose: round k's vocab materializes into the
    # cache during round k+1's 1-row argmax collect (the only action), so
    # each iteration is exactly ONE job and recompute depth stays 1 —
    # an eager count() per round would double the job count for nothing.
    vocab = (
        word_freqs(df, text_col)
        .withColumn("syms", _char_syms(F.col("word")))
        .persist()
    )
    merges: list[dict] = []
    prev: DataFrame | None = None
    for step in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["pair_count"])
        merges.append(
            {
                "step": step,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": cnt,
            }
        )
        nxt = vocab.withColumn("syms", _merge_expr("syms", left, right)).persist()
        prev = vocab
        vocab = nxt
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
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    seg = segment_words(toks.select("word").distinct(), merges)
    joined = toks.join(F.broadcast(seg), "word")
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
