"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

The corpus never leaves the cluster: training state is the DISTINCT-WORD
table (word -> corpus count), orders of magnitude smaller than the corpus
(Heaps' law), and each merge iteration is one partial-agg round over it:

  pass 0   distributed word counts (the top_words partial/combiner shape)
  per merge:
    1. map_batches: per-block adjacent-pair counts weighted by word count
       (one (pair, n) partial row per distinct pair per block)
    2. groupby(pair).sum  — the ONLY exchange, vocabulary-sized, tiny rows
    3. driver: argmax pair (count desc, pair asc tiebreak -> deterministic)
    4. map_batches: apply the merge to each word's symbol list (vectorized
       over the block's words; symbols stay python tuples inside the block)

The driver holds only the merge list (N_merges pairs) and per-iteration
argmax — never words or counts.  A 100-TB corpus changes pass 0's cost,
not the loop's: the word table is bounded by vocabulary, and each
iteration shuffles at most one row per distinct pair per block.

Single-process reference ``bpe_reference`` (same tie-breaking) backs the
equivalence tests; both implementations must produce IDENTICAL merge
sequences.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word)


def _pair_counts_block(batch: pd.DataFrame) -> pd.DataFrame:
    """(symbols, n) block -> per-block (a, b, pn) adjacent-pair partials."""
    counts: dict[tuple[str, str], int] = {}
    for syms, n in zip(batch["symbols"], batch["n"]):
        for i in range(len(syms) - 1):
            k = (syms[i], syms[i + 1])
            counts[k] = counts.get(k, 0) + int(n)
    if not counts:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "pn": pd.Series([], dtype="int64")})
    ks = list(counts)
    return pd.DataFrame({"a": [k[0] for k in ks], "b": [k[1] for k in ks],
                         "pn": pd.Series([counts[k] for k in ks],
                                         dtype="int64")})


def _apply_merge_block(batch: pd.DataFrame, a: str, b: str) -> pd.DataFrame:
    ab = a + b
    out = []
    for syms in batch["symbols"]:
        if len(syms) < 2:
            out.append(syms)
            continue
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out.append(tuple(merged))
    return pd.DataFrame({"symbols": pd.Series(out, dtype=object),
                         "n": batch["n"].astype("int64")})


def train_bpe_distributed(docs_ds, n_merges: int = 50,
                          text_col: str = "text") -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges over a documents Dataset; returns the
    merge list in order.  Word-boundary BPE (no cross-word merges), no
    end-of-word marker — the variant ``bpe_reference`` mirrors."""
    import ray.data as rd

    def wc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[text_col].str.split().explode().dropna()
        vc = words.value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                             "pn": vc.to_numpy().astype("int64")})

    from ray.data.aggregate import Sum

    words = (docs_ds.map_batches(wc_partial, batch_format="pandas")
             .groupby("w").aggregate(Sum("pn", alias_name="n"))
             .map_batches(lambda b: pd.DataFrame(
                 {"symbols": b["w"].map(_word_symbols), "n": b["n"]}),
                 batch_format="pandas"))

    merges: list[tuple[str, str]] = []
    # materialize once: the word table re-feeds every iteration
    current = words.materialize()
    for _ in range(n_merges):
        pairs = (current.map_batches(_pair_counts_block,
                                     batch_format="pandas")
                 .groupby(["a", "b"]).aggregate(Sum("pn", alias_name="n"))
                 .to_pandas())  # bounded by distinct pairs, tiny rows
        if pairs.empty:
            break
        pairs = pairs.sort_values(["n", "a", "b"],
                                  ascending=[False, True, True])
        best = (str(pairs.iloc[0]["a"]), str(pairs.iloc[0]["b"]))
        if int(pairs.iloc[0]["n"]) < 2:
            break  # nothing left worth merging
        merges.append(best)
        a, b = best
        current = current.map_batches(
            lambda batch, a=a, b=b: _apply_merge_block(batch, a, b),
            batch_format="pandas").materialize()
    return merges


def bpe_reference(texts: list[str], n_merges: int = 50) -> list[tuple[str, str]]:
    """Single-process reference with identical semantics + tie-breaking."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    words = {(_word_symbols(w)): n for w, n in wc.items()}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        ab = a + b
        new_words: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(ab)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def apply_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a trained merge list (training-order greedy,
    the standard BPE inference rule)."""
    syms = list(word)
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
