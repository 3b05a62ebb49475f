"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

The corpus never leaves the cluster: training state is the DISTINCT-WORD
table (word -> corpus count), orders of magnitude smaller than the corpus
(Heaps' law), and each merge iteration is one partial-agg round over it:

  pass 0   distributed word counts (the top_words partial/combiner shape)
  then the word table is parked ONCE in a pool of resident merge actors
  (it is vocabulary-bounded — Heaps' law — so worker heaps hold it
  trivially at any corpus size); per cluster pass:
    1. each actor returns its adjacent-pair counts weighted by word count
       (one vocabulary-sized dict per actor — the only exchange)
    2. driver: exact integer dict-fold, then select the longest
       PROVABLY-INDEPENDENT prefix of the (count desc, pair asc) ranking
       — symbol-disjoint pairs whose counts strictly dominate anything an
       earlier merge in the batch could create
       (``_select_safe_merge_batch``) — so one pass commits many merges
       with a sequence IDENTICAL to one-at-a-time training
    3. each actor applies the batch to its resident symbol lists in place

The driver holds only the merge list (N_merges pairs) and the folded
pair-count dict (vocabulary-sized) — never words or documents.  A 100-TB
corpus changes pass 0's cost, not the loop's: each pass costs one O(ms)
actor round instead of a fresh Dataset execution plan (the earlier
one-plan-per-pass form spent ~2-3 s of plan launch + shuffle constant
per pass — 22.8 s for a 30-merge train at sf0.1 vs ~4 s resident).

Single-process reference ``bpe_reference`` (same tie-breaking) backs the
equivalence tests; both implementations must produce IDENTICAL merge
sequences.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray as _ray


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word)


def _merge_one(syms: tuple, a: str, b: str, ab: str) -> tuple:
    if len(syms) < 2:
        return syms
    merged, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            merged.append(ab)
            i += 2
        else:
            merged.append(syms[i])
            i += 1
    return tuple(merged)


@_ray.remote(num_cpus=1)
class _BpeWorker:
    """Resident merge actor: holds its shard of the (word, count) table
    as symbol lists and answers pair-count / apply-merge rounds."""

    def __init__(self, refs):
        self.words: list[list] = []  # [symbols_tuple, count] records
        for df in _ray.get(list(refs)):
            if len(df) == 0 or "w" not in df.columns:
                continue  # Ray emits zero-column empty blocks
            for w, n in zip(df["w"], df["n"]):
                self.words.append([_word_symbols(w), int(n)])

    def pair_counts(self) -> dict:
        counts: dict[tuple[str, str], int] = {}
        for syms, n in self.words:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + n
        return counts

    def apply(self, merge_list) -> None:
        """Apply a BATCH of merges in selection order in ONE pass over
        the resident words (the batched pairs are symbol-disjoint, so
        sequential application equals one-merge-per-pass application)."""
        prepared = [(a, b, a + b) for a, b in merge_list]
        for rec in self.words:
            syms = rec[0]
            for a, b, ab in prepared:
                syms = _merge_one(syms, a, b, ab)
            rec[0] = syms


def _select_safe_merge_batch(pairs: pd.DataFrame,
                             limit: int) -> list[tuple[str, str]]:
    """Greedy prefix of the (count desc, lex asc) pair ranking that is
    PROVABLY order-equivalent to one-merge-at-a-time training:

    - merging (a,b) DECREASES only pairs with second==a (their ``a`` gets
      consumed: x·a·b) or first==b (a·b·y) — so a candidate with
      second in {selected firsts} or first in {selected seconds} STOPS
      the batch (its current count may be stale; skipping it could
      reorder the reference sequence).  Any other overlap — e.g. (a,x)
      sharing the first symbol, or (x,b) sharing the second — is
      count-INVARIANT under the earlier merges and may join the batch
      (sequential application in selection order equals the reference's
      one-at-a-time application);
    - every later candidate's count must STRICTLY exceed the upper bound
      of any pair a previous merge can create: merging (a,b) creates only
      (x,ab) with count <= count(x,a) and (ab,y) with count <= count(b,y),
      so the bound is max(max count with second==a, max count with
      first==b) — which also covers chained creations like (ab,cd) via
      count(b,c) <= max_first[b].

    Under those rules the reference's next argmax after applying the
    selected prefix is exactly the next selected pair, so the merge
    SEQUENCE is identical — only the number of cluster passes drops.
    """
    a_l = pairs["a"].tolist()
    b_l = pairs["b"].tolist()
    n_l = pairs["n"].tolist()
    max_first: dict[str, int] = {}
    max_second: dict[str, int] = {}
    for a, b, c in zip(a_l, b_l, n_l):
        c = int(c)
        if c > max_first.get(a, -1):
            max_first[a] = c
        if c > max_second.get(b, -1):
            max_second[b] = c
    sel: list[tuple[str, str]] = []
    sel_firsts: set[str] = set()
    sel_seconds: set[str] = set()
    bound = -1
    for a, b, c in zip(a_l, b_l, n_l):
        c = int(c)
        if c < 2:
            break
        if sel and (b in sel_firsts or a in sel_seconds or c <= bound):
            break
        sel.append((a, b))
        sel_firsts.add(a)
        sel_seconds.add(b)
        bound = max(bound, max_second.get(a, -1), max_first.get(b, -1))
        if len(sel) >= limit:
            break
    return sel


def train_bpe_distributed(docs_ds, n_merges: int = 50,
                          text_col: str = "text",
                          pass_counter: list | None = None
                          ) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges over a documents Dataset; returns the
    merge list in order.  Word-boundary BPE (no cross-word merges), no
    end-of-word marker — the variant ``bpe_reference`` mirrors.

    Each cluster pass applies a BATCH of provably-independent merges
    (``_select_safe_merge_batch``), so a GPT-scale vocabulary costs far
    fewer than n_merges actor rounds while the merge sequence stays
    identical to one-at-a-time training.  ``pass_counter`` (a list) gets
    one element appended per cluster pass — test instrumentation only."""
    ray = _ray

    def wc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[text_col].str.split().explode().dropna()
        vc = words.value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                             "pn": vc.to_numpy().astype("int64")})

    from ray.data.aggregate import Sum

    words = (docs_ds.map_batches(wc_partial, batch_format="pandas")
             .groupby("w").aggregate(Sum("pn", alias_name="n")))

    merges: list[tuple[str, str]] = []
    refs = words.to_pandas_refs()
    if not refs:
        return merges
    n_actors = max(1, min(len(refs),
                          int(ray.cluster_resources().get("CPU", 8)) - 2))
    workers = [_BpeWorker.remote(refs[i::n_actors]) for i in range(n_actors)]
    try:
        while len(merges) < n_merges:
            total: dict[tuple[str, str], int] = {}
            for part in ray.get([w.pair_counts.remote() for w in workers]):
                for k, v in part.items():
                    total[k] = total.get(k, 0) + v
            if not total:
                break
            ks = list(total)
            pairs = pd.DataFrame(
                {"a": [k[0] for k in ks], "b": [k[1] for k in ks],
                 "n": pd.Series([total[k] for k in ks], dtype="int64")})
            pairs = pairs.sort_values(["n", "a", "b"],
                                      ascending=[False, True, True])
            # batch all provably-independent top merges into ONE pass
            # (sequence-identical to one-at-a-time;
            # see _select_safe_merge_batch)
            batch_sel = _select_safe_merge_batch(
                pairs, limit=n_merges - len(merges))
            if not batch_sel:
                break  # best pair count < 2: nothing left worth merging
            if pass_counter is not None:
                pass_counter.append(len(batch_sel))
            merges.extend(batch_sel)
            ray.get([w.apply.remote(batch_sel) for w in workers])
    finally:
        for w in workers:
            ray.kill(w)
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
