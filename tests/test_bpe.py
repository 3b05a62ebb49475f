"""Distributed BPE trainer: merge-sequence equivalence with the
single-process reference, determinism, inference sanity."""
import pandas as pd
import pyarrow as pa
import pytest

from ocr_main_ray.functions.bpe import (apply_bpe, bpe_reference,
                                        train_bpe_distributed)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer wide lowest",
]


def test_reference_merges_sane():
    merges = bpe_reference(CORPUS, n_merges=8)
    assert len(merges) == 8
    assert merges[0] == ("l", "o")  # 'lo' appears in low/lower/lowest x7


def test_distributed_matches_reference(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": pa.array(CORPUS, pa.string())}))
    got = train_bpe_distributed(ds, n_merges=8)
    want = bpe_reference(CORPUS, n_merges=8)
    assert got == want


def test_distributed_matches_reference_on_documents(ray_session):
    import ray.data as rd

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).head(80)
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    got = train_bpe_distributed(ds, n_merges=6)
    want = bpe_reference(list(docs["text"]), n_merges=6)
    assert got == want
    assert len(got) == 6


def test_apply_bpe_roundtrip():
    merges = bpe_reference(CORPUS, n_merges=12)
    toks = apply_bpe("lowest", merges)
    assert "".join(toks) == "lowest"
    assert len(toks) < len("lowest")  # merges actually fired


def test_batched_merges_sequence_identical_on_documents(ray_session):
    """Safety on natural text: n_merges=200 over real documents must
    produce the EXACT reference merge sequence (batching may win little
    here — this corpus's merge DAG is a near-pure dependency chain, so
    even oracle batching is bounded; the capability criterion lives in
    the parallel-corpus test below)."""
    import ray.data as rd

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).head(200)
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    passes = []
    got = train_bpe_distributed(ds, n_merges=200, pass_counter=passes)
    want = bpe_reference(list(docs["text"]), n_merges=200)
    assert got == want
    assert sum(passes) == len(got)
    assert len(passes) < len(got)  # batching engaged at least somewhere


def test_batched_merges_4x_fewer_passes_when_dag_allows(ray_session):
    """Capability criterion: when the merge DAG has parallelism (a
    GPT-scale vocabulary over a heterogeneous corpus, modeled here by
    independent word families with separated counts), the batch selector
    must commit >=4x fewer cluster passes with the IDENTICAL sequence."""
    import ray.data as rd

    import string
    alphabet = [a + b for a in string.ascii_lowercase
                for b in string.ascii_lowercase]  # 2-char "words"
    texts = []
    for i, w in enumerate(alphabet[:240]):
        texts.extend([w] * (1000 - 4 * i))  # separated counts
    # a few chained words too: the selector must serialize those safely
    texts.extend(["chain"] * 3000)
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    passes = []
    got = train_bpe_distributed(ds, n_merges=200, pass_counter=passes)
    want = bpe_reference(texts, n_merges=200)
    assert got == want
    assert sum(passes) == len(got) == 200
    assert len(passes) <= len(got) // 4, (len(passes), len(got))


@pytest.mark.usefixtures("ray_session")
def test_corpus_tokenize_stats_equal_reference():
    """The full tokenize-stats pipeline (train distributed -> broadcast
    merges -> cached per-word encode -> per-lang integer stats) must equal
    a single-process mirror exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_main_ray.functions.bpe import apply_bpe, bpe_reference
    from ocr_main_ray.pipelines.queries import q_bpe_tokenize_stats

    # build a small parquet documents table in a tmp sf dir
    import tempfile, pathlib, pyarrow.parquet as pq
    texts = [" ".join(["alpha beta gamma beta", "alpha alpha"][i % 2].split())
             for i in range(24)]
    texts[3] = ""  # empty doc must contribute 0 words / 0 tokens
    langs = ["en", "es", "de"] * 8
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"doc_id": pa.array(range(24), pa.int64()),
                      "text": pa.array(texts),
                      "lang": pa.array(langs),
                      "n_chars": pa.array([len(t) for t in texts],
                                          pa.int64())}),
            pathlib.Path(d) / "documents.parquet")
        got = q_bpe_tokenize_stats(d)
    merges = bpe_reference(texts, n_merges=30)
    ntok = {w: len(apply_bpe(w, merges))
            for t in texts for w in t.split()}
    import pandas as pd
    ref_rows = []
    for lang in sorted(set(langs)):
        docs = [t for t, lg in zip(texts, langs) if lg == lang]
        ref_rows.append({
            "lang": lang, "n_docs": len(docs),
            "n_words": sum(len(t.split()) for t in docs),
            "n_tokens": sum(ntok[w] for t in docs for w in t.split())})
    ref = pd.DataFrame(ref_rows).astype(
        {"n_docs": "int64", "n_words": "int64", "n_tokens": "int64"})
    assert got.equals(ref)
