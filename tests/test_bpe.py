"""Distributed BPE trainer: merge-sequence equivalence with the
single-process reference, determinism, inference sanity."""
import pandas as pd
import pyarrow as pa

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
