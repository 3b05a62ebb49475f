"""Curation pipeline: union-find clustering, canonical election, and
reason-tagged keep/drop on planted exact dups, near dups, and junk."""
import numpy as np
import pyarrow as pa
import pytest

from ocr_main_ray.pipelines.curate import (assign_clusters, cluster_pairs,
                                           curate_documents,
                                           near_dup_canonical_map)


def _pairs(rows):
    a, b = zip(*rows) if rows else ((), ())
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def test_cluster_pairs_transitive_chain():
    canon = cluster_pairs(_pairs([(2, 5), (5, 9), (20, 21)]))
    assert canon[2] == canon[5] == canon[9] == 2
    assert canon[20] == canon[21] == 20


def test_cluster_pairs_order_independent():
    fwd = cluster_pairs(_pairs([(1, 2), (2, 3), (3, 4)]))
    rev = cluster_pairs(_pairs([(3, 4), (2, 3), (1, 2)]))
    assert fwd == rev
    assert set(fwd.values()) == {1}


def test_cluster_pairs_min_is_canonical_even_if_seen_late():
    canon = cluster_pairs(_pairs([(7, 9), (9, 3)]))
    assert canon[7] == canon[9] == canon[3] == 3


BASE = ("the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest to find a quiet place for a long nap "
        "under the old oak tree near the river bank in the warm afternoon sun")


def _planted_docs():
    rows = [
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": BASE},                       # exact dup of 0
        {"doc_id": 2, "text": BASE.replace("quick", "swift")},  # near dup of 0
        {"doc_id": 3, "text": "totally different content about databases and "
                              "query engines with columns rows batches and "
                              "shuffles spread across many worker nodes in a "
                              "large cluster running jobs all day and night "
                              "for the big data teams of the wide world"},
        # junk: no alpha, no stopwords, absurd word lengths -> score ~1.5
        {"doc_id": 4, "text": "~~~~~~~~~~~~~~~ 0000000000000000 !!!!!!!!!!!!!"},
    ]
    import ray.data as rd
    return rd.from_items(rows)


@pytest.mark.usefixtures("ray_session")
def test_curation_planted():
    out = (curate_documents(_planted_docs(), min_quality=30.0)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0, "keep"] == 1 and out.loc[0, "drop_reason"] == ""
    assert out.loc[1, "drop_reason"] == "exact_dup"
    assert out.loc[2, "drop_reason"] == "near_dup"
    assert out.loc[3, "keep"] == 1
    assert out.loc[4, "drop_reason"] == "low_quality"
    assert (out["keep"] == (out["drop_reason"] == "").astype(int)).all()


@pytest.mark.usefixtures("ray_session")
def test_assign_clusters_singletons_and_members():
    docs = _planted_docs()
    canon = near_dup_canonical_map(docs.select_columns(["doc_id", "text"]),
                                   threshold=0.5)
    assigned = (assign_clusters(docs, canon)
                .to_pandas().set_index("doc_id").sort_index())
    # 0,1,2 share one cluster with canonical 0; 3 and 4 are singletons
    assert assigned.loc[0, "cluster_id"] == 0
    assert assigned.loc[1, "cluster_id"] == 0
    assert assigned.loc[2, "cluster_id"] == 0
    assert assigned.loc[0, "is_canonical"] == 1
    assert assigned.loc[1, "is_canonical"] == 0
    assert assigned.loc[3, "cluster_id"] == 3
    assert assigned.loc[3, "is_canonical"] == 1
    assert assigned.loc[4, "is_canonical"] == 1


@pytest.mark.usefixtures("ray_session")
def test_curation_determinism_under_reordering():
    import ray.data as rd

    rows = list(_planted_docs().take_all())[::-1]
    out_rev = (curate_documents(rd.from_items(rows), min_quality=30.0)
               .to_pandas().set_index("doc_id").sort_index())
    out_fwd = (curate_documents(_planted_docs(), min_quality=30.0)
               .to_pandas().set_index("doc_id").sort_index())
    assert (out_rev["drop_reason"] == out_fwd["drop_reason"]).all()


def test_curation_extended_new_reasons(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_main_ray.pipelines.curate import curate_documents_extended

    good = ("This is a perfectly reasonable document with plenty of words "
            "and normal diversity of vocabulary across its sentences. "
            "It keeps going with even more varied wording to be safe, "
            "because every phrase introduces genuinely novel tokens here.")
    repetitive = "spam " * 120                      # distinct ratio ~1/120
    symbols = " ".join(f"@#{i}$ {i * 7}%" for i in range(40))  # diverse, alpha~0
    fillers = [
        f"Filler document number {i} talks about topic {i} with several "
        f"distinct content words like alpha{i} beta{i} gamma{i} delta{i}."
        for i in range(4, 10)]
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3] + list(range(4, 10)), pa.int64()),
        "text": pa.array([good, repetitive, symbols] + fillers, pa.string())})
    out = (curate_documents_extended(rd.from_arrow(docs), min_quality=0.0)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "keep"] == 1
    assert out.loc[2, "drop_reason"] == "high_repetition"
    assert out.loc[3, "drop_reason"] == "low_alpha"


def test_curation_extended_precedence_base_reasons_first(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_main_ray.pipelines.curate import curate_documents_extended

    rep = "dup " * 100
    fillers = [
        f"Another varied filler text {i} mentioning distinct things "
        f"epsilon{i} zeta{i} eta{i} theta{i} and more normal prose."
        for i in range(12, 18)]
    docs = pa.table({
        "doc_id": pa.array([10, 11] + list(range(12, 18)), pa.int64()),
        "text": pa.array([rep, rep] + fillers, pa.string())})  # 10/11: exact dups AND repetitive
    out = (curate_documents_extended(rd.from_arrow(docs), min_quality=0.0)
           .to_pandas().set_index("doc_id"))
    assert out.loc[11, "drop_reason"] == "exact_dup"  # precedence holds
    assert out.loc[10, "drop_reason"] == "high_repetition"


@pytest.mark.usefixtures("ray_session")
def test_cluster_pairs_distributed_equals_union_find():
    """Min-label-propagation labels == the driver union-find map, including
    transitive chains and min-id canonical election."""
    import ray.data as rd

    from ocr_main_ray.pipelines.curate import cluster_pairs_distributed

    rows = [(2, 5), (5, 9), (20, 21), (7, 9), (9, 3), (100, 40), (40, 41)]
    want = cluster_pairs(_pairs(rows))
    got = (cluster_pairs_distributed(rd.from_arrow(_pairs(rows))
                                     .repartition(3))
           .to_pandas().set_index("doc_id")["canonical"].to_dict())
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_curation_join_path_equals_broadcast_path():
    """Forcing the pair set over the driver budget must flip to the
    distributed label join and produce the identical verdict table."""
    base = (curate_documents(_planted_docs(), min_quality=30.0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    joined = (curate_documents(_planted_docs(), min_quality=30.0,
                               driver_pair_budget=0)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert joined.equals(base)
    assert (joined["drop_reason"] == "near_dup").sum() >= 1  # path exercised
