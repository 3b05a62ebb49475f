import pyarrow as pa
import pytest

from ocr_main_ray.sources.synth import (MIXES, build_payload,
                                        pages_dataset_from_documents,
                                        pages_from_documents, synth_pages)

SF = "/root/testdata/sf0.001"


def test_synth_deterministic():
    a, b = synth_pages(40), synth_pages(40)
    assert a.equals(b)
    c, d = pages_from_documents(SF, limit=50), pages_from_documents(SF, limit=50)
    assert c.equals(d)


def test_duplicate_urls_present():
    t = synth_pages(60)
    urls = t.column("url").to_pylist()
    assert len(urls) > len(set(urls))  # dedup fixtures exist


def test_mixes():
    for mix in MIXES:
        routes = {build_payload(k, "some text here " * 10, mix)[1]
                  for k in range(20)}
        assert routes == {"html", "pdf_native", "pdf_scanned", "edge"}


@pytest.mark.usefixtures("ray_session")
def test_distributed_synth_same_row_set():
    """The Ray-parallel synthesizer must emit the identical row SET as the
    single-process one (order-free)."""
    serial = pages_from_documents(SF, repeat=2, mix="ocr-heavy")
    ds = pages_dataset_from_documents(SF, repeat=2, mix="ocr-heavy")
    parallel = pa.concat_tables(ds.iter_batches(batch_size=8192,
                                                batch_format="pyarrow"))
    assert parallel.num_rows == serial.num_rows

    def key_set(tbl):
        return {
            (u, ts, hash(p))
            for u, ts, p in zip(tbl.column("url").to_pylist(),
                                tbl.column("warc_ts").to_pylist(),
                                tbl.column("html").to_pylist())
        }

    assert key_set(parallel) == key_set(serial)
