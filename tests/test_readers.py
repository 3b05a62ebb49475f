import pytest

from ocr_main_ray.sources.pdfgen import native_pdf
from ocr_main_ray.sources.readers import pages_from_binary_dir
from ocr_main_ray.pipelines.extract import extract_dataset


@pytest.mark.usefixtures("ray_session")
def test_pages_from_binary_dir(tmp_path):
    pdf = native_pdf(["hello from a real file " * 5])
    pdf += b"%" + b"P" * 1024 + b"\n"
    (tmp_path / "doc1.pdf").write_bytes(pdf)
    (tmp_path / "page2.html").write_bytes(
        b"<html><body><p>real html file content with several words here"
        b"</p></body></html>")
    ds = pages_from_binary_dir(str(tmp_path))
    out = {r["url"].rsplit("/", 1)[-1]: r
           for r in extract_dataset(ds).take_all()}
    assert out["doc1.pdf"]["content_type"] == "pdf_native"
    assert "hello from a real file" in out["doc1.pdf"]["extracted_text"]
    assert out["page2.html"]["content_type"] == "html"
    assert "real html file content" in out["page2.html"]["extracted_text"]
