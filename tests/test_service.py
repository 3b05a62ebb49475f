"""REST interface tests — route surface, state machine, E3 re-parse.

The server is the real ThreadingHTTPServer from ocr_main_ray.service on an
ephemeral port; requests go over actual HTTP (urllib).  Processing runs the
real Ray Dataset pipeline (session fixture owns Ray).
"""
import itertools
import json
import threading
import urllib.error
import urllib.request
from datetime import datetime
from pathlib import Path

import pytest

from ocr_main_ray import docstore
from ocr_main_ray.service import (OcrService, ServiceConfig, make_server,
                                  parse_multipart)
from ocr_main_ray.sources.pdfgen import native_pdf

FIXED_NOW = datetime(2024, 5, 17, 12, 0, 0)


@pytest.fixture()
def api(tmp_path, ray_session):
    counter = itertools.count(1)
    service = OcrService(
        ServiceConfig(output_directory=str(tmp_path / "resultado"),
                      input_directory=str(tmp_path / "pdfs")),
        id_factory=lambda: f"fid{next(counter):04d}",
        clock=lambda: FIXED_NOW)
    server = make_server(service)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}/api/v1"
    yield base, service, tmp_path
    server.shutdown()
    thread.join(timeout=5)


def _request(method, url, body=None, headers=None):
    req = urllib.request.Request(url, data=body, method=method,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def _get(url):
    status, body, _ = _request("GET", url)
    return status, json.loads(body)


def _post_json(url, obj):
    status, body, _ = _request(
        "POST", url, json.dumps(obj).encode(),
        {"Content-Type": "application/json"})
    return status, json.loads(body)


def _multipart(fields: dict, files: list[tuple[str, str, bytes]]):
    boundary = "testboundary1234"
    parts = []
    for k, v in fields.items():
        parts.append(f'--{boundary}\r\nContent-Disposition: form-data; '
                     f'name="{k}"\r\n\r\n{v}\r\n'.encode())
    for name, filename, content in files:
        parts.append(f'--{boundary}\r\nContent-Disposition: form-data; '
                     f'name="{name}"; filename="{filename}"\r\n'
                     f'Content-Type: application/pdf\r\n\r\n'.encode()
                     + content + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def _post_multipart(url, fields, files):
    body, ctype = _multipart(fields, files)
    status, resp, _ = _request("POST", url, body, {"Content-Type": ctype})
    return status, json.loads(resp)


# one page, >1024 bytes (the D2 valid-PDF gate drops smaller payloads)
PAGE_TEXT = "\n".join(f"Linea {i} del informe de prueba tecnica OCR"
                      for i in range(1, 15))
PDF = native_pdf([PAGE_TEXT])
assert len(PDF) >= 1024


# ------------------------- health / status ------------------------- #
def test_health_routes(api):
    base, _, _ = api
    status, body = _get(f"{base}/health/")
    assert status == 200
    assert body["status"] == "healthy"
    assert body["version"] == "2.0.0"
    assert body["uptime"] >= 0
    for sub, key in (("detailed", "uptime_formatted"),
                     ("liveness", "status"), ("readiness", "checks")):
        status, body = _get(f"{base}/health/{sub}")
        assert status == 200 and key in body
    status, body = _get(f"{base}/health/readiness")
    assert body["checks"]["dependencies"] == "ok"  # ray up via fixture


def test_status_routes(api):
    base, _, _ = api
    status, body = _get(f"{base}/status/")
    assert status == 200
    assert body["api_status"] == "running"
    assert body["storage_available"] is True
    assert set(body["ocr_engines"]) == {"basic", "tesseract", "opencv"}
    status, body = _get(f"{base}/status/engines")
    assert body["engines"]["basic"]["available"] is True
    status, body = _get(f"{base}/status/storage")
    assert body["storage"]["writable"] is True


def test_system_profiles_and_languages(api):
    base, _, _ = api
    status, profiles = _get(f"{base}/system/profiles")
    assert [p["name"] for p in profiles] == ["fast", "balanced", "high",
                                             "custom"]
    by_name = {p["name"]: p for p in profiles}
    assert by_name["fast"]["dpi"] == 150
    assert by_name["high"]["dpi"] == 600
    assert by_name["high"]["tesseract_config"] == "--oem 3 --psm 8"
    assert by_name["balanced"]["confidence_threshold"] == 60.0
    status, langs = _get(f"{base}/system/languages")
    assert langs == {"spa": "Español", "eng": "Inglés", "por": "Portugués",
                     "fra": "Francés", "deu": "Alemán", "ita": "Italiano"}


# ------------------------- files router ------------------------- #
def test_upload_rejects_non_pdf(api):
    base, _, _ = api
    status, body = _post_multipart(f"{base}/files/upload", {},
                                   [("file", "notes.txt", b"hello")])
    assert status == 400
    assert body["detail"] == "Solo se permiten archivos PDF"


def test_upload_and_registry(api):
    base, service, tmp = api
    status, rec = _post_multipart(f"{base}/files/upload", {},
                                  [("file", "doc.pdf", PDF)])
    assert status == 200
    assert rec["file_id"] == "fid0001"
    assert rec["filename"] == "fid0001_doc.pdf"
    assert rec["original_filename"] == "doc.pdf"
    assert rec["status"] == "uploaded"
    assert rec["pdf_type"] is not None          # analyze_type defaults on
    assert rec["recommended_engine"] in ("basic", "opencv")
    assert (tmp / "pdfs" / "fid0001_doc.pdf").read_bytes() == PDF

    status, listing = _get(f"{base}/files/")
    assert status == 200 and len(listing) == 1
    status, one = _get(f"{base}/files/fid0001")
    assert one["file_id"] == "fid0001"
    status, body = _get(f"{base}/files/missing")
    assert status == 404 and body["detail"] == "Archivo no encontrado"
    # status filter
    status, listing = _get(f"{base}/files/?status_filter=processed")
    assert listing == []


def test_batch_upload_skips_non_pdf(api):
    base, _, _ = api
    status, recs = _post_multipart(
        f"{base}/files/batch-upload", {},
        [("files", "a.pdf", PDF), ("files", "b.txt", b"x"),
         ("files", "c.pdf", PDF)])
    assert status == 200
    assert [r["original_filename"] for r in recs] == ["a.pdf", "c.pdf"]


def test_process_file_state_machine(api):
    base, service, tmp = api
    _, rec = _post_multipart(f"{base}/files/upload", {},
                             [("file", "informe.pdf", PDF)])
    fid = rec["file_id"]
    status, result = _post_json(f"{base}/files/{fid}/process",
                                {"engine_type": "auto",
                                 "generate_summary": True})
    assert status == 200
    assert result["status"] == "completed"
    assert result["file_id"] == fid
    assert result["document_id"] == "informe"
    assert result["total_pages"] == 1
    assert result["confidence_score"] == 0.0     # A7 constant-0.0 parity
    assert set(result["output_files"]) == {
        "informe.txt", "informe.md", "informe_summary.md"}
    # registry transitioned
    status, one = _get(f"{base}/files/{fid}")
    assert one["status"] == "processed"
    # storage tree: FileStorage trio + API outputs
    doc_dir = tmp / "resultado" / "informe"
    assert (doc_dir / "informe_texto.txt").read_text(
        encoding="utf-8") == PAGE_TEXT
    assert (doc_dir / "informe.txt").exists()
    assert (doc_dir / "informe_original.pdf").read_bytes() == PDF
    meta = json.loads((doc_dir / "informe_metadata.json").read_text(
        encoding="utf-8"))
    assert meta["text_length"] == len(PAGE_TEXT)
    assert meta["confidence"] == 0.0
    md = (doc_dir / "informe.md").read_text(encoding="utf-8")
    assert "## Información del Documento" in md
    assert "- **Archivo Original**: informe.pdf" in md
    assert "- **ID de Documento**: informe" in md


def test_process_unknown_file_404(api):
    base, _, _ = api
    status, body = _post_json(f"{base}/files/nope/process", {})
    assert status == 404 and body["detail"] == "Archivo no encontrado"


def test_unique_dir_on_reprocess(api):
    base, _, tmp = api
    _, rec = _post_multipart(f"{base}/files/upload", {},
                             [("file", "dup.pdf", PDF)])
    _, r1 = _post_json(f"{base}/files/{rec['file_id']}/process", {})
    _, r2 = _post_json(f"{base}/files/{rec['file_id']}/process", {})
    assert r1["document_id"] == "dup"
    assert r2["document_id"] == "dup_01"        # _create_unique_dir parity
    assert (tmp / "resultado" / "dup_01").is_dir()


def test_delete_upload(api):
    base, _, tmp = api
    _, rec = _post_multipart(f"{base}/files/upload", {},
                             [("file", "gone.pdf", PDF)])
    path = Path(rec["file_path"])
    assert path.exists()
    status, body, _ = _request("DELETE",
                               f"{base}/files/{rec['file_id']}")
    assert status == 200
    assert "eliminado exitosamente" in json.loads(body)["message"]
    assert not path.exists()
    status, _body = _get(f"{base}/files/{rec['file_id']}")
    assert status == 404


# ------------------------- documents router ------------------------- #
def test_upload_and_process_one_shot(api):
    base, _, tmp = api
    status, resp = _post_multipart(
        f"{base}/documents/upload-and-process",
        {"engine_type": "basic", "dpi": "300", "output_format": "both"},
        [("file", "carta.pdf", PDF)])
    assert status == 200
    assert resp["document_id"] == "carta"
    assert resp["filename"] == "carta.pdf"
    assert resp["status"] == "completed"
    assert resp["extracted_text"] == PAGE_TEXT
    assert resp["total_pages"] == 1
    assert resp["tables_extracted"] == 0
    assert "procesado exitosamente" in resp["message"]

    # download returns the markdown bytes written to storage
    status, body, headers = _request(
        "GET", f"{base}/documents/download/carta")
    assert status == 200
    disk = (tmp / "resultado" / "carta" / "carta.md").read_bytes()
    assert body == disk
    assert "text/markdown" in headers["Content-Type"]

    status, body = _get(f"{base}/documents/download/none")
    assert status == 404 and "no encontrado" in body["detail"]

    status, listing = _get(f"{base}/documents/?limit=10")
    assert listing["total"] == 1
    doc = listing["documents"][0]
    assert doc["document_id"] == "carta"
    assert doc["has_text"] and doc["has_markdown"]
    assert not doc["has_images"]


def test_upload_and_process_validations(api):
    base, _, _ = api
    status, body = _post_multipart(f"{base}/documents/upload-and-process",
                                   {}, [("file", "x.docx", b"zz")])
    assert status == 400
    status, body = _post_multipart(f"{base}/documents/upload-and-process",
                                   {"dpi": "9000"},
                                   [("file", "x.pdf", PDF)])
    assert status == 422


def test_upload_auto_reports_detection(api):
    base, _, _ = api
    status, resp = _post_multipart(f"{base}/documents/upload-auto", {},
                                   [("file", "auto.pdf", PDF)])
    assert status == 200
    assert resp["message"].startswith("Tipo detectado: ")
    assert "Motor: " in resp["message"]


# ------------------------- system router / E3 ------------------------- #
def test_files_processed_markdown_reparse_roundtrip(api):
    """E3: the fields injected by render_markdown_reference_exact are
    recovered by the re-parse exactly (system.py:306-375 semantics)."""
    base, _, _ = api
    _post_multipart(f"{base}/documents/upload-and-process", {},
                    [("file", "parseme.pdf", PDF)])
    status, docs = _get(f"{base}/system/files/processed")
    assert status == 200
    entry = next(d for d in docs if d["document_id"] == "parseme")
    assert entry["filename"] == "parseme.pdf"     # **Archivo Original**
    assert entry["total_pages"] == 1              # **Páginas Procesadas**
    assert entry["engine_used"] == "tesseract"    # footer **Motor OCR**
    assert entry["confidence_score"] == 0.0       # 0.00% -> 0.0
    assert "parseme.md" in entry["output_files"]
    assert "parseme.txt" in entry["output_files"]
    # engine filter excludes, then includes
    _, none = _get(f"{base}/system/files/processed?engine_filter=opencv")
    assert all(d["document_id"] != "parseme" for d in none)
    _, some = _get(f"{base}/system/files/processed?engine_filter=tesseract")
    assert any(d["document_id"] == "parseme" for d in some)


def test_system_status_and_available(api):
    base, _, tmp = api
    (tmp / "pdfs").mkdir(exist_ok=True)
    (tmp / "pdfs" / "waiting.pdf").write_bytes(PDF)
    status, body = _get(f"{base}/system/status")
    assert body["status"] == "operational"
    assert body["statistics"]["documents_available"] == 1
    assert body["current_config"]["default_dpi"] == 300
    status, files = _get(f"{base}/system/files/available?analyze_type=true")
    names = [f["filename"] for f in files]
    assert "waiting.pdf" in names
    entry = next(f for f in files if f["filename"] == "waiting.pdf")
    assert entry["pdf_type"] is not None


def test_config_update_semantics(api):
    base, service, tmp = api
    status, body = _post_json(f"{base}/system/config/update",
                              {"default_language": "xx"})
    assert status == 400 and "Idioma no disponible" in body["detail"]
    status, body = _post_json(f"{base}/system/config/update",
                              {"default_dpi": 5000})
    assert status == 400 and "DPI" in body["detail"]
    status, body = _post_json(f"{base}/system/config/update",
                              {"confidence_threshold": 150})
    assert status == 400
    status, body = _post_json(f"{base}/system/config/update",
                              {"quality_profile": "nope"})
    assert status == 400 and "Perfil no válido" in body["detail"]
    status, body = _post_json(f"{base}/system/config/update",
                              {"quality_profile": "high",
                               "default_language": "eng"})
    assert status == 200
    assert set(body["updated_fields"]) == {"default_language",
                                           "default_dpi",
                                           "confidence_threshold"}
    assert body["current_config"]["default_dpi"] == 600
    assert body["current_config"]["confidence_threshold"] == 80.0
    assert service.config.default_language == "eng"


def test_unknown_route_404(api):
    base, _, _ = api
    status, body = _get(f"{base}/nope")
    assert status == 404
    status, body, _ = _request("GET", base.rsplit("/api/v1", 1)[0] + "/")
    assert status == 404


# ------------------------- unit: multipart + docstore ----------------- #
def test_parse_multipart_roundtrip():
    body, ctype = _multipart({"a": "1", "b": "two"},
                             [("file", "x.pdf", b"%PDF-bytes\x00\xff")])
    fields, files = parse_multipart(body, ctype)
    assert fields == {"a": "1", "b": "two"}
    assert files == [("file", "x.pdf", b"%PDF-bytes\x00\xff")]


def test_docstore_roundtrip(tmp_path):
    doc_dir, files = docstore.save_document(
        tmp_path, "informe", "texto final", [{"data": [["h"], ["v"]]}],
        b"%PDF-", doc_id="informe", confidence=0.0, processing_time=1.5)
    names = {f.name for f in files}
    assert names == {"informe_texto.txt", "informe_tablas.json",
                     "informe_original.pdf", "informe_metadata.json",
                     "informe.txt"}
    got = docstore.get_document(tmp_path, "informe")
    assert got["text"] == "texto final"
    assert got["tables_count"] == 1
    assert docstore.get_document(tmp_path, "missing") is None
    # unique-name allocation: second save of the same name gets _01
    d2, _ = docstore.save_document(tmp_path, "informe", "otra", None, None)
    assert d2.name == "informe_01"
    d3, _ = docstore.save_document(tmp_path, "informe", "tercera", None, None)
    assert d3.name == "informe_02"


# --------------------------------------------------------------------- #
# HTTP client (ocr_main_ray/client.py — reference api_utils.py:12-233)
# --------------------------------------------------------------------- #

@pytest.fixture()
def client(api):
    from ocr_main_ray.client import OcrApiClient
    base, service, tmp = api
    root = base[:-len("/api/v1")]
    return OcrApiClient(root), service, tmp


def test_client_health_and_status(client):
    c, _, _ = client
    health = c.health_check()
    assert health["status"] == "healthy"
    status = c.get_system_status()
    assert status["api_status"] == "running" and "error" not in status


def test_client_health_unreachable_is_error_dict(tmp_path):
    from ocr_main_ray.client import OcrApiClient
    c = OcrApiClient("http://127.0.0.1:9", timeout=2)  # discard port
    health = c.health_check()
    assert health["status"] == "unhealthy" and "error" in health


def test_client_two_phase_flow(client, tmp_path):
    """Full reference flow through the client: upload -> process -> poll
    wait -> download (api_utils.py upload_document / wait_for_completion /
    download_file)."""
    c, _, tmp = client
    pdf = tmp_path / "informe.pdf"
    pdf.write_bytes(PDF)
    up = c.upload_document(pdf, {"analyze_type": "true"})
    assert "error" not in up and up["status"] == "uploaded"
    fid = up["file_id"]
    result = c.process_document(fid, {"engine_type": "auto",
                                      "generate_summary": True})
    assert result["status"] == "completed"
    assert result["document_id"] == "informe"
    final = c.wait_for_completion(fid, timeout=30, poll_interval=0.05)
    assert final["status"] == "processed"
    out = tmp_path / "dl.md"
    assert c.download_document(result["document_id"], out)
    assert "## Información del Documento" in out.read_text(encoding="utf-8")
    assert not c.download_document("no-such-doc", tmp_path / "x.md")


def test_client_upload_validations(client, tmp_path):
    c, _, _ = client
    missing = c.upload_document(tmp_path / "nope.pdf")
    assert "error" in missing and "no encontrado" in missing["error"]
    txt = tmp_path / "doc.txt"
    txt.write_text("hi")
    wrong = c.upload_document(txt)
    assert wrong == {"error": "Solo se aceptan archivos PDF"}


def test_client_process_unknown_file_is_error_dict(client):
    c, _, _ = client
    result = c.process_document("no-such-id")
    assert "error" in result


def test_client_wait_timeout(client, tmp_path):
    """A file that never leaves 'uploaded' hits the reference's timeout
    dict (api_utils.py:110-111)."""
    c, _, tmp = client
    pdf = tmp_path / "idle.pdf"
    pdf.write_bytes(PDF)
    up = c.upload_document(pdf)
    out = c.wait_for_completion(up["file_id"], timeout=0.2,
                                poll_interval=0.05)
    assert out == {"error": "Timeout esperando completion", "timeout": 0.2}


def test_client_upload_and_process_one_shot(client, tmp_path):
    c, _, _ = client
    pdf = tmp_path / "oneshot.pdf"
    pdf.write_bytes(PDF)
    result = c.upload_and_process(pdf, {"engine_type": "auto",
                                        "language": "spa", "dpi": 300})
    assert result["status"] == "completed"
    assert result["extracted_text"] == PAGE_TEXT
    assert result["total_pages"] == 1


def test_client_process_document_complete(client, tmp_path):
    """The upload+process+wait composite (api_utils.py:143-180)."""
    c, _, tmp = client
    pdf = tmp_path / "full.pdf"
    pdf.write_bytes(PDF)
    result = c.process_document_complete(pdf, {"engine_type": "auto"},
                                         poll_interval=0.05)
    assert result["status"] == "completed"
    assert result["upload_status"] == "processed"
    assert result["document_id"] == "full"


# ------------------ concurrency (round-4 verdict item 5) ------------------ #
# Two threads driving the two-phase upload -> process state machine on the
# same and different ids: the reference serves through 4 uvicorn workers, so
# concurrent requests against one registry/docstore are its real traffic
# shape.  The pipeline is stubbed (the race under test is the service state
# machine + the docstore _NN allocator, not Ray), with a sleep to widen the
# race window.

def _stub_pipeline(service, monkeypatch, delay=0.05):
    import time as _time

    def slow(names, payloads, language):
        _time.sleep(delay)
        return [{"url": n, "extracted_text": "texto concurrente",
                 "tables_json": "[]", "processing_ms": 5.0,
                 "confidence": 0.0, "n_pages": 1} for n in names]

    monkeypatch.setattr(service, "_run_pipeline", slow)


def test_create_unique_dir_concurrent(tmp_path):
    """8 threads racing the B5 allocator on one base name: every thread
    must win a DISTINCT directory (mkdir is the atomic allocation; the
    old exists()-then-mkdir pattern crashed the losers)."""
    from concurrent.futures import ThreadPoolExecutor

    barrier = threading.Barrier(8)

    def alloc(_):
        barrier.wait()
        return docstore.create_unique_dir(tmp_path / "out", "doc").name

    with ThreadPoolExecutor(8) as ex:
        names = list(ex.map(alloc, range(8)))
    assert sorted(names) == sorted(
        ["doc"] + [f"doc_{i:02d}" for i in range(1, 8)])
    for n in names:
        assert (tmp_path / "out" / n).is_dir()


def test_concurrent_process_same_id(api, monkeypatch):
    base, service, tmp = api
    _stub_pipeline(service, monkeypatch)
    _, rec = _post_multipart(f"{base}/files/upload", {},
                             [("file", "race.pdf", PDF)])
    fid = rec["file_id"]
    barrier = threading.Barrier(2)
    out = [None, None]

    def worker(i):
        barrier.wait()
        out[i] = _post_json(f"{base}/files/{fid}/process", {})

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert [r[0] for r in out] == [200, 200]
    # both processed; the docstore allocator hands each a distinct dir
    assert sorted(r[1]["document_id"] for r in out) == ["race", "race_01"]
    assert (tmp / "resultado" / "race").is_dir()
    assert (tmp / "resultado" / "race_01").is_dir()
    _, one = _get(f"{base}/files/{fid}")
    assert one["status"] == "processed"


def test_concurrent_process_different_ids(api, monkeypatch):
    base, service, tmp = api
    _stub_pipeline(service, monkeypatch)
    fids = []
    for name in ("alpha.pdf", "bravo.pdf"):
        _, rec = _post_multipart(f"{base}/files/upload", {},
                                 [("file", name, PDF)])
        fids.append(rec["file_id"])
    barrier = threading.Barrier(2)
    out = [None, None]

    def worker(i):
        barrier.wait()
        out[i] = _post_json(f"{base}/files/{fids[i]}/process", {})

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert [r[0] for r in out] == [200, 200]
    assert sorted(r[1]["document_id"] for r in out) == ["alpha", "bravo"]
    for fid in fids:
        _, one = _get(f"{base}/files/{fid}")
        assert one["status"] == "processed"
    # no cross-contamination in the registry
    _, listing = _get(f"{base}/files/?status_filter=processed")
    assert len(listing) == 2
