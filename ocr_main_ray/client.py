"""HTTP client for the ocr_main_ray REST API — parity with the reference's
``OCRAPIClient`` (``/root/reference/api_utils.py:12-233``): health check,
system status, multipart upload, process, completion wait-loop (2 s poll /
300 s default timeout), file download, and the upload→wait composite.

Differences forced by the rebuild's transport and job model, kept minimal:

- stdlib ``urllib.request`` instead of ``requests`` (the sandbox ships no
  third-party HTTP client); error semantics mirror the reference exactly —
  every network/HTTP failure returns an ``{"error": ...}`` dict, never an
  exception (api_utils.py:26-36).
- the rebuild's processing routes are SYNCHRONOUS (the Ray pipeline runs
  inside the request), so the "job" being polled is the upload record's
  status field (``uploaded → processing → processed | error``) at
  ``GET /api/v1/files/{file_id}`` — the same two-phase flow the reference
  polls at ``/documents/status/{job_id}``.  ``wait_for_completion`` keeps
  the reference's 2-second cadence, timeout dict, and early-return on an
  ``error`` payload (api_utils.py:86-111).
"""
from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
import uuid
from pathlib import Path
from typing import Optional

_TERMINAL = ("processed", "error")


def _encode_multipart(fields: dict, files: list[tuple[str, str, bytes]]
                      ) -> tuple[bytes, str]:
    """RFC 2388 multipart/form-data body for stdlib urllib."""
    boundary = f"ocrmainray{uuid.uuid4().hex}"
    parts = []
    for k, v in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="{k}"\r\n\r\n{v}\r\n'.encode())
    for name, filename, content in files:
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="{name}"; filename="{filename}"\r\n'
            f'Content-Type: application/pdf\r\n\r\n'.encode()
            + content + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


class OcrApiClient:
    """Client for the ocr_main_ray API (reference: api_utils.py:12)."""

    def __init__(self, base_url: str = "http://localhost:8000",
                 timeout: float = 120.0):
        self.base_url = base_url.rstrip("/")
        self.api_base = f"{self.base_url}/api/v1"
        self.timeout = timeout

    # ------------------------------------------------------------- #
    # transport
    # ------------------------------------------------------------- #
    def _request(self, method: str, path: str, body: bytes | None = None,
                 headers: dict | None = None) -> dict | list:
        req = urllib.request.Request(f"{self.api_base}{path}", data=body,
                                     method=method, headers=headers or {})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read())

    def _get(self, path: str) -> dict | list:
        return self._request("GET", path)

    def _post_json(self, path: str, obj: dict) -> dict | list:
        return self._request("POST", path, json.dumps(obj).encode(),
                             {"Content-Type": "application/json"})

    def _post_multipart(self, path: str, fields: dict,
                        files: list[tuple[str, str, bytes]]) -> dict | list:
        body, ctype = _encode_multipart(fields, files)
        return self._request("POST", path, body, {"Content-Type": ctype})

    @staticmethod
    def _err(e: Exception) -> dict:
        if isinstance(e, urllib.error.HTTPError):
            try:
                detail = json.loads(e.read()).get("detail")
            except Exception:
                detail = None
            return {"error": detail or f"HTTP {e.code}"}
        return {"error": str(e)}

    # ------------------------------------------------------------- #
    # reference method surface
    # ------------------------------------------------------------- #
    def health_check(self) -> dict:
        """api_utils.py:20-28 — unhealthy marker on failure."""
        try:
            return self._get("/health/")
        except Exception as e:
            return {**self._err(e), "status": "unhealthy"}

    def get_system_status(self) -> dict:
        """api_utils.py:30-37."""
        try:
            return self._get("/status/")
        except Exception as e:
            return self._err(e)

    def _upload_pdf(self, path: str, file_path: Path,
                    config: Optional[dict]) -> dict:
        """Shared validate-then-multipart uploader: existence + .pdf
        suffix checked client-side, config values stringified as form
        fields (api_utils.py:39-73 semantics, both upload routes)."""
        file_path = Path(file_path)
        if not file_path.exists():
            return {"error": f"Archivo no encontrado: {file_path}"}
        if file_path.suffix.lower() != ".pdf":
            return {"error": "Solo se aceptan archivos PDF"}
        fields = {k: str(v) for k, v in (config or {}).items()}
        try:
            return self._post_multipart(
                path, fields,
                [("file", file_path.name, file_path.read_bytes())])
        except Exception as e:
            return self._err(e)

    def upload_document(self, file_path: Path,
                        config: Optional[dict] = None) -> dict:
        """Phase 1 of the two-phase flow (api_utils.py:39-73): returns
        the upload record (``file_id`` is the poll handle)."""
        return self._upload_pdf("/files/upload", file_path, config)

    def process_document(self, file_id: str,
                         config: Optional[dict] = None) -> dict:
        """Phase 2: trigger processing of an uploaded file."""
        try:
            return self._post_json(f"/files/{file_id}/process", config or {})
        except Exception as e:
            return self._err(e)

    def get_processing_status(self, file_id: str) -> dict:
        """api_utils.py:75-81 — the upload record carries ``status``."""
        try:
            return self._get(f"/files/{file_id}")
        except Exception as e:
            return self._err(e)

    def wait_for_completion(self, file_id: str, timeout: float = 300,
                            poll_interval: float = 2.0) -> dict:
        """api_utils.py:83-111: poll every 2 s until a terminal status or
        timeout; error payloads pass straight through."""
        start = time.monotonic()
        while time.monotonic() - start < timeout:
            status = self.get_processing_status(file_id)
            if "error" in status:
                return status
            if status.get("status") in _TERMINAL:
                return status
            time.sleep(poll_interval)
        return {"error": "Timeout esperando completion", "timeout": timeout}

    def download_document(self, document_id: str,
                          output_path: Optional[Path] = None) -> bool:
        """api_utils.py:113-141: fetch the rendered markdown, write it to
        ``output_path`` (default ``{document_id}.md``), boolean result."""
        url = f"{self.api_base}/documents/download/{document_id}"
        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as resp:
                content = resp.read()
        except Exception:
            return False
        out = Path(output_path) if output_path else Path(f"{document_id}.md")
        out.write_bytes(content)
        return True

    def upload_and_process(self, file_path: Path,
                           config: Optional[dict] = None) -> dict:
        """One-shot route (reference documents.py upload-and-process)."""
        return self._upload_pdf("/documents/upload-and-process",
                                file_path, config)

    def process_document_complete(self, file_path: Path,
                                  config: Optional[dict] = None,
                                  timeout: float = 300,
                                  poll_interval: float = 2.0) -> dict:
        """api_utils.py:143-180 composite: upload → process → wait.  The
        returned dict is the process response merged with the final poll
        (so callers see both ``document_id`` and the terminal status)."""
        upload = self.upload_document(file_path, config)
        if "error" in upload:
            return upload
        file_id = upload.get("file_id")
        if not file_id:
            return {"error": "No se recibió file_id"}
        processed = self.process_document(file_id, config)
        if "error" in processed:
            return processed
        final = self.wait_for_completion(file_id, timeout=timeout,
                                         poll_interval=poll_interval)
        if "error" in final:
            return final
        return {**processed, "upload_status": final.get("status")}


def main(argv: list[str] | None = None) -> int:
    """CLI mirror of api_utils.py:183-233 (health / status / process)."""
    import argparse

    parser = argparse.ArgumentParser(prog="ocr-main-ray-client")
    parser.add_argument("--url", default="http://localhost:8000")
    sub = parser.add_subparsers(dest="command")
    sub.add_parser("health")
    sub.add_parser("status")
    proc = sub.add_parser("process")
    proc.add_argument("file", type=Path)
    proc.add_argument("--engine", choices=["basic", "opencv", "auto"],
                      default="auto")
    proc.add_argument("--language", default="spa")
    proc.add_argument("--dpi", type=int, default=300)
    args = parser.parse_args(argv)
    if not args.command:
        parser.print_help()
        return 0
    client = OcrApiClient(args.url)
    if args.command == "health":
        result = client.health_check()
    elif args.command == "status":
        result = client.get_system_status()
    else:
        result = client.process_document_complete(
            args.file, {"engine_type": args.engine,
                        "language": args.language, "dpi": args.dpi})
    print(json.dumps(result, indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
