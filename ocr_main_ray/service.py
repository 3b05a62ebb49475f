"""REST interface rebuild — the reference's FastAPI service on stdlib http.

Reproduces the route surface, request/response field names, status codes and
state machine of the reference's five routers (all under ``/api/v1``):

- health   ``backend/src/interfaces/api/routers/health.py:18-114``
- status   ``routers/status.py:17-176``
- system   ``routers/system.py:122-482`` (incl. the E3 markdown re-parse at
  :306-375 — lossless here because our ``.md`` files are written by the
  reference-exact template in ``stages/assemble.py``)
- files    ``routers/files.py:97-428`` (two-phase upload → process with the
  uploaded→processing→processed/error transitions at :161-253)
- documents ``routers/documents.py:31-448`` (one-shot upload-and-process,
  upload-auto, download, paginated list)

FastAPI/uvicorn are absent in this environment, so the transport is
``http.server.ThreadingHTTPServer`` + a minimal multipart parser; everything
HTTP-visible (paths, JSON shapes, ``{"detail": ...}`` error bodies, 400/404
semantics) matches the reference.

Architectural deltas (deliberate, documented):

- The reference holds uploads in a per-process dict (``files.py:71`` — a
  correctness hazard under ``--workers 4``, SURVEY §3.3).  Here the registry
  is a single ``OcrService`` instance, and every *processing* call runs the
  real Ray Dataset pipeline (``pipelines/extract.py``), so API-processed
  documents take the identical dataplane path as batch runs — including the
  per-type C1/C2 dispatch the reference's API silently drops
  (``documents.py:173-311`` selects an engine and then ignores it).
- Results land in the FileStorage-parity tree (``docstore.py``) so every
  read-back route behaves as in the reference.  The reference's
  processed-list/download glob only the output root (``system.py:306``,
  ``documents.py:335``) while its storage writes into per-document
  subdirectories — a latent mismatch; we search root *and* one level of
  subdirectories so the routes actually find what the storage wrote.

The module never calls ``ray.init`` (driver contract); only ``main()`` —
a real CLI entry point — initialises Ray, guarded.
"""
from __future__ import annotations

import json
import platform
import re
import threading
import time
import uuid
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import pyarrow as pa

from .config import PipelineConfig
from .schema import PAGES_SCHEMA

API_VERSION = "2.0.0"
API_PREFIX = "/api/v1"

# system.py:22-33, value-for-value
AVAILABLE_LANGUAGES = {
    "spa": "Español",
    "eng": "Inglés",
    "por": "Portugués",
    "fra": "Francés",
    "deu": "Alemán",
    "ita": "Italiano",
}

# system.py:188-229, value-for-value
QUALITY_PROFILES = [
    {"name": "fast",
     "description": "Procesamiento rápido para documentos de alta calidad",
     "dpi": 150, "confidence_threshold": 50.0,
     "tesseract_config": "--oem 3 --psm 6",
     "recommended_for": "PDFs nativos, documentos escaneados de alta calidad"},
    {"name": "balanced",
     "description": "Configuración balanceada para uso general",
     "dpi": 300, "confidence_threshold": 60.0,
     "tesseract_config": "--oem 3 --psm 6",
     "recommended_for": "La mayoría de documentos"},
    {"name": "high",
     "description": "Alta precisión para documentos difíciles",
     "dpi": 600, "confidence_threshold": 80.0,
     "tesseract_config": "--oem 3 --psm 8",
     "recommended_for": "Documentos escaneados de baja calidad, textos pequeños"},
    {"name": "custom",
     "description": "Configuración personalizada",
     "dpi": 300, "confidence_threshold": 60.0,
     "tesseract_config": "--oem 3 --psm 6",
     "recommended_for": "Configuración manual según necesidades específicas"},
]


class HttpError(Exception):
    """Maps to FastAPI's HTTPException → ``{"detail": ...}`` body."""

    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


class ServiceConfig:
    """Mutable runtime config — the reference's SystemConfig singleton fields
    the API reads/writes (``system.py:112-120,164-170,391-460``)."""

    def __init__(self, output_directory: str = "./resultado",
                 input_directory: str = "./pdfs",
                 logs_directory: str = "./logs"):
        self.output_directory = output_directory
        self.input_directory = input_directory
        self.logs_directory = logs_directory
        self.default_language = "spa"
        self.default_dpi = 300
        self.confidence_threshold = 60.0
        self.tesseract_config = "--oem 3 --psm 6"


class OcrService:
    """Transport-independent core: the HTTP handler and the interactive menu
    both call these methods.  ``id_factory`` / ``clock`` are injectable so
    tests are deterministic (runtime defaults: uuid4[:12] / datetime.now,
    matching ``files.py:310,332``)."""

    def __init__(self, config: ServiceConfig | None = None,
                 pipeline_config: PipelineConfig | None = None,
                 id_factory=None, clock=None):
        self.config = config or ServiceConfig()
        self.pipeline_config = pipeline_config or PipelineConfig()
        self._id_factory = id_factory or (lambda: str(uuid.uuid4())[:12])
        self._clock = clock or datetime.now
        self.uploads: dict[str, dict] = {}   # file_id -> UploadedFile record
        self._lock = threading.Lock()
        self.start_time = time.time()

    # ------------------------------------------------------------------ #
    # shared helpers
    # ------------------------------------------------------------------ #
    def _sniff_pdf_type(self, data: bytes) -> tuple[str, str]:
        """files.py:74-96 fallback semantics on our C1 classifier: returns
        (pdf_type in native|scanned|mixed|unknown, recommended_engine)."""
        from .stages.sniff import classify_pdf_type, recommend_engine
        try:
            pdf_type = classify_pdf_type(data)
        except Exception:
            return "unknown", "basic"
        engine, _dpi = recommend_engine(pdf_type)
        # files.py:341: "opencv" if scanned else "basic"
        return pdf_type, engine

    def _record_upload(self, original_filename: str, content: bytes,
                       analyze_type: bool) -> dict:
        file_id = self._id_factory()
        upload_dir = Path(self.config.input_directory)
        upload_dir.mkdir(parents=True, exist_ok=True)
        unique_filename = f"{file_id}_{original_filename}"
        file_path = upload_dir / unique_filename
        file_path.write_bytes(content)
        record = {
            "file_id": file_id,
            "filename": unique_filename,
            "original_filename": original_filename,
            "size_mb": round(len(content) / (1024 * 1024), 2),
            "upload_date": self._clock().isoformat(),
            "file_path": str(file_path),
            "pdf_type": None,
            "recommended_engine": None,
            "status": "uploaded",
        }
        if analyze_type:
            pdf_type, engine = self._sniff_pdf_type(content)
            record["pdf_type"] = pdf_type
            record["recommended_engine"] = engine
        with self._lock:
            self.uploads[file_id] = record
        return record

    def _run_pipeline(self, names: list[str], payloads: list[bytes],
                      language: str) -> list[dict]:
        """Run the real Dataset pipeline over the uploaded payloads.

        One Dataset job per API call — the batch analogue of the reference's
        per-request ``ProcessDocument.execute`` (``use_cases.py``), except
        N files in one request become N rows of one plan.
        """
        from .pipelines.extract import extract_pages_table
        now = self._clock()
        tbl = pa.table({
            "url": pa.array(names, pa.string()),
            "warc_ts": pa.array([now] * len(names), pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array([""] * len(names), pa.string()),
            "lang": pa.array([language] * len(names), pa.string()),
        }, schema=PAGES_SCHEMA)
        ds = extract_pages_table(tbl, config=self.pipeline_config, dedup=False)
        rows = ds.take_all()          # bounded: one API request's files
        by_url = {r["url"]: r for r in rows}
        return [by_url[n] for n in names]

    def _save_result(self, original_filename: str, row: dict,
                     pdf_bytes: bytes | None,
                     language: str, dpi: int, output_format: str,
                     generate_summary: bool) -> tuple[str, Path, list[str]]:
        """Persist one processed row; returns (document_id, doc_dir, files)."""
        from . import docstore
        from .stages.assemble import (render_markdown_reference_exact,
                                      render_summary_markdown)
        name = Path(original_filename).stem
        text = row["extracted_text"]
        tables = json.loads(row["tables_json"] or "[]")
        processing_time = row["processing_ms"] / 1000.0
        confidence = row["confidence"]
        n_pages = int(row["n_pages"])
        write_txt = output_format in ("text", "both")
        markdown = None
        doc_dir, _ = docstore.save_document(
            Path(self.config.output_directory), name, text, tables,
            pdf_bytes, doc_id=name, confidence=confidence,
            processing_time=processing_time, markdown=None,
            write_plain_text=write_txt)
        document_id = doc_dir.name
        files_generated = []
        if write_txt:
            files_generated.append(f"{document_id}.txt")
        if output_format in ("markdown", "both"):
            markdown = render_markdown_reference_exact(
                filename=original_filename, extracted_text=text,
                tables=tables, total_pages=n_pages,
                confidence_score=confidence,
                processing_time_s=processing_time,
                processed_date=self._clock().strftime("%Y-%m-%d %H:%M:%S"),
                document_id=document_id,
                tesseract_config=self.config.tesseract_config,
                dpi=dpi, language=language)
            (doc_dir / f"{document_id}.md").write_text(markdown,
                                                       encoding="utf-8")
            files_generated.append(f"{document_id}.md")
        if generate_summary:
            summary = render_summary_markdown(
                [{"url": original_filename, "n_pages": n_pages,
                  "confidence": confidence,
                  "processing_time": processing_time,
                  "status": "completed"}],
                total_docs=1, total_pages=n_pages,
                avg_confidence=confidence, total_time_s=processing_time)
            (doc_dir / f"{document_id}_summary.md").write_text(
                summary, encoding="utf-8")
            files_generated.append(f"{document_id}_summary.md")
        return document_id, doc_dir, files_generated

    # ------------------------------------------------------------------ #
    # files router (files.py)
    # ------------------------------------------------------------------ #
    def upload_file(self, original_filename: str, content: bytes,
                    analyze_type: bool = True) -> dict:
        if not original_filename.lower().endswith(".pdf"):
            raise HttpError(400, "Solo se permiten archivos PDF")
        return self._record_upload(original_filename, content, analyze_type)

    def batch_upload(self, files: list[tuple[str, bytes]],
                     analyze_type: bool = True) -> list[dict]:
        out = []
        for filename, content in files:
            if not filename.lower().endswith(".pdf"):
                continue   # files.py:305: non-PDFs skipped, not rejected
            out.append(self._record_upload(filename, content, analyze_type))
        return out

    def list_uploads(self, status_filter: str | None = None,
                     limit: int = 20, offset: int = 0) -> list[dict]:
        with self._lock:
            files = list(self.uploads.values())
        if status_filter:
            files = [f for f in files if f["status"] == status_filter]
        files.sort(key=lambda f: f["upload_date"], reverse=True)
        return files[offset:offset + limit]

    def get_upload(self, file_id: str) -> dict:
        with self._lock:
            rec = self.uploads.get(file_id)
        if rec is None:
            raise HttpError(404, "Archivo no encontrado")
        return rec

    def delete_upload(self, file_id: str) -> dict:
        with self._lock:
            rec = self.uploads.get(file_id)
        if rec is None:
            raise HttpError(404, "Archivo no encontrado")
        path = Path(rec["file_path"])
        if path.exists():
            path.unlink()
        with self._lock:
            del self.uploads[file_id]
        return {"message":
                f"Archivo {rec['filename']} eliminado exitosamente"}

    def process_file(self, file_id: str, engine_type: str = "auto",
                     language: str = "spa", dpi: int = 300,
                     extract_tables: bool = True,
                     output_format: str = "both",
                     generate_summary: bool = False) -> dict:
        rec = self.get_upload(file_id)
        path = Path(rec["file_path"])
        if not path.exists():
            raise HttpError(404, "Archivo físico no encontrado")
        rec["status"] = "processing"
        try:
            # files.py:166-171 auto resolution (advisory engine label; the
            # pipeline's C2 dispatch does the real per-type routing)
            if engine_type == "auto":
                engine_type = ("opencv" if rec["pdf_type"] == "scanned"
                               else "basic")
            content = path.read_bytes()
            row = self._run_pipeline([rec["original_filename"]], [content],
                                     language)[0]
            document_id, _doc_dir, files_generated = self._save_result(
                rec["original_filename"], row, content,
                language, dpi, output_format, generate_summary)
            rec["status"] = "processed"
            return {
                "file_id": file_id,
                "document_id": document_id,
                "status": "completed",
                "message": (f"Procesado con motor {engine_type}. "
                            f"{len(files_generated)} archivos generados."),
                "processing_time": row["processing_ms"] / 1000.0,
                "confidence_score": row["confidence"],
                "total_pages": int(row["n_pages"]),
                "output_files": files_generated,
            }
        except HttpError:
            rec["status"] = "error"
            raise
        except Exception as e:   # files.py:249-256
            rec["status"] = "error"
            raise HttpError(500, f"Error procesando archivo: {e}")

    # ------------------------------------------------------------------ #
    # documents router (documents.py)
    # ------------------------------------------------------------------ #
    def upload_and_process(self, original_filename: str, content: bytes,
                           engine_type: str = "auto", language: str = "spa",
                           dpi: int = 300, extract_tables: bool = True,
                           output_format: str = "both",
                           generate_summary: bool = False,
                           auto: bool = False) -> dict:
        if not original_filename.lower().endswith(".pdf"):
            raise HttpError(400, "Solo se permiten archivos PDF")
        if not 72 <= dpi <= 600:   # Form(ge=72, le=600)
            raise HttpError(422, "DPI debe estar entre 72 y 600")
        detected = None
        if auto or engine_type == "auto":
            pdf_type, engine_type = self._sniff_pdf_type(content)
            detected = pdf_type
        try:
            row = self._run_pipeline([original_filename], [content],
                                     language)[0]
            document_id, doc_dir, files_generated = self._save_result(
                original_filename, row, content, language,
                dpi, output_format, generate_summary)
            message = (f"Documento procesado exitosamente. "
                       f"Archivos generados: {len(files_generated)}")
            if auto and detected:
                message = (f"Tipo detectado: {detected}. Motor: "
                           f"{engine_type}. " + message)
            return {
                "document_id": document_id,
                "filename": original_filename,
                "status": "completed",
                "extracted_text": row["extracted_text"],
                "total_pages": int(row["n_pages"]),
                "confidence_score": row["confidence"],
                "processing_time": row["processing_ms"] / 1000.0,
                "output_directory": str(doc_dir),
                "tables_extracted": len(json.loads(row["tables_json"] or "[]")),
                "message": message,
            }
        except HttpError:
            raise
        except Exception as e:
            raise HttpError(500, f"Error procesando documento: {e}")

    def list_documents(self, limit: int = 10, offset: int = 0) -> dict:
        from . import docstore
        if not 1 <= limit <= 100:
            raise HttpError(422, "limit debe estar entre 1 y 100")
        if offset < 0:
            raise HttpError(422, "offset debe ser >= 0")
        dirs = docstore.list_documents(Path(self.config.output_directory))
        total = len(dirs)
        documents = []
        for doc_dir in dirs[offset:offset + limit]:
            documents.append({
                "document_id": doc_dir.name,
                "filename": f"{doc_dir.name}.pdf",
                "status": "completed",
                "output_directory": str(doc_dir),
                "processed_at": doc_dir.stat().st_mtime,
                "has_text": bool(list(doc_dir.glob("*.txt"))),
                "has_images": bool(list(doc_dir.glob("*.png"))),
                "has_tables": bool(list(doc_dir.glob("*_tables.csv"))
                                   or list(doc_dir.glob("*_tablas.json"))),
                "has_markdown": bool(list(doc_dir.glob("*.md"))),
            })
        return {"documents": documents, "total": total,
                "limit": limit, "offset": offset}

    def download_path(self, document_id: str) -> Path:
        """documents.py:335-345 looks for ``{id}.md`` at the output root;
        our storage writes per-document dirs, so check both."""
        root = Path(self.config.output_directory)
        for candidate in (root / f"{document_id}.md",
                          root / document_id / f"{document_id}.md"):
            if candidate.exists():
                return candidate
        raise HttpError(404, f"Documento {document_id} no encontrado")

    # ------------------------------------------------------------------ #
    # system router (system.py)
    # ------------------------------------------------------------------ #
    def system_status(self) -> dict:
        from .stages.ocr import DeterministicEngine
        output_dir = Path(self.config.output_directory)
        input_dir = Path(self.config.input_directory)
        processed = len(list(output_dir.glob("*.md"))) + \
            len(list(output_dir.glob("*/*.md"))) if output_dir.exists() else 0
        available = len(list(input_dir.glob("*.pdf"))) if input_dir.exists() else 0
        total_size = sum(f.stat().st_size for f in output_dir.rglob("*")
                         if f.is_file()) if output_dir.exists() else 0
        info = DeterministicEngine(self.pipeline_config).get_engine_info()
        return {
            "status": "operational",
            "version": API_VERSION,
            "tesseract_available": bool(info),
            "opencv_available": bool(info),
            "current_config": {
                "output_directory": self.config.output_directory,
                "input_directory": self.config.input_directory,
                "default_language": self.config.default_language,
                "default_dpi": self.config.default_dpi,
                "confidence_threshold": self.config.confidence_threshold,
                "tesseract_config": self.config.tesseract_config,
            },
            "directories": {
                "input_exists": input_dir.exists(),
                "output_exists": output_dir.exists(),
                "logs_directory": self.config.logs_directory,
            },
            "statistics": {
                "documents_processed": processed,
                "documents_available": available,
                "total_output_size_mb": round(total_size / (1024 * 1024), 2),
            },
        }

    def quality_profiles(self) -> list[dict]:
        return QUALITY_PROFILES

    def languages(self) -> dict:
        return AVAILABLE_LANGUAGES

    def files_available(self, analyze_type: bool = False) -> list[dict]:
        input_dir = Path(self.config.input_directory)
        if not input_dir.exists():
            return []
        files = []
        for pdf_file in input_dir.glob("*.pdf"):
            stat = pdf_file.stat()
            info = {
                "filename": pdf_file.name,
                "filepath": str(pdf_file),
                "size_mb": round(stat.st_size / (1024 * 1024), 2),
                "modified_date": datetime.fromtimestamp(
                    stat.st_mtime).isoformat(),
                "pdf_type": None,
                "recommended_engine": None,
            }
            if analyze_type:
                pdf_type, engine = self._sniff_pdf_type(
                    pdf_file.read_bytes())
                info["pdf_type"] = pdf_type
                info["recommended_engine"] = engine
            files.append(info)
        files.sort(key=lambda f: f["modified_date"], reverse=True)
        return files

    def files_processed(self, limit: int = 20, offset: int = 0,
                        engine_filter: str | None = None,
                        min_confidence: float | None = None) -> list[dict]:
        """E3 — the markdown metadata re-parse (``system.py:306-375``),
        quirk-for-quirk: ``Confianza OCR`` is divided by 100 only when > 1,
        then multiplied back to a percentage in the response; unknown fields
        default to (0.0, "unknown", 1, filename)."""
        output_dir = Path(self.config.output_directory)
        if not output_dir.exists():
            return []
        documents = []
        md_files = list(output_dir.glob("*.md")) + \
            list(output_dir.glob("*/*.md"))
        for md_file in md_files:
            try:
                content = md_file.read_text(encoding="utf-8")
                document_id = md_file.stem
                confidence, engine, pages, filename = 0.0, "unknown", 1, md_file.name
                for line in content.split("\n"):
                    if "**Confianza OCR**:" in line:
                        try:
                            conf_str = (line.split(":", 1)[1].strip()
                                        .replace("%", "").replace("*", ""))
                            confidence = (float(conf_str) / 100
                                          if float(conf_str) > 1
                                          else float(conf_str))
                        except ValueError:
                            pass
                    elif "**Motor OCR**:" in line:
                        engine = (line.split(":", 1)[1].strip()
                                  .replace("*", "").lower())
                    elif "**Páginas Procesadas**:" in line:
                        try:
                            pages = int(line.split(":", 1)[1].strip()
                                        .replace("*", ""))
                        except ValueError:
                            pass
                    elif "**Archivo Original**:" in line:
                        filename = (line.split(":", 1)[1].strip()
                                    .replace("*", ""))
                if engine_filter and engine_filter.lower() not in engine:
                    continue
                if min_confidence and confidence < min_confidence / 100:
                    continue
                base_dir = md_file.parent
                output_files = [f"{document_id}{ext}"
                                for ext in (".md", ".txt", ".json")
                                if (base_dir / f"{document_id}{ext}").exists()]
                stat = md_file.stat()
                documents.append({
                    "document_id": document_id,
                    "filename": filename,
                    "processed_date": datetime.fromtimestamp(
                        stat.st_mtime).isoformat(),
                    "confidence_score": confidence * 100,
                    "total_pages": pages,
                    "engine_used": engine,
                    "output_files": output_files,
                    "size_mb": round(stat.st_size / (1024 * 1024), 2),
                })
            except OSError:
                continue
        documents.sort(key=lambda d: d["processed_date"], reverse=True)
        return documents[offset:offset + limit]

    def config_update(self, update: dict) -> dict:
        """system.py:391-460 validation semantics, value-for-value."""
        updated = []
        if update.get("output_directory"):
            self.config.output_directory = update["output_directory"]
            Path(update["output_directory"]).mkdir(parents=True, exist_ok=True)
            updated.append("output_directory")
        if update.get("input_directory"):
            self.config.input_directory = update["input_directory"]
            Path(update["input_directory"]).mkdir(parents=True, exist_ok=True)
            updated.append("input_directory")
        if update.get("default_language"):
            lang = update["default_language"]
            if lang not in AVAILABLE_LANGUAGES:
                raise HttpError(400,
                                "Idioma no disponible. Idiomas soportados: "
                                + ", ".join(AVAILABLE_LANGUAGES))
            self.config.default_language = lang
            updated.append("default_language")
        if update.get("default_dpi"):
            dpi = update["default_dpi"]
            if not 72 <= dpi <= 600:
                raise HttpError(400, "DPI debe estar entre 72 y 600")
            self.config.default_dpi = dpi
            updated.append("default_dpi")
        if update.get("confidence_threshold"):
            thr = update["confidence_threshold"]
            if not 0 <= thr <= 100:
                raise HttpError(
                    400, "Umbral de confianza debe estar entre 0 y 100")
            self.config.confidence_threshold = thr
            updated.append("confidence_threshold")
        if update.get("quality_profile"):
            profiles = {"fast": (150, 50.0), "balanced": (300, 60.0),
                        "high": (600, 80.0)}
            prof = update["quality_profile"]
            if prof not in profiles:
                raise HttpError(400,
                                "Perfil no válido. Perfiles disponibles: "
                                + ", ".join(profiles))
            self.config.default_dpi, self.config.confidence_threshold = \
                profiles[prof]
            updated.extend(["default_dpi", "confidence_threshold"])
        return {
            "message": "Configuración actualizada exitosamente",
            "updated_fields": updated,
            "current_config": {
                "output_directory": self.config.output_directory,
                "input_directory": self.config.input_directory,
                "default_language": self.config.default_language,
                "default_dpi": self.config.default_dpi,
                "confidence_threshold": self.config.confidence_threshold,
            },
        }

    # ------------------------------------------------------------------ #
    # status + health routers (status.py, health.py)
    # ------------------------------------------------------------------ #
    def status_response(self) -> dict:
        output_dir = Path(self.config.output_directory)
        storage_available = True
        try:
            output_dir.mkdir(parents=True, exist_ok=True)
            probe = output_dir / ".test_write"
            probe.write_text("test")
            probe.unlink()
        except OSError:
            storage_available = False
        processed = len([d for d in output_dir.iterdir() if d.is_dir()]) \
            if output_dir.exists() else 0
        return {
            "api_status": "running",
            "ocr_engines": {"basic": True, "tesseract": True, "opencv": True},
            "storage_available": storage_available,
            "system_info": {
                "platform": platform.system(),
                "python_version": platform.python_version(),
                "current_directory": str(Path.cwd()),
                "output_directory": str(output_dir),
                "output_directory_exists": output_dir.exists(),
            },
            "processing_stats": {
                "total_documents": processed,
                "documents_today": 0,
                "average_processing_time": 0.0,
            },
        }

    def engines_status(self) -> dict:
        from .stages.ocr import DeterministicEngine
        info = DeterministicEngine(self.pipeline_config).get_engine_info()
        engines = {
            "deterministic": {"available": True,
                              "version": info.get("name", "1.0.0")},
            "opencv": {"available": True,
                       "version": "numpy-preprocess-chain"},
            "basic": {"available": True, "version": "1.0.0"},
        }
        return {"timestamp": self._clock().isoformat(), "engines": engines}

    def storage_status(self) -> dict:
        output_dir = Path(self.config.output_directory)
        storage_info = {"output_directory": str(output_dir),
                        "exists": output_dir.exists(), "writable": False,
                        "documents": 0, "total_size": 0}
        try:
            output_dir.mkdir(parents=True, exist_ok=True)
            probe = output_dir / ".test_write"
            probe.write_text("test")
            probe.unlink()
            storage_info["writable"] = True
            dirs = [d for d in output_dir.iterdir() if d.is_dir()]
            storage_info["documents"] = len(dirs)
            total = sum(f.stat().st_size for f in output_dir.rglob("*")
                        if f.is_file())
            storage_info["total_size"] = total
            storage_info["total_size_mb"] = round(total / (1024 * 1024), 2)
        except OSError as e:
            storage_info["error"] = str(e)
        return {"timestamp": self._clock().isoformat(),
                "storage": storage_info}

    def health(self) -> dict:
        return {"status": "healthy", "version": API_VERSION,
                "timestamp": self._clock().isoformat(),
                "uptime": time.time() - self.start_time}

    def health_detailed(self) -> dict:
        uptime = time.time() - self.start_time
        return {
            "status": "healthy", "version": API_VERSION,
            "timestamp": self._clock().isoformat(),
            "uptime_seconds": uptime,
            "uptime_formatted": (f"{int(uptime // 3600)}h "
                                 f"{int((uptime % 3600) // 60)}m "
                                 f"{int(uptime % 60)}s"),
            "system_info": {
                "platform": platform.system(),
                "platform_release": platform.release(),
                "architecture": platform.machine(),
                "python_version": platform.python_version(),
            },
            "api_info": {"framework": "http.server",
                         "docs_url": None, "redoc_url": None,
                         "openapi_url": None},
        }

    def liveness(self) -> dict:
        return {"status": "alive", "timestamp": self._clock().isoformat()}

    def readiness(self) -> dict:
        import ray
        return {"status": "ready", "timestamp": self._clock().isoformat(),
                "checks": {"api": "ok",
                           "dependencies":
                               "ok" if ray.is_initialized() else "no_ray"}}


# ---------------------------------------------------------------------- #
# HTTP transport
# ---------------------------------------------------------------------- #
def parse_multipart(body: bytes, content_type: str) -> tuple[dict, list]:
    """Minimal multipart/form-data parser (the stdlib ``cgi`` module is
    deprecated): returns (fields, files) where files is a list of
    (field_name, filename, bytes)."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise HttpError(400, "multipart boundary ausente")
    boundary = m.group(1).encode()
    fields: dict[str, str] = {}
    files: list[tuple[str, str, bytes]] = []
    # Exact framing (RFC 2046): parts are delimited by CRLF--boundary; the
    # payload between a part's blank line and the next delimiter is verbatim
    # (a naive strip() would corrupt binary payloads ending in \r or \n).
    for part in (b"\r\n" + body).split(b"\r\n--" + boundary):
        if not part or part.startswith(b"--"):
            continue   # preamble / closing -- marker
        if part.startswith(b"\r\n"):
            part = part[2:]
        if b"\r\n\r\n" not in part:
            continue
        head, _, content = part.partition(b"\r\n\r\n")
        disp = re.search(rb'Content-Disposition:[^\r\n]*', head, re.I)
        if not disp:
            continue
        disp_val = disp.group(0).decode("utf-8", "replace")
        name_m = re.search(r'name="([^"]*)"', disp_val)
        file_m = re.search(r'filename="([^"]*)"', disp_val)
        name = name_m.group(1) if name_m else ""
        if file_m:
            files.append((name, file_m.group(1), content))
        else:
            fields[name] = content.decode("utf-8", "replace")
    return fields, files


def _bool(v: str | bool | None, default: bool) -> bool:
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return v.strip().lower() in ("1", "true", "yes", "on")


class ApiHandler(BaseHTTPRequestHandler):
    """Route table mirrors the reference's router prefixes under /api/v1."""

    server_version = "OcrMainRay/2.0.0"
    protocol_version = "HTTP/1.1"

    # quiet: don't spam stderr per request
    def log_message(self, fmt, *args):
        pass

    @property
    def svc(self) -> OcrService:
        return self.server.service   # type: ignore[attr-defined]

    # -------------------- plumbing -------------------- #
    def _send_json(self, obj, status: int = 200):
        data = json.dumps(obj, ensure_ascii=False).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _send_file(self, path: Path, media_type: str):
        data = path.read_bytes()
        self.send_response(200)
        self.send_header("Content-Type", media_type)
        self.send_header("Content-Disposition",
                         f'attachment; filename="{path.name}"')
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _body(self) -> bytes:
        length = int(self.headers.get("Content-Length", "0") or "0")
        return self.rfile.read(length) if length else b""

    def _query(self) -> dict:
        from urllib.parse import parse_qs, urlparse
        q = parse_qs(urlparse(self.path).query)
        return {k: v[0] for k, v in q.items()}

    def _route(self, method: str):
        from urllib.parse import urlparse
        path = urlparse(self.path).path.rstrip("/") or "/"
        if not path.startswith(API_PREFIX):
            raise HttpError(404, "Not Found")
        sub = path[len(API_PREFIX):] or "/"
        q = self._query()
        try:
            return self._dispatch(method, sub, q)
        except HttpError:
            raise
        except Exception as e:
            raise HttpError(500, f"Error interno: {e}")

    # -------------------- routes -------------------- #
    def _dispatch(self, method: str, sub: str, q: dict):
        svc = self.svc
        if method == "GET":
            if sub in ("/health", "/health/"):
                return svc.health()
            if sub == "/health/detailed":
                return svc.health_detailed()
            if sub == "/health/liveness":
                return svc.liveness()
            if sub == "/health/readiness":
                return svc.readiness()
            if sub in ("/status", "/status/"):
                return svc.status_response()
            if sub == "/status/engines":
                return svc.engines_status()
            if sub == "/status/storage":
                return svc.storage_status()
            if sub == "/system/status":
                return svc.system_status()
            if sub == "/system/profiles":
                return svc.quality_profiles()
            if sub == "/system/languages":
                return svc.languages()
            if sub == "/system/files/available":
                return svc.files_available(_bool(q.get("analyze_type"), False))
            if sub == "/system/files/processed":
                return svc.files_processed(
                    limit=int(q.get("limit", 20)),
                    offset=int(q.get("offset", 0)),
                    engine_filter=q.get("engine_filter"),
                    min_confidence=(float(q["min_confidence"])
                                    if "min_confidence" in q else None))
            if sub in ("/files", "/files/"):
                return svc.list_uploads(q.get("status_filter"),
                                        int(q.get("limit", 20)),
                                        int(q.get("offset", 0)))
            m = re.fullmatch(r"/files/([^/]+)", sub)
            if m:
                return svc.get_upload(m.group(1))
            if sub in ("/documents", "/documents/"):
                return svc.list_documents(int(q.get("limit", 10)),
                                          int(q.get("offset", 0)))
            m = re.fullmatch(r"/documents/download/([^/]+)", sub)
            if m:
                path = svc.download_path(m.group(1))
                self._send_file(path, "text/markdown")
                return None   # already sent
        elif method == "POST":
            body = self._body()
            ctype = self.headers.get("Content-Type", "")
            if sub == "/files/upload":
                fields, files = parse_multipart(body, ctype)
                if not files:
                    raise HttpError(400, "Archivo ausente")
                _, filename, content = files[0]
                return svc.upload_file(
                    filename, content,
                    _bool(fields.get("analyze_type"), True))
            if sub == "/files/batch-upload":
                fields, files = parse_multipart(body, ctype)
                return svc.batch_upload(
                    [(fn, c) for _, fn, c in files],
                    _bool(fields.get("analyze_type"), True))
            m = re.fullmatch(r"/files/([^/]+)/process", sub)
            if m:
                req = json.loads(body or b"{}")
                return svc.process_file(
                    m.group(1),
                    engine_type=req.get("engine_type", "auto"),
                    language=req.get("language", "spa"),
                    dpi=int(req.get("dpi", 300)),
                    extract_tables=bool(req.get("extract_tables", True)),
                    output_format=req.get("output_format", "both"),
                    generate_summary=bool(req.get("generate_summary", False)))
            if sub in ("/documents/upload-and-process",
                       "/documents/upload-auto"):
                fields, files = parse_multipart(body, ctype)
                if not files:
                    raise HttpError(400, "Archivo ausente")
                _, filename, content = files[0]
                auto = sub.endswith("upload-auto")
                return svc.upload_and_process(
                    filename, content,
                    engine_type=fields.get("engine_type", "auto"),
                    language=fields.get("language", "spa"),
                    dpi=int(fields.get("dpi", 300)),
                    extract_tables=_bool(fields.get("extract_tables"), True),
                    output_format=fields.get("output_format", "both"),
                    generate_summary=_bool(fields.get("generate_summary"),
                                           False),
                    auto=auto)
            if sub == "/system/config/update":
                return svc.config_update(json.loads(body or b"{}"))
        elif method == "DELETE":
            m = re.fullmatch(r"/files/([^/]+)", sub)
            if m:
                return svc.delete_upload(m.group(1))
        raise HttpError(404, "Not Found")

    def _handle(self, method: str):
        try:
            result = self._route(method)
            if result is not None:
                self._send_json(result)
        except HttpError as e:
            self._send_json({"detail": e.detail}, e.status)
        except BrokenPipeError:
            pass

    def do_GET(self):
        self._handle("GET")

    def do_POST(self):
        self._handle("POST")

    def do_DELETE(self):
        self._handle("DELETE")


def make_server(service: OcrService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Bind (port=0 → ephemeral); caller drives serve_forever/shutdown."""
    server = ThreadingHTTPServer((host, port), ApiHandler)
    server.service = service   # type: ignore[attr-defined]
    return server


def main(argv=None) -> int:
    """CLI entry point: ``python -m ocr_main_ray.service --port 8000``.
    Owns the Ray session (guarded), per the driver contract."""
    import argparse

    import ray

    parser = argparse.ArgumentParser(prog="ocr-main-ray-service")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--output", default="./resultado")
    parser.add_argument("--input", default="./pdfs")
    args = parser.parse_args(argv)

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    service = OcrService(ServiceConfig(output_directory=args.output,
                                       input_directory=args.input))
    server = make_server(service, args.host, args.port)
    host, port = server.server_address[:2]
    print(f"ocr_main_ray API on http://{host}:{port}{API_PREFIX}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
