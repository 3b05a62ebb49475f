"""Filesystem document store — FileStorage parity for the interface layer.

Rebuilds the reference's storage adapter
(``backend/src/infrastructure/adapters/storage/file_storage.py:24-104,179-190``):
a per-document directory under ``output_dir`` holding the convention-named
file trio (``{name}_texto.txt``, ``{name}_tablas.json``,
``{name}_original.pdf``, ``{name}_metadata.json``) plus the API routes'
additional ``{name}.txt`` / ``{name}.md`` outputs
(``routers/documents.py:96-124``, ``routers/files.py:182-217``).

This store is the INTERFACE-layer sink only (one document at a time,
human-browsable tree).  The dataplane sink remains partitioned Parquet via
``state/manifest.py`` — at 100-TB scale results live in Parquet; this tree
exists so a user of the reference's API/CLI sees the same files in the same
places.
"""
from __future__ import annotations

import json
from pathlib import Path


def create_unique_dir(output_dir: Path, base_name: str) -> Path:
    """B5 allocator, reference-exact (``file_storage.py:179-190``): first
    ``{base}``, then ``{base}_01``, ``{base}_02``, … until a free name.

    Allocation is the ``mkdir`` itself (atomic at the filesystem level),
    not a check-then-create: two concurrent requests saving the same name
    race the reference's exists() loop into a crash; here the loser's
    FileExistsError just advances it to the next suffix."""
    unique_dir = Path(output_dir) / base_name
    counter = 1
    while True:
        try:
            unique_dir.mkdir(parents=True)
            return unique_dir
        except FileExistsError:
            unique_dir = Path(output_dir) / f"{base_name}_{counter:02d}"
            counter += 1


def save_document(output_dir: Path, name: str, extracted_text: str,
                  tables: list | None, pdf_bytes: bytes | None,
                  doc_id: str | None = None, confidence: float | None = None,
                  processing_time: float | None = None,
                  markdown: str | None = None,
                  write_plain_text: bool = True) -> tuple[Path, list[Path]]:
    """Persist one processed document; returns ``(doc_dir, generated_files)``.

    File set and field names mirror ``file_storage.py:40-81`` exactly
    (tables file only when tables are non-empty; metadata keys
    ``id/name/text_length/tables_count/confidence/processing_time``);
    the ``.txt``/``.md`` pair mirrors the API routes' extra outputs.
    """
    doc_dir = create_unique_dir(output_dir, name)
    final_name = doc_dir.name
    generated: list[Path] = []

    text_file = doc_dir / f"{final_name}_texto.txt"
    text_file.write_text(extracted_text, encoding="utf-8")
    generated.append(text_file)

    if tables:
        tables_file = doc_dir / f"{final_name}_tablas.json"
        tables_file.write_text(
            json.dumps(tables, ensure_ascii=False, indent=2), encoding="utf-8")
        generated.append(tables_file)

    if pdf_bytes is not None:
        pdf_copy = doc_dir / f"{final_name}_original.pdf"
        pdf_copy.write_bytes(pdf_bytes)
        generated.append(pdf_copy)

    metadata = {
        "id": doc_id,
        "name": final_name,
        "text_length": len(extracted_text),
        "tables_count": len(tables) if tables else 0,
        "confidence": confidence,
        "processing_time": processing_time,
    }
    metadata_file = doc_dir / f"{final_name}_metadata.json"
    metadata_file.write_text(
        json.dumps(metadata, ensure_ascii=False, indent=2), encoding="utf-8")
    generated.append(metadata_file)

    # API-route outputs (documents.py:96-124): plain .txt and rendered .md
    if write_plain_text:
        api_txt = doc_dir / f"{final_name}.txt"
        api_txt.write_text(extracted_text, encoding="utf-8")
        generated.append(api_txt)
    if markdown is not None:
        api_md = doc_dir / f"{final_name}.md"
        api_md.write_text(markdown, encoding="utf-8")
        generated.append(api_md)

    return doc_dir, generated


def get_document(output_dir: Path, document_id: str) -> dict | None:
    """``file_storage.py:84-113``: document_id == directory name; returns the
    metadata dict + text, or None when absent."""
    doc_dir = Path(output_dir) / document_id
    if not doc_dir.is_dir():
        return None
    meta_file = doc_dir / f"{document_id}_metadata.json"
    meta = {}
    if meta_file.exists():
        try:
            meta = json.loads(meta_file.read_text(encoding="utf-8"))
        except (json.JSONDecodeError, OSError):
            meta = {}
    text_file = doc_dir / f"{document_id}_texto.txt"
    text = text_file.read_text(encoding="utf-8") if text_file.exists() else ""
    return {**meta, "name": document_id, "text": text,
            "output_directory": str(doc_dir)}


def list_documents(output_dir: Path) -> list[Path]:
    """All per-document directories, most-recently-modified first
    (``routers/documents.py:399-402``)."""
    output_dir = Path(output_dir)
    if not output_dir.exists():
        return []
    dirs = [d for d in output_dir.iterdir() if d.is_dir()]
    dirs.sort(key=lambda d: d.stat().st_mtime, reverse=True)
    return dirs
