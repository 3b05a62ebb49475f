"""Interactive menu tests — scripted stdin drives every reference path."""
import itertools
from datetime import datetime

import pytest

from ocr_main_ray.config import PipelineConfig
from ocr_main_ray.menu import (InteractiveMenu, create_ocr_config_from_user_choices,
                               create_pdf_menu_options, get_selected_pdf,
                               is_exit_selection, validate_menu_selection,
                               validate_ocr_engine_choice)
from ocr_main_ray.service import OcrService, ServiceConfig
from ocr_main_ray.sources.pdfgen import native_pdf


# ------------------------- menu_utils parity ------------------------- #
def test_create_pdf_menu_options_layout():
    opts = create_pdf_menu_options(["a.pdf", "b.pdf"])
    assert [o.text for o in opts] == [" 1. a.pdf", " 2. b.pdf", "3. Salir"]
    assert opts[-1].value == "exit"
    assert create_pdf_menu_options([])[0].text == "1. Salir"


def test_selection_helpers():
    assert validate_menu_selection(1, 3) and validate_menu_selection(3, 3)
    assert not validate_menu_selection(0, 3)
    assert not validate_menu_selection(4, 3)
    assert get_selected_pdf(["a.pdf", "b.pdf"], 2) == "b.pdf"
    with pytest.raises(ValueError):
        get_selected_pdf(["a.pdf"], 2)
    assert is_exit_selection(3, 2)
    assert not is_exit_selection(2, 2)
    assert validate_ocr_engine_choice(3)
    assert not validate_ocr_engine_choice(4)


def test_create_ocr_config_values():
    basic = create_ocr_config_from_user_choices(1)
    assert (basic.engine_type, basic.dpi,
            basic.min_quality_threshold) == ("basic", 300, 60.0)
    cv = create_ocr_config_from_user_choices(2)
    assert (cv.engine_type, cv.dpi, cv.min_quality_threshold) == (
        "opencv", 400, 70.0)
    assert cv.deskew and cv.denoise and cv.enhance_contrast
    with pytest.raises(ValueError):
        create_ocr_config_from_user_choices(3)


# ------------------------- scripted menu runs ------------------------- #
def _menu(tmp_path, inputs, with_ray_service=None):
    lines = []
    it = iter(inputs)

    def fake_input(prompt=""):
        try:
            v = next(it)
        except StopIteration:
            raise EOFError
        lines.append(prompt + v)
        return v

    def fake_print(*args, **kwargs):
        lines.append(" ".join(str(a) for a in args))

    menu = InteractiveMenu(tmp_path / "pdfs", tmp_path / "resultado",
                           input_fn=fake_input, print_fn=fake_print,
                           service=with_ray_service)
    return menu, lines


def test_menu_exit_immediately(tmp_path):
    menu, lines = _menu(tmp_path, ["6"])
    menu.run()
    out = "\n".join(lines)
    assert "MENU PRINCIPAL" in out
    assert "Gracias por usar el Sistema OCR!" in out
    assert not menu.running


def test_menu_invalid_then_valid_choice(tmp_path):
    menu, lines = _menu(tmp_path, ["9", "abc", "6"])
    menu.run()
    out = "\n".join(lines)
    assert "ERROR: Opción inválida. Seleccione entre 1 y 6" in out
    assert "ERROR: Por favor ingrese un número válido" in out


def test_menu_list_files_and_results(tmp_path):
    (tmp_path / "pdfs").mkdir()
    (tmp_path / "pdfs" / "informe.pdf").write_bytes(b"%PDF-demo")
    (tmp_path / "resultado" / "viejo").mkdir(parents=True)
    menu, lines = _menu(tmp_path, ["4", "", "5", "", "6"])
    menu.run()
    out = "\n".join(lines)
    assert " 1. informe.pdf (0.0 MB)" in out
    assert " 1. viejo/ (sin metadatos)" in out


def test_menu_no_pdfs_message(tmp_path):
    menu, lines = _menu(tmp_path, ["1", "", "6"])
    menu.run()
    out = "\n".join(lines)
    assert "No se encontraron archivos PDF" in out


def test_menu_configure_language_and_dpi(tmp_path):
    menu, lines = _menu(tmp_path, ["2", "2", "2", "",      # lang -> eng
                                   "2", "3", "9999", "",   # dpi out of range
                                   "2", "3", "240", "",    # dpi ok
                                   "6"])
    menu.run()
    out = "\n".join(lines)
    assert "Idioma cambiado a: eng" in out
    assert "ERROR: DPI debe estar entre 150 y 600" in out
    assert "DPI cambiado a: 240" in out
    assert menu.config.lang == "eng"
    assert menu.config.dpi == 240


def test_menu_configure_engine(tmp_path):
    menu, lines = _menu(tmp_path, ["2", "1", "2", "", "3", "", "6"])
    menu.run()
    out = "\n".join(lines)
    assert "Motor seleccionado: OpenCV" in out
    assert "Configuración actualizada" in out
    assert "Motor OCR: opencv" in out     # option 3 shows the new config
    assert menu.config.dpi == 400


def test_menu_process_document_auto(tmp_path, ray_session):
    pdf = native_pdf(["\n".join(f"Texto de prueba del menu linea {i}" for i in range(1, 20))])
    (tmp_path / "pdfs").mkdir()
    (tmp_path / "pdfs" / "menu_doc.pdf").write_bytes(pdf)
    counter = itertools.count(1)
    service = OcrService(
        ServiceConfig(output_directory=str(tmp_path / "resultado"),
                      input_directory=str(tmp_path / "pdfs")),
        id_factory=lambda: f"m{next(counter):04d}",
        clock=lambda: datetime(2024, 5, 17, 12, 0, 0))
    # 1=process, 1=first pdf, 3=auto-detect, Enter, 6=exit
    menu, lines = _menu(tmp_path, ["1", "1", "3", "", "6"],
                        with_ray_service=service)
    menu.run()
    out = "\n".join(lines)
    assert "Detectando tipo de documento automáticamente..." in out
    assert "Proceso completado exitosamente!" in out
    assert "Documento: menu_doc" in out
    doc_dir = tmp_path / "resultado" / "menu_doc"
    assert (doc_dir / "menu_doc_texto.txt").read_text(
        encoding="utf-8") == "\n".join(f"Texto de prueba del menu linea {i}" for i in range(1, 20))
    assert (doc_dir / "menu_doc.md").exists()


def test_menu_process_select_exit(tmp_path):
    (tmp_path / "pdfs").mkdir()
    (tmp_path / "pdfs" / "x.pdf").write_bytes(b"%PDF-")
    # choose process, then the Salir entry (2 with one file), then exit
    menu, lines = _menu(tmp_path, ["1", "2", "", "6"])
    menu.run()
    out = "\n".join(lines)
    assert "Proceso completado" not in out
