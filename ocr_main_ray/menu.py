"""Interactive CLI menu — rebuild of the reference's menu interface.

Reproduces ``backend/src/interfaces/cli/interactive_menu.py:34-374`` and the
``menu_utils.py`` helpers (:25-89): the six-option main menu, numbered PDF
selection with a trailing "Salir" entry, the three-way engine menu (basic /
opencv / auto-detect), the configure submenu, and the results listing.

Testability: the constructor takes ``input_fn`` / ``print_fn`` so scripted
stdin/stdout drives every path (the reference reads ``input()`` directly);
``clear_screen`` becomes a no-op when not attached to a TTY.  Processing
goes through :class:`ocr_main_ray.service.OcrService` so the menu and the
REST API share one core — and every document runs the real Ray Dataset
pipeline, not a per-file code path.
"""
from __future__ import annotations

import os
import sys
from dataclasses import dataclass
from pathlib import Path

from .config import PipelineConfig
from .service import OcrService, ServiceConfig


# ---------------------------------------------------------------------- #
# menu_utils parity helpers (menu_utils.py:18-89)
# ---------------------------------------------------------------------- #
@dataclass
class MenuOption:
    id: int
    text: str
    value: str = ""


def create_pdf_menu_options(pdf_files: list[str]) -> list[MenuOption]:
    """menu_utils.py:25-40: numbered file entries + trailing Salir."""
    options = [MenuOption(id=i, text=f"{i:2d}. {filename}", value=filename)
               for i, filename in enumerate(pdf_files, 1)]
    exit_id = len(pdf_files) + 1
    options.append(MenuOption(id=exit_id, text=f"{exit_id}. Salir",
                              value="exit"))
    return options


def validate_menu_selection(choice: int, max_options: int) -> bool:
    return 1 <= choice <= max_options


def get_selected_pdf(pdf_files: list[str], choice: int) -> str:
    if not validate_menu_selection(choice, len(pdf_files)):
        raise ValueError(f"Selección inválida: {choice}")
    return pdf_files[choice - 1]


def is_exit_selection(choice: int, total_files: int) -> bool:
    return choice == total_files + 1


def validate_ocr_engine_choice(choice: int) -> bool:
    return choice in (1, 2, 3)


def create_ocr_config_from_user_choices(engine_choice: int) -> PipelineConfig:
    """menu_utils.py:66-89, value-for-value: 1 → basic dpi=300/thr=60,
    2 → opencv dpi=400/thr=70 with all preprocess flags on."""
    if engine_choice == 1:
        return PipelineConfig(engine_type="basic", dpi=300,
                              min_quality_threshold=60.0)
    if engine_choice == 2:
        return PipelineConfig(engine_type="opencv", dpi=400,
                              min_quality_threshold=70.0,
                              deskew=True, denoise=True,
                              enhance_contrast=True)
    raise ValueError(f"Opción de motor inválida: {engine_choice}")


# ---------------------------------------------------------------------- #
# interactive menu
# ---------------------------------------------------------------------- #
class InteractiveMenu:
    """interactive_menu.py:34-374 with injectable IO."""

    def __init__(self, pdfs_directory: str | Path = "./pdfs",
                 results_directory: str | Path = "./resultado",
                 input_fn=input, print_fn=print, service: OcrService | None = None):
        self.pdfs_directory = Path(pdfs_directory)
        self.results_directory = Path(results_directory)
        self._input = input_fn
        self._print = print_fn
        self.config = PipelineConfig()
        self.running = True
        self.service = service or OcrService(ServiceConfig(
            output_directory=str(self.results_directory),
            input_directory=str(self.pdfs_directory)))

    # ------------------------- chrome ------------------------- #
    def clear_screen(self):
        if sys.stdout.isatty():   # scripted runs: never shell out
            os.system("clear" if os.name == "posix" else "cls")

    def show_header(self):
        self._print("=" * 60)
        self._print("SISTEMA OCR - RAY DATA ENGINE")
        self._print("=" * 60)
        self._print()

    def show_main_menu(self):
        self._print("MENU PRINCIPAL")
        self._print("-" * 30)
        self._print("1. Procesar documento PDF")
        self._print("2. Configurar sistema")
        self._print("3. Ver estado del sistema")
        self._print("4. Listar archivos disponibles")
        self._print("5. Ver resultados anteriores")
        self._print("6. Salir")
        self._print()

    def get_user_choice(self, max_option: int) -> int:
        """interactive_menu.py:87-100: reprompt until valid; EOF/interrupt
        selects the exit option."""
        while True:
            try:
                choice = int(self._input(
                    f"Seleccione una opción (1-{max_option}): "))
                if validate_menu_selection(choice, max_option):
                    return choice
                self._print(f"ERROR: Opción inválida. Seleccione entre 1 y "
                            f"{max_option}")
            except ValueError:
                self._print("ERROR: Por favor ingrese un número válido")
            except (KeyboardInterrupt, EOFError):
                self._print("\n\nSaliendo del sistema...")
                return max_option

    # ------------------------- discovery ------------------------- #
    def discover_pdfs(self) -> list[Path]:
        self.pdfs_directory.mkdir(parents=True, exist_ok=True)
        return sorted(self.pdfs_directory.glob("*.pdf"))

    def select_pdf_file(self) -> Path | None:
        pdf_files = self.discover_pdfs()
        if not pdf_files:
            self._print("\nERROR: No se encontraron archivos PDF en el "
                        f"directorio {self.pdfs_directory}/")
            self._print("NOTA: Coloque archivos PDF en el directorio y "
                        "vuelva a intentar")
            return None
        self._print("\nARCHIVOS PDF DISPONIBLES")
        self._print("-" * 40)
        file_names = [p.name for p in pdf_files]
        for option in create_pdf_menu_options(file_names):
            self._print(option.text)
        self._print()
        choice = self.get_user_choice(len(file_names) + 1)
        if is_exit_selection(choice, len(file_names)):
            return None
        try:
            selected = get_selected_pdf(file_names, choice)
        except (ValueError, IndexError) as e:
            self._print(f"ERROR: Error en selección: {e}")
            return None
        self._print(f"\nArchivo seleccionado: {selected}")
        return self.pdfs_directory / selected

    def select_ocr_engine(self) -> PipelineConfig | None:
        """Returns None to signal auto-detection (interactive_menu.py:153)."""
        self._print("\nCONFIGURACION DEL MOTOR OCR")
        self._print("-" * 40)
        self._print("1. Motor Básico (Tesseract)")
        self._print("2. Motor OpenCV (Avanzado)")
        self._print("3. Detección Automática")
        self._print()
        choice = self.get_user_choice(3)
        if choice == 3:
            return None
        try:
            config = create_ocr_config_from_user_choices(choice)
            self._print(f"Motor seleccionado: "
                        f"{'Básico' if choice == 1 else 'OpenCV'}")
            return config
        except ValueError as e:
            self._print(f"ERROR: Error en configuración: {e}")
            return self.config

    # ------------------------- actions ------------------------- #
    def process_document(self):
        selected_pdf = self.select_pdf_file()
        if not selected_pdf:
            return None
        config = self.select_ocr_engine()
        if config is None:
            self._print("\nDetectando tipo de documento automáticamente...")
            data = selected_pdf.read_bytes()
            pdf_type, engine = self.service._sniff_pdf_type(data)
            self._print(f"Resultado: tipo={pdf_type}, motor={engine}")
            from .stages.sniff import get_optimal_config
            auto = get_optimal_config(pdf_type)
            config = PipelineConfig(engine_type=auto["engine_type"],
                                    dpi=auto["dpi"])
        self._print("\nConfiguración aplicada:")
        self._print(f"   Motor: {config.engine_type}")
        self._print(f"   Idioma: {config.lang}")
        self._print(f"   DPI: {config.dpi}")
        self._print("\nProcesando documento...")
        self._print(f"Archivo: {selected_pdf.name}")
        try:
            self.service.pipeline_config = config
            row = self.service._run_pipeline(
                [selected_pdf.name], [selected_pdf.read_bytes()],
                config.lang)[0]
            document_id, doc_dir, files = self.service._save_result(
                selected_pdf.name, row, selected_pdf.read_bytes(),
                config.lang, config.dpi, "both", False)
            self._print("\nProceso completado exitosamente!")
            self._print(f"Documento: {document_id}")
            self._print(f"Texto extraído: "
                        f"{len(row['extracted_text']):,} caracteres")
            import json as _json
            self._print(f"Tablas encontradas: "
                        f"{len(_json.loads(row['tables_json'] or '[]'))}")
            self._print(f"Directorio de salida: {doc_dir.name}")
            self._print(f"Archivos generados: {len(files)}")
            if document_id != selected_pdf.stem:
                self._print(f"NOTA: Se asignó nombre único '{document_id}' "
                            "para evitar duplicados")
            self._print("\nArchivos guardados:")
            for name in files:
                self._print(f"   {name}")
            return document_id
        except Exception as e:
            self._print(f"\nERROR: Error de procesamiento: {e}")
            return None

    def show_system_configuration(self):
        self._print("\nCONFIGURACION DEL SISTEMA")
        self._print("-" * 40)
        self._print(f"Motor OCR: {self.config.engine_type}")
        self._print(f"Idioma: {self.config.lang}")
        self._print(f"DPI: {self.config.dpi}")
        self._print(f"Umbral de confianza: "
                    f"{self.config.min_quality_threshold}%")
        self._print(f"Directorio de PDFs: {self.pdfs_directory}")
        self._print(f"Directorio de resultados: {self.results_directory}")
        self._print(f"Corrección de inclinación: "
                    f"{'Activada' if self.config.deskew else 'Desactivada'}")
        self._print(f"Eliminación de ruido: "
                    f"{'Activada' if self.config.denoise else 'Desactivada'}")
        self._print(
            "Mejora de contraste: "
            f"{'Activada' if self.config.enhance_contrast else 'Desactivada'}")

    def list_available_files(self):
        pdf_files = self.discover_pdfs()
        self._print("\nARCHIVOS PDF DISPONIBLES")
        self._print("-" * 40)
        if not pdf_files:
            self._print("ERROR: No se encontraron archivos PDF")
            self._print("NOTA: Coloque archivos PDF en el directorio "
                        f"{self.pdfs_directory}/")
            return
        for i, pdf_file in enumerate(pdf_files, 1):
            size_mb = pdf_file.stat().st_size / (1024 * 1024)
            self._print(f"{i:2d}. {pdf_file.name} ({size_mb:.1f} MB)")

    def list_previous_results(self):
        self._print("\nRESULTADOS ANTERIORES")
        self._print("-" * 40)
        if not self.results_directory.exists():
            self._print("ERROR: No se encontró directorio de resultados")
            return
        result_dirs = [d for d in sorted(self.results_directory.iterdir())
                       if d.is_dir()]
        if not result_dirs:
            self._print("ERROR: No se encontraron resultados anteriores")
            return
        for i, result_dir in enumerate(result_dirs, 1):
            metadata = result_dir / f"{result_dir.name}_metadata.json"
            suffix = "" if metadata.exists() else " (sin metadatos)"
            self._print(f"{i:2d}. {result_dir.name}/{suffix}")

    def configure_system(self):
        """interactive_menu.py:288-337: engine / language / dpi submenu."""
        from dataclasses import replace
        self._print("\nCONFIGURACION DEL SISTEMA")
        self._print("-" * 40)
        self._print("1. Cambiar motor OCR")
        self._print("2. Cambiar idioma")
        self._print("3. Ajustar DPI")
        self._print("4. Volver al menú principal")
        choice = self.get_user_choice(4)
        if choice == 1:
            new_config = self.select_ocr_engine()
            if new_config:
                self.config = new_config
                self._print("Configuración actualizada")
        elif choice == 2:
            self._print("\nIdiomas disponibles:")
            self._print("1. Español (spa)")
            self._print("2. Inglés (eng)")
            self._print("3. Portugués (por)")
            lang_choice = self.get_user_choice(3)
            lang = {1: "spa", 2: "eng", 3: "por"}.get(lang_choice, "spa")
            self.config = replace(self.config, lang=lang)
            self._print(f"Idioma cambiado a: {lang}")
        elif choice == 3:
            try:
                new_dpi = int(self._input("Ingrese nuevo DPI (150-600): "))
                if 150 <= new_dpi <= 600:
                    self.config = replace(self.config, dpi=new_dpi)
                    self._print(f"DPI cambiado a: {new_dpi}")
                else:
                    self._print("ERROR: DPI debe estar entre 150 y 600")
            except ValueError:
                self._print("ERROR: Valor de DPI inválido")

    # ------------------------- loop ------------------------- #
    def run(self):
        while self.running:
            try:
                self.clear_screen()
                self.show_header()
                self.show_main_menu()
                choice = self.get_user_choice(6)
                if choice == 1:
                    self.process_document()
                elif choice == 2:
                    self.configure_system()
                elif choice == 3:
                    self.show_system_configuration()
                elif choice == 4:
                    self.list_available_files()
                elif choice == 5:
                    self.list_previous_results()
                elif choice == 6:
                    self._print("\nGracias por usar el Sistema OCR!")
                    self.running = False
                    break
                if choice != 6:
                    try:
                        self._input("\nPresione Enter para continuar...")
                    except (EOFError, KeyboardInterrupt):
                        self.running = False
            except (KeyboardInterrupt, EOFError):
                self._print("\n\nSaliendo del sistema...")
                self.running = False


def main(argv=None) -> int:
    """``python -m ocr_main_ray.menu`` — owns the Ray session (guarded)."""
    import argparse

    import ray

    parser = argparse.ArgumentParser(prog="ocr-main-ray-menu")
    parser.add_argument("--pdfs", default="./pdfs")
    parser.add_argument("--results", default="./resultado")
    args = parser.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        InteractiveMenu(args.pdfs, args.results).run()
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
