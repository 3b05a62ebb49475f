"""ocr_main_ray — a Ray-Data-native web-page / document extraction engine.

A brand-new rebuild (NOT a port) of the extraction capabilities of the
reference repo ROD-LAR-GILLES/OCR-MAIN, expressed as Ray Data pipelines:

    ray.data.read_parquet(pages)                  # (url, warc_ts, html, text, lang)
      -> map_batches(sniff)                       # validity gate + content-type sniff
      -> groupby("url") keep-first dedup          # the one required wide op
      -> map_batches(ExtractDispatch, actor pool) # html strip | pdf text-layer | OCR
      -> write_parquet(extracted)                 # (url, extracted_text, span_offsets, ...)

Design notes, scale assumptions and reference-parity citations live in the
module docstrings; SURVEY.md section 2 is the operator inventory this package
implements.  Library code never calls ray.init()/ray.shutdown() — sessions are
owned by bench.py / test fixtures / the driver.
"""

__version__ = "0.1.0"
