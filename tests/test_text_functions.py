import numpy as np

from ocr_main_ray.functions.text import (LangId, bpe_token_count,
                                         detect_language, fingerprint,
                                         quality_features, quality_score,
                                         whitespace_token_count)


def test_lang_id_basic():
    assert detect_language("the cat and the dog are in the house") == "eng"
    assert detect_language("la casa de la montaña es de piedra, según dicen") == "spa"
    assert detect_language("") == "und"
    assert detect_language("123 456") == "und"


def test_lang_id_actor_shape():
    import pyarrow as pa
    out = LangId()(pa.table({"text": ["the cat and the dog"]}))
    assert out.column("lang_id").to_pylist() == ["eng"]


def test_quality_features():
    f = quality_features("The cat sat on the mat.")
    assert f["n_words"] == 6
    assert f["stopword_ratio"] == 3 / 6  # The, on, the
    assert 0 < f["alpha_ratio"] < 1
    assert quality_features("")["n_words"] == 0


def test_quality_score_ranges():
    good = quality_score("The quick brown fox jumps over the lazy dog and "
                         "runs into the forest for a while " * 3)
    junk = quality_score("@@@@ #### $$$$ 1234 %%%%")
    assert 0 <= junk < good <= 100


def test_token_counts():
    assert whitespace_token_count("a b  c") == 3
    assert bpe_token_count("hello, world42!") == 5  # hello , world 42 !
    assert bpe_token_count("") == 0


def test_fingerprint_properties():
    a = fingerprint("the quick brown fox jumps over the lazy dog " * 5)
    b = fingerprint("the quick brown fox jumps over the lazy dog " * 5)
    c = fingerprint("a completely different document about other things " * 5)
    assert a == b != c
    assert isinstance(a, int)
    assert fingerprint("") == fingerprint("")
    assert fingerprint("x") != fingerprint("y")
