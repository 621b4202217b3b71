"""Tokenizer kernel tests.

Scenario shapes mirror the reference's tokenizer pytest suites
(/root/reference/test/python/tokenizer/test_icu.py,
 token_analysis/test_generic_mutation.py, sanitizers/test_clean_housenumbers.py)
re-targeted at our unicodedata-based pipeline.
"""

import pandas as pd

from nominatim_spark.functions import housenumbers as hn
from nominatim_spark.functions import text


def test_normalize_basics():
    assert text.normalize("Hello World") == "hello world"
    assert text.normalize("Straße") == "strasse"
    assert text.normalize("CAFÉ") == "cafe"
    assert text.normalize("") == ""
    assert text.normalize(None) == ""


def test_normalize_punctuation_to_dash():
    # dash adjacent to space is eaten by the [-:]?space+[-:]? -> ' ' rule
    assert text.normalize("St. Jürgen") == "st jurgen"
    assert text.normalize("a,b") == "a-b"
    assert text.normalize("a, b") == "a b"
    # runs of punctuation collapse to one dash
    assert text.normalize("a...b") == "a-b"


def test_normalize_special_chars():
    assert text.normalize("№5") == "no5"
    assert text.normalize("Nº 5") == "no 5"
    assert text.normalize("1ª avenida") == "1a avenida"


def test_transliterate():
    assert text.transliterate("Jürgen-Weg") == "jurgen weg"
    assert text.transliterate("a:b") == "a b"
    assert text.transliterate("ÅÄÖ") == "aao"
    assert text.transliterate("x   y") == "x y"


def test_transliterate_fold_table():
    """Letters NFKD cannot decompose plus Greek/Cyrillic romanize via the
    pinned fold table (the ':: Latin' / extended-unicode-to-ascii stage,
    icu_tokenizer.yaml:19-28) instead of being dropped."""
    assert text.transliterate("Ærøskøbing") == "aeroskobing"
    assert text.transliterate("Łódź") == "lodz"
    assert text.transliterate("Þórshöfn") == "thorshofn"
    assert text.transliterate("Đakovo") == "dakovo"
    assert text.norm_translit("Straße") == "strasse"
    assert text.transliterate("Αθήνα") == "athina"
    assert text.transliterate("Москва") == "moskva"
    # NFKD decomposes ї -> і + diaeresis before the fold, so the pinned
    # romanization is the base-letter form
    assert text.transliterate("Київ") == "kiiv"
    assert text.transliterate("Београд") == "beograd"


def test_norm_translit_deterministic_and_idempotent():
    samples = ["Rue de l'Église", "Bāyern München e.V.", "  spaced   out  ", "１２３"]
    for s in samples:
        once = text.norm_translit(s)
        assert text.norm_translit(s) == once  # deterministic
        assert text.norm_translit(once) == once  # idempotent on own output


def test_split_words():
    assert text.split_words("Rue de l'Église, Paris") == ["rue", "de", "l", "eglise", "paris"]
    assert text.split_words("Sankt-Jürgen:Straße") == ["sankt", "jurgen", "strasse"]


def test_word_ngrams_never_exceed_max():
    grams = text.word_ngrams(list("abcdefgh"), max_len=3)
    assert max(j - i for i, j, _ in grams) == 3
    assert (0, 3, "a b c") in grams


def test_series_variants_match_scalar():
    s = pd.Series(["Straße", None, "CAFÉ", ""])
    out = text.norm_translit_series(s)
    assert out.tolist() == ["strasse", "", "cafe", ""]


# --- housenumbers (reference: token_analysis/housenumbers.py:39-72) ---

def test_housenumber_digit_fast_path():
    assert hn.canonical_housenumber("123") == "123"


def test_housenumber_optional_space():
    canon = hn.canonical_housenumber("34 B")
    assert canon == "34␣b"
    assert sorted(hn.housenumber_variants(canon)) == ["34 b", "34b"]


def test_housenumber_named_part_untouched():
    canon = hn.canonical_housenumber("Haus 5")
    assert "␣" not in canon  # 'haus' is a 4-letter named part


def test_housenumber_variant_cap():
    # many boundaries -> no markers inserted (cnt > 4)
    canon = hn.canonical_housenumber("1a2b3c4d5e6f")
    assert "␣" not in canon


def test_interpolation_numbers():
    assert hn.interpolation_numbers(2, 8, 2) == [2, 4, 6, 8]
    assert hn.interpolation_numbers(8, 2, 2) == [2, 4, 6, 8]  # reversed way
    assert hn.interpolation_numbers(1, 1, 1) == [1]
    assert hn.interpolation_numbers(1, 10, 3) == [1, 4, 7, 10]


def test_interpolation_contains():
    assert hn.interpolation_contains(4, 2, 8, 2)
    assert not hn.interpolation_contains(5, 2, 8, 2)
    assert hn.interpolation_contains(5, 9, 1, 2)  # reversed, odd
    assert not hn.interpolation_contains(11, 1, 9, 2)  # out of range
