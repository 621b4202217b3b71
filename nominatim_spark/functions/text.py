"""Text normalization & transliteration — the engine's tokenizer kernel.

Re-creates the *semantics* of the reference's ICU pipeline
(/root/reference/settings/icu_tokenizer.yaml:1-28, applied in
src/nominatim_api/search/icu_tokenizer.py:198-203 and
src/nominatim_db/tokenizer/icu_tokenizer.py:325-334) without PyICU (not in
this container): two deterministic stages built on ``unicodedata``.

* :func:`normalize` — the "normalization" ruleset: lowercase, unicode digits
  to decimal, '№/n°/nº' -> 'no', ª/º -> a/o, punctuation+symbols (except
  ``-`` and ``:``) -> '-', ß -> ss, strip everything that is not
  alnum/space/-/:, strip combining marks & format chars, collapse
  ``[-:]?space+[-:]?`` to a single space.
* :func:`transliterate` — the "transliteration" ruleset: ``-``/``:`` ->
  space, latin-fold via NFKD + combining-mark strip, lowercase, drop
  non-[a-z0-9 ], collapse spaces.

The function pair is **pure and versioned**: given the same input string the
output is byte-identical across runs/executors (the per-url byte-identity
invariant required of the extraction stage rides on this).  Differences vs
real ICU (e.g. no Hans->Hant conversion, no full Latin transliteration of
non-Latin scripts — such text is dropped by the ascii filter instead) are
acceptable because this engine defines its own dictionary with the SAME
functions applied on both the index side and the query side.

All entry points also have pandas-Series variants used inside Arrow batches.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

_PRE_RE = re.compile("[№]|n[°º]")
_PUNCT_DASH_RE = None  # built lazily over unicode categories


def _is_punct_or_symbol(ch: str) -> bool:
    cat = unicodedata.category(ch)
    return cat[0] in ("P", "S") or ch == "\u02bc"


_SPACE_COLLAPSE_RE = re.compile(r"[-:]?[\s]+[-:]?")
_NORM_KEEP_RE = re.compile(r"[^0-9a-z\u00df\s:\-\u0300-\u036f\w]", re.UNICODE)
_TRANS_DROP_RE = re.compile(r"[^a-z0-9 ]")
_MULTISPACE_RE = re.compile(r"\s+")


def _fold_digits(s: str) -> str:
    out = []
    for ch in s:
        if ch.isdigit():
            d = unicodedata.digit(ch, None)
            out.append(str(d) if d is not None else ch)
        else:
            out.append(ch)
    return "".join(out)


def normalize(s: str) -> str:
    """Normalization stage (icu_tokenizer.yaml:1-18 semantics)."""
    if s is None:
        return ""
    s = s.lower()
    s = _fold_digits(s)
    s = s.replace("№", "no").replace("n°", "no").replace("nº", "no")
    s = s.replace("ª", "a").replace("º", "o")
    # punctuation/symbols except - and : -> '-' (runs collapse to one)
    out = []
    prev_dash = False
    for ch in s:
        if ch in "-:":
            out.append(ch)
            prev_dash = False
        elif _is_punct_or_symbol(ch):
            if not prev_dash:
                out.append("-")
                prev_dash = True
        else:
            out.append(ch)
            prev_dash = False
    s = "".join(out)
    s = s.replace("ß", "ss")
    # keep alnum, space, -, :; drop the rest (incl. Lm); strip marks via NFKD
    s = unicodedata.normalize("NFKD", s)
    s = "".join(
        ch for ch in s
        if not unicodedata.combining(ch)
        and unicodedata.category(ch) not in ("Cf", "Lm")
        and (ch.isalnum() or ch.isspace() or ch in "-:")
    )
    s = s.lower()  # NFKD can reintroduce uppercase (ligatures)
    # [-:]?space+[-:]? -> ' '
    s = _SPACE_COLLAPSE_RE.sub(" ", s)
    return s.strip()


# Pinned Latin-fold table for letters NFKD cannot decompose plus Greek
# and Cyrillic romanization — the ':: Latin' + extended-unicode-to-ascii
# stage of the reference's transliteration ruleset
# (settings/icu_tokenizer.yaml:19-28, settings/icu-rules/
# extended-unicode-to-asccii.yaml).  A deliberately compact re-expression:
# the long tail of the reference's 4900-entry table (IPA, historic
# letters) is dropped-by-filter here, while the letters that actually
# appear in place names round-trip.  Pinned = the engine's dictionary is
# versioned on this exact table; both index and query sides share it.
_FOLD_TABLE = {
    "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d", "þ": "th",
    "ħ": "h", "ł": "l", "ŋ": "n", "ĸ": "k", "ſ": "s", "ı": "i",
    "ƒ": "f", "ȷ": "j",
    # Greek (ICU Greek-Latin semantics, modern values)
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "i", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
    "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
    "ς": "s", "τ": "t", "υ": "y", "φ": "f", "χ": "ch", "ψ": "ps",
    "ω": "o",
    # Cyrillic (pinned romanization)
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ё": "e", "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "у": "u", "ф": "f", "х": "h", "ц": "ts",
    "ч": "ch", "ш": "sh", "щ": "shch", "ъ": "", "ы": "y", "ь": "",
    "э": "e", "ю": "yu", "я": "ya",
    # Ukrainian / Serbian extras
    "і": "i", "ї": "yi", "є": "ye", "ґ": "g", "ђ": "dj", "ј": "j",
    "љ": "lj", "њ": "nj", "ћ": "c", "џ": "dz",
}


def transliterate(s: str) -> str:
    """Transliteration stage (icu_tokenizer.yaml:19-28 semantics)."""
    if s is None:
        return ""
    s = s.replace("-", " ").replace(":", " ")
    s = unicodedata.normalize("NFKD", s)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = s.lower().replace("ß", "ss")
    s = "".join(_FOLD_TABLE.get(ch, ch) for ch in s)
    s = _TRANS_DROP_RE.sub("", s)
    s = _MULTISPACE_RE.sub(" ", s)
    return s.strip()


def norm_translit(s: str) -> str:
    """normalize -> transliterate, the full index/query-side term pipeline."""
    return transliterate(normalize(s))


def split_words(s: str) -> list[str]:
    """Split a normalized string into terms.

    The reference splits on space after transliteration
    (src/nominatim_api/search/icu_tokenizer.py:233-252 splits on ``[ :-]``
    pre-transliteration; post-transliteration only spaces remain).
    """
    s = norm_translit(s)
    return [w for w in s.split(" ") if w]


def word_ngrams(words: list[str], max_len: int = 20) -> list[tuple[int, int, str]]:
    """All multi-word substrings up to ``max_len`` terms.

    Mirrors query.py:399-424 (never across a phrase break — callers split
    phrases first). Returns (start, end_exclusive, joined) triples.
    """
    out = []
    n = len(words)
    for i in range(n):
        for j in range(i + 1, min(i + 1 + max_len, n + 1)):
            out.append((i, j, " ".join(words[i:j])))
    return out


# ---- pandas variants (Arrow-batch entry points) ----

def normalize_series(s: pd.Series) -> pd.Series:
    return s.map(lambda v: normalize(v) if isinstance(v, str) else "")


def transliterate_series(s: pd.Series) -> pd.Series:
    return s.map(lambda v: transliterate(v) if isinstance(v, str) else "")


def norm_translit_series(s: pd.Series) -> pd.Series:
    return s.map(lambda v: norm_translit(v) if isinstance(v, str) else "")
