"""Housenumber canonicalization & variant generation.

Re-creates the semantics of the reference's housenumber token analyzer
(/root/reference/src/nominatim_db/tokenizer/token_analysis/housenumbers.py:39-72
and generic_mutation.py MutationVariantGenerator): digit/alpha boundaries get
an *optional-space* marker ``␣`` which then expands into both the spaced and
unspaced spelling variants, capped to avoid combinatorial blowup.

Also the interpolation arithmetic helpers (odd/even/step housenumber
expansion — /root/reference/lib-sql/functions/interpolation.sql:196-374):
given ``(startnumber, endnumber, step)``, valid housenumbers are
``start, start+step, ..., end`` with ``(n - start) % step == 0``.
"""

from __future__ import annotations

import itertools
import re

from nominatim_spark.functions.text import normalize, transliterate

OPT_SPACE = "␣"  # ␣ optional-space marker (same as the reference)

RE_NON_DIGIT = re.compile(r"[^0-9]")
RE_DIGIT_ALPHA = re.compile(r"(\d)\s*([^\d\s␣])")
RE_ALPHA_DIGIT = re.compile(r"([^\s\d␣])(\s*)(\d)")
RE_NAMED_PART = re.compile(r"[a-z]{4}")


def canonical_housenumber(hnr: str) -> str:
    """Normalized canonical form with optional-space markers.

    Pure-digit numbers pass through untouched (the 90% fast path the
    reference takes); otherwise normalize+transliterate, and if there is no
    significant named part (4+ letters), insert ``␣`` at up to 4
    digit<->alpha boundaries.
    """
    if RE_NON_DIGIT.search(hnr) is None:
        return hnr
    norm = transliterate(normalize(hnr))
    if RE_NAMED_PART.search(norm) is None:
        out, cnt1 = RE_DIGIT_ALPHA.subn("\\1" + OPT_SPACE + "\\2", norm)
        out, cnt2 = re.subn(r"([^\s\d␣])\s*(\d)", "\\1" + OPT_SPACE + "\\2", out)
        if cnt1 + cnt2 <= 4:
            return out
    return norm


def housenumber_variants(canonical: str) -> list[str]:
    """Expand ``␣`` markers into all space/no-space spellings.

    MutationVariantGenerator('␣', (' ', '')) semantics: split on the marker,
    rejoin with every combination of ' ' and ''.
    """
    parts = canonical.split(OPT_SPACE)
    if len(parts) == 1:
        return [canonical]
    variants = []
    for seps in itertools.product((" ", ""), repeat=len(parts) - 1):
        pieces = [parts[0]]
        for sep, part in zip(seps, parts[1:]):
            pieces.append(sep)
            pieces.append(part)
        variants.append("".join(pieces))
    return variants


def interpolation_numbers(start: int, end: int, step: int) -> list[int]:
    """Housenumbers on an interpolation way (interpolation.sql:196-374).

    Inclusive of both endpoints when aligned; step >= 1.
    """
    if step <= 0:
        raise ValueError("step must be positive")
    lo, hi = (start, end) if start <= end else (end, start)
    return list(range(lo, hi + 1, step))


def interpolation_contains(n: int, start: int, end: int, step: int) -> bool:
    """Range + step-mod predicate used by the housenumber expansion join
    (address_search.py:49-67): ``n BETWEEN start AND end AND
    (n - start) % step == 0`` (after orienting start <= end)."""
    lo, hi = (start, end) if start <= end else (end, start)
    return lo <= n <= hi and (n - lo) % step == 0
