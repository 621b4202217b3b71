"""Result localization — the reference's ``Locales`` name selection
(/root/reference/src/nominatim_api/localization.py:16-120) as column
expressions.

The reference keeps a priority list of name tags derived from the
caller's accept-language list and the OUTPUT_NAMES config
(``name:XX,name`` by default → ``name:lang``/``_place_name:lang`` per
language, then ``name``/``_place_name``), and ``display_name`` picks the
first tag present in a result's name map, falling back to the map's
first value.  Here the pick is one JVM ``coalesce`` over map lookups —
no Python in the row path — and the same ``Locales`` object threads
through search / reverse / lookup / details display assembly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_LANG_RE = re.compile(
    r"\s*([a-z_-]+)(?:;\s*q\s*=\s*([01](?:\.\d+)?))?\s*", re.I)


class Locales:
    """Priority list of name tags (localization.py:16-49)."""

    def __init__(self, langs: list[str] | None = None,
                 names: str = "name:XX,name") -> None:
        self.languages = list(langs or [])
        self.name_tags: list[str] = []
        for part in (names.split(",") if names else []):
            part = part.strip()
            if part.endswith(":XX"):
                base = part[:-3]
                for lang in self.languages:
                    self.name_tags.append(f"{base}:{lang}")
                    self.name_tags.append(f"_place_{base}:{lang}")
            else:
                self.name_tags.append(part)
                self.name_tags.append(f"_place_{part}")

    def __bool__(self) -> bool:
        return len(self.languages) > 0

    @staticmethod
    def from_accept_languages(langstr: str,
                              names: str = "name:XX,name") -> "Locales":
        """HTTP accept-language header -> Locales
        (localization.py:67-99: forgiving parse, q-weight sort preserving
        order, region variants also add the bare language)."""
        candidates = []
        for desc in langstr.split(","):
            m = _LANG_RE.fullmatch(desc)
            if m:
                candidates.append((m[1], float(m[2] or 1.0)))
        candidates.sort(reverse=True, key=lambda e: e[1])
        languages = []
        for lid, _ in candidates:
            languages.append(lid)
            parts = lid.split("-", 1)
            if len(parts) > 1 and all(c[0] != parts[0] for c in candidates):
                languages.append(parts[0])
        return Locales(languages, names)

    def display_name_expr(self, name_col: Column | str) -> Column:
        """Best matching name from a map<string,string> column — the
        reference's ``display_name`` (localization.py:50-65): first
        name_tag present, else the map's first value.  (When the map has
        exactly one entry the coalesce returns the same single value the
        reference's early-exit does, tag match or not.)"""
        col = F.col(name_col) if isinstance(name_col, str) else name_col
        picks = [col.getItem(tag) for tag in self.name_tags]
        picks.append(F.element_at(F.map_values(col), 1))
        return F.when(col.isNotNull() & (F.size(F.map_keys(col)) > 0),
                      F.coalesce(*picks))


DEFAULT_LOCALES = Locales()


def localize_results(results, placex, locales: Locales | None = None,
                     out_col: str = "locale_name"):
    """Attach ``locale_name`` — the localized display name — to result
    rows carrying ``place_id`` (the reference's ``localize_results``,
    localization.py:113-120, applied to every API result).  One left
    join against the place-name map; the pick itself is JVM-side."""
    loc = locales or DEFAULT_LOCALES
    names = placex.select(
        "place_id", loc.display_name_expr("name").alias(out_col))
    return results.join(names, "place_id", "left")
