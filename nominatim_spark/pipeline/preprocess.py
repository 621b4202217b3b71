"""Query preprocessing — per-phrase text rewrites applied before token
assignment (the reference's query_preprocessing plugin chain,
/root/reference/src/nominatim_api/query_preprocessing/*).

Each preprocessor is a plain ``str -> str`` callable over ONE query
string; ``compile_chain`` turns a config list (the reference's
``query-preprocessing:`` yaml semantics) into a single callable that
``parse_queries`` maps over the batch inside its Arrow stage — per-query
Python, but already inside the existing mapInPandas boundary, so no new
serialization point.

Built-ins:

* ``regex_replace`` (query_preprocessing/regex_replace.py:24-50) —
  ordered ``(pattern, replace)`` rules;
* ``split_japanese_phrases``
  (query_preprocessing/split_japanese_phrases.py:18-60) — undelimited
  Japanese addresses split at prefecture/municipality suffix characters.
  The reference joins the parts with ':' break markers; the batch engine
  inserts spaces so the standard forward/backward split enumeration sees
  separate tokens — same downstream effect.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

_JP_PATTERNS = [
    # prefecture + municipality + rest
    re.compile(r"^(...??[都道府県縣])(.+?[市区區町村])(.+)$"),
    # prefecture + rest
    re.compile(r"^(...??[都道府県縣])(.+)$"),
    # municipality + rest
    re.compile(r"^(.+?[市区區町村])(.+)$"),
]


def split_japanese_phrases(text: str) -> str:
    for pat in _JP_PATTERNS:
        m = pat.match(text)
        if m is not None:
            return " ".join(m.groups())
    return text


def regex_replace(replacements: Iterable[dict | tuple]) -> Callable[[str], str]:
    """Build the ordered-rules preprocessor.  ``replacements`` entries are
    ``{"pattern": ..., "replace": ...}`` dicts (reference config shape) or
    ``(pattern, replace)`` tuples."""
    compiled = []
    for item in replacements:
        if isinstance(item, dict):
            compiled.append((re.compile(item["pattern"]), item["replace"]))
        else:
            compiled.append((re.compile(item[0]), item[1]))

    def run(text: str) -> str:
        for pat, repl in compiled:
            text = pat.sub(repl, text).strip()
        return text

    return run


PREPROCESSORS: dict[str, Callable] = {
    "split-japanese-phrases": lambda: split_japanese_phrases,
    "regex-replace": regex_replace,
}

DEFAULT_CHAIN: list = ["split-japanese-phrases"]


def compile_chain(chain: list | None = None) -> Callable[[str], str]:
    """Config list -> one ``str -> str`` callable.  Entries are a
    preprocessor name, a ``{"step": name, **kwargs}`` dict, or a bare
    callable."""
    steps: list[Callable[[str], str]] = []
    for entry in (chain if chain is not None else DEFAULT_CHAIN):
        if callable(entry):
            steps.append(entry)
        elif isinstance(entry, str):
            steps.append(PREPROCESSORS[entry]())
        else:
            kw = {k.replace("-", "_"): v
                  for k, v in entry.items() if k != "step"}
            steps.append(PREPROCESSORS[entry["step"]](**kw))

    def run(text: str) -> str:
        for step in steps:
            text = step(text)
        return text

    return run
