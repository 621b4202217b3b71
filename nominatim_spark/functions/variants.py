"""Name-variant expansion (abbreviations + mutations).

Re-expresses the reference's generic token analysis
(/root/reference/src/nominatim_db/tokenizer/token_analysis/generic.py:58-143,
config_variants.py, generic_mutation.py) for the batch engine:

* replacement rules  — ``"street -> st"`` adds the abbreviated variant and
  keeps the original; ``"street => st"`` replaces it.  Sources may list
  alternatives (``"avenue,av -> ave"``).  Matching is word-boundary
  longest-match over the normalized name (the reference walks a trie over
  ``'^ name ^'``; here one alternation regex sorted longest-first gives the
  same longest-prefix choice for word-level rules).
* mutations          — a regex pattern whose every occurrence is replaced
  by each of a set of alternatives, all combinations
  (generic_mutation.py:40-57): e.g. ``ae`` ↔ ``ä``.
* the variant set is capped at 128 (generic.py:121-126) — beyond that only
  the original form is kept.

The index side expands names into variants; queries stay single-form and
match because their spelling is one of the indexed variants.

Everything here is plain Python called from Arrow-batched pandas UDFs —
the per-name work is dictionary-sized and the rule table is a module
constant (broadcast implicitly with the task closure).
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass

MAX_VARIANTS = 128


@dataclass(frozen=True)
class CompiledRules:
    pattern: re.Pattern | None           # word alternation, longest-first
    repl: dict[str, tuple[str, ...]]     # source word -> variant words
    mutations: tuple[tuple[re.Pattern, tuple[str, ...]], ...]


def compile_rules(rules: list[str],
                  mutations: list[tuple[str, list[str]]] | None = None
                  ) -> CompiledRules:
    """Compile ``"src1,src2 -> repl1,repl2"`` rule strings.

    ``->`` keeps the source as a variant; ``=>`` replaces it.
    """
    repl: dict[str, set[str]] = {}
    # reverse entries are collected per target and only merged when every
    # rule that produced the target agrees on a common source: a target
    # shared by rules with DISJOINT sources ("street -> st" and
    # "saint -> st") must NOT become transitive ("birch st" expanding to
    # "birch saint") — the reference's explicit per-direction config rules
    # never produce that, so an ambiguous abbreviation simply keeps its
    # own spelling.  Agreement is judged on source SETS, not rule
    # instances, so the same word rule appearing in both the default and
    # a language table ("avenue -> ave" + "avenue -> av,ave") still
    # expands ("birch ave" -> "birch avenue").
    rev: dict[str, set[str]] = {}
    rev_sources: dict[str, list[set[str]]] = {}
    suffix_muts: list[tuple[re.Pattern, tuple[str, ...]]] = []
    for rule in rules:
        m = re.split(r"\s*\|?([=-])>\s*", rule)
        if len(m) != 3:
            raise ValueError(f"bad variant rule: {rule!r}")
        sources = [s.strip() for s in m[0].split(",") if s.strip()]
        targets = [t.strip() for t in m[2].split(",") if t.strip()]
        keep = m[1] == "-"
        # '~suffix' rules (the reference's decomposed word-part rules,
        # config_variants.py:106-117): the term also abbreviates when
        # glued to a preceding word ('rosengasse' -> 'roseng').
        # Compiled into the mutation machinery: replace the suffix at a
        # word end after at least one letter.
        sfx = [s[1:] for s in sources if s.startswith("~")]
        sources = [s for s in sources if not s.startswith("~")]
        for s in sfx:
            alts = tuple([s] + targets) if keep else tuple(targets)
            suffix_muts.append((
                re.compile(rf"(?<=[a-z]){re.escape(s)}(?= |$)"), alts,
            ))
        for s in sources:
            out = repl.setdefault(s, set())
            out.update(targets)
            if keep:
                out.add(s)
        # make the rule symmetric-searchable: an abbreviated name in
        # the data must also index its expansions ("st" data, "street"
        # query) — the reference achieves this with reverse rules in
        # the config; the engine defaults generate both directions
        for t in targets:
            rout = rev.setdefault(t, set())
            rout.add(t)
            rout.update(sources)
            rout.update(targets)
            if sources:
                rev_sources.setdefault(t, []).append(set(sources))
    for t, rout in rev.items():
        srcs = rev_sources.get(t, [])
        if srcs and set.intersection(*srcs):
            repl.setdefault(t, set()).update(rout)
    pattern = None
    if repl:
        words = sorted(repl, key=len, reverse=True)
        pattern = re.compile(
            r"(?<![^ ])(" + "|".join(re.escape(w) for w in words) + r")(?![^ ])"
        )
    muts = tuple(suffix_muts) + tuple(
        (re.compile(p), tuple(alts)) for p, alts in (mutations or [])
    )
    return CompiledRules(pattern=pattern, repl={
        k: tuple(sorted(v)) for k, v in repl.items()
    }, mutations=muts)


def compute_variants(norm_name: str, rules: CompiledRules) -> list[str]:
    """All spelling variants of a normalized name (original included).

    Port of GenericTokenAnalysis.compute_variants/_generate_word_variants
    semantics: left-to-right replacement with the variant product, the
    128 cap, then mutation products.
    """
    variants = [norm_name]
    if rules.pattern is not None and norm_name:
        parts = rules.pattern.split(norm_name)
        # parts alternate literal, match, literal, match, ...
        if len(parts) > 1:
            choices: list[tuple[str, ...]] = []
            total = 1
            for i, part in enumerate(parts):
                if i % 2 == 1:
                    alts = rules.repl.get(part, (part,))
                    total *= len(alts)
                    choices.append(alts)
                else:
                    choices.append((part,))
                if total > MAX_VARIANTS:
                    choices = None  # type: ignore[assignment]
                    break
            if choices is not None:
                variants = ["".join(c) for c in itertools.product(*choices)]

    for pat, alts in rules.mutations:
        out: list[str] = []
        for name in variants:
            parts = pat.split(name)
            if len(parts) == 1:
                out.append(name)
                continue
            for seps in itertools.product(alts, repeat=len(parts) - 1):
                merged = parts[0]
                for sep, nxt in zip(seps, parts[1:]):
                    merged += sep + nxt
                out.append(merged)
            if len(out) > MAX_VARIANTS:
                out = [name]
                break
        variants = out

    seen: dict[str, None] = {}
    for v in variants:
        v = v.strip()
        if v:
            seen.setdefault(v, None)
    if norm_name and norm_name not in seen:
        seen[norm_name] = None
    return list(seen)[:MAX_VARIANTS]


# Engine default rule set — the common street/direction abbreviations from
# the reference's per-language variant configs (settings/icu-rules and
# country configs model; the table itself is standard public postal
# abbreviation data).
DEFAULT_RULES = [
    "street -> st",
    "avenue -> ave",
    "road -> rd",
    "lane -> ln",
    "boulevard -> blvd",
    "drive -> dr",
    "court -> ct",
    "place -> pl",
    "square -> sq",
    "north -> n",
    "south -> s",
    "east -> e",
    "west -> w",
    "saint -> st",
]

DEFAULT_MUTATIONS: list[tuple[str, list[str]]] = [
    ("ae", ["ae", "a"]),
    ("oe", ["oe", "o"]),
    ("ue", ["ue", "u"]),
]

DEFAULT_COMPILED = compile_rules(DEFAULT_RULES, DEFAULT_MUTATIONS)


def variants_default(norm_name: str) -> list[str]:
    return compute_variants(norm_name, DEFAULT_COMPILED)


# Per-language variant rule sets — compact engine tables modeled on the
# reference's per-language trees (settings/icu-rules/variants-{de,en,fr,
# ...}.yaml selected by the token-analysis config,
# settings/icu_tokenizer.yaml:29-185).  Forms are post-transliteration
# ascii because the engine expands variants AFTER norm_translit.  '~'
# marks word-part suffix rules (config_variants.py decomposition).
LANG_RULES: dict[str, list[str]] = {
    "en": [
        "alley -> al,ally,aly", "arcade -> arc", "avenue -> av,ave",
        "boulevard -> blvd,bvd", "building -> bldg",
        "center,centre -> ctr", "circle -> cir", "close -> cl",
        "court -> ct", "crescent -> cres", "drive -> dr",
        "esplanade -> esp", "expressway -> expy", "freeway -> fwy",
        "garden -> gdn", "gardens -> gdns", "grove -> gr",
        "highway -> hwy", "lane -> la,ln", "mount -> mt",
        "mountain -> mtn", "parade -> pde", "parkway -> pkwy",
        "place -> pl", "plaza -> plz", "road -> rd", "square -> sq",
        "street -> st", "terrace -> ter,tce", "way -> wy",
        "fort -> ft", "saint -> st",
    ],
    "de": [
        "strasse,~strasse -> str", "gasse,~gasse -> g",
        "platz,~platz -> pl", "weg,~weg -> w",
        "bahnhof -> bhf,bf", "hauptbahnhof -> hbf",
        "doktor -> dr", "professor -> prof", "sankt -> st",
        "bruecke,~bruecke -> br", "berg,~berg -> bg",
        "burg,~burg -> bg", "dorf,~dorf -> df",
    ],
    "fr": [
        "avenue -> av", "boulevard -> bd", "chemin -> che",
        "allee -> all", "impasse -> imp", "place -> pl",
        "route -> rte", "rue -> r", "ruelle -> rle", "saint -> st",
        "sainte -> ste", "passage -> pas",
    ],
    "es": [
        "avenida -> av,avda", "calle -> c,cl", "callejon -> cjon",
        "camino -> cno", "carretera -> ctra", "plaza -> pza",
        "paseo -> po", "urbanizacion -> urb", "santa -> sta",
    ],
    "nl": [
        "straat,~straat -> str", "laan,~laan -> ln", "plein -> pln",
        "sint -> st",
    ],
    "it": [
        "viale -> vle", "piazza -> pza,pzza", "corso -> cso",
        "largo -> lgo", "vicolo -> vlo", "santa -> sta",
    ],
    "sv": [
        "gatan,~gatan -> g", "vaegen,~vaegen -> v", "gata -> g",
    ],
    "ru": [
        "ulitsa -> ul", "prospekt -> pr,prosp", "pereulok -> per",
        "ploshchad -> pl", "shosse -> sh", "naberezhnaya -> nab",
    ],
}

# country default language (the reference's tag-analyzer-by-language
# use-defaults country table, sanitizers/tag_analyzer_by_language.py)
COUNTRY_LANG: dict[str, str] = {
    "cv": "en", "gb": "en", "us": "en", "au": "en", "nz": "en",
    "ie": "en", "ca": "en",
    "de": "de", "at": "de", "ch": "de",
    "fr": "fr",
    "es": "es", "mx": "es", "ar": "es",
    "nl": "nl", "be": "nl",
    "it": "it",
    "se": "sv",
    "ru": "ru",
}

_LANG_COMPILED: dict[str | None, CompiledRules] = {None: DEFAULT_COMPILED}


def compiled_for(lang: str | None) -> CompiledRules:
    """Default rules plus the language's table, compiled once per lang."""
    if lang not in _LANG_COMPILED:
        extra = LANG_RULES.get(lang)
        _LANG_COMPILED[lang] = (
            DEFAULT_COMPILED if extra is None
            else compile_rules(DEFAULT_RULES + extra, DEFAULT_MUTATIONS)
        )
    return _LANG_COMPILED[lang]


def variants_for(norm_name: str, lang: str | None) -> list[str]:
    return compute_variants(norm_name, compiled_for(lang))
