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


# Chinese place-name characters -> Mandarin pinyin, with the traditional
# form where it differs — the ':: Hans-Hant' normalization rule +
# ':: Latin' Han transliteration of the reference's ICU chain
# (settings/icu_tokenizer.yaml:3,19-21) re-expressed as a pinned compact
# table of the characters that actually appear in Chinese geography
# (standard public Hanyu-Pinyin readings; both index and query sides
# share the table, so the engine's dictionary round-trips).  The
# reference folds Hans->Hant then romanizes; the engine folds Hant->Hans
# then romanizes — equivalent for matching.
_HAN_PINYIN: list[tuple[str, str, str]] = [
    # (simplified, pinyin, traditional-if-different)
    ("北", "bei", ""), ("京", "jing", ""), ("上", "shang", ""),
    ("海", "hai", ""), ("天", "tian", ""), ("津", "jin", ""),
    ("重", "chong", ""), ("庆", "qing", "慶"), ("广", "guang", "廣"),
    ("州", "zhou", ""), ("深", "shen", ""), ("圳", "zhen", ""),
    ("香", "xiang", ""), ("港", "gang", ""), ("澳", "ao", ""),
    ("台", "tai", "臺"), ("湾", "wan", "灣"), ("西", "xi", ""),
    ("安", "an", ""), ("南", "nan", ""), ("东", "dong", "東"),
    ("武", "wu", ""), ("汉", "han", "漢"), ("成", "cheng", ""),
    ("都", "du", ""), ("杭", "hang", ""), ("苏", "su", "蘇"),
    ("宁", "ning", "寧"), ("郑", "zheng", "鄭"), ("沈", "shen", "瀋"),
    ("阳", "yang", "陽"), ("青", "qing", ""), ("岛", "dao", "島"),
    ("大", "da", ""), ("连", "lian", "連"), ("厦", "xia", "廈"),
    ("门", "men", "門"), ("福", "fu", ""), ("昆", "kun", ""),
    ("明", "ming", ""), ("贵", "gui", "貴"), ("兰", "lan", "蘭"),
    ("川", "chuan", ""), ("河", "he", ""), ("湖", "hu", ""),
    ("山", "shan", ""), ("江", "jiang", ""), ("省", "sheng", ""),
    ("市", "shi", ""), ("区", "qu", "區"), ("县", "xian", "縣"),
    ("镇", "zhen", "鎮"), ("乡", "xiang", "鄉"), ("村", "cun", ""),
    ("街", "jie", ""), ("道", "dao", ""), ("路", "lu", ""),
    ("巷", "xiang", ""), ("桥", "qiao", "橋"), ("站", "zhan", ""),
    ("口", "kou", ""), ("新", "xin", ""), ("旧", "jiu", "舊"),
    ("老", "lao", ""), ("中", "zhong", ""), ("国", "guo", "國"),
    ("人", "ren", ""), ("民", "min", ""), ("公", "gong", ""),
    ("园", "yuan", "園"), ("场", "chang", "場"), ("学", "xue", "學"),
    ("校", "xiao", ""), ("医", "yi", "醫"), ("院", "yuan", ""),
    ("银", "yin", "銀"), ("行", "hang", ""), ("店", "dian", ""),
    ("饭", "fan", "飯"), ("酒", "jiu", ""), ("楼", "lou", "樓"),
    ("寺", "si", ""), ("庙", "miao", "廟"), ("宫", "gong", "宮"),
    ("塔", "ta", ""), ("城", "cheng", ""), ("堡", "bao", ""),
    ("林", "lin", ""), ("森", "sen", ""), ("花", "hua", ""),
    ("石", "shi", ""), ("金", "jin", ""), ("木", "mu", ""),
    ("水", "shui", ""), ("火", "huo", ""), ("土", "tu", ""),
    ("日", "ri", ""), ("月", "yue", ""), ("星", "xing", ""),
    ("云", "yun", "雲"), ("风", "feng", "風"), ("雨", "yu", ""),
    ("雪", "xue", ""), ("春", "chun", ""), ("秋", "qiu", ""),
    ("冬", "dong", ""), ("夏", "xia", ""),
    ("一", "yi", ""), ("二", "er", ""), ("三", "san", ""),
    ("四", "si", ""), ("五", "wu", ""), ("六", "liu", ""),
    ("七", "qi", ""), ("八", "ba", ""), ("九", "jiu", ""),
    ("十", "shi", ""), ("百", "bai", ""), ("千", "qian", ""),
    ("万", "wan", "萬"),
    ("龙", "long", "龍"), ("凤", "feng", "鳳"), ("马", "ma", "馬"),
    ("牛", "niu", ""), ("虎", "hu", ""), ("鱼", "yu", "魚"),
    ("鸟", "niao", "鳥"), ("长", "chang", "長"), ("高", "gao", ""),
    ("平", "ping", ""), ("和", "he", ""), ("泰", "tai", ""),
    ("康", "kang", ""), ("兴", "xing", "興"), ("隆", "long", ""),
    ("盛", "sheng", ""), ("昌", "chang", ""), ("荣", "rong", "榮"),
    ("华", "hua", "華"), ("富", "fu", ""), ("吉", "ji", ""),
    ("祥", "xiang", ""), ("美", "mei", ""), ("丽", "li", "麗"),
    ("白", "bai", ""), ("黑", "hei", ""), ("红", "hong", "紅"),
    ("黄", "huang", "黃"), ("绿", "lu", "綠"), ("蓝", "lan", "藍"),
    ("清", "qing", ""), ("观", "guan", "觀"), ("阁", "ge", "閣"),
    ("亭", "ting", ""), ("池", "chi", ""), ("泉", "quan", ""),
    ("井", "jing", ""), ("谷", "gu", ""), ("岭", "ling", "嶺"),
    ("峰", "feng", ""), ("湾", "wan", "灣"), ("滩", "tan", "灘"),
    ("洲", "zhou", ""), ("岸", "an", ""), ("坡", "po", ""),
    ("田", "tian", ""), ("塘", "tang", ""), ("坝", "ba", "壩"),
    ("庄", "zhuang", "莊"), ("屯", "tun", ""), ("寨", "zhai", ""),
    ("营", "ying", "營"), ("集", "ji", ""), ("铺", "pu", "鋪"),
    ("头", "tou", "頭"), ("尾", "wei", ""), ("环", "huan", "環"),
    ("济", "ji", "濟"), ("丰", "feng", "豐"), ("顺", "shun", "順"),
    ("德", "de", ""), ("善", "shan", ""), ("义", "yi", "義"),
    ("礼", "li", "禮"), ("信", "xin", ""), ("文", "wen", ""),
    ("化", "hua", ""), ("体", "ti", "體"), ("育", "yu", ""),
    ("馆", "guan", "館"), ("书", "shu", "書"), ("图", "tu", "圖"),
    ("机", "ji", "機"), ("飞", "fei", "飛"), ("车", "che", "車"),
    ("电", "dian", "電"), ("铁", "tie", "鐵"), ("号", "hao", "號"),
]

_EXT_FOLD: dict[str, str] | None = None


def _combined_fold() -> dict[str, str]:
    """Pinned fold table + the full extended unicode-to-ascii tail
    (4,941 entries loaded from the package data file — mapping data from
    the reference's public settings/icu-rules table) + the Han pinyin
    table (traditional forms fold to the same romanization).  Pinned
    entries win on overlap."""
    global _EXT_FOLD
    if _EXT_FOLD is None:
        import os

        table: dict[str, str] = {}
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "data", "translit_extended.tsv")
        try:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    if line.startswith("#"):
                        continue
                    ch, _, out = line.rstrip("\n").partition("\t")
                    if ch:
                        table[ch] = out
        except OSError:
            pass
        for simp, py, trad in _HAN_PINYIN:
            table[simp] = f" {py} "
            if trad:
                table[trad] = f" {py} "
        table.update(_FOLD_TABLE)
        _EXT_FOLD = table
    return _EXT_FOLD


def has_han(s: str) -> bool:
    return any("一" <= ch <= "鿿" for ch in (s or ""))


def transliterate(s: str) -> str:
    """Transliteration stage (icu_tokenizer.yaml:19-28 semantics)."""
    if s is None:
        return ""
    fold = _combined_fold()
    s = s.replace("-", " ").replace(":", " ")
    s = unicodedata.normalize("NFKD", s)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = s.lower().replace("ß", "ss")
    s = "".join(fold.get(ch, ch) for ch in s)
    s = s.lower()
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
