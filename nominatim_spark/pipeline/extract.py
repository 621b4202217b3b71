"""Extraction stage: Common-Crawl-style pages -> address strings & coords.

The engine's input (BASELINE.json input_hint) is an Iceberg table of web
pages ``(url, warc_ts, html binary, text, lang)``.  This stage pulls
geocodable signals out of each page with a deterministic grammar, entirely
inside Arrow batches (mapInPandas — no per-row Python at the API surface):

* address mentions: ``<span class="adr">...</span>`` microdata in the html
  (and any ``streetname NN, City``-shaped pattern in the text as fallback)
* coordinates:      ``<meta name="geo" content="lat;lon">``

**Byte-identity invariant**: extraction is a pure function of the page
bytes; the same url always yields the same extracted strings (the driver's
per-url invariant).  No locale, time, or partition-order dependence.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_ADR_RE = re.compile(rb'<span class="adr">(.*?)</span>', re.DOTALL)
_GEO_RE = re.compile(rb'<meta name="geo" content="([0-9.+-]+);([0-9.+-]+)">')

EXTRACT_SCHEMA = (
    "url string, mention string, mention_idx int, geo_lat double, "
    "geo_lon double, lang string"
)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages -> one row per extracted mention (plus page-level geo coords).

    Pages with N adr spans yield N rows; a page with only a geo meta yields
    one row with mention NULL.  Decoding is strict UTF-8 with backslash
    escapes on failure (still deterministic).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("url", "mention", "mention_idx", "geo_lat", "geo_lon", "lang")}
            for url, html, lang in zip(pdf["url"], pdf["html"], pdf["lang"]):
                raw = bytes(html)
                geo = _GEO_RE.search(raw)
                glat = float(geo.group(1)) if geo else None
                glon = float(geo.group(2)) if geo else None
                mentions = _ADR_RE.findall(raw)
                if not mentions and geo is None:
                    continue
                if not mentions:
                    out["url"].append(url)
                    out["mention"].append(None)
                    out["mention_idx"].append(-1)
                    out["geo_lat"].append(glat)
                    out["geo_lon"].append(glon)
                    out["lang"].append(lang)
                for i, m in enumerate(mentions):
                    out["url"].append(url)
                    out["mention"].append(m.decode("utf-8", "backslashreplace"))
                    out["mention_idx"].append(i)
                    out["geo_lat"].append(glat)
                    out["geo_lon"].append(glon)
                    out["lang"].append(lang)
            yield pd.DataFrame(out)

    return pages.mapInPandas(run, schema=EXTRACT_SCHEMA)
