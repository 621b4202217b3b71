"""Result reranking against the original query — the reference's
difflib-based ``rerank_by_query`` (src/nominatim_api/search/
geocoder.py:193-248), opt-in and output-path-only.

The in-plan ranking keeps the JVM normalized-levenshtein stand-in for the
token fuzzy penalty (F4 — a full-candidate ``SequenceMatcher`` pass
measured +11 s per batch); THIS pass restores byte-level difflib parity
where the reference actually applies it: over the final result list.  It
runs as one Arrow-batched pandas UDF over the top-k rows per query
(``geocode_all``'s adaptive-cut output, ≤ max_results each), so its cost
scales with the RESPONSE size, never the candidate volume — the plan
shape that survives 100 TB.

Semantics mirrored line-for-line from the reference:

* query words come from splitting the normalized query on ``[-,: ]+``
  (the reference normalizes phrases in query preprocessing before
  ``query.source`` is read back in ``rerank_by_query``);
* each query word missing from the result's word set costs ``len(word)``
  when no result word reaches ``quick_ratio >= 0.4``, else ``1``;
* the result word set is the normalized localized display line plus the
  country code (``_get_result_rerank_text`` collapses address-row names
  — our ``display_name`` is that same comma-joined, locale-selected
  line, and the split strips the commas);
* country results (``rank_address == 4``) either double the distance
  (no locales) or take ``calculated_importance() * 0.5`` when the query
  is not one of the country's localized names (geocoder.py:246-257);
* results without a display name or with negative importance
  (distance-ordered) are left untouched;
* the final bump is ``distance * 0.3 / sum(len(qword))`` added to the
  penalty (the reference's ``accuracy``).
"""

from __future__ import annotations

import difflib
import re

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType

from nominatim_spark.functions.text import normalize

_SPLIT_RE = re.compile(r"[-,: ]+")


def rerank_delta(qtext: str | None, display_name: str | None,
                 country_code: str | None, rank_address: int | None,
                 importance: float | None, rank_search: int | None,
                 names: dict | None, name_tags: list[str]) -> float:
    """Penalty delta for ONE result row (geocoder.py:213-248 body).

    ``name_tags`` non-empty ⇔ the caller passed locales (the reference's
    ``self.params.locales`` truthiness).
    """
    qwords = [w for w in _SPLIT_RE.split(normalize(qtext or "")) if w]
    if not qwords:
        return 0.0
    if not display_name or (importance is not None and importance < 0):
        return 0.0
    norm = normalize(" ".join((display_name, country_code or "")))
    words = set(w for w in _SPLIT_RE.split(norm) if w)
    if not words:
        return 0.0
    distance = 0.0
    for qword in qwords:
        if qword not in words:
            wdist = max(difflib.SequenceMatcher(a=qword, b=w).quick_ratio()
                        for w in words)
            distance += len(qword) if wdist < 0.4 else 1
    extra = 0.0
    if rank_address == 4:
        if name_tags and names:
            country_names = {normalize(names[t]) for t in name_tags
                             if names.get(t)}
            if country_code:
                country_names.add(country_code)
            if " ".join(qwords) not in country_names:
                imp = importance or (0.40001 - (rank_search or 30) / 75.0)
                extra = imp * 0.5
        else:
            distance *= 2
    return extra + distance * 0.3 / sum(len(w) for w in qwords)


def rerank_by_query(spark, idx, results: DataFrame, queries: DataFrame, *,
                    locales=None, addressline: DataFrame | None = None,
                    text_col: str = "qtext") -> DataFrame:
    """Add the difflib match penalty to final result rows and re-rank.

    ``results``: output of :func:`~nominatim_spark.pipeline.search.
    geocode_all` (needs query_id, place_id, penalty; re-numbers
    ``result_rank`` when present).  ``queries``: the original
    (query_id, qtext) batch.  ``addressline``: reuse a prebuilt
    addressline table; built on demand otherwise (semi-joined to the
    result ids first — the display join only ever touches response
    rows).
    """
    from nominatim_spark.pipeline.addressline import (
        address_details, build_place_addressline)
    from nominatim_spark.pipeline.localization import DEFAULT_LOCALES

    loc = locales or DEFAULT_LOCALES
    name_tags = list(loc.name_tags) if (locales and bool(loc)) else []

    out = results.join(
        F.broadcast(queries.select("query_id",
                                   F.col(text_col).alias("_rr_qtext"))),
        "query_id", "left")

    ids = results.select("place_id").distinct()
    if "display_name" in results.columns:
        disp_col = F.col("display_name")
        aux = idx.placex.join(ids, "place_id", "left_semi").select(
            "place_id", F.col("country_code").alias("_rr_cc"),
            F.col("name").alias("_rr_names"))
        out = out.join(aux, "place_id", "left")
    else:
        if addressline is None:
            addressline = build_place_addressline(spark, idx.placex)
        addressline = addressline.join(ids, "place_id", "left_semi")
        disp = address_details(idx.placex, addressline, locales=loc) \
            .withColumnRenamed("display_name", "_rr_disp")
        aux = idx.placex.join(ids, "place_id", "left_semi").select(
            "place_id", F.col("country_code").alias("_rr_cc"),
            F.col("name").alias("_rr_names"))
        out = out.join(disp, "place_id", "left").join(aux, "place_id", "left")
        disp_col = F.col("_rr_disp")

    @F.pandas_udf(DoubleType())
    def _delta(qt: pd.Series, dn: pd.Series, cc: pd.Series, ra: pd.Series,
               imp: pd.Series, rs: pd.Series, nm: pd.Series) -> pd.Series:
        return pd.Series([
            rerank_delta(
                qt.iat[i], dn.iat[i], cc.iat[i],
                None if pd.isna(ra.iat[i]) else int(ra.iat[i]),
                None if pd.isna(imp.iat[i]) else float(imp.iat[i]),
                None if pd.isna(rs.iat[i]) else int(rs.iat[i]),
                nm.iat[i], name_tags)
            for i in range(len(qt))
        ], dtype="float64")

    _delta = _delta.asNondeterministic()  # block arg-tree inlining (see PLANS)

    out = out.withColumn(
        "penalty",
        F.col("penalty") + _delta(
            F.col("_rr_qtext"), disp_col, F.col("_rr_cc"),
            F.col("rank_address").cast("double"), F.col("importance"),
            F.col("rank_search").cast("double"), F.col("_rr_names")),
    ).drop("_rr_qtext", "_rr_cc", "_rr_names", "_rr_disp")

    if "result_rank" in results.columns:
        worder = Window.partitionBy("query_id").orderBy(
            "penalty", "text_dist", F.col("importance").desc(), "place_id")
        out = out.withColumn("result_rank", F.row_number().over(worder))
    return out
