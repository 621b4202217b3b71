"""Result sinks / output formatters (SURVEY §2.1 S7).

The reference serializes results to JSON / JSONv2 / GeoJSON / geocodejson /
XML (src/nominatim_api/v1/format.py, format_json.py, format_xml.py).  Here
each format is a *column expression* producing the serialized document
JVM-side (`to_json(struct(...))` / `concat` for XML) so a 10^12-row result
table serializes in parallel with zero Python.

Field mapping follows the reference's json formatter: place_id, licence,
osm_type/osm_id, lat/lon (as strings, like the reference), display_name,
class/type, importance, and a [south, north, west, east] boundingbox.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

LICENCE = "Data synthesized by nominatim_spark; reference semantics ODbL"

_OSM_TYPE_NAME = {"N": "node", "W": "way", "R": "relation"}


def _osm_type_long(col: str = "osm_type") -> Column:
    expr = F.lit("node")
    for short, name in _OSM_TYPE_NAME.items():
        expr = F.when(F.col(col) == short, name).otherwise(expr)
    return expr


def _bbox_array(half: float = 0.0001) -> Column:
    """[south, north, west, east] strings — point bbox like the reference's
    fallback for non-area results."""
    return F.array(
        F.format_number(F.col("lat") - half, 7),
        F.format_number(F.col("lat") + half, 7),
        F.format_number(F.col("lon") - half, 7),
        F.format_number(F.col("lon") + half, 7),
    )


def result_struct(display_name: Column | None = None) -> Column:
    if display_name is None:
        display_name = F.col("display_name")
    return F.struct(
        F.col("place_id"),
        F.lit(LICENCE).alias("licence"),
        _osm_type_long().alias("osm_type"),
        F.col("osm_id"),
        F.col("lat").cast("string").alias("lat"),
        F.col("lon").cast("string").alias("lon"),
        F.col("class"),
        F.col("type"),
        F.coalesce(F.col("importance"), F.lit(0.0)).alias("importance"),
        display_name.alias("display_name"),
        _bbox_array().alias("boundingbox"),
    )


def to_json_col(df: DataFrame, out: str = "result_json") -> DataFrame:
    """Nominatim /search JSON format as a serialized column."""
    return df.withColumn(out, F.to_json(result_struct()))


def _point_geojson_col() -> Column:
    """Serialized Point geometry from lon/lat (the centroid fallback)."""
    return F.concat(
        F.lit('{"type":"Point","coordinates":['),
        F.col("lon").cast("string"), F.lit(","),
        F.col("lat").cast("string"), F.lit("]}"),
    )


def _geometry_json() -> Column:
    """The feature's geometry JSON: the full polygon/line geometry when a
    ``geometry_geojson`` column rides the frame (polygon_geojson output,
    see :func:`add_geometry_output`), else the centroid Point."""
    return F.coalesce(F.col("geometry_geojson"), _point_geojson_col())


def to_geojson_col(df: DataFrame, out: str = "result_geojson") -> DataFrame:
    """GeoJSON Feature per result (geometry = the full stored geometry
    when ``add_geometry_output`` ran on the frame, else the centroid
    point).  The geometry arrives pre-serialized, so the feature is
    assembled by concat — to_json would double-encode it."""
    geom = (_geometry_json() if "geometry_geojson" in df.columns
            else _point_geojson_col())
    return df.withColumn(
        out,
        F.concat(
            F.lit('{"type":"Feature","properties":'),
            F.to_json(result_struct()),
            F.lit(',"geometry":'), geom, F.lit("}"),
        ),
    )


# rank_address -> geocodejson 'type' label (format_json.py:314-322)
_GEOCODEJSON_RANKS = [
    (4, "country"), (9, "state"), (12, "county"), (16, "city"),
    (21, "district"), (24, "locality"), (27, "street"), (28, "house"),
]


def _geocodejson_rank_label() -> Column:
    # clamp 3..28 (format_json.py:279); 3 -> 'locality'
    r = F.greatest(F.lit(3), F.least(F.lit(28), F.col("rank_address")))
    expr = F.when(r == 3, "locality")
    for hi, label in _GEOCODEJSON_RANKS:
        expr = expr.when(r <= hi, label)
    return expr.otherwise("house")


_GEOCODEJSON_ADDR_LABELS = (
    "country", "state", "county", "city", "district", "locality", "street",
)


def with_geocodejson_address(results: DataFrame, placex: DataFrame,
                             addressline: DataFrame,
                             locales=None) -> DataFrame:
    """Attach the geocodejson ``addressdetails`` columns (the reference's
    ``_write_geocodejson_address`` + the admin block,
    format_json.py:45-66,284-294): per result a rank-label → localized
    ancestor name map (isaddress rows of rank_address 4..27, excluding
    the result row itself; first hit per label wins by rank desc like the
    reference's sorted-iteration dedup), a ``levelN`` → name admin map
    for administrative-boundary ancestors below level 15, and the
    ancestor postcode when one rides the chain.  All JVM aggregation —
    one join against the addressline table, scales with the response."""
    from nominatim_spark.pipeline.localization import DEFAULT_LOCALES

    loc = locales or DEFAULT_LOCALES
    anc = placex.select(
        F.col("place_id").alias("address_place_id"),
        loc.display_name_expr("name").alias("_an"),
        F.col("admin_level").alias("_alvl"),
        F.col("class").alias("_acls"),
        F.col("type").alias("_atyp"),
        F.col("rank_address").alias("_ara"),
    )
    rows = (
        addressline.filter(F.col("isaddress"))
        .filter(F.col("address_place_id") != F.col("place_id"))
        .join(anc, "address_place_id")
        .filter(F.col("_an").isNotNull())
    )
    r = F.greatest(F.lit(3), F.least(F.lit(28), F.col("_ara")))
    label = F.when(r == 3, "locality")
    for hi, lab in _GEOCODEJSON_RANKS:
        label = label.when(r <= hi, lab)
    label = label.otherwise("house")

    addr = (
        rows.filter(F.col("_ara").between(4, 27))
        .withColumn("_lab", label)
        .groupBy("place_id", "_lab")
        .agg(F.expr("min_by(_an, struct(-_ara, _an))").alias("_nm"))
        .groupBy("place_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("_lab", "_nm"))).alias("_gcj_addr"))
    )
    admin = (
        rows.filter(
            (F.col("_acls") == "boundary")
            & (F.col("_atyp") == "administrative")
            & (F.coalesce(F.col("_alvl"), F.lit(15)) < 15)
        )
        .withColumn("_lab", F.concat(F.lit("level"),
                                     F.col("_alvl").cast("int")))
        .groupBy("place_id", "_lab")
        .agg(F.expr("min_by(_an, struct(-_ara, _an))").alias("_nm"))
        .groupBy("place_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("_lab", "_nm"))).alias("_gcj_admin"))
    )
    pc = (
        rows.filter(F.col("_atyp").isin("postcode", "postal_code"))
        .groupBy("place_id")
        .agg(F.min("_an").alias("_gcj_postcode"))
    )
    if "country_code" not in results.columns:
        results = results.join(
            placex.select("place_id", "country_code"), "place_id", "left")
    return (results.join(addr, "place_id", "left")
            .join(admin, "place_id", "left")
            .join(pc, "place_id", "left"))


def to_geocodejson_col(df: DataFrame,
                       out: str = "result_geocodejson",
                       addressdetails: bool = False) -> DataFrame:
    """geocodejson Feature per result (format_json.py:244-311
    format_base_geocodejson): properties.geocoding carries place_id, the
    osm ref, osm_key/osm_value, the rank-derived 'type' label, and the
    display label; geometry = centroid Point.  Wrap the collected rows
    with :func:`geocodejson_envelope` for the FeatureCollection.

    ``addressdetails=True`` (after :func:`with_geocodejson_address`)
    flattens the ancestor labels into the geocoding object and nests the
    ``admin`` level map, exactly like the reference's option."""
    fields = [
        F.col("place_id"),
        F.concat(F.lower(F.col("osm_type")),
                 F.col("osm_id").cast("string")).alias("osm_id"),
        _osm_type_long().alias("osm_type"),
        F.col("class").alias("osm_key"),
        F.col("type").alias("osm_value"),
        _geocodejson_rank_label().alias("type"),
        F.col("display_name").alias("label"),
    ]
    if addressdetails:
        if "housenumber" in df.columns:
            fields.append(F.col("housenumber"))
        fields.append(F.coalesce(
            F.col("_gcj_postcode") if "_gcj_postcode" in df.columns
            else F.lit(None).cast("string"),
            F.col("postcode") if "postcode" in df.columns
            else F.lit(None).cast("string"),
        ).alias("postcode"))
        for lab in _GEOCODEJSON_ADDR_LABELS:
            fields.append(F.col("_gcj_addr").getItem(lab).alias(lab))
        if "country_code" in df.columns:
            fields.append(F.col("country_code"))
        fields.append(F.col("_gcj_admin").alias("admin"))
    geocoding = F.struct(*fields)
    geom = (_geometry_json() if "geometry_geojson" in df.columns
            else _point_geojson_col())
    return df.withColumn(
        out,
        F.concat(
            F.lit('{"type":"Feature","properties":'),
            F.to_json(F.struct(geocoding.alias("geocoding"))),
            F.lit(',"geometry":'), geom, F.lit("}"),
        ),
    )


def geocodejson_envelope(features: list[str], query: str | None = None
                         ) -> str:
    """FeatureCollection envelope around serialized feature rows (the
    geocoding header block, format_json.py:253-261)."""
    import json

    head = {"version": "0.1.0", "licence": "ODbL",
            "attribution": LICENCE}
    if query is not None:
        head["query"] = query
    return ('{"type":"FeatureCollection","geocoding":'
            + json.dumps(head)
            + ',"features":[' + ",".join(features) + "]}")


def to_xml_col(df: DataFrame, out: str = "result_xml") -> DataFrame:
    """The reference's <place> XML element, built by concat (JVM-side)."""
    esc = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(
            F.regexp_replace(c.cast("string"), "&", "&amp;"), "<", "&lt;"
        ),
        '"', "&quot;",
    )
    return df.withColumn(
        out,
        F.concat(
            F.lit('<place place_id="'), F.col("place_id").cast("string"),
            F.lit('" osm_type="'), _osm_type_long(),
            F.lit('" osm_id="'), F.col("osm_id").cast("string"),
            F.lit('" lat="'), F.col("lat").cast("string"),
            F.lit('" lon="'), F.col("lon").cast("string"),
            F.lit('" class="'), esc(F.col("class")),
            F.lit('" type="'), esc(F.col("type")),
            F.lit('" display_name="'), esc(F.col("display_name")),
            F.lit('"/>'),
        ),
    )


GEOMETRY_OUTPUTS = ("geojson", "text", "kml", "svg")


def add_geometry_output(results: DataFrame, placex: DataFrame | None = None,
                        output=("geojson",), simplify: float = 0.0,
                        ndigits: int = 7) -> DataFrame:
    """Attach serialized full-geometry columns (``geometry_geojson`` /
    ``geometry_text`` / ``geometry_kml`` / ``geometry_svg``) to result
    rows — the reference's polygon_geojson/text/kml/svg output knobs
    (v1/helpers.py:76-82; ``_add_geometry_columns`` in reverse.py:126-142
    with ST_AsGeoJSON(col, 7) etc. and the geometry_simplification
    tolerance).

    When the results don't already carry the WKB ``geometry`` column it
    is joined from ``placex`` by place_id.  Serialization runs as one
    Arrow-batched pandas UDF over the RESULT rows only (output path —
    top-k per query — never the candidate set), so the cost is bounded
    by the response size at any input scale.  Rows without a stored
    geometry yield null (formatters fall back to the centroid Point).
    """

    fmts = [f for f in GEOMETRY_OUTPUTS if f in output]
    if not fmts:
        raise ValueError(f"no known format in {output!r}")
    if "geometry" not in results.columns:
        if placex is None:
            raise ValueError("results lack a geometry column and no "
                             "placex was given to join it from")
        results = results.join(
            placex.select("place_id", "geometry"), "place_id", "left")

    ret_type = ", ".join(f"geometry_{f} string" for f in fmts)

    @F.pandas_udf(ret_type)
    def _ser(geom: pd.Series) -> pd.DataFrame:
        from nominatim_spark.geometry.serialize import serialize_wkb

        cols = {}
        for f in fmts:
            cols[f"geometry_{f}"] = [
                serialize_wkb(g, f, ndigits=ndigits, simplify=simplify)
                for g in geom]
        return pd.DataFrame(cols)

    res = results.withColumn("_geo", _ser("geometry")).drop("geometry")
    for f in fmts:
        res = res.withColumn(f"geometry_{f}", F.col(f"_geo.geometry_{f}"))
    return res.drop("_geo")


def display_name_col(parts: list[str]) -> Column:
    """Comma-joined display name from name-part columns (null-safe),
    mirroring the reference's locale line assembly (results.py)."""
    return F.concat_ws(", ", *[F.col(p) for p in parts])
