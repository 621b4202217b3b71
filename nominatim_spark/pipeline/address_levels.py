"""Address-level rank table.

Factual rank data re-expressed from the reference's configuration
(/root/reference/settings/address-levels.json — the mapping from OSM
class/type to (rank_search, rank_address)).  Stored as plain tuples
``(country, class, type, rank_search, rank_address)`` where ``country=None``
and ``type=None`` act as wildcards, matching the lookup semantics of
``compute_place_rank`` (lib-sql/functions/ranking.sql:236-241: most specific
row wins — country before wildcard, exact type before wildcard).
"""

from __future__ import annotations

import pandas as pd

# (country, class, type, rank_search, rank_address); type None = class default
DEFAULT_LEVELS: list[tuple[str | None, str, str | None, int, int]] = [
    # place
    (None, "place", "sea", 2, 0),
    (None, "place", "island", 17, 0),
    (None, "place", "islet", 20, 0),
    (None, "place", "continent", 2, 0),
    (None, "place", "country", 4, 0),
    (None, "place", "state", 8, 0),
    (None, "place", "province", 8, 0),
    (None, "place", "region", 18, 0),
    (None, "place", "county", 12, 12),
    (None, "place", "district", 12, 12),
    (None, "place", "municipality", 14, 14),
    (None, "place", "city", 16, 16),
    (None, "place", "town", 18, 16),
    (None, "place", "borough", 18, 18),
    (None, "place", "village", 19, 16),
    (None, "place", "suburb", 19, 20),
    (None, "place", "hamlet", 20, 20),
    (None, "place", "croft", 20, 20),
    (None, "place", "subdivision", 22, 22),
    (None, "place", "allotments", 22, 22),
    (None, "place", "neighbourhood", 24, 24),
    (None, "place", "quarter", 20, 22),
    (None, "place", "isolated_dwelling", 22, 25),
    (None, "place", "farm", 22, 25),
    (None, "place", "city_block", 25, 25),
    (None, "place", "mountain_pass", 25, 25),
    (None, "place", "square", 25, 25),
    (None, "place", "locality", 25, 25),
    (None, "place", "houses", 28, 0),
    (None, "place", "house", 30, 30),
    (None, "place", None, 22, 0),
    # boundary (administrative<N> synthesized from admin_level)
    (None, "boundary", "administrative2", 4, 4),
    (None, "boundary", "administrative3", 6, 6),
    (None, "boundary", "administrative4", 8, 8),
    (None, "boundary", "administrative5", 10, 10),
    (None, "boundary", "administrative6", 12, 12),
    (None, "boundary", "administrative7", 14, 14),
    (None, "boundary", "administrative8", 16, 16),
    (None, "boundary", "administrative9", 18, 18),
    (None, "boundary", "administrative10", 20, 20),
    (None, "boundary", "administrative11", 22, 22),
    (None, "boundary", "administrative12", 24, 24),
    (None, "boundary", None, 25, 0),
    # landuse
    (None, "landuse", "residential", 24, 24),
    (None, "landuse", "farm", 24, 24),
    (None, "landuse", "farmyard", 24, 24),
    (None, "landuse", "industrial", 24, 24),
    (None, "landuse", "commercial", 24, 24),
    (None, "landuse", "allotments", 24, 24),
    (None, "landuse", "retail", 24, 24),
    (None, "landuse", None, 24, 0),
    # leisure
    (None, "leisure", "park", 24, 0),
    (None, "leisure", "nature_reserve", 24, 0),
    (None, "leisure", "garden", 25, 0),
    (None, "leisure", "common", 25, 0),
    # natural
    (None, "natural", "peak", 18, 0),
    (None, "natural", "volcano", 18, 0),
    (None, "natural", "mountain_range", 18, 0),
    (None, "natural", "sea", 4, 0),
    (None, "natural", "tree", 30, 30),
    (None, "natural", "spring", 30, 30),
    (None, "natural", "cave_entrance", 30, 30),
    (None, "natural", "geyser", 30, 30),
    (None, "natural", "hot_spring", 30, 30),
    (None, "natural", "rock", 30, 30),
    (None, "natural", "stone", 30, 30),
    (None, "natural", None, 22, 0),
    # water
    (None, "water", "lake", 20, 0),
    (None, "water", "reservoir", 20, 0),
    (None, "water", "wastewater", 24, 0),
    (None, "water", "pond", 24, 0),
    (None, "water", "fountain", 24, 0),
    (None, "water", None, 22, 0),
    # waterway
    (None, "waterway", "river", 19, 0),
    (None, "waterway", "stream", 22, 0),
    (None, "waterway", "ditch", 22, 0),
    (None, "waterway", "drain", 22, 0),
    (None, "waterway", None, 20, 0),
    # highway
    (None, "highway", None, 30, 30),
    (None, "highway", "service", 27, 27),
    (None, "highway", "cycleway", 27, 27),
    (None, "highway", "path", 27, 27),
    (None, "highway", "footway", 27, 27),
    (None, "highway", "steps", 27, 27),
    (None, "highway", "bridleway", 27, 27),
    (None, "highway", "motorway_link", 27, 27),
    (None, "highway", "primary_link", 27, 27),
    (None, "highway", "trunk_link", 27, 27),
    (None, "highway", "secondary_link", 27, 27),
    (None, "highway", "tertiary_link", 27, 27),
    (None, "highway", "residential", 26, 26),
    (None, "highway", "track", 26, 26),
    (None, "highway", "unclassified", 26, 26),
    (None, "highway", "tertiary", 26, 26),
    (None, "highway", "secondary", 26, 26),
    (None, "highway", "primary", 26, 26),
    (None, "highway", "living_street", 26, 26),
    (None, "highway", "trunk", 26, 26),
    (None, "highway", "motorway", 26, 26),
    (None, "highway", "pedestrian", 26, 26),
    (None, "highway", "road", 26, 26),
    (None, "highway", "construction", 26, 26),
    # misc
    (None, "mountain_pass", None, 20, 0),
    (None, "historic", "neighbourhood", 22, 0),
]

# per-country overrides (same source, country-specific entries)
COUNTRY_LEVELS: list[tuple[str, str, str, int, int]] = [
    ("au", "boundary", "administrative6", 12, 0),
    ("ca", "place", "county", 12, 0),
    ("cz", "boundary", "administrative5", 12, 12),
    ("cz", "boundary", "administrative6", 13, 0),
    ("cz", "boundary", "administrative7", 14, 0),
    ("cz", "boundary", "administrative8", 14, 14),
    ("cz", "boundary", "administrative9", 15, 15),
    ("cz", "boundary", "administrative10", 16, 16),
    ("de", "place", "region", 10, 0),
    ("de", "place", "county", 12, 0),
    ("de", "boundary", "administrative5", 10, 0),
    ("be", "boundary", "administrative3", 5, 0),
    ("be", "boundary", "administrative4", 6, 6),
    ("be", "boundary", "administrative5", 7, 0),
    ("be", "boundary", "administrative6", 8, 8),
    ("be", "boundary", "administrative7", 12, 12),
    ("be", "boundary", "administrative8", 14, 14),
    ("be", "boundary", "administrative9", 16, 16),
    ("be", "boundary", "administrative10", 18, 18),
    ("br", "boundary", "administrative5", 10, 0),
    ("br", "boundary", "administrative6", 12, 0),
    ("br", "boundary", "administrative7", 14, 0),
    ("se", "boundary", "administrative3", 8, 8),
    ("se", "boundary", "administrative4", 12, 12),
    ("no", "boundary", "administrative3", 8, 8),
    ("no", "boundary", "administrative4", 12, 12),
    ("id", "place", "municipality", 18, 18),
    ("id", "boundary", "administrative5", 12, 12),
    ("id", "boundary", "administrative6", 14, 14),
    ("id", "boundary", "administrative7", 16, 16),
    ("id", "boundary", "administrative8", 20, 20),
    ("id", "boundary", "administrative9", 22, 22),
    ("id", "boundary", "administrative10", 24, 24),
    ("ru", "place", "municipality", 18, 18),
    ("ru", "boundary", "administrative5", 10, 0),
    ("ru", "boundary", "administrative7", 13, 0),
    ("ru", "boundary", "administrative8", 14, 14),
    ("nl", "boundary", "administrative7", 13, 0),
    ("nl", "boundary", "administrative8", 14, 14),
    ("nl", "boundary", "administrative9", 15, 0),
    ("nl", "boundary", "administrative10", 16, 16),
    ("es", "place", "province", 10, 10),
    ("es", "place", "civil_parish", 18, 18),
    ("es", "boundary", "administrative5", 10, 0),
    ("es", "boundary", "administrative6", 10, 10),
    ("es", "boundary", "administrative7", 12, 12),
    ("es", "boundary", "administrative10", 22, 22),
    ("sa", "place", "province", 12, 12),
    ("sa", "place", "municipality", 18, 18),
    ("jp", "boundary", "administrative7", 16, 16),
    ("jp", "boundary", "administrative8", 18, 18),
    ("jp", "boundary", "administrative9", 20, 20),
    ("jp", "boundary", "administrative10", 22, 22),
    ("jp", "boundary", "administrative11", 24, 24),
]


def levels_pdf() -> pd.DataFrame:
    """All level rows as a pandas frame (broadcast-sized: ~170 rows)."""
    rows = [
        {"lv_country": c, "lv_class": k, "lv_type": t,
         "lv_search": s, "lv_address": a}
        for c, k, t, s, a in DEFAULT_LEVELS + COUNTRY_LEVELS
    ]
    return pd.DataFrame(rows)
