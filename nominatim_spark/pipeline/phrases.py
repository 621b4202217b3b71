"""Special-phrase category table — searchable category words.

Re-expresses the reference's special-phrases machinery
(/root/reference/src/nominatim_db/tools/special_phrases/sp_importer.py,
sp_csv_loader.py, special_phrase.py): a table of (phrase, class, type,
operator) rows turns category words ("restaurant", "swimming pool") into
search roles —

* operator ``near``/``in``  -> a NEAR_ITEM reading: the rest of the query
  resolves as an anchor and the result is the nearest place of the
  category (db_search_builder.py:86-118 NearSearch wrap);
* operator ``-``            -> a QUALIFIER reading: the phrase restricts
  the candidate class/type of the remaining name search
  (db_searches/place_search.py qualifier filter);
* a category-only query     -> PoiSearch (viewbox-bounded).

The reference imports the phrase set from the OSM wiki or a CSV into
``place_classtype_*`` tables + 'S'-type word rows; the batch engine keeps
the table as plain data broadcast into the parse stage
(``load_phrases_csv`` mirrors SPCsvLoader's csv contract), with a compact
built-in default table of common public OSM category vocabulary.
"""

from __future__ import annotations

import csv
import re

# sanity gate for class/type values (sp_importer.py sanity_check_pattern)
_SANE = re.compile(r"^\w+$")

# (phrase, class, type) — engine default table; operators default to the
# full set (the wiki ships '-', 'near' and 'in' rows for most phrases).
# Plural forms are listed explicitly like the wiki does.
_D = [
    # --- amenity
    ("restaurant", "amenity", "restaurant"),
    ("restaurants", "amenity", "restaurant"),
    ("cafe", "amenity", "cafe"), ("cafes", "amenity", "cafe"),
    ("coffee shop", "amenity", "cafe"),
    ("coffee shops", "amenity", "cafe"),
    ("bar", "amenity", "bar"), ("bars", "amenity", "bar"),
    ("pub", "amenity", "pub"), ("pubs", "amenity", "pub"),
    ("fast food", "amenity", "fast_food"),
    ("food court", "amenity", "food_court"),
    ("bank", "amenity", "bank"), ("banks", "amenity", "bank"),
    ("atm", "amenity", "atm"), ("atms", "amenity", "atm"),
    ("pharmacy", "amenity", "pharmacy"),
    ("pharmacies", "amenity", "pharmacy"),
    ("chemist", "amenity", "pharmacy"),
    ("hospital", "amenity", "hospital"),
    ("hospitals", "amenity", "hospital"),
    ("clinic", "amenity", "clinic"), ("clinics", "amenity", "clinic"),
    ("doctor", "amenity", "doctors"), ("doctors", "amenity", "doctors"),
    ("dentist", "amenity", "dentist"),
    ("dentists", "amenity", "dentist"),
    ("veterinary", "amenity", "veterinary"),
    ("school", "amenity", "school"), ("schools", "amenity", "school"),
    ("kindergarten", "amenity", "kindergarten"),
    ("kindergartens", "amenity", "kindergarten"),
    ("college", "amenity", "college"),
    ("colleges", "amenity", "college"),
    ("university", "amenity", "university"),
    ("universities", "amenity", "university"),
    ("library", "amenity", "library"),
    ("libraries", "amenity", "library"),
    ("police", "amenity", "police"),
    ("police station", "amenity", "police"),
    ("police stations", "amenity", "police"),
    ("fire station", "amenity", "fire_station"),
    ("fire stations", "amenity", "fire_station"),
    ("post office", "amenity", "post_office"),
    ("post offices", "amenity", "post_office"),
    ("post box", "amenity", "post_box"),
    ("town hall", "amenity", "townhall"),
    ("townhall", "amenity", "townhall"),
    ("courthouse", "amenity", "courthouse"),
    ("courthouses", "amenity", "courthouse"),
    ("prison", "amenity", "prison"), ("prisons", "amenity", "prison"),
    ("embassy", "amenity", "embassy"),
    ("embassies", "amenity", "embassy"),
    ("theatre", "amenity", "theatre"),
    ("theatres", "amenity", "theatre"),
    ("theater", "amenity", "theatre"),
    ("theaters", "amenity", "theatre"),
    ("cinema", "amenity", "cinema"), ("cinemas", "amenity", "cinema"),
    ("nightclub", "amenity", "nightclub"),
    ("nightclubs", "amenity", "nightclub"),
    ("casino", "amenity", "casino"), ("casinos", "amenity", "casino"),
    ("parking", "amenity", "parking"),
    ("car park", "amenity", "parking"),
    ("car parks", "amenity", "parking"),
    ("fuel", "amenity", "fuel"),
    ("petrol station", "amenity", "fuel"),
    ("petrol stations", "amenity", "fuel"),
    ("gas station", "amenity", "fuel"),
    ("gas stations", "amenity", "fuel"),
    ("charging station", "amenity", "charging_station"),
    ("charging stations", "amenity", "charging_station"),
    ("car wash", "amenity", "car_wash"),
    ("car rental", "amenity", "car_rental"),
    ("taxi", "amenity", "taxi"), ("taxis", "amenity", "taxi"),
    ("bus station", "amenity", "bus_station"),
    ("bus stations", "amenity", "bus_station"),
    ("ferry terminal", "amenity", "ferry_terminal"),
    ("marketplace", "amenity", "marketplace"),
    ("market", "amenity", "marketplace"),
    ("markets", "amenity", "marketplace"),
    ("place of worship", "amenity", "place_of_worship"),
    ("church", "amenity", "place_of_worship"),
    ("churches", "amenity", "place_of_worship"),
    ("mosque", "amenity", "place_of_worship"),
    ("mosques", "amenity", "place_of_worship"),
    ("synagogue", "amenity", "place_of_worship"),
    ("temple", "amenity", "place_of_worship"),
    ("toilet", "amenity", "toilets"), ("toilets", "amenity", "toilets"),
    ("drinking water", "amenity", "drinking_water"),
    ("recycling", "amenity", "recycling"),
    ("shelter", "amenity", "shelter"),
    # --- shop
    ("supermarket", "shop", "supermarket"),
    ("supermarkets", "shop", "supermarket"),
    ("grocery", "shop", "supermarket"),
    ("bakery", "shop", "bakery"), ("bakeries", "shop", "bakery"),
    ("butcher", "shop", "butcher"), ("butchers", "shop", "butcher"),
    ("greengrocer", "shop", "greengrocer"),
    ("convenience store", "shop", "convenience"),
    ("convenience stores", "shop", "convenience"),
    ("mall", "shop", "mall"), ("malls", "shop", "mall"),
    ("shopping centre", "shop", "mall"),
    ("shopping center", "shop", "mall"),
    ("department store", "shop", "department_store"),
    ("department stores", "shop", "department_store"),
    ("kiosk", "shop", "kiosk"), ("kiosks", "shop", "kiosk"),
    ("hairdresser", "shop", "hairdresser"),
    ("hairdressers", "shop", "hairdresser"),
    ("optician", "shop", "optician"),
    ("opticians", "shop", "optician"),
    ("jeweller", "shop", "jewelry"),
    ("jewellers", "shop", "jewelry"),
    ("florist", "shop", "florist"), ("florists", "shop", "florist"),
    ("bookshop", "shop", "books"), ("bookshops", "shop", "books"),
    ("bookstore", "shop", "books"), ("bookstores", "shop", "books"),
    ("toy shop", "shop", "toys"), ("toy shops", "shop", "toys"),
    ("furniture store", "shop", "furniture"),
    ("electronics store", "shop", "electronics"),
    ("bicycle shop", "shop", "bicycle"),
    ("bicycle shops", "shop", "bicycle"),
    ("car dealer", "shop", "car"), ("car dealers", "shop", "car"),
    ("hardware store", "shop", "hardware"),
    ("pet shop", "shop", "pet"), ("pet shops", "shop", "pet"),
    ("shoe shop", "shop", "shoes"), ("shoe shops", "shop", "shoes"),
    ("gift shop", "shop", "gift"), ("gift shops", "shop", "gift"),
    ("travel agency", "shop", "travel_agency"),
    ("travel agencies", "shop", "travel_agency"),
    ("laundry", "shop", "laundry"),
    ("dry cleaner", "shop", "dry_cleaning"),
    ("dry cleaners", "shop", "dry_cleaning"),
    # --- tourism
    ("hotel", "tourism", "hotel"), ("hotels", "tourism", "hotel"),
    ("motel", "tourism", "motel"), ("motels", "tourism", "motel"),
    ("hostel", "tourism", "hostel"), ("hostels", "tourism", "hostel"),
    ("guest house", "tourism", "guest_house"),
    ("guest houses", "tourism", "guest_house"),
    ("bed and breakfast", "tourism", "guest_house"),
    ("campsite", "tourism", "camp_site"),
    ("campsites", "tourism", "camp_site"),
    ("camp site", "tourism", "camp_site"),
    ("caravan site", "tourism", "caravan_site"),
    ("museum", "tourism", "museum"), ("museums", "tourism", "museum"),
    ("gallery", "tourism", "gallery"),
    ("galleries", "tourism", "gallery"),
    ("attraction", "tourism", "attraction"),
    ("attractions", "tourism", "attraction"),
    ("viewpoint", "tourism", "viewpoint"),
    ("viewpoints", "tourism", "viewpoint"),
    ("zoo", "tourism", "zoo"), ("zoos", "tourism", "zoo"),
    ("theme park", "tourism", "theme_park"),
    ("theme parks", "tourism", "theme_park"),
    ("tourist information", "tourism", "information"),
    # --- leisure
    ("park", "leisure", "park"), ("parks", "leisure", "park"),
    ("playground", "leisure", "playground"),
    ("playgrounds", "leisure", "playground"),
    ("sports centre", "leisure", "sports_centre"),
    ("sports center", "leisure", "sports_centre"),
    ("stadium", "leisure", "stadium"),
    ("stadiums", "leisure", "stadium"),
    ("swimming pool", "leisure", "swimming_pool"),
    ("swimming pools", "leisure", "swimming_pool"),
    ("golf course", "leisure", "golf_course"),
    ("golf courses", "leisure", "golf_course"),
    ("fitness centre", "leisure", "fitness_centre"),
    ("gym", "leisure", "fitness_centre"),
    ("gyms", "leisure", "fitness_centre"),
    ("marina", "leisure", "marina"), ("marinas", "leisure", "marina"),
    ("garden", "leisure", "garden"), ("gardens", "leisure", "garden"),
    ("ice rink", "leisure", "ice_rink"),
    ("dog park", "leisure", "dog_park"),
    # --- natural / historic / transport
    ("beach", "natural", "beach"), ("beaches", "natural", "beach"),
    ("peak", "natural", "peak"), ("peaks", "natural", "peak"),
    ("spring", "natural", "spring"),
    ("waterfall", "waterway", "waterfall"),
    ("waterfalls", "waterway", "waterfall"),
    ("castle", "historic", "castle"),
    ("castles", "historic", "castle"),
    ("monument", "historic", "monument"),
    ("monuments", "historic", "monument"),
    ("memorial", "historic", "memorial"),
    ("memorials", "historic", "memorial"),
    ("ruins", "historic", "ruins"),
    ("archaeological site", "historic", "archaeological_site"),
    ("railway station", "railway", "station"),
    ("railway stations", "railway", "station"),
    ("train station", "railway", "station"),
    ("train stations", "railway", "station"),
    ("tram stop", "railway", "tram_stop"),
    ("airport", "aeroway", "aerodrome"),
    ("airports", "aeroway", "aerodrome"),
    ("bus stop", "highway", "bus_stop"),
    ("bus stops", "highway", "bus_stop"),
]

NEAR_OPS = ("near", "in")
ALL_OPS = ("-", "near", "in")

# phrase table shape: lowercase phrase -> ("class|type", ops tuple)
PhraseTable = dict


def compile_phrases(rows) -> PhraseTable:
    """(phrase, class, type[, operator]) rows -> lookup table.  Rows with
    non-word class/type are dropped (sp_importer sanity gate); repeated
    phrases merge their operator sets (the wiki ships one row per
    operator)."""
    table: dict[str, tuple[str, set]] = {}
    for row in rows:
        phrase, cls, typ = row[0], row[1], row[2]
        op = (row[3] if len(row) > 3 else "").strip().lower()
        # unknown operators read as '-' (special_phrase.py:24-26); the
        # engine defaults an UNSPECIFIED operator to every role
        ops = {op} if op in ALL_OPS else (
            {"-"} if op else set(ALL_OPS))
        if not (_SANE.match(cls) and _SANE.match(typ)):
            continue
        key = " ".join(phrase.lower().split())
        if not key:
            continue
        if key in table and table[key][0] != f"{cls}|{typ}":
            # first mapping wins on conflicting class/type (stable)
            continue
        if key in table:
            table[key] = (table[key][0], table[key][1] | ops)
        else:
            table[key] = (f"{cls}|{typ}", ops)
    return {k: (v[0], tuple(sorted(v[1]))) for k, v in table.items()}


DEFAULT_PHRASE_TABLE: PhraseTable = compile_phrases(_D)

MAX_PHRASE_WORDS = max(len(k.split()) for k in DEFAULT_PHRASE_TABLE)


def load_phrases_csv(path: str) -> PhraseTable:
    """CSV with columns phrase,class,type,operator (SPCsvLoader's
    contract, sp_csv_loader.py:30-37) -> phrase table."""
    with open(path, encoding="utf-8") as fd:
        reader = csv.DictReader(fd, delimiter=",")
        rows = [(r["phrase"], r["class"], r["type"],
                 r.get("operator", "")) for r in reader]
    return compile_phrases(rows)


def match_phrase(tokens: list[str], table: PhraseTable,
                 max_words: int | None = None):
    """Longest phrase-table match at the START of ``tokens`` ->
    (n_words, 'class|type', ops) or None."""
    limit = min(len(tokens),
                max_words if max_words is not None else MAX_PHRASE_WORDS)
    for n in range(limit, 0, -1):
        key = " ".join(t.lower() for t in tokens[:n])
        if key in table:
            return n, table[key][0], table[key][1]
    return None
