"""Deterministic synthetic flight-delay fixtures (FIXTURES.md).

Builds the bronze envelope exactly as the reference's producers +
Event Hubs Capture would: one JSON object per row with all values as
strings-of-decimals ("134.00"), UTF-8-encoded into a binary ``body``
(kafka-eh/produce_to_eventhub.py:73; README.md:114-131) — including
the two dirty cases the reference repairs: truncated JSON and
non-numeric strings (ETL/flight-silver-transformation (1).ipynb:
1194-1206, 1229).
"""

from __future__ import annotations

import json
import random

CARRIERS = [
    ("AA", "American Airlines Inc."),
    ("DL", "Delta Air Lines Inc."),
    ("WN", "Southwest Airlines Co."),
    ("UA", "United Air Lines Inc."),
    ("9E", "Endeavor Air Inc."),
]
AIRPORTS = [("ATL", "Atlanta, GA"), ("ORD", "Chicago, IL"), ("DEN", "Denver, CO")]


def make_clean_rows(n: int = 200, seed: int = 7) -> list[dict[str, str]]:
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        carrier, carrier_name = rng.choice(CARRIERS)
        airport, airport_name = rng.choice(AIRPORTS)
        flights = rng.randint(0, 500)  # zeros exercise the 0-denominator guard
        del15 = rng.randint(0, flights) if flights else 0
        cts = [round(rng.uniform(0, del15), 2) for _ in range(5)]
        rows.append({
            "year": str(rng.choice([2023, 2024])),
            "month": str(rng.randint(1, 12)),
            "carrier": carrier, "carrier_name": carrier_name,
            "airport": airport, "airport_name": airport_name,
            "arr_flights": f"{flights}.00",
            "arr_del15": f"{del15}.00",
            "carrier_ct": f"{cts[0]:.2f}", "weather_ct": f"{cts[1]:.2f}",
            "nas_ct": f"{cts[2]:.2f}", "security_ct": f"{cts[3]:.2f}",
            "late_aircraft_ct": f"{cts[4]:.2f}",
            "arr_cancelled": f"{rng.randint(0, 10)}.00",
            "arr_diverted": f"{rng.randint(0, 5)}.00",
            "arr_delay": f"{rng.randint(0, 30000)}.00",
            "carrier_delay": f"{rng.randint(0, 10000)}.00",
        })
    return rows


def encode_bodies(rows: list[dict[str, str]]) -> list[bytes]:
    return [json.dumps(r).encode("utf-8") for r in rows]


def dirty_bodies() -> list[bytes]:
    """The corrupt-record cases from the reference's repair path."""
    clean = make_clean_rows(3, seed=99)
    full = json.dumps(clean[0]).encode()
    return [
        # trailing garbage after last '}' → repaired by trim-to-last-'}'
        full + b"\xff\xfeGARBAGE",
        # truncated mid-object, no closing '}' → unparseable → dropped
        json.dumps(clean[1]).encode()[:40],
        # truncated but a '}' survives mid-string? flat objects have no
        # inner '}', so this is also dropped
        json.dumps(clean[2]).encode()[:-1],
        # not JSON at all → dropped
        b"plain text, no json here",
        # null body → dropped
        None,
        # non-numeric metric strings → parse OK, cast → NULL (kept)
        json.dumps({**clean[0], "arr_flights": "not_a_number"}).encode(),
    ]


def bronze_df(spark, bodies: list[bytes]):
    """Envelope frame with the Capture-style metadata columns."""
    from pyspark.sql.types import (BinaryType, LongType, StringType,
                                   StructField, StructType)
    schema = StructType([
        StructField("body", BinaryType(), True),
        StructField("partition", StringType(), True),
        StructField("offset", LongType(), True),
    ])
    data = [(b, str(i % 4), i) for i, b in enumerate(bodies)]
    return spark.createDataFrame(data, schema)
