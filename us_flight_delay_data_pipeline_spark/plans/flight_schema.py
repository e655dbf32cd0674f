"""Schemas for the flight-delay payload — the data contract shared by
producer, bronze, silver, and gold.

Field list and silver cast map reproduce the reference contract:
17 all-nullable StringType payload fields applied via ``from_json``
(ETL/flight-silver-transformation (1).ipynb:1172-1189), then
year/month→int and 11 metrics→double
(ETL/flight-silver-transformation (1).ipynb:1234-1246).
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

# Payload fields, in the reference's declared order.
PAYLOAD_FIELDS = (
    "year", "month", "carrier", "carrier_name", "airport", "airport_name",
    "arr_flights", "arr_del15", "carrier_ct", "weather_ct", "nas_ct",
    "security_ct", "late_aircraft_ct", "arr_cancelled", "arr_diverted",
    "arr_delay", "carrier_delay",
)

# Schema-on-read: everything string-first (the CSV ships decimals-as-
# strings like "134.00"; parse-then-cast means malformed numerics go
# NULL instead of failing the job — SURVEY.md §1 "semantic quirk").
FLIGHT_PAYLOAD_SCHEMA = StructType(
    [StructField(f, StringType(), True) for f in PAYLOAD_FIELDS]
)

# Silver casts — note counts are DOUBLE, not INT, end-to-end.
SILVER_CASTS: dict[str, str] = {
    "year": "int",
    "month": "int",
    "arr_flights": "double",
    "arr_del15": "double",
    "carrier_ct": "double",
    "weather_ct": "double",
    "nas_ct": "double",
    "security_ct": "double",
    "late_aircraft_ct": "double",
    "arr_cancelled": "double",
    "arr_diverted": "double",
    "arr_delay": "double",
    "carrier_delay": "double",
}

# The five delay-cause count columns (README.md:182 cause_total).
CAUSE_COLUMNS = (
    "carrier_ct", "weather_ct", "nas_ct", "security_ct", "late_aircraft_ct",
)
