from .flight_schema import FLIGHT_PAYLOAD_SCHEMA, SILVER_CASTS
from .silver import silver_transform
from .gold import derive_kpis, agg_carrier, agg_monthly, agg_causes, gold_master, write_gold
from .views import register_gold_views, v_overall_kpis, v_monthly_trend, v_top_carriers, v_causes_pct

__all__ = [
    "FLIGHT_PAYLOAD_SCHEMA", "SILVER_CASTS", "silver_transform",
    "derive_kpis", "agg_carrier", "agg_monthly", "agg_causes",
    "gold_master", "write_gold",
    "register_gold_views", "v_overall_kpis", "v_monthly_trend",
    "v_top_carriers", "v_causes_pct",
]
