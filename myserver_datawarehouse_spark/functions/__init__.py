from myserver_datawarehouse_spark.functions.keys import (
    date_id,
    minute_bucket,
    rounded_time_id,
    time_id,
    to_business_tz,
)
from myserver_datawarehouse_spark.functions.scalar import (
    color_for_name,
    currency_normalize,
    duration_hhmm,
    lenient_cast,
    md5_fingerprint,
    reconstruct_timestamp,
)

__all__ = [
    "date_id",
    "time_id",
    "rounded_time_id",
    "minute_bucket",
    "to_business_tz",
    "currency_normalize",
    "color_for_name",
    "duration_hhmm",
    "lenient_cast",
    "md5_fingerprint",
    "reconstruct_timestamp",
]
