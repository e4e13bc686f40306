from .explode import explode_sizes, parse_props  # noqa: F401
from .timeseries import (  # noqa: F401
    delta_vs_prev,
    distinct_tags,
    gap_fill_forward,
    last_per_bucket,
    time_bucket_agg,
    time_range,
    top1_by_time,
)
from .asof import asof_join  # noqa: F401
from .joins import delta_new_rows, enrich  # noqa: F401
