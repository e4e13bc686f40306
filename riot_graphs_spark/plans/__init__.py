from .flagship import daily_last_value_delta  # noqa: F401
from .riot import build_sizes_from_raw, pr_events_from_commits  # noqa: F401
