from .scalars import (  # noqa: F401
    anchored_day,
    html_pr_anchor,
    parse_iso_offset,
    parse_rfc2822,
    pr_number,
    wrap_text,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
