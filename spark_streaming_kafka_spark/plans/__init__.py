"""Physical-plan inspection helpers (used by tests and tuning)."""

from .inspect import (  # noqa: F401
    explain_str,
    has_broadcast_hash_join,
    pushed_filters,
    scan_read_schema,
    wholestage_codegen_ids,
)
