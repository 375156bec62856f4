"""Sources and sinks (SURVEY.md §2.1, S1–S18)."""

from .readers import (  # noqa: F401
    load_table,
    load_testdata,
    read_csv,
    read_jsonl,
    read_parquet,
    read_tsv,
)
