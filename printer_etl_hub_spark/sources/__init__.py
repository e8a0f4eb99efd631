"""Sources & sinks (SURVEY.md §2.1)."""

from .fetch import fetch_stage, probe_per_group  # noqa: F401
from .json_store import load_printers_json, save_printers_json  # noqa: F401
