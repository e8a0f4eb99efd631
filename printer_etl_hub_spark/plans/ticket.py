"""The interactive ticket flow (SURVEY §3.3) as a parameterized driver
API: resolve plugin → point lookup → extract → render → .eml sink.

The reference's `cli/open_ticket.py` walks a user through group/field/
value prompts, runs a linear scan (J6 numeric-tolerant equality), and
renders an Outlook draft (`plugins/openticket/TonerOrder.py`,
`core/openticket/plugins.py:7-36` for the alias map + interface
contract). Spark-side, steps 3-5 are ONE single-row query against the
canonical table — pushdown-pruned, no shuffle (q12's plan discipline) —
and everything interactive becomes function parameters: a multi-match
returns the candidate rows for the caller to pick from (the reference's
user picker, de-interactivized).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field as dc_field
from pathlib import Path

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from ..edges import make_ticket_subject, render_ticket_html, write_eml_draft
from ..functions.normalize import canonicalize_id


@dataclass(frozen=True)
class TicketPlugin:
    """The reference's plugin interface contract
    (`cli/open_ticket.py:57-60`): prepare, search(-able fields), extract,
    make_subject, make_html — enforced at registration, not at call time."""

    name: str
    prepare: Callable[[DataFrame], DataFrame]
    search_fields: tuple[str, ...]
    extract: Callable[[Row], dict]
    make_subject: Callable[[dict], str] = make_ticket_subject
    make_html: Callable[[dict], str] = render_ticket_html


def _toner_prepare(df: DataFrame) -> DataFrame:
    return df.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


def _toner_extract(row: Row) -> dict:
    return {
        "customer": row["c_name"],
        "model": row["c_mktsegment"],
        "branch_id": row["c_custkey"],
        "group": "Branches",
    }


#: Alias map mirroring `core/openticket/plugins.py:7-36` (tech/toner/drum
#: all resolve to the toner-order plugin over the canonical table).
_TONER = TicketPlugin(
    name="toner",
    prepare=_toner_prepare,
    search_fields=("c_custkey", "c_name"),
    extract=_toner_extract,
)
PLUGINS: dict[str, TicketPlugin] = {"toner": _TONER, "tech": _TONER, "drum": _TONER}


def open_ticket(
    df: DataFrame,
    plugin: str,
    field: str,
    value: str,
    items: list[dict],
    to_addr: str = "orders@example.invalid",
    out_dir: str | None = None,
    max_matches: int = 5,
) -> Path | list[Row]:
    """Run the full §3.3 flow. Returns the written ``.eml`` path on a
    unique match, or the candidate rows (≤ max_matches) on a multi-match
    for the caller to disambiguate and re-call with a tighter value.

    The lookup predicate normalizes the LITERAL side only (J6/F37 —
    `plugins/openticket/TonerOrder.py:38-48`): the column stays bare so
    parquet row-group stats prune the scan at any table size.
    """
    p = PLUGINS.get(plugin)
    if p is None:
        raise KeyError(f"unknown ticket plugin {plugin!r}; have {sorted(set(PLUGINS))}")
    base = p.prepare(df)
    if field not in p.search_fields:
        raise ValueError(f"field {field!r} not searchable; allowed: {p.search_fields}")
    lit_norm = canonicalize_id(F.lit(value))
    dtype = dict(base.dtypes)[field]
    pred = (
        F.col(field) == lit_norm.cast(dtype)
        if dtype in ("bigint", "int", "smallint")
        else F.col(field) == lit_norm
    )
    rows = base.filter(pred).limit(max_matches + 1).collect()
    if not rows:
        raise LookupError(f"no match for {field} = {value!r}")
    if len(rows) > 1:
        return rows[:max_matches]
    fields = p.extract(rows[0])
    fields["items"] = items
    return write_eml_draft(
        to_addr,
        p.make_subject(fields),
        p.make_html(fields),
        out_dir,
        filename=f"ticket_{p.name}_{fields.get('branch_id', 'x')}.eml",
    )
