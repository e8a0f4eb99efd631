"""Fleet-enrichment operators (reference J1-J3) and the SNMP toner pipeline
(A1+P7+F13+F15) — the reference's per-printer dataflow as declarative plans.

Order-dependent reference semantics (SURVEY.md §7 watch list #1) are made
explicit: every "first-appearance" / "last-wins" rule keys on a ``seq``
column captured at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extract import (
    compute_supply_percent,
    friendly_color,
    parse_supplies_oid,
    pct_with_symbol,
)
from ..functions.normalize import norm_text, safe_bigint, split_postal

#: prtMarkerSuppliesType values that are toner/ink (reference P7,
#: `adapters/snmp_toner.py:13`).
TONER_SUPPLY_TYPES = (3, 5, 6, 10, 21)


def enrich_employees(
    branches: DataFrame, employees: DataFrame, id_col: str = "ID"
) -> DataFrame:
    """J1: left-join employees by trimmed string id; update Manager/Phone
    ONLY when the dimension value is non-empty; flag changed rows.

    Reference: `core/enrich/employees.py:4-34`. The employee index is
    last-write-wins on duplicate ids (dict overwrite semantics) → max_by(seq).
    """
    emp = employees
    if "seq" not in emp.columns:
        emp = emp.withColumn("seq", F.monotonically_increasing_id())
    dim = (
        emp.select(
            F.trim(F.col("id").cast("string")).alias("_eid"),
            norm_text(F.col("name")).alias("_ename"),
            norm_text(F.col("phone")).alias("_ephone"),
            F.col("seq"),
        )
        .groupBy("_eid")
        .agg(
            # whole-RECORD last-write-wins (dict overwrite semantics in the
            # reference), not per-field: a later row with an empty phone
            # still replaces the record, and the empty field then fails the
            # non-empty update check below.
            F.max_by(F.struct(F.col("_ename"), F.col("_ephone")), F.col("seq")).alias("_e"),
        )
        .select("_eid", F.col("_e._ename").alias("_ename"), F.col("_e._ephone").alias("_ephone"))
    )
    j = branches.join(
        F.broadcast(dim), F.trim(F.col(id_col).cast("string")) == F.col("_eid"), "left"
    )
    mgr_new = F.when(F.col("_ename").isNotNull(), F.col("_ename")).otherwise(
        F.col("Manager")
    )
    phone_new = F.when(F.col("_ephone").isNotNull(), F.col("_ephone")).otherwise(
        F.col("Phone")
    )
    changed = (
        F.col("_ename").isNotNull() & ~F.col("_ename").eqNullSafe(F.col("Manager"))
    ) | (
        F.col("_ephone").isNotNull() & ~F.col("_ephone").eqNullSafe(F.col("Phone"))
    )
    keep = [c for c in branches.columns if c not in ("Manager", "Phone")]
    return j.select(
        *keep,
        mgr_new.alias("Manager"),
        phone_new.alias("Phone"),
        changed.cast("int").alias("emp_changed"),
    )


def enrich_locations(branches: DataFrame, locations: DataFrame, id_col: str = "ID") -> DataFrame:
    """J2: branch_id→address last-write-wins, postal split out of address.

    Reference: `core/enrich/locations.py:47-56,88-91` (postal split 27-35).
    Hebrew source headers are normalized upstream to
    (branch_id, address, primary_desc, secondary_desc, sub_num, seq).
    """
    loc = locations
    if "seq" not in loc.columns:
        loc = loc.withColumn("seq", F.monotonically_increasing_id())
    addr = (
        loc.select(
            safe_bigint(F.col("branch_id")).alias("_bid"),
            norm_text(F.col("address")).alias("_addr"),
            "seq",
        )
        .filter(F.col("_bid").isNotNull() & F.col("_addr").isNotNull())
        .groupBy("_bid")
        .agg(F.max_by(F.col("_addr"), F.col("seq")).alias("_addr"))
    )
    clean, postal = split_postal(F.col("_addr"))
    addr = addr.select("_bid", clean.alias("Location"), postal.alias("Postal"))
    return branches.join(
        F.broadcast(addr), safe_bigint(F.col(id_col)) == F.col("_bid"), "left"
    ).drop("_bid")


def service_descriptions(locations: DataFrame) -> DataFrame:
    """J3: per branch, the FIRST TWO first-appearance-ordered distinct
    (primary, secondary) description pairs; each pair's LineID is the first
    non-null subscription number seen for that pair.

    Reference: `core/enrich/locations.py:57-108`. Output one row per branch:
    (branch_id, firstDescription struct, secondDescription struct) with the
    reference's field names — including its `SecondayDescription` typo,
    preserved deliberately for byte-compatible output (documented in
    SURVEY.md §7).
    """
    loc = locations
    if "seq" not in loc.columns:
        loc = loc.withColumn("seq", F.monotonically_increasing_id())
    rows = loc.select(
        safe_bigint(F.col("branch_id")).alias("bid"),
        norm_text(F.col("primary_desc")).alias("p"),
        norm_text(F.col("secondary_desc")).alias("s"),
        norm_text(F.col("sub_num")).alias("sub"),
        "seq",
    ).filter(F.col("bid").isNotNull() & F.col("p").isNotNull())
    pairs = rows.groupBy("bid", "p", "s").agg(
        F.min("seq").alias("first_seq"),
        F.min_by(F.col("sub"), F.when(F.col("sub").isNotNull(), F.col("seq"))).alias(
            "line_id"
        ),
    )
    w = Window.partitionBy("bid").orderBy("first_seq")
    top2 = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)

    def desc_struct(prefix: int):
        return F.max(
            F.when(
                F.col("rn") == prefix,
                F.struct(
                    F.col("line_id").alias("LineID"),
                    F.col("p").alias("PrimaryDescription"),
                    F.col("s").alias("SecondayDescription"),  # reference typo kept
                ),
            )
        )

    return top2.groupBy("bid").agg(
        desc_struct(1).alias("firstDescription"),
        desc_struct(2).alias("secondDescription"),
    )


def snmp_toner_cartridges(walk: DataFrame) -> DataFrame:
    """A1+P7+F13+F15+W2: SNMP supplies walk rows → per-ip cartridges array.

    Input: (ip, oid, value) varbind rows. Pivot the supplies table columns
    (5=type, 6=desc, 7=unit, 8=max, 9=level) per (ip, supply row index),
    keep toner rows, compute percent, friendly color, sort by row index.
    Reference: `adapters/snmp_toner.py:90-138`.
    """
    col_no, row_idx = parse_supplies_oid(F.col("oid"))
    supplies = walk.select(
        "ip", col_no.alias("colno"), row_idx.alias("idx"), F.col("value")
    ).filter(F.col("colno").isNotNull())
    wide = (
        supplies.groupBy("ip", "idx")
        .pivot("colno", [5, 6, 7, 8, 9])
        .agg(F.first("value", ignorenulls=True))
    )
    toner = wide.filter(F.col("5").try_cast("int").isin(*TONER_SUPPLY_TYPES))
    cart = toner.select(
        "ip",
        "idx",
        F.struct(
            friendly_color(F.col("6")).alias("cartridge"),
            pct_with_symbol(
                compute_supply_percent(F.col("7"), F.col("9"), F.col("8"))
            ).alias("remaining_percent"),
        ).alias("c"),
    )
    return cart.groupBy("ip").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("idx"), F.col("c")))
            ),
            lambda x: x["c"],
        ).alias("cartridges")
    )
